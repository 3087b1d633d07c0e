package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup

/** HyperLogLog distinct-word counter (Flajolet/Fusy/Gandouet/Meunier,
  * AofA 2007) as a Catalyst TypedImperativeAggregate — the cardinality
  * twin of [[CountMinAgg]]: per-group vocabulary size in CONSTANT
  * state (2^P = 1024 registers) where an exact count(DISTINCT word)
  * shuffles every distinct word.
  *
  * update() folds each word occurrence's 64-bit hash: register index =
  * top P bits, rank = leading zeros of the remaining bits + 1, register
  * = max. merge() is element-wise max — like the CMS, pure integer
  * lattice ops, so the register state is order- and partition-invariant
  * bit for bit, and the float estimate computed FROM it (fixed register
  * order, dyadic 2^-r addends) is deterministic too.
  *
  * estimate(): the standard m=1024 path — raw = α_m·m²/Σ2^-reg with
  * linear counting m·ln(m/V) below 2.5m when V>0 (Flajolet §4). V is
  * DISCRETE (1..m), so the oracle replays even the transcendental
  * branch exactly from a dumped (V → m·ln(m/V)) table of Java-computed
  * values. The 32-bit-era long-range correction is unnecessary with a
  * 64-bit hash (Heule/Nunkesser/Hall, HLL++ EDBT 2013) and omitted.
  */
case class HllAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {
  import HllAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val toks = Dedup.tokens(v.asInstanceOf[UTF8String].toString)
      var t = 0
      while (t < toks.length) {
        val wh = Dedup.wordHash64(toks(t))
        val idx = (wh >>> (64 - P)).toInt
        val rest = wh << P
        val rank = if (rest == 0L) 64 - P + 1
        else java.lang.Long.numberOfLeadingZeros(rest) + 1
        if (rank > buffer(idx)) buffer(idx) = rank
        t += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < M) { if (other(i) > buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = buffer(i).toByte; i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = bytes(i) & 0xff; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hll_agg"
}

object HllAgg {
  val P = 10
  val M = 1 << P // 1024 registers, 1 KiB serialized

  /** α_m·m² for m=1024 (Flajolet α_m = 0.7213/(1 + 1.079/m)). */
  val ALPHA_M2: Double = 0.7213 / (1.0 + 1.079 / M) * M * M

  /** 2^-r addends, indexed by register value (0..64-P+1). */
  val INV_POW2: Array[Double] =
    (0 to 64 - P + 1).map(r => java.lang.Math.scalb(1.0, -r)).toArray

  /** Fixed-register-order estimate — reproducible bit for bit. */
  def estimate(regs: Array[Int]): Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum = sum + INV_POW2(regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = ALPHA_M2 / sum
    if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
    else raw
  }

  /** Column face: HLL register state over the group's word tokens. */
  def hll_agg(c: Column): Column =
    GraftBridge.column(
      HllAgg(GraftBridge.expression(c)).toAggregateExpression())
}
