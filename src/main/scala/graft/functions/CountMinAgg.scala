package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup
import graft.util.Hash.mix

/** Count-Min sketch aggregate (Cormode/Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 2005) as a Catalyst TypedImperativeAggregate — the
  * heavy-hitter / frequency-estimate primitive for vocabulary stats at
  * 10^12 rows, where an exact per-word groupBy would shuffle one row
  * per DISTINCT WORD per partition and the long tail dominates.
  *
  * The sketch folds every word occurrence of a group's text into a
  * fixed depth×width counter grid: update() adds 1 at row j, column
  * mix(wordHash64(w) ^ seed_j) & (width-1); merge() is element-wise
  * add. Size is CONSTANT (depth·width longs — 32 KiB at 4×1024) no
  * matter how many distinct words flow in, so map-side partial
  * aggregation always applies and the per-group exchange payload is
  * bounded. Point estimate = min over rows (pure overestimate: for
  * every word, estimate >= true count, with ε=e/width relative error at
  * δ=e^-depth confidence). All arithmetic is integer adds — the result
  * is order- and partition-invariant, bit-for-bit.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = CountMinAgg.DEPTH,
    width: Int = CountMinAgg.WIDTH,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {
  require(Integer.bitCount(width) == 1, "width must be a power of two")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val toks = Dedup.tokens(v.asInstanceOf[UTF8String].toString)
      var t = 0
      while (t < toks.length) {
        val wh = Dedup.wordHash64(toks(t))
        var j = 0
        while (j < depth) {
          buffer(j * width + (mix(wh ^ CountMinAgg.seed(j)).toInt & (width - 1))) += 1L
          j += 1
        }
        t += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_count_min_agg"
}

object CountMinAgg {
  val DEPTH = 4
  val WIDTH = 1024

  /** Fixed row seeds — compile-time constants of j so the SQL oracle
    * embeds the same values as literals.
    */
  def seed(j: Int): Long = mix(0xc3a5c85c97cb3127L + j)

  /** Column face: Count-Min sketch of all word tokens in the group. */
  def count_min_agg(c: Column, depth: Int = DEPTH, width: Int = WIDTH): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Bucket of word w in sketch row j. */
  def bucket(w: String, j: Int, width: Int = WIDTH): Int =
    mix(Dedup.wordHash64(w) ^ seed(j)).toInt & (width - 1)

  /** Point estimate: min over rows — always >= the true count. */
  def estimate(sketch: Array[Long], w: String, depth: Int = DEPTH,
      width: Int = WIDTH): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = sketch(j * width + bucket(w, j, width))
      if (c < best) best = c
      j += 1
    }
    best
  }
}
