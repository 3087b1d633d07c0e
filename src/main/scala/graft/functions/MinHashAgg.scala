package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup

/** Custom Catalyst aggregate (TypedImperativeAggregate, SURVEY.md §2.13
  * ladder step (b)): folds ALL rows of a group into one MinHash
  * signature — element-wise min across the per-row shingle hashes.
  *
  * This is the aggregate the built-ins can't express: it lets a
  * GROUP's similarity sketch (e.g. a whole conversation's, grouped by
  * conv_id) be computed distributively — update() folds each turn's
  * shingles into the buffer, merge() is element-wise min across
  * partial buffers — so conversation-level near-dup detection runs as
  * one ordinary hash aggregate: map-side partial min, one shuffle on
  * conv_id, no collect_list of the conversation's text anywhere.
  * MinHash property: P[sig_a(i) == sig_b(i)] = Jaccard(A, B), so the
  * fraction of agreeing components estimates conversation Jaccard
  * similarity (Broder 1997).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 64,
    shingleSize: Int = 3,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sh = Dedup.shingles(v.asInstanceOf[UTF8String].toString, shingleSize)
      val sig = Dedup.minhashSignature(sh, numHashes)
      var i = 0
      while (i < numHashes) {
        if (sig(i) < buffer(i)) buffer(i) = sig(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var i = 0
    while (i < numHashes) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_minhash_agg"
}

object MinHashAgg {
  /** Column face: group-level MinHash signature aggregate. */
  def minhash_agg(c: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(c), numHashes, shingleSize)
        .toAggregateExpression())
}
