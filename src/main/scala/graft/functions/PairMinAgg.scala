package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualNullSafe, Expression, If, IsNotNull, IsNull, LessThan, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, StructField, StructType}

/** Lexicographic minimum of an ordered pair — the hash-aggregable
  * replacement for `min(struct(a, b))`.
  *
  * Spark's built-in `min` over a struct forces SortAggregate (a struct
  * is not an UnsafeRow-mutable buffer type), so every partial aggregate
  * pays a per-partition O(n log n) sort of its input. This aggregate
  * keeps the pair in TWO scalar buffer slots plus a set flag — all
  * mutable primitive types — so both the partial and final aggregates
  * run as whole-stage-codegen HashAggregate: per-row O(1) update
  * against a hash map keyed by the group key, no sort anywhere. That is
  * the scale bound the first-occurrence dedup paths
  * ([[graft.dedup.Dedup.lineDedup]], [[graft.dedup.Dedup.spanDedup]])
  * need: a boilerplate line/span occurring 10^8 times folds map-side
  * into one (id, pos) pair per map task with no per-task sort of the
  * occurrences.
  *
  * Ordering matches `min(struct(a, b))` exactly, including SQL
  * null-field ordering (NULLS FIRST per field), verified field-by-field
  * against the built-in in PairMinAggSpec. Result is a
  * struct<f1, f2> (field names supplied by the caller) so call sites
  * keep their `.getField` accesses unchanged; an empty group yields
  * NULL like the built-in.
  */
case class PairMinAgg(
    left: Expression,
    right: Expression,
    f1: String,
    f2: String
) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField(f1, left.dataType, nullable = true),
    StructField(f2, right.dataType, nullable = true)))

  private lazy val mSet = AttributeReference("mSet", BooleanType, nullable = false)()
  private lazy val m1 = AttributeReference("m1", left.dataType)()
  private lazy val m2 = AttributeReference("m2", right.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(mSet, m1, m2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(false),
    Literal.create(null, left.dataType),
    Literal.create(null, right.dataType))

  // SQL ascending-NULLS-FIRST per-field comparison, the same ordering
  // the struct comparator applies inside min(struct(a, b))
  private def nullsFirstLt(a: Expression, b: Expression): Expression =
    Or(And(IsNull(a), IsNotNull(b)),
      And(And(IsNotNull(a), IsNotNull(b)), LessThan(a, b)))

  private def pairLt(a1: Expression, a2: Expression,
      b1: Expression, b2: Expression): Expression =
    Or(nullsFirstLt(a1, b1), And(EqualNullSafe(a1, b1), nullsFirstLt(a2, b2)))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(Not(mSet), pairLt(left, right, m1, m2))
    Seq(Literal(true), If(better, left, m1), If(better, right, m2))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = And(mSet.right,
      Or(Not(mSet.left), pairLt(m1.right, m2.right, m1.left, m2.left)))
    Seq(
      Or(mSet.left, mSet.right),
      If(better, m1.right, m1.left),
      If(better, m2.right, m2.left))
  }

  override lazy val evaluateExpression: Expression =
    If(mSet,
      CreateNamedStruct(Seq(Literal(f1), m1, Literal(f2), m2)),
      Literal.create(null, dataType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PairMinAgg =
    copy(left = newChildren(0), right = newChildren(1))

  override def prettyName: String = "graft_pair_min"
}

object PairMinAgg {
  /** Column face: `pair_min(a, b, "fa", "fb")` ≡ `min(struct(a as fa,
    * b as fb))`, but hash-aggregable.
    */
  def pair_min(a: Column, b: Column, f1: String, f2: String): Column =
    GraftBridge.column(
      PairMinAgg(GraftBridge.expression(a), GraftBridge.expression(b), f1, f2)
        .toAggregateExpression())
}
