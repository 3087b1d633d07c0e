package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor into Spark's private[sql] Column↔Expression
  * conversions (org.apache.spark.sql.classic.ExpressionUtils) for the
  * custom Catalyst expressions in graft.functions. Public Spark API
  * only — this file exists solely because the conversion helpers are
  * package-private in Spark 4.x.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
