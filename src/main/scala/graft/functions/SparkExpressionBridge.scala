package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's classic Column ⇄ Expression conversions, which are
  * `private[sql]` in Spark 4's unified Column API. Lives in the
  * `org.apache.spark.sql` package solely to satisfy that access scope —
  * the standard pattern for libraries contributing custom Catalyst
  * expressions (the same access `functions._` uses internally).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
