package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst Expression to the public Column API —
  * `ExpressionUtils.column` is private[sql] in Spark 4, so the adapter
  * lives under the org.apache.spark.sql package (the standard extension
  * pattern for custom expressions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's canonical DIVIDE_BY_ZERO error (QueryExecutionErrors is
    * private[sql]) — thrown by graft.plans.CosineSim under ANSI mode so
    * the fused expression fails exactly like the Divide it replaces. */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)
}
