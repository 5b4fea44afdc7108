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
}
