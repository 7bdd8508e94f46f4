package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 moved Column onto
  * ColumnNode and made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so custom-expression
  * libraries expose them from inside the package — the same pattern
  * Spark's own connectors use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
