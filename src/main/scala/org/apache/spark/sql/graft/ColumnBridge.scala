package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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

  /** Register a SQL function on a LIVE session (sessionState is
    * `private[sql]`); the extensions path (`graft.GraftExtensions`)
    * covers sessions built with `withExtensions` / `spark.sql.extensions`.
    */
  def registerFunction(spark: SparkSession, name: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(name, info, builder)

  /** The exact error an ANSI double→decimal cast raises on precision
    * overflow (`QueryExecutionErrors` is `private[sql]`); the fused
    * round-to-decimal kernel re-throws it for bit-and-error parity.
    */
  def decimalPrecisionOverflowError(
      value: org.apache.spark.sql.types.Decimal, precision: Int,
      scale: Int): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .cannotChangeDecimalPrecisionError(value, precision, scale)
}
