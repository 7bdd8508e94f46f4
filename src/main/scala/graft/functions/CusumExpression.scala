package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Two-sided CUSUM change-point statistic over an ORDERED value list —
  * the standard sequential drift detector for metric streams (Page
  * 1954; what a monitoring shop runs on the counter rates the
  * reference lands):
  *
  *   S⁺ᵢ = max(0, S⁺ᵢ₋₁ + ((xᵢ − target) − slack))
  *   S⁻ᵢ = max(0, S⁻ᵢ₋₁ + ((target − xᵢ) − slack))
  *
  * with an ALARM when either statistic exceeds `threshold`, after
  * which both reset (restart detection — each alarm marks one
  * change). Like [[EwmaFold]], the recursion is sequential within a
  * key, so it runs as one linear codegen'd pass over the key's
  * collected array; each step is the fixed (subtract, subtract, add,
  * max) IEEE-double sequence, so the oracle's recursive CTE replays
  * every statistic bit-for-bit.
  *
  * Output: array<struct<s_pos double, s_neg double, alarm boolean>>
  * aligned with the input (the emitted values are the PRE-reset
  * statistics, so the triggering magnitudes stay visible).
  */
object CusumExpression {

  def cusumFold(values: Column, target: Double, slack: Double,
      threshold: Double): Column =
    ColumnBridge.column(CusumFold(ColumnBridge.expression(values),
      target, slack, threshold))
}

case class CusumFold(child: Expression, target: Double, slack: Double,
    threshold: Double) extends UnaryExpression {

  require(slack >= 0, s"slack must be >= 0, got $slack")
  require(threshold > 0, s"threshold must be > 0, got $threshold")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s_pos", DoubleType, nullable = false),
    StructField("s_neg", DoubleType, nullable = false),
    StructField("alarm", BooleanType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cusum_fold requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val values = new Array[Double](n)
    var i = 0
    while (i < n) { values(i) = arr.getDouble(i); i += 1 }
    CusumFold.result(values, target, slack, threshold)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      s"""
         |double[] $v = new double[$arr.numElements()];
         |for (int $i = 0; $i < $v.length; $i++) {
         |  $v[$i] = $arr.getDouble($i);
         |}
         |${ev.value} = graft.functions.CusumFold.result(
         |  $v, $target, $slack, $threshold);
       """.stripMargin
    })

  override def prettyName: String = "cusum_fold"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CusumFold {
  def result(values: Array[Double], target: Double, slack: Double,
      threshold: Double): GenericArrayData = {
    val out = new Array[Any](values.length)
    var sp = 0.0; var sn = 0.0
    var i = 0
    while (i < values.length) {
      // fixed op order — the oracle's recursive CTE replays it exactly
      sp = Math.max(0.0, sp + ((values(i) - target) - slack))
      sn = Math.max(0.0, sn + ((target - values(i)) - slack))
      val alarm = sp > threshold || sn > threshold
      out(i) = InternalRow(sp, sn, alarm)
      if (alarm) { sp = 0.0; sn = 0.0 }
      i += 1
    }
    new GenericArrayData(out)
  }
}
