package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Holt linear-trend (double exponential) smoothing over an ORDERED
  * value list — the one-step-ahead forecaster monitoring dashboards
  * run where [[EwmaFold]]'s level-only smoothing lags a trending
  * series:
  *
  *   l₁ = x₁, b₁ = 0
  *   lᵢ = α·xᵢ + (1−α)·(lᵢ₋₁ + bᵢ₋₁)
  *   bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁
  *
  * Output per element: (level, trend, forecast = level + trend — the
  * next step's prediction). Sequential within a key, so it runs as
  * one linear codegen'd pass over the key's collected array (the
  * [[EwmaFold]] pattern).
  *
  * Engine-replayable arithmetic: each step is a fixed IEEE-double op
  * sequence, and the complements (1−α), (1−β) are computed ONCE and
  * must equal the oracle's literals bit-for-bit — callers pick α, β
  * whose complements are exactly representable (0.25, 0.5, 0.75 …);
  * `require` enforces it so a drift-prone parameter fails loudly
  * instead of hash-mismatching (the q_ewma convention).
  */
object HoltExpression {

  def holtFold(values: Column, alpha: Double, beta: Double): Column =
    ColumnBridge.column(HoltFold(ColumnBridge.expression(values),
      alpha, beta))

  /** 1−p is exactly representable iff the subtraction round-trips. */
  def exactComplement(p: Double): Boolean = (1.0 - (1.0 - p)) == p
}

case class HoltFold(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression {

  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0 && beta <= 1, s"beta must be in [0, 1], got $beta")
  require(HoltExpression.exactComplement(alpha) &&
    HoltExpression.exactComplement(beta),
    "alpha and beta must have exactly-representable complements " +
      s"(e.g. 0.25, 0.5, 0.75) for oracle-replayable arithmetic; " +
      s"got ($alpha, $beta)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false),
    StructField("forecast", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"holt_fold requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val values = new Array[Double](n)
    var i = 0
    while (i < n) { values(i) = arr.getDouble(i); i += 1 }
    HoltFold.result(values, alpha, beta)
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
         |${ev.value} = graft.functions.HoltFold.result($v, $alpha, $beta);
       """.stripMargin
    })

  override def prettyName: String = "holt_fold"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HoltFold {
  def result(values: Array[Double], alpha: Double,
      beta: Double): GenericArrayData = {
    val out = new Array[Any](values.length)
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    var l = 0.0; var b = 0.0
    var i = 0
    while (i < values.length) {
      if (i == 0) { l = values(0); b = 0.0 }
      else {
        val lp = l
        // fixed op order — the oracle's recursive CTE replays it
        l = alpha * values(i) + ca * (lp + b)
        b = beta * (l - lp) + cb * b
      }
      out(i) = InternalRow(l, b, l + b)
      i += 1
    }
    new GenericArrayData(out)
  }
}
