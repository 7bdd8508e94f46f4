package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Holt–Winters ADDITIVE seasonal smoothing (triple exponential) over
  * an ORDERED value list — the [[HoltFold]] ladder's top rung for
  * series with a repeating period `m` (daily load curves, weekly
  * batch windows), where level+trend alone chases the season:
  *
  *   warmup (first m samples, no output): l₀ = (Σ x_i)/m summed
  *   LEFT-TO-RIGHT, b₀ = 0, ring[i] = x_i − l₀
  *   step i ≥ m, with s_old = ring[i mod m]:
  *     lᵢ = α·(xᵢ − s_old) + (1−α)·(lₚ + bₚ)
  *     bᵢ = β·(lᵢ − lₚ) + (1−β)·bₚ
  *     ring[i mod m] = γ·(xᵢ − lᵢ) + (1−γ)·s_old
  *     forecast = lᵢ + bᵢ + ring[(i+1) mod m]   (one step ahead,
  *       against the NEXT slot's still-previous-cycle seasonal)
  *
  * Output per element: null for the m warmup slots (a season must be
  * observed once before it can be removed), then (level, trend,
  * season, forecast). Sequential within a key — one linear codegen'd
  * pass over the key's collected array (the [[EwmaFold]] pattern).
  *
  * Engine-replayable arithmetic: every step is a fixed IEEE-double op
  * sequence (the warmup mean accumulates in element order, exactly
  * what a recursive-CTE replay does), and all three complements must
  * be exactly representable — the [[HoltFold]] `require` convention,
  * so a drift-prone parameter fails loudly instead of
  * hash-mismatching.
  */
object HoltWintersExpression {

  def holtWintersFold(values: Column, alpha: Double, beta: Double,
      gamma: Double, period: Int): Column =
    ColumnBridge.column(HoltWintersFold(ColumnBridge.expression(values),
      alpha, beta, gamma, period))
}

case class HoltWintersFold(child: Expression, alpha: Double,
    beta: Double, gamma: Double, period: Int)
    extends UnaryExpression {

  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0 && beta <= 1, s"beta must be in [0, 1], got $beta")
  require(gamma >= 0 && gamma <= 1, s"gamma must be in [0, 1], got $gamma")
  require(period >= 2, s"period must be >= 2, got $period")
  require(HoltExpression.exactComplement(alpha) &&
    HoltExpression.exactComplement(beta) &&
    HoltExpression.exactComplement(gamma),
    "alpha, beta and gamma must have exactly-representable " +
      "complements (e.g. 0.25, 0.5, 0.75) for oracle-replayable " +
      s"arithmetic; got ($alpha, $beta, $gamma)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false),
    StructField("season", DoubleType, nullable = false),
    StructField("forecast", DoubleType, nullable = false))),
    containsNull = true) // the m warmup slots

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"holt_winters_fold requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val values = new Array[Double](n)
    var i = 0
    while (i < n) { values(i) = arr.getDouble(i); i += 1 }
    HoltWintersFold.result(values, alpha, beta, gamma, period)
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
         |${ev.value} = graft.functions.HoltWintersFold.result(
         |  $v, $alpha, $beta, $gamma, $period);
       """.stripMargin
    })

  override def prettyName: String = "holt_winters_fold"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HoltWintersFold {
  def result(values: Array[Double], alpha: Double, beta: Double,
      gamma: Double, period: Int): GenericArrayData = {
    val out = new Array[Any](values.length)
    val n = values.length
    val m = period
    if (n <= m) return new GenericArrayData(out) // all warmup: nulls
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    val cg = 1.0 - gamma
    // warmup: left-to-right mean, b = 0, ring = residuals vs the mean
    var acc = 0.0
    var i = 0
    while (i < m) { acc = acc + values(i); i += 1 }
    var l = acc / m
    var b = 0.0
    val ring = new Array[Double](m)
    i = 0
    while (i < m) { ring(i) = values(i) - l; i += 1 }
    i = m
    while (i < n) {
      val sOld = ring(i % m)
      val lp = l
      // fixed op order — the oracle's recursive CTE replays it
      l = alpha * (values(i) - sOld) + ca * (lp + b)
      b = beta * (l - lp) + cb * b
      ring(i % m) = gamma * (values(i) - l) + cg * sOld
      out(i) = InternalRow(l, b, ring(i % m),
        l + b + ring((i + 1) % m))
      i += 1
    }
    new GenericArrayData(out)
  }
}
