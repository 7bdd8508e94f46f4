package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exponentially-weighted moving average over an ORDERED value list:
  * y₁ = x₁, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ — the standard smoothing pass for
  * noisy per-key metric streams (the rrd data the reference ingests
  * is itself consolidated this way upstream).
  *
  * A recursive fold is inherently sequential within a key, so — like
  * [[NextFitPack]] — it runs as one linear codegen'd pass over the
  * key's collected array rather than an `aggregate()` HOF (interpreted
  * lambda per element, quadratic array-accumulator copying). The op
  * sequence per step is exactly (multiply, multiply, add) on doubles,
  * so any engine replaying the same order produces bit-identical
  * output — the oracle's recursive CTE does.
  *
  * Null elements HOLD the previous smoothed value (a gap contributes
  * no new information); leading nulls stay null.
  */
object EwmaExpression {

  /** `ewmaFold(values, alpha)`: array<double> of smoothed values, same
    * length as `values`.
    */
  def ewmaFold(values: Column, alpha: Double): Column =
    ColumnBridge.column(EwmaFold(ColumnBridge.expression(values), alpha))
}

case class EwmaFold(child: Expression, alpha: Double)
    extends UnaryExpression {

  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ewma_fold requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val values = new Array[Double](n)
    val present = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      present(i) = !arr.isNullAt(i)
      if (present(i)) values(i) = arr.getDouble(i)
      i += 1
    }
    EwmaFold.result(values, present, alpha)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val v = ctx.freshName("v")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      s"""
         |double[] $v = new double[$arr.numElements()];
         |boolean[] $p = new boolean[$arr.numElements()];
         |for (int $i = 0; $i < $v.length; $i++) {
         |  $p[$i] = !$arr.isNullAt($i);
         |  if ($p[$i]) $v[$i] = $arr.getDouble($i);
         |}
         |${ev.value} = graft.functions.EwmaFold.result($v, $p, $alpha);
       """.stripMargin
    })

  override def prettyName: String = "ewma_fold"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object EwmaFold {
  /** Shared fold: output i is the smoothed value, NaN marking "no
    * observation yet" (leading nulls).
    */
  def compute(values: Array[Double], present: Array[Boolean],
      alpha: Double): Array[Double] = {
    val out = new Array[Double](values.length)
    var y = Double.NaN
    var seen = false
    var i = 0
    while (i < values.length) {
      if (present(i)) {
        y = if (!seen) values(i) else alpha * values(i) + (1 - alpha) * y
        seen = true
      }
      out(i) = y
      i += 1
    }
    out
  }

  /** Boxed array form shared by interpreted and codegen paths: null =
    * no observation yet; a null element after the first observation
    * holds the previous smoothed value.
    */
  def result(values: Array[Double], present: Array[Boolean],
      alpha: Double): GenericArrayData = {
    val y = compute(values, present, alpha)
    val out = new Array[Any](y.length)
    var seen = false
    var i = 0
    while (i < y.length) {
      if (present(i)) seen = true
      out(i) = if (seen) java.lang.Double.valueOf(y(i)) else null
      i += 1
    }
    new GenericArrayData(out)
  }
}
