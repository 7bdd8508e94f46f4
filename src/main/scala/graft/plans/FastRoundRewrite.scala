package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.functions.{FastRound, FastRoundToDecimal}

/** Optimizer rule: substitute [[graft.functions.FastRound]] for
  * Spark's `Round` wherever the child is DoubleType and the scale is a
  * literal int in [0, 15] — every `round(col, 6)` / `round(col, 12)`
  * in the exactness chains. Spark's Round evaluates two BigDecimal
  * constructions per row (each a Double.toString parse); the engine's
  * decimal-exactness convention rounds on nearly every hot aggregate
  * input, so that constant dominates round-dense plans.
  * [[FastRound]] is bit-identical (HALF_UP on the shortest-decimal
  * representation, NaN/Infinity pass-through, correctly-rounded
  * decimal→double re-conversion) with an integer fast path —
  * differential-pinned in PropertySpec over boundary-adversarial
  * sweeps, and by the whole oracle suite running under the rule.
  *
  * The rewrite happens AFTER analysis, so aliases and schemas are
  * untouched; `bround` (HALF_EVEN) and decimal/integral children are
  * left alone. Disable with `spark.graft.fastRound.enabled=false`.
  *
  * Ships via [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * builder-configured sessions, or [[FastRoundRewrite.install]] on a
  * live session (`spark.experimental.extraOptimizations`).
  */
object FastRoundRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.fastRound.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan.transformAllExpressions {
      // the exactness convention's per-term chain, fused end to end:
      // cast(round(x, s) as decimal(p, s)) with p >= 19; the fused
      // expression replicates the cast's full Spark 4 semantics in
      // both ANSI and legacy mode (NaN/Inf → null, long-range values
      // compact, larger through the BigDecimal path, precision
      // overflow → Spark's own error under ANSI / null otherwise)
      case Cast(Round(c, Literal(s: Int, IntegerType), _),
            dt: DecimalType, _, mode)
          if c.resolved && c.dataType == DoubleType &&
            s >= 0 && s <= 15 && dt.scale == s && dt.precision >= 19 =>
        FastRoundToDecimal(c, s, dt.precision, mode == EvalMode.ANSI)
      case Round(c, Literal(s: Int, IntegerType), _)
          if c.resolved && c.dataType == DoubleType &&
            s >= 0 && s <= 15 =>
        FastRound(c, s)
    }
  }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}
