package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Boolean pass-through wrapper marking a predicate as
  * [[RangeJoinRewrite]]'s own wide-fallback join condition. Catalyst
  * treats an unknown expression conservatively — nothing splits,
  * simplifies, or substitutes through it — so the fallback join can
  * never be re-parsed as a rewrite candidate. Markers built from
  * projected columns do NOT survive: pushing a marker conjunct
  * through its defining Project substitutes the alias away
  * (PushPredicateThroughNonJoin) and ColumnPruning then drops the
  * column, which re-armed the rule every fixed-point iteration
  * (measured 202 stacked joins before this wrapper).
  */
case class GraftFallbackCond(child: org.apache.spark.sql.catalyst
    .expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c)
}

/** Optimizer rule: rewrite a point-in-interval non-equi inner join into
  * a binned equi-join (SURVEY §2.4 / §4 — the whole-plan tier of the
  * extension ladder: a `Rule[LogicalPlan]` where a library operator
  * ([[graft.operators.Relational.rangeJoin]]) would force callers to
  * restructure their query).
  *
  * Spark plans `pts JOIN ivs ON pt BETWEEN start AND end` as a
  * broadcast nested loop — O(|pts|·|ivs|) comparisons, the classic
  * 100 TB melt. With `spark.graft.rangeJoin.binWidth` set to a positive
  * integer (same unit as the joined columns, ideally near the typical
  * interval length), this rule transparently rewrites the SAME query
  * text into the plan you'd write by hand:
  *
  *   - points project an extra `floor(pt / width)` bin column;
  *   - intervals `Generate(Explode(Sequence(floor(start/w),
  *     floor(end/w))))` — one row per overlapped bin;
  *   - the join becomes an EQUI-join on the bin (hash-partitionable,
  *     AQE/skew-split eligible) with the original predicate kept as the
  *     residual filter, under a Project back to the original output.
  *
  * Correctness: a point in `[start, end]` lies in some bin `b` with
  * `floor(start/w) <= b <= floor(end/w)`, so the bin equi-join yields a
  * superset of the true pairs and the residual original condition
  * removes the rest. Strict bounds (`<`, `>`) produce a subset of the
  * inclusive candidates — still covered. Malformed intervals
  * (end < start) generate a descending bin sequence whose pairs all
  * fail the residual filter, matching the empty nested-loop result.
  *
  * Scope guards: inner joins only; the condition's conjuncts must
  * contain a lower and an upper bound on one semantically-identical
  * integral point expression from one side against integral bounds from
  * the other; any cross-side equality conjunct (`=` or `<=>`) means
  * Spark already has an equi key, so the join is left alone. Intervals
  * wider than `spark.graft.rangeJoin.maxBinsPerInterval` (default 256)
  * bins are not exploded — they keep the original non-equi join in a
  * unioned fallback branch, so one open-ended sentinel row cannot turn
  * the rewrite into a too-long-sequence runtime failure. Fixpoint
  * (load-bearing inside the extensions' fixed-point operator batch):
  * the binned join is recognized by the recursive `__graft` subtree
  * scan (its bin attributes are condition-referenced and can never be
  * pruned), and the fallback join's condition is wrapped in the
  * opaque [[GraftFallbackCond]], which the conjunct parser cannot
  * decompose — so neither is ever reprocessed.
  *
  * Ships via [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * builder-configured sessions, or [[RangeJoinRewrite.install]] on a
  * live session (`spark.experimental.extraOptimizations`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  /** Intervals spanning more than this many bins are NOT exploded —
    * they run through an unchanged non-equi fallback join unioned with
    * the binned plan. Guards against open-ended sentinel intervals
    * (end = MAX) turning the bin sequence into a runtime error.
    */
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerInterval"

  /** Register on a live session; inert until [[WidthConf]] is set. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(WidthConf, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  /** One candidate reading of a comparison conjunct: `pt >= bound`
    * (lower) or `pt <= bound` (upper).
    */
  private case class BoundOn(pt: Expression, bound: Expression,
      lower: Boolean)

  /** Both orientations of a binary comparison (`a >= b` is also
    * `b <= a`); the pair search resolves which operand is the point.
    */
  private def readings(e: Expression): Seq[BoundOn] = e match {
    case GreaterThanOrEqual(a, b) =>
      Seq(BoundOn(a, b, lower = true), BoundOn(b, a, lower = false))
    case GreaterThan(a, b) =>
      Seq(BoundOn(a, b, lower = true), BoundOn(b, a, lower = false))
    case LessThanOrEqual(a, b) =>
      Seq(BoundOn(a, b, lower = false), BoundOn(b, a, lower = true))
    case LessThan(a, b) =>
      Seq(BoundOn(a, b, lower = false), BoundOn(b, a, lower = true))
    case _ => Seq.empty
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case x => Seq(x)
  }

  private def integral(e: Expression): Boolean = (e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }) && e.deterministic

  private def fromOnly(side: LogicalPlan)(e: Expression): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def crossSide(j: Join, a: Expression, b: Expression): Boolean =
    (fromOnly(j.left)(a) && fromOnly(j.right)(b)) ||
      (fromOnly(j.right)(a) && fromOnly(j.left)(b))

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(j.condition.get)

    // our own artifacts ANYWHERE below this join mean it is (or sits
    // over) a rewritten or wide-fallback join — never reprocess.
    // The scan must be SUBTREE-recursive: inside the extensions'
    // fixed-point operator batch, PushDownPredicates moves the
    // fallback marker's conjunct below the join and ColumnPruning
    // re-projects it out of the immediate child's output, so a
    // shallow child-output check stops seeing it after one iteration
    // and the rule re-rewrites its own fallback every iteration
    // (measured 202 stacked joins). The marker alias itself is
    // non-foldable (see below), so it can never be constant-folded
    // out of the subtree. Trade-off: a user query stacking a SECOND
    // range join directly above a rewritten one keeps its original
    // plan — correct, just not binned.
    def tainted(p: LogicalPlan): Boolean =
      p.exists(n => n.output.exists(_.name.startsWith("__graft")))
    if (tainted(j.left) || tainted(j.right)) return None

    // an existing cross-side equality = Spark already equi-joins
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(j, a, b)
      case EqualNullSafe(a, b) => crossSide(j, a, b) // <=> is equi too
      case _ => false
    }
    if (hasEqui) return None

    val all = conjuncts.flatMap(readings)
    // find (lower, upper) on the same pt expression, pt wholly from one
    // side, both bounds wholly from the other, all integral
    val pair = (for {
      lo <- all if lo.lower && integral(lo.pt) && integral(lo.bound)
      hi <- all if !hi.lower && integral(hi.bound)
      if lo.pt.semanticEquals(hi.pt)
      ptOnLeft <- Seq(true, false)
      (ptSide, ivSide) =
        if (ptOnLeft) (j.left, j.right) else (j.right, j.left)
      if fromOnly(ptSide)(lo.pt) &&
        fromOnly(ivSide)(lo.bound) && fromOnly(ivSide)(hi.bound)
    } yield (lo.pt, lo.bound, hi.bound, ptOnLeft)).headOption

    pair.map { case (pt, start, end, ptOnLeft) =>
      val (ptsPlan, ivsPlan) =
        if (ptOnLeft) (j.left, j.right) else (j.right, j.left)
      val maxBins =
        try math.max(1L, conf.getConfString(MaxBinsConf, "256").toLong)
        catch { case _: NumberFormatException => 256L }
      val w = Literal(width.toDouble, DoubleType)
      def binOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), w))
      // bins an interval explodes to, computed in DOUBLE: a LongType
      // subtraction would ANSI-overflow on a fully open sentinel
      // (MinValue..MaxValue) — the very row the guard must shunt away.
      // NULL bounds make it NULL, which both branch filters reject —
      // matching the original join, where a NULL bound can never
      // satisfy the range predicate.
      val spanBins = Subtract(Cast(binOf(end), DoubleType),
        Cast(binOf(start), DoubleType))

      // NARROW intervals (0 ≤ span ≤ maxBins bins): explode to bins,
      // equi-join. The span >= 0 arm matters: a REVERSED interval
      // (end < start) would otherwise slip past `span <= maxBins` and
      // default-step Sequence DOWNWARD |span| bins; the original join
      // returns empty for reversed bounds, so such rows are simply
      // dropped (they fail the wide filter too).
      val ptBin = Alias(binOf(pt), "__graft_pt_bin")()
      val ptsProj = Project(ptsPlan.output :+ ptBin, ptsPlan)
      val ivBin = AttributeReference("__graft_iv_bin", LongType,
        nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and the optimizer integrity check rejects the plan
      val gen = Generate(Explode(Sequence(binOf(start), binOf(end), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ivBin),
        child = Filter(And(
            GreaterThanOrEqual(spanBins, Literal(0.0)),
            LessThanOrEqual(spanBins, Literal(maxBins.toDouble))),
          ivsPlan))
      val (nl, nr) = if (ptOnLeft) (ptsProj, gen) else (gen, ptsProj)
      val newCond = And(EqualTo(ptBin.toAttribute, ivBin), j.condition.get)
      val narrow = Project(j.output, Join(nl, nr, Inner, Some(newCond),
        j.hint))

      // WIDE intervals (open-ended sentinels, malformed spans): exploding
      // them could exceed Spark's sequence limit outright — keep the
      // original non-equi join for just these rows (they are few by
      // construction; a corpus of wide intervals has no bin width that
      // helps). The marker column makes the fallback join skip-able
      // above and is never part of the projected output. The fallback
      // branch re-reads the point side, but in the common no-wide-rows
      // case AQE's empty-relation propagation collapses the whole
      // branch at runtime after the (tiny) interval-side stage
      // materializes empty — PlanSpec asserts the final adaptive plan
      // carries no nested loop then.
      // the fallback's ORIGINAL condition rides inside the opaque
      // [[GraftFallbackCond]] wrapper: the pair-search above cannot
      // decompose it, so the fallback join is structurally
      // unrewritable — fixpoint by construction, with no reliance on
      // prunable marker columns
      val wideIvs = Filter(
        GreaterThan(spanBins, Literal(maxBins.toDouble)), ivsPlan)
      val (wl, wr) = if (ptOnLeft) (ptsPlan, wideIvs) else (wideIvs, ptsPlan)
      val wide = Project(j.output,
        Join(wl, wr, Inner, Some(GraftFallbackCond(j.condition.get)),
          j.hint))

      Union(Seq(narrow, wide))
    }
  }
}
