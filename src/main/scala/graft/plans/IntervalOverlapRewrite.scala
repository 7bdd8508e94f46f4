package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an interval×interval OVERLAP inner join
  * (`a.s <= b.e AND b.s <= a.e`, any comparison spelling) into the
  * binned equi-join [[graft.operators.Relational.intervalOverlapJoin]]
  * plans by hand — the [[RangeJoinRewrite]] treatment for the other
  * classic non-equi join Spark executes as a broadcast nested loop.
  *
  * With `spark.graft.overlapJoin.binWidth` set to a positive integer
  * (same unit as the bound columns, near the typical interval
  * length), the SAME query text becomes:
  *
  *   - each side `Generate(Explode(Sequence(floor(s/w), floor(e/w))))`
  *     — one row per overlapped bin;
  *   - an EQUI-join on the bin (hash-partitionable, AQE/skew-split
  *     eligible) with the ORIGINAL predicate as residual;
  *   - the canonical-bin conjunct `bin == floor(greatest(a.s, b.s)/w)`
  *     — a true pair's later start falls in exactly one bin common to
  *     both ranges, so each pair emits ONCE and no `distinct` (and no
  *     second shuffle) is needed.
  *
  * Correctness: for a pair satisfying the predicate with both
  * intervals bin-ordered (`floor(s/w) <= floor(e/w)`), `a.s <= b.e`
  * and `b.s <= a.e` put `floor(max(a.s, b.s)/w)` inside both exploded
  * ranges, so the candidate set is complete and the residual filters
  * exact. Rows whose interval is bin-REVERSED or wider than
  * `spark.graft.overlapJoin.maxBinsPerInterval` (default 256) bins —
  * open-ended sentinels that would explode the sequence — run
  * through non-equi fallback joins carrying the original condition
  * inside the opaque [[GraftFallbackCond]] (fixpoint by
  * construction, the RangeJoinRewrite lesson): bad-A×all-B plus
  * normal-A×bad-B covers every remaining pair exactly once. NULL
  * bounds fall out of every branch, matching the original join where
  * a NULL bound can never satisfy the comparison.
  *
  * Scope guards: inner joins only; both matched conjuncts integral
  * and deterministic; any cross-side equality conjunct means Spark
  * already has an equi key — left alone; `__graft` taint anywhere
  * below skips (a plan this rule or [[RangeJoinRewrite]] already
  * produced). Ships via [[graft.GraftExtensions]]; inert until the
  * width conf is set.
  */
object IntervalOverlapRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.overlapJoin.binWidth"
  val MaxBinsConf = "spark.graft.overlapJoin.maxBinsPerInterval"

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

  /** A conjunct normalized to `x <= y` (`strict` = it was `<`). */
  private case class Le(x: Expression, y: Expression, strict: Boolean)

  private def les(e: Expression): Seq[Le] = e match {
    case LessThanOrEqual(a, b)    => Seq(Le(a, b, strict = false))
    case LessThan(a, b)           => Seq(Le(a, b, strict = true))
    case GreaterThanOrEqual(a, b) => Seq(Le(b, a, strict = false))
    case GreaterThan(a, b)        => Seq(Le(b, a, strict = true))
    case _                        => Seq.empty
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

    // never reprocess our own (or RangeJoinRewrite's) plans — the
    // SUBTREE-recursive scan, see RangeJoinRewrite's fixpoint notes
    def tainted(p: LogicalPlan): Boolean =
      p.exists(n => n.output.exists(_.name.startsWith("__graft")))
    if (tainted(j.left) || tainted(j.right)) return None

    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(j, a, b)
      case EqualNullSafe(a, b) => crossSide(j, a, b)
      case _ => false
    }
    if (hasEqui) return None

    val all = conjuncts.flatMap(les)
    // c1: (A-side x) <= (B-side y); c2: (B-side x) <= (A-side y) —
    // the two half-overlap constraints, A = left by convention. ANY
    // candidate pair yields a CORRECT rewrite (the full original
    // predicate rides as the residual); the non-strict-preferring
    // score only steers plan QUALITY — overlap bounds are written
    // inclusively while id-dedup conjuncts (`a.id < b.id`) are
    // strict, and picking the latter as a "bound" would shunt every
    // row through the wide fallback.
    val pair = (for {
      c1 <- all
      if fromOnly(j.left)(c1.x) && fromOnly(j.right)(c1.y) &&
        integral(c1.x) && integral(c1.y)
      c2 <- all
      if fromOnly(j.right)(c2.x) && fromOnly(j.left)(c2.y) &&
        integral(c2.x) && integral(c2.y)
    } yield (c1, c2))
      .sortBy { case (c1, c2) =>
        (if (c1.strict) 1 else 0) + (if (c2.strict) 1 else 0) }
      .headOption
      .map { case (c1, c2) => (c1.x, c2.y, c2.x, c1.y) } // (aS,aE,bS,bE)

    pair.map { case (aS, aE, bS, bE) =>
      val maxBins =
        try math.max(1L, conf.getConfString(MaxBinsConf, "256").toLong)
        catch { case _: NumberFormatException => 256L }
      val w = Literal(width.toDouble, DoubleType)
      def binOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), w))
      // DOUBLE span: a LongType subtraction would ANSI-overflow on an
      // open sentinel — the very row the guard shunts to the fallback
      def spanBins(s: Expression, e: Expression): Expression =
        Subtract(Cast(binOf(e), DoubleType), Cast(binOf(s), DoubleType))
      def normal(s: Expression, e: Expression): Expression =
        And(GreaterThanOrEqual(spanBins(s, e), Literal(0.0)),
          LessThanOrEqual(spanBins(s, e), Literal(maxBins.toDouble)))
      def bad(s: Expression, e: Expression): Expression =
        Not(normal(s, e)) // NULL span -> NULL -> filtered: no branch

      val tz = Some(conf.sessionLocalTimeZone)
      val aBin = AttributeReference("__graft_ov_bin_a", LongType,
        nullable = false)()
      val bBin = AttributeReference("__graft_ov_bin_b", LongType,
        nullable = false)()
      val genA = Generate(Explode(Sequence(binOf(aS), binOf(aE), None, tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(aBin),
        child = Filter(normal(aS, aE), j.left))
      val genB = Generate(Explode(Sequence(binOf(bS), binOf(bE), None, tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bBin),
        child = Filter(normal(bS, bE), j.right))
      // canonical bin: the LATER START's bin — common to both ranges
      // for every true pair, and unique, so no pair-level distinct
      val canonical = binOf(Greatest(Seq(Cast(aS, LongType),
        Cast(bS, LongType))))
      val narrowCond = And(And(EqualTo(aBin, bBin),
        EqualTo(aBin, canonical)), j.condition.get)
      val narrow = Project(j.output,
        Join(genA, genB, Inner, Some(narrowCond), j.hint))

      // fallbacks: bad-A x all-B, then normal-A x bad-B — every pair
      // with a degenerate side exactly once, original semantics kept
      val fb1 = Project(j.output,
        Join(Filter(bad(aS, aE), j.left), j.right, Inner,
          Some(GraftFallbackCond(j.condition.get)), j.hint))
      val fb2 = Project(j.output,
        Join(Filter(normal(aS, aE), j.left), Filter(bad(bS, bE), j.right),
          Inner, Some(GraftFallbackCond(j.condition.get)), j.hint))

      Union(Seq(narrow, fb1, fb2))
    }
  }
}
