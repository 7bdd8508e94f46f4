package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics over a keyed event stream — the analysis
  * layer a monitoring pipeline grows once the raw status/metric stream
  * (SURVEY §1.1 "time-series metric fact rows", `extract.py:80-96`;
  * "service-status snapshot rows", `url_service_status_InfluxDB_insert
  * .py:60-64`) is landed: ordered-step funnels, cohort retention,
  * state-transition matrices, and snapshot-to-history (SCD2)
  * compaction of the status changelog.
  *
  * Scale design: every operator here is one hash exchange on the
  * entity key (`keyCol`) followed by window/aggregate passes that
  * reuse that partitioning — chained window specs share the same
  * `partitionBy`, so Catalyst plans ONE shuffle and at most one sort
  * per distinct ordering. Nothing collects to the driver; no
  * per-entity state exceeds the entity's own row count, so the only
  * skew risk is a single hyper-active key (cap upstream with
  * [[Sampling.capPerKey]] when key cardinality is adversarial).
  */
object Behavior {

  /** Ordered-step funnel: for each entity, the earliest completion
    * time of step i AMONG EVENTS AT-OR-AFTER its step i-1 completion
    * (strictly ordered progression, ties allowed at equal timestamps).
    *
    * Returns one row per entity with one nullable epoch-seconds column
    * per step (`t1..tN`); a null `tk` means the entity never reached
    * step k. Aggregate the non-null counts for the classic funnel bar
    * chart (see `q_funnel`).
    *
    * Plan shape: N chained projections, each adding
    * `min(CASE step-k-event AND epoch >= t(k-1) THEN epoch END)` over
    * `Window.partitionBy(key)` (whole-partition frame, no ordering) —
    * one exchange on the key, zero sorts, then a final
    * `dropDuplicates(key)` that collapses the per-row constants and is
    * itself exchange-free (AQE sees the existing hash partitioning).
    * This beats the collect_list/sort-fold form at scale: no per-key
    * array materialization, stays inside whole-stage codegen.
    */
  def funnel(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(keyCol))
    val epoch = unix_timestamp(col(tsCol))
    val withSteps = steps.zipWithIndex.foldLeft(
        events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)) {
      case (df, (step, i)) =>
        val reached =
          if (i == 0) when(col(typeCol) === step, epoch)
          else when(col(typeCol) === step &&
            epoch >= col(s"t$i"), epoch)
        df.withColumn(s"t${i + 1}", min(reached).over(w))
    }
    val stepCols = (1 to steps.size).map(i => col(s"t$i"))
    withSteps
      .select(col(keyCol) +: stepCols: _*)
      .dropDuplicates(keyCol)
  }

  /** Funnel step totals: one row per step with the count of entities
    * whose funnel reached it. `count(t_k)` over [[funnel]]'s output —
    * monotonically non-increasing by construction.
    */
  def funnelCounts(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val perEntity = funnel(events, keyCol, typeCol, tsCol, steps)
    val counts = perEntity.agg(
      count(col("t1")).as("c1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    // unpivot to (step, step_name, entities) — stack is a codegen'd
    // Generate, no shuffle on the 1-row input
    val stackArgs = steps.zipWithIndex.map { case (s, i) =>
      s"${i + 1}L, '$s', c${i + 1}"
    }.mkString(", ")
    counts.select(expr(
      s"stack(${steps.size}, $stackArgs) AS (step, step_name, entities)"))
  }

  /** Cohort retention: assign each entity to the calendar bucket of
    * its FIRST event (`date_trunc(granularity)`), then count distinct
    * entities active per (cohort bucket, bucket offset).
    *
    * Offsets are exact bucket differences (weeks via integer division
    * of day diffs; months via `months_between`), so row (c, 0) is the
    * cohort size and (c, k) / (c, 0) the retention curve.
    *
    * Plan shape: cohort assignment is `min(ts) over (partition by
    * key)` — same single-exchange trick as [[funnel]] (no join back) —
    * then one distinct-aggregate on (cohort, offset). Two exchanges
    * total; the distinct's partial aggregation deduplicates
    * (cohort, offset, key) map-side so the second exchange carries at
    * most one row per entity-bucket.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
      granularity: String = "week"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val cohort = date_trunc(granularity, min(col(tsCol)).over(w))
    val bucket = date_trunc(granularity, col(tsCol))
    val offset = granularity match {
      case "week" =>
        floor(datediff(bucket, cohort) / 7).cast("long")
      case "month" =>
        round(months_between(bucket, cohort)).cast("long")
      case _ => datediff(bucket, cohort).cast("long")
    }
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), cohort.cast("date").as("cohort"),
        offset.as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(countDistinct(col(keyCol)).as("entities"))
  }

  /** First-order state-transition counts: for each entity's
    * time-ordered event sequence, count (previous type → current type)
    * pairs across the whole stream. The Markov-chain transition matrix
    * in sparse (from, to, n) form.
    *
    * One window pass (`lag` over key, ordered by ts + tiebreak) + one
    * small aggregate on (from, to) — the aggregate's partial phase
    * collapses each partition to ≤ |types|² rows before the exchange.
    */
  def transitions(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Snapshot-changelog → SCD2 history: collapse each entity's
    * time-ordered state stream into validity intervals
    * (state, valid_from, valid_to), where consecutive equal states
    * merge and `valid_to` is the next CHANGE's timestamp (null for the
    * current open interval). The batch form of the reference's status
    * snapshot stream (`url_service_status_InfluxDB_insert.py:60-64,
    * 97-123`): replaying every run's snapshot through this yields the
    * full status history the reference only keeps the tip of.
    *
    * Gaps-and-islands: change flag via `lag`, island id via running
    * sum — both over the same (key, ts) window spec, so one exchange +
    * one sort — then one groupBy (key, island) and a `lead` back over
    * the collapsed intervals for valid_to.
    */
  def scd2History(snapshots: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val changed = when(
      lag(col(stateCol), 1).over(w).isNull ||
        lag(col(stateCol), 1).over(w) =!= col(stateCol), 1L)
      .otherwise(0L)
    val islands = snapshots
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol), col(stateCol), col(tsCol),
        sum(changed).over(run).as("_island"))
    val intervals = islands
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(stateCol)).as("state"), // constant within an island;
        min(col(tsCol)).as("valid_from"))  // min = deterministic pick
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("_island").asc)
    intervals
      .select(col(keyCol), col("state"), col("valid_from"),
        lead(col("valid_from"), 1).over(w2).as("valid_to"))
  }

  /** Robust per-group outliers by median absolute deviation: flag rows
    * where |x − median| > cutoff · MAD. Unlike the z-score form
    * (`q_zscore_outliers`), a few extreme points cannot inflate the
    * spread estimate and mask themselves — the standard robust
    * alternative when the value stream has heavy tails.
    *
    * Two aggregation passes over the group key (median, then MAD of
    * the residuals) joined back to the fact rows. Both stats frames
    * are |groups| rows — AQE broadcasts them while they fit and falls
    * back to shuffled joins beyond that, the same unpinned-build-side
    * policy as `q_zscore_outliers`. Exact `percentile` keeps the
    * medians engine-portable (one interpolated midpoint, no float
    * summation ordering).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      cutoff: Double): DataFrame = {
    val filtered = df.filter(
      col(groupCol).isNotNull && col(valueCol).isNotNull)
    val med = filtered.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("_med"))
    val withMed = filtered.join(med, groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile(abs(col(valueCol) - col("_med")), lit(0.5))
        .as("_mad"))
    withMed.join(mad, groupCol)
      .filter(abs(col(valueCol) - col("_med")) > lit(cutoff) * col("_mad"))
  }
}
