package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** MTTR / MTBF reliability rollup over a status-snapshot stream —
    * the incident-report pair every monitoring shop derives from the
    * state history the reference lands: per key,
    *  - `n_failures`: episodes of `downState` ([[scd2History]]
    *    islands, so consecutive equal snapshots are ONE episode);
    *  - `mttr_s`: mean seconds of the CLOSED down episodes (an
    *    ongoing outage has no repair time yet — null when none
    *    closed);
    *  - `mtbf_s`: mean seconds between consecutive failure STARTS
    *    (null with fewer than two failures).
    * Deterministic: epoch-second durations sum exactly as longs
    * before one double division; 6dp rounding (engine-portable).
    * Scale: one more lag + aggregate over the |episodes|-sized
    * interval frame, all on the [[scd2History]] key partitioning.
    */
  def reliability(snapshots: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieBreakCol: String, downState: String): DataFrame = {
    val downs = scd2History(snapshots, keyCol, stateCol, tsCol,
        tieBreakCol)
      .filter(col("state") === downState)
      .select(col(keyCol),
        unix_timestamp(col("valid_from")).as("__from"),
        unix_timestamp(col("valid_to")).as("__to")) // null = ongoing
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__from").asc)
    downs
      .withColumn("__prev_start", lag(col("__from"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_failures"),
        round(avg(col("__to") - col("__from")), 6).as("mttr_s"),
        round(avg(col("__from") - col("__prev_start")), 6).as("mtbf_s"))
  }

  /** Nagios-style flap detection over a status-snapshot stream — the
    * classic monitoring heuristic for services oscillating between
    * states (public Nagios Core docs, "Detection and Handling of State
    * Flapping"; the reference's status stream
    * `url_service_status_InfluxDB_insert.py:60-64` is exactly the
    * input this reads). For each check, look at the trailing
    * `historyLen` archived states (default 21 → 20 consecutive-state
    * comparisons), weight each observed state CHANGE linearly from 0.8
    * (oldest comparison) to 1.2 (newest), and report
    * `pct = 100 · Σ weighted changes / (historyLen − 1)`. Flapping
    * starts when pct rises STRICTLY above `highPct` and stops when it
    * falls STRICTLY below `lowPct` (hysteresis) — Nagios Core's
    * `curved_percent_change > high_flap_threshold` /
    * `< low_flap_threshold` comparisons, so rows landing exactly on a
    * threshold keep the previous flapping verdict (dead band).
    *
    * Weights are exact rationals: with m = historyLen−1 comparisons
    * the weight of the change d rows back (d = 0 newest … m−1 oldest)
    * is (6(m−1) − 2d)/(5(m−1)), so the weighted sum is the INTEGER
    *   num = 6(m−1)·S1 − 2·(rn·S1 − S_rn)
    * over two windowed integer sums (S1 = Σ chg, S_rn = Σ chg·rn over
    * ROWS m−1 PRECEDING), and pct = num·20/(m(m−1)) is one IEEE
    * division — engine-portable with no per-row float accumulation
    * (default historyLen 21 → the Nagios constants 114, 1900). Keys
    * with fewer than historyLen snapshots score over the states seen
    * so far (a short history can only under-count changes — the
    * conservative cold-start, matching Nagios's zero-filled array).
    *
    * Hysteresis without a sequential fold: each row emits an event
    * (1 = crossed high, 0 = fell below low, null = in the dead band)
    * and `flapping` is the LAST non-null event so far — a single
    * `last(ignoreNulls)` running window, the standard
    * latest-threshold-crossing trick.
    *
    * Plan shape: one hash exchange on the key; every window reads the
    * same per-key total order ((ts, tiebreak), re-expressed as the
    * materialized `_rn`), so the plan carries ONE exchange and two
    * in-partition sorts (Catalyst cannot prove `_rn`-order ≡
    * (ts, tiebreak)-order across the projection). Per-row state is
    * O(1); no arrays, no collect.
    */
  def flapDetection(snapshots: DataFrame, keyCol: String,
      stateCol: String, tsCol: String, tieBreakCol: String,
      highPct: Double = 20.0, lowPct: Double = 5.0,
      historyLen: Int = 21): DataFrame = {
    require(historyLen >= 3, "flapDetection needs historyLen >= 3")
    val m = historyLen - 1 // comparisons in a full window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val chg = when(lag(col(stateCol), 1).over(w).isNotNull &&
      lag(col(stateCol), 1).over(w) =!= col(stateCol), 1L).otherwise(0L)
    val base = snapshots
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol), col(stateCol), col(tsCol),
        row_number().over(w).as("_rn"), chg.as("_chg"))
    // downstream windows order by the materialized _rn — the same
    // total order, so the sort is reused and the tiebreak column can
    // be dropped
    val wr = Window.partitionBy(col(keyCol)).orderBy(col("_rn").asc)
    val run = wr.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val trail = wr.rowsBetween(-(m - 1).toLong, Window.currentRow)
    val num = lit(6L * (m - 1)) * sum(col("_chg")).over(trail) -
      lit(2L) * (col("_rn") * sum(col("_chg")).over(trail) -
        sum(col("_chg") * col("_rn")).over(trail))
    val denom = 5L * m.toLong * (m - 1) // num/denom = Σw·chg / m
    val scored = base.withColumn("_num", num)
      .withColumn("pct",
        round(col("_num").cast("double") * 100.0 / denom.toDouble, 6))
    // strict threshold events on the exact rational:
    // num·100/denom > T  ⇔  num > T·denom/100 (integer vs exact
    // double product — no rounding edge; 19·T at the default size)
    val evt = when(col("_num").cast("double") >
        lit(highPct * denom / 100.0), 1)
      .when(col("_num").cast("double") <
        lit(lowPct * denom / 100.0), 0)
      .otherwise(lit(null).cast("int"))
    scored
      .withColumn("flapping",
        coalesce(last(evt, ignoreNulls = true).over(run), lit(0)) === 1)
      .select(col(keyCol), col(tsCol), col(stateCol).as("state"),
        col("pct"), col("flapping"))
  }

  /** Nagios-style soft/hard state confirmation over a status-snapshot
    * stream (public Nagios Core docs, "State Types"): a non-OK result
    * is SOFT until `maxAttempts` CONSECUTIVE NON-OK checks have been
    * seen — the retry counter keeps incrementing across differing
    * non-OK states (warn → crit is still attempt 2, the Nagios
    * `current_attempt` semantics), hardening at attempt `maxAttempts`
    * with whatever state the hardening check observed. OK snapshots
    * are HARD immediately and reset the counter to 1. Emits per
    * check: the retry ordinal within the current OK/non-OK run
    * (capped at `maxAttempts`; 1 on every OK row), the state type,
    * the prevailing CONFIRMED (hard) state, and `hard_change` — true
    * on the row where the confirmed state changes, i.e. the row that
    * fires a notification. A key whose FIRST confirmed state is
    * `okState` fires nothing (a service that starts healthy is not a
    * recovery — ADVICE r8); a first confirmed non-OK state does fire.
    *
    * Run lengths without a second exchange: a run starts where the
    * OK-flag flips (or at the key's first row), its start row is the
    * running max of `rn` over those flip rows (same window sort), so
    * `attempt = rn − run_start + 1` — no re-partition by island, no
    * arrays. The confirmed state is again the latest-non-null running
    * fill ([[flapDetection]]'s hysteresis trick) over rows that
    * qualify as hard.
    *
    * One hash exchange on the key, O(1) per-row state.
    */
  def hardSoftState(snapshots: DataFrame, keyCol: String,
      stateCol: String, tsCol: String, tieBreakCol: String,
      okState: String, maxAttempts: Int = 3,
      keepTieBreak: Boolean = false): DataFrame = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val ok = col(stateCol) === okState
    val okFlip = lag(ok, 1).over(w).isNull ||
      lag(ok, 1).over(w) =!= ok
    val base = snapshots
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol), col(stateCol), col(tsCol),
        col(tieBreakCol), ok.as("_ok"),
        row_number().over(w).as("_rn"),
        when(okFlip, row_number().over(w)).as("_flip_rn"))
    // window functions cannot nest inside window arguments, so each
    // derived signal materializes before the next window reads it;
    // every spec shares the (key, _rn) partitioning + sort
    val wr = Window.partitionBy(col(keyCol)).orderBy(col("_rn").asc)
    val run = wr.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val staged = base
      .withColumn("attempt", when(col("_ok"), lit(1L)).otherwise(least(
        col("_rn") - max(col("_flip_rn")).over(run) + 1L,
        lit(maxAttempts.toLong))))
      .withColumn("_hard", col("_ok") ||
        col("_rn") - max(col("_flip_rn")).over(run) + 1L >=
          lit(maxAttempts.toLong))
      .withColumn("hard_state",
        last(when(col("_hard"), col(stateCol)), ignoreNulls = true)
          .over(run))
    staged
      .withColumn("state_type",
        when(col("_hard"), "HARD").otherwise("SOFT"))
      .withColumn("hard_change",
        col("hard_state").isNotNull && (
          when(lag(col("hard_state"), 1).over(wr).isNull,
            col("hard_state") =!= okState)
          .otherwise(
            lag(col("hard_state"), 1).over(wr) =!= col("hard_state"))))
      .select((Seq(col(keyCol), col(tsCol),
        col(stateCol).as("state"), col("attempt"), col("state_type"),
        col("hard_state"), col("hard_change")) ++
        (if (keepTieBreak) Seq(col(tieBreakCol)) else Nil)): _*)
  }

  /** Nagios-style re-notification schedule over the confirmed-state
    * stream (public Nagios Core docs, `notification_interval` /
    * escalations): the initial page fires when a problem CONFIRMS
    * ([[hardSoftState]]'s `hard_change`), and while the confirmed
    * state stays the same non-OK value, the FIRST CHECK in each
    * elapsed `intervalSeconds` slot since the problem confirmed
    * re-notifies — pages repeat at check granularity, exactly the
    * "re-notify every N unless acknowledged" contract (no
    * acknowledgement model here; feed an ack table as an anti-join
    * upstream). `notification_no` is the 0-based page ordinal within
    * the episode; `escalated` turns true from ordinal
    * `escalateAfter` on (the escalation chain's trigger row).
    *
    * No sequential recursion: confirmed-state episodes are
    * [[scd2History]]-style islands over `hard_change`, the slot is
    * integer (elapsed div interval), and one row per (episode, slot)
    * survives — three window/aggregate passes on the same key
    * partitioning, O(1) per-row state.
    * Output: (key, ts, state, notification_no, escalated).
    */
  def notificationSchedule(snapshots: DataFrame, keyCol: String,
      stateCol: String, tsCol: String, tieBreakCol: String,
      okState: String, maxAttempts: Int = 3,
      intervalSeconds: Long = 3600L,
      escalateAfter: Long = 2L): DataFrame = {
    require(intervalSeconds > 0, "intervalSeconds must be positive")
    require(escalateAfter >= 1, "escalateAfter must be >= 1")
    val hs = hardSoftState(snapshots, keyCol, stateCol, tsCol,
      tieBreakCol, okState, maxAttempts, keepTieBreak = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val episodes = hs
      .filter(col("hard_state").isNotNull)
      .withColumn("_ep",
        sum(when(col("hard_change"), 1L).otherwise(0L)).over(run))
      .filter(col("hard_state") =!= okState)
    val wEp = Window.partitionBy(col(keyCol), col("_ep"))
    val slotted = episodes
      .withColumn("_e", unix_timestamp(col(tsCol)))
      .withColumn("_start", min(col("_e")).over(wEp))
      .withColumn("_slot",
        expr(s"(_e - _start) div ${intervalSeconds}L"))
    // first check in each slot notifies (native-order tiebreak, so
    // the oracle's row_number replays the pick exactly)
    val wSlot = Window.partitionBy(col(keyCol), col("_ep"), col("_slot"))
      .orderBy(col("_e").asc, col(tieBreakCol).asc)
    val wN = Window.partitionBy(col(keyCol), col("_ep"))
      .orderBy(col("_slot").asc)
    slotted
      .withColumn("_srn", row_number().over(wSlot))
      .filter(col("_srn") === 1)
      .withColumn("notification_no",
        row_number().over(wN).cast("long") - 1L)
      .select(col(keyCol), col(tsCol),
        col("hard_state").as("state"), col("notification_no"),
        (col("notification_no") >= escalateAfter).as("escalated"))
  }

  /** Kaplan–Meier survival estimator per cohort — the
    * time-to-failure curve behind churn and hardware-lifetime
    * reports, with right-censoring done correctly (a subject still
    * alive at the end of observation reduces the risk set but never
    * counts as a death — naive "fraction failed by t" over-estimates
    * hazard exactly there): at each distinct event time tᵢ,
    * S(tᵢ) = Π_{j≤i} (1 − dⱼ/nⱼ) with dⱼ = events at tⱼ and nⱼ =
    * subjects still at risk (duration ≥ tⱼ, censored included).
    *
    * Shape: one (cohort, duration) aggregate collapses subjects; the
    * risk set is a DESCENDING cumulative sum over that per-cohort
    * frame (distinct durations — retention-bounded, never subject
    * rows); the product chain folds left-to-right per cohort over the
    * event-time list (collect bounded by distinct event times; the
    * O(k²) interpreted prefix products are documented — k is a curve,
    * not a corpus). Survival rounds to 6dp at OUTPUT only, so the
    * chained double multiplies replay in a recursive-CTE oracle.
    * Output: (cohort, duration, d, n_at_risk, survival).
    */
  def kaplanMeier(df: DataFrame, cohortCols: Seq[String],
      durationCol: String, eventCol: String): DataFrame = {
    require(cohortCols.nonEmpty, "kaplanMeier needs at least one cohort")
    val keys = cohortCols.map(col)
    val perDur = df
      .filter(cohortCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(keys :+ col(durationCol).cast("long").as("duration"): _*)
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__w"))
    val wDesc = Window.partitionBy(keys: _*)
      .orderBy(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = perDur
      .withColumn("n_at_risk", sum(col("__w")).over(wDesc))
      .filter(col("d") > 0)
    val curves = atRisk
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("duration"), col("d"),
        col("n_at_risk")))).as("__pts"))
      .select(keys ++ Seq(col("__pts"),
        posexplode(col("__pts")).as(Seq("__i", "__p"))): _*)
    curves.select(keys ++ Seq(
      col("__p.duration").as("duration"), col("__p.d").as("d"),
      col("__p.n_at_risk").as("n_at_risk"),
      round(aggregate(
        slice(col("__pts"), lit(1), col("__i") + 1),
        lit(1.0), (acc, x) => acc *
          (lit(1.0) - x.getField("d").cast("double") /
            x.getField("n_at_risk").cast("double"))), 6)
        .as("survival")): _*)
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

  /** Gap-based sessionization: split each entity's event stream into
    * sessions wherever the inter-event gap exceeds `gapSeconds`
    * (classic web-analytics session semantics — the batch twin of
    * Structured Streaming's `session_window`; a StreamingSpec parity
    * test pins the two to agree on session starts and event counts,
    * the fields whose contracts overlap — ends differ by design, and
    * at a gap of EXACTLY the threshold this merges where
    * `session_window`'s half-open window splits).
    *
    * Output: one row per (entity, session) —
    * (keyCol, session_no ordinal from 1, session_start, session_end
    * = last EVENT time, not +gap, n_events) ordered nowhere (sort at
    * the sink if needed).
    *
    * Plan shape: ONE hash exchange on the entity key; the gap flag
    * (`lag`) and the running session ordinal (`sum` of flags) are two
    * window passes over the SAME (key, ts) partitioning+sort, so
    * Catalyst plans one exchange and one sort; the final
    * (key, session_no) aggregate reuses the partitioning
    * exchange-free. Window partitions are per-entity — entity count
    * grows with the data and per-entity volume is bounded by the
    * entity's own activity, so unlike a token-keyed window there is
    * no Zipf-head straggler; cap hyper-active keys upstream with
    * [[Sampling.capPerKey]] if key cardinality is adversarial.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val epoch = unix_timestamp(col(tsCol))
    val newSession = when(
      lag(epoch, 1).over(w).isNull ||
        epoch - lag(epoch, 1).over(w) > gapSeconds, 1L).otherwise(0L)
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("_sess", sum(newSession).over(w))
      .groupBy(col(keyCol), col("_sess").as("session_no"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** PageRank by power iteration over an edge list — graph centrality
    * for entity-importance ranking (which hub supplier/order/document
    * matters most; pick dup-cluster representatives by centrality
    * instead of min-id). Standard damped formulation on the directed
    * graph, uniform 1.0 prior, dangling mass NOT redistributed (nodes
    * with no out-edges leak — the common simplified variant):
    *
    *   pr_{t+1}(v) = (1 − d) + d · Σ_{(u→v)∈E} pr_t(u) / outdeg(u)
    *
    * run a FIXED `iters` rounds (deterministic, oracle-replayable —
    * no convergence test, which would be data-dependent).
    *
    * Exactness: each contribution pr(u)/outdeg(u) is rounded to 12dp
    * and summed as DECIMAL(38,12) — decimal addition is exact and
    * ORDER-INDEPENDENT, so the result is bit-identical regardless of
    * partitioning (a double sum would drift in the last ulps with the
    * reduce order and break cross-engine hashing; same trick as the
    * correlation/moments and centroid oracles). Output:
    * (node, pagerank DOUBLE rounded 6dp).
    *
    * THREE regimes by graph size (round 13 adds the smallest): at or
    * under `localMaxEdges` edges (default 2M) the whole fixed-round
    * loop replays driver-side over the collected (already
    * checkpointed) edge list — see [[localPageRank]]; every sf-scale
    * bench graph is otherwise pure multi-job round latency. Pass 0 to
    * force the distributed path (the scale probe's `pagerank_edges`
    * axis and the layout A/B specs do — a regime flip mid-axis would
    * make the 1×/10× ratio compare different algorithms).
    *
    * Plan shape per distributed iteration, chosen by |V| at setup
    * (VERDICT r11 task 6 — measured, not argued):
    *  - |V| ≤ `broadcastRanksMax` (the bench graphs, most entity
    *    graphs): the edge list is pre-partitioned on DST and the
    *    |nodes|-row weighted-rank side BROADCASTS onto it, so the
    *    (dst, contrib) aggregate reuses the edges' own partitioning —
    *    zero per-iteration exchange of anything edge-sized (A/B on
    *    the 1.2M-edge bench graph: 5.3M → 4.4M shuffle records for
    *    the 5-round run, the remaining volume being setup + the
    *    node-sized frames).
    *  - |V| above the threshold (web-scale graphs, where a rank
    *    broadcast would not fit): the edge list is pre-partitioned on
    *    SRC, the rank join reuses it exchange-free, and each round
    *    pays the irreducible pair — the |V|-row rank shuffle onto src
    *    plus the (dst, contrib) aggregate exchange. The pair is
    *    irreducible in this regime because the data flows src→dst
    *    through the join: no single edge layout can serve both sides,
    *    and the aggregate input is the join output, not the edges.
    *
    * Lineage is truncated with an eager `localCheckpoint` every
    * iteration — without it the plan doubles per round and Catalyst
    * analysis goes quadratic (same blowup the connected-components
    * closure guards against, [[Dedup]]). Skewed in-degree (every web
    * graph) is an AGGREGATE on dst — map-side partial combine caps
    * the hot node's shuffle volume at one row per task, unlike a
    * window. Out-degree is precomputed once and joined, not windowed,
    * for the same reason.
    */
  /** Driver-side replay of the EXACT per-round decimal dataflow the
    * distributed loop runs — the small-graph arm (the
    * `Dedup.connectedComponents` union-find convention): each helper
    * reproduces the corresponding Catalyst expression bit-for-bit
    * (`round(double, s)` = shortest-repr BigDecimal setScale HALF_UP
    * back to double; `cast(double AS DECIMAL(38,12))` = the same
    * setScale on the shortest repr; decimal sums are exact and
    * order-independent in both worlds; `x * 1.0 == x` makes the
    * uniform restart term `(1−d)` and the personalized `(1−d)·r`
    * coincide for r = 1), so the local labels hash-match the
    * distributed ones — differential-spec-pinned AND proven on the
    * live oracle surface (q_pagerank / q_personalized_pagerank stay
    * hash-exact with the gate active). Cost: one pass over the
    * collected edge array per round — BigDecimal adds on the compact
    * long path, ~1 s for 5 rounds on a 1.2M-edge graph vs 5 rounds
    * of multi-job latency.
    */
  private def localPageRank(spark: SparkSession,
      edges: Array[(Any, Any)], seeds: Option[Array[Any]], iters: Int,
      damping: Double, dt: org.apache.spark.sql.types.DataType)
      : DataFrame = {
    import org.apache.spark.sql.types._
    def roundD(d: Double, s: Int): Double =
      if (d.isNaN || d.isInfinite) d
      else java.math.BigDecimal.valueOf(d)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def dec12(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d)
        .setScale(12, java.math.RoundingMode.HALF_UP)
    val idx = new java.util.HashMap[Any, Integer]()
    val vals = new scala.collection.mutable.ArrayBuffer[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue
      else { val i = vals.length; idx.put(v, Integer.valueOf(i)); vals += v; i }
    }
    val es = edges.map { case (a, b) => (id(a), id(b)) }
    seeds.foreach(_.foreach(id(_)))
    val n = vals.length
    val r = seeds match {
      case Some(sv) =>
        val arr = Array.fill(n)(0.0)
        sv.foreach(v => arr(idx.get(v).intValue) = 1.0)
        arr
      case None => Array.fill(n)(1.0)
    }
    val deg = Array.fill(n)(0L)
    es.foreach { case (s, _) => deg(s) += 1 }
    val oneMinusD = 1.0 - damping
    var pr = r.clone()
    for (_ <- 1 to iters) {
      // prW0: inner join on outDeg (deg>0) + the zero-mass prune —
      // a no-op for the uniform arm, where pr >= 1-d > 0 always
      val w = Array.ofDim[java.math.BigDecimal](n)
      var u = 0
      while (u < n) {
        if (deg(u) > 0L && pr(u) != 0.0)
          w(u) = dec12(roundD(pr(u) / deg(u).toDouble, 12))
        u += 1
      }
      val acc = Array.ofDim[java.math.BigDecimal](n)
      es.foreach { case (s, d) =>
        val ws = w(s)
        if (ws != null) acc(d) = if (acc(d) == null) ws else acc(d).add(ws)
      }
      val next = Array.ofDim[Double](n)
      var v = 0
      while (v < n) {
        val in = if (acc(v) == null) 0.0 else acc(v).doubleValue()
        next(v) = roundD(oneMinusD * r(v) + damping * in, 12)
        v += 1
      }
      pr = next
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    var i = 0
    while (i < n) {
      rows.add(org.apache.spark.sql.Row(vals(i), roundD(pr(i), 6)))
      i += 1
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("node", dt), StructField("pagerank", DoubleType))))
  }

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85,
      broadcastRanksMax: Long = 4000000L,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    // Node type is PRESERVED, not cast to string — callers with
    // numeric keys keep long join hashing, roughly half the
    // per-iteration cost of string keys on the bench graph
    // checkpoint the canonical edge set FIRST (one pass over the
    // caller's lineage — nodes, degrees and the layout decision all
    // derive from the checkpoint, never re-running the upstream
    // pipeline), optimistically partitioned on dst: that is the layout
    // the common broadcast regime reuses every round, and only the
    // huge-|V| regime pays one extra |E| exchange to flip to src —
    // where setup cost is dominated by the iterations anyway.
    // localCheckpoint preserves the hash partitioning in its
    // LogicalRDD, so the edge set never re-exchanges across rounds.
    val e0 = edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("dst"))
      .localCheckpoint(true)
    // small-graph gate: the checkpoint above already materialized the
    // edge list, so the count and the collect both read the cache
    if (e0.count() <= localMaxEdges)
      return localPageRank(edges.sparkSession,
        e0.collect().map(r => (r.get(0), r.get(1))), None, iters,
        damping, e0.schema("src").dataType)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val outDeg = e0.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
      .localCheckpoint(true)
    // the nodes checkpoint is already materialized, so the layout
    // decision costs one cheap count
    val broadcastRanks = nodes.count() <= broadcastRanksMax
    val e = if (broadcastRanks) e0
      else e0.repartition(col("src")).localCheckpoint(true)
    var pr = nodes.withColumn("pr", lit(1.0))
    for (_ <- 1 to iters) {
      // pr(u)/outdeg(u) is constant across u's out-edges, so the
      // divide-and-round happens on the |nodes|-row side and the
      // edge join carries ONE ready decimal weight — joining outDeg
      // onto the edge stream would do the same division |E| times
      // and ship an extra |E|-row join per round on the 1.2M-edge
      // bench graph
      val prW0 = pr.join(outDeg, pr("node") === outDeg("src"))
        .select(col("node"),
          round(col("pr") / col("_deg"), 12)
            .cast("decimal(38,12)").as("_w"))
      val prW = if (broadcastRanks) broadcast(prW0) else prW0
      val contrib = e.join(prW, e("src") === prW("node"))
        .select(col("dst").as("node"), col("_w").as("_c"))
        .groupBy(col("node"))
        .agg(sum(col("_c")).as("_in"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) +
            lit(damping) * coalesce(col("_in").cast("double"), lit(0.0)),
            12).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), round(col("pr"), 6).as("pagerank"))
  }

  /** Personalized PageRank — [[pageRank]] with the restart mass
    * concentrated on a SEED set instead of spread uniformly:
    * `pr(v) ← (1−d)·r(v) + d·Σ incoming`, `r(v) = 1` for seeds and 0
    * elsewhere (the unnormalized convention [[pageRank]] uses), ranks
    * initialized to `r`. The result scores every node by its
    * proximity to the seeds through the link structure — the
    * seeded-relevance readout (which hosts sit near the flapping
    * ones, which documents cluster around a known-bad source) that
    * uniform PageRank's global centrality cannot express.
    *
    * Plan shape, layout decision, lineage truncation, and decimal
    * order-independent contribution sums are [[pageRank]]'s
    * verbatim; the only per-round difference is the |nodes|-row
    * restart column riding the node frame (checkpointed once).
    *
    * The node frame is edge endpoints ∪ SEEDS (ADVICE r12): an
    * isolated seed (no edges touching it) still emits its teleport
    * mass — rank `(1−d)·1` every round, nothing propagating — rather
    * than vanishing from the output. Matches the restart-mass
    * contract: `r(v)=1` for EVERY seed, not just the connected ones.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iters: Int = 5, damping: Double = 0.85,
      broadcastRanksMax: Long = 4000000L,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("dst"))
      .localCheckpoint(true)
    val seedSet = seeds.select(col(seedCol).as("node"))
      .filter(col("node").isNotNull).distinct()
    // small-graph gate (the pageRank arm's twin): the seed collect is
    // BOUNDED by limit — an over-limit seed set falls through to the
    // distributed path without ever materializing on the driver.
    // The gate also requires the seed column's dataType to MATCH the
    // edge node type (ADVICE r13): the distributed node-frame union
    // widens IntegerType seeds against LongType edges, but the local
    // HashMap keys by boxed equality, where Integer(5) != Long(5) — a
    // matching seed would become a distinct isolated node and the
    // mixed-type rows would then fail row encoding. Mismatched types
    // take the distributed path, whose set-operation widening owns
    // that case.
    val seedTypeMatches =
      seedSet.schema("node").dataType == e0.schema("src").dataType
    if (seedTypeMatches && e0.count() <= localMaxEdges) {
      val sv = seedSet.limit(
        (localMaxEdges + 1).min(Int.MaxValue.toLong).toInt).collect()
      if (sv.length <= localMaxEdges)
        return localPageRank(edges.sparkSession,
          e0.collect().map(r => (r.get(0), r.get(1))),
          Some(sv.map(_.get(0))), iters, damping,
          e0.schema("src").dataType)
    }
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .union(seedSet) // isolated seeds stay in the frame (teleport mass)
      .distinct()
      .join(seedSet.withColumn("_r", lit(1.0)), Seq("node"), "left")
      .select(col("node"), coalesce(col("_r"), lit(0.0)).as("_r"))
      .localCheckpoint(true)
    val outDeg = e0.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
      .localCheckpoint(true)
    val broadcastRanks = nodes.count() <= broadcastRanksMax
    val e = if (broadcastRanks) e0
      else e0.repartition(col("src")).localCheckpoint(true)
    var pr = nodes.select(col("node"), col("_r").as("pr"))
    for (_ <- 1 to iters) {
      val prW0 = pr.join(outDeg, pr("node") === outDeg("src"))
        .filter(col("pr") =!= 0.0) // zero mass contributes zero rows
        .select(col("node"),
          round(col("pr") / col("_deg"), 12)
            .cast("decimal(38,12)").as("_w"))
      val prW = if (broadcastRanks) broadcast(prW0) else prW0
      val contrib = e.join(prW, e("src") === prW("node"))
        .select(col("dst").as("node"), col("_w").as("_c"))
        .groupBy(col("node"))
        .agg(sum(col("_c")).as("_in"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) * col("_r") +
            lit(damping) * coalesce(col("_in").cast("double"), lit(0.0)),
            12).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), round(col("pr"), 6).as("pagerank"))
  }

  /** Per-node triangle counts over an undirected edge list — the
    * clustering/community readout for co-occurrence graphs (which
    * hosts alert together, which parts ship together). Input may
    * carry duplicates, both directions, and self-loops; they are
    * canonicalized away.
    *
    * Algorithm: degree-ordered orientation (Schank & Wagner 2005) —
    * each undirected edge points from its lower endpoint to its
    * higher under the strict total order (degree, node), wedges are
    * enumerated only from each edge's LOW-degree apex, and a wedge
    * (a,b,c) counts iff the oriented edge b→c closes it. Every
    * triangle is produced exactly once (its three vertices are
    * totally ordered), and the orientation bounds per-node wedge
    * fan-out by O(√|E|) on any graph — the property that keeps the
    * wedge join from going quadratic on skewed degree distributions,
    * where a naive "wedges at every vertex" enumeration pays
    * Σ deg(v)² and the hub node alone explodes.
    *
    * Plan shape: two degree joins (|V|-row build sides, AQE decides
    * broadcast), a wedge self-join hashed on the apex, one closing
    * equi-join on (b,c), and a bounded explode→count. Nodes in zero
    * triangles are absent from the output.
    */
  /** k-core extraction (Seidman 1983) — the maximal subgraph in which
    * every node keeps degree ≥ k, the standard graph-curation filter
    * between [[triangleCounts]]'s local density and [[pageRank]]'s
    * global centrality (spam/bridge nodes peel away, the cohesive
    * community remains). Iterative peel to the FIXPOINT: drop nodes
    * under degree k, recompute degrees over the surviving edges,
    * repeat; converges because the edge set strictly shrinks.
    * Output: (node, core_degree) for the surviving nodes —
    * `core_degree` is the node's degree INSIDE the k-core (≥ k by
    * construction).
    *
    * Scale shape: each round is one degree aggregate (map-side
    * combined — a Zipf hub contributes per-task partials, never a
    * single-reducer window) plus two semi-joins of the |nodes|-sized
    * keep list back onto the edges (AQE broadcasts it while it
    * fits); per-round eager localCheckpoint cuts the plan lineage
    * (the [[Dedup.connectedComponents]] O(2^rounds) lesson). Rounds
    * are data-bounded: a peel round only fires when the previous one
    * removed something, and real graphs shell out in a few dozen
    * rounds; `maxIters` bounds the pathological chain and the
    * operator REFUSES (raise, not silent truncation) if the fixpoint
    * is not reached — partial peels are not a k-core.
    */
  /** Index map shared by the small-graph arms: values → dense ints,
    * appearance order (no ordering requirement — peel rounds and
    * triangle counts are invariant under node relabeling). */
  private def indexNodes(edges: Array[(Any, Any)])
      : (java.util.HashMap[Any, Integer],
         scala.collection.mutable.ArrayBuffer[Any], Array[(Int, Int)]) = {
    val idx = new java.util.HashMap[Any, Integer]()
    val vals = new scala.collection.mutable.ArrayBuffer[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue
      else { val i = vals.length; idx.put(v, Integer.valueOf(i)); vals += v; i }
    }
    (idx, vals, edges.map { case (a, b) => (id(a), id(b)) })
  }

  /** `localMaxEdges` gates the r13 small-graph arm (the
    * [[graft.operators.Dedup.connectedComponents]] /[[pageRank]]
    * convention): at or under it, the peel runs driver-side over the
    * collected canonical edge list — every round is otherwise a
    * degree aggregate plus two semi-joins of fixed job latency. The
    * peel is pure integer arithmetic on a relabeling-invariant graph,
    * so the surviving (node, core_degree) rows are identical by
    * construction (differential-spec-pinned); the `maxIters` refusal
    * fires on the same round count. The scale probe's `kcore_zipf`
    * axis pins `localMaxEdges = 0` (regime-consistent 1×/10×).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 40, localMaxEdges: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var surv = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    def degrees(e: DataFrame): DataFrame = e
      .select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    var nEdges = surv.count()
    if (nEdges <= localMaxEdges) {
      val dt = surv.schema("u").dataType
      val (_, vals, es0) = indexNodes(
        surv.collect().map(r => (r.get(0), r.get(1))))
      var es = es0
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        it += 1
        val d = Array.fill(vals.length)(0L)
        es.foreach { case (u, v) => d(u) += 1; d(v) += 1 }
        val next = es.filter { case (u, v) => d(u) >= k && d(v) >= k }
        converged = next.length == es.length
        es = next
      }
      require(converged,
        s"kCore did not reach the fixpoint in $maxIters rounds")
      val d = Array.fill(vals.length)(0L)
      es.foreach { case (u, v) => d(u) += 1; d(v) += 1 }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      vals.indices.foreach { i =>
        if (d(i) > 0L)
          rows.add(org.apache.spark.sql.Row(vals(i), d(i)))
      }
      import org.apache.spark.sql.types._
      return edges.sparkSession.createDataFrame(rows, StructType(Seq(
        StructField("node", dt), StructField("core_degree", LongType))))
    }
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      val keep = degrees(surv).filter(col("d") >= k)
        .select(col("node"))
      val next = surv
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val n = next.count()
      converged = n == nEdges // edges only shrink: equal = fixpoint
      nEdges = n
      surv = next
    }
    require(converged,
      s"kCore did not reach the fixpoint in $maxIters rounds")
    degrees(surv).select(col("node"), col("d").as("core_degree"))
  }

  /** `localMaxEdges` gates the r13 small-graph arm: per-node triangle
    * counts are orientation- and relabeling-INVARIANT (every triangle
    * is counted once under ANY acyclic orientation from a strict
    * total order), so the driver-side degree-ordered wedge
    * enumeration — the same Schank–Wagner algorithm, O(Σ C(d⁺,2))
    * candidate work — returns identical rows without needing Spark's
    * value ordering for ties (index order serves). The scale probe's
    * `triangles_zipf` axis pins `localMaxEdges = 0`.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
      localMaxEdges: Long = 1000000L): DataFrame = {
    // materialize the canonical edge set ONCE: it feeds the degree
    // aggregate (twice, via the endpoint union) and the orientation
    // join, and `o` below feeds three join sides — without the
    // checkpoints the caller's (possibly expensive) edge derivation
    // re-executes for every consumer (measured 5.2 s → 1.3 s on the
    // co-purchase bench graph). Same eager-localCheckpoint pattern as
    // [[pageRank]]; state is |E| rows of ids, never wider.
    val e0 = edges.select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    if (e0.count() <= localMaxEdges) {
      val dt = e0.schema("u").dataType
      val (_, vals, es) = indexNodes(
        e0.collect().map(r => (r.get(0), r.get(1))))
      val n = vals.length
      val deg = Array.fill(n)(0)
      es.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
      // orient low→high under (degree, index); out-adjacency sorted
      // for merge intersection
      def lowFirst(u: Int, v: Int): Boolean =
        deg(u) < deg(v) || (deg(u) == deg(v) && u < v)
      val outDeg = Array.fill(n)(0)
      es.foreach { case (u, v) =>
        if (lowFirst(u, v)) outDeg(u) += 1 else outDeg(v) += 1 }
      val adj = Array.tabulate(n)(i => new Array[Int](outDeg(i)))
      val fill = Array.fill(n)(0)
      es.foreach { case (u, v) =>
        val (a, b) = if (lowFirst(u, v)) (u, v) else (v, u)
        adj(a)(fill(a)) = b; fill(a) += 1
      }
      adj.foreach(java.util.Arrays.sort)
      val tri = Array.fill(n)(0L)
      var a = 0
      while (a < n) {
        val na = adj(a)
        var i = 0
        while (i < na.length) {
          val b = na(i)
          val nb = adj(b)
          // merge-intersect N+(a) and N+(b): each common c closes a
          // triangle (a,b,c), counted exactly once
          var p = 0; var q = 0
          while (p < na.length && q < nb.length) {
            if (na(p) < nb(q)) p += 1
            else if (na(p) > nb(q)) q += 1
            else {
              tri(a) += 1L; tri(b) += 1L; tri(na(p)) += 1L
              p += 1; q += 1
            }
          }
          i += 1
        }
        a += 1
      }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      var v = 0
      while (v < n) {
        if (tri(v) > 0L)
          rows.add(org.apache.spark.sql.Row(vals(v), tri(v)))
        v += 1
      }
      import org.apache.spark.sql.types._
      return edges.sparkSession.createDataFrame(rows, StructType(Seq(
        StructField("node", dt), StructField("triangles", LongType))))
    }
    val deg = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val withDeg = e0
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      // degree of the HIGH endpoint rides along so the wedge join can
      // order its two far endpoints without re-joining degrees
      when(uFirst, col("dv")).otherwise(col("du")).as("db"))
      .localCheckpoint(true)
    val wedge = o.as("e1").join(o.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.a").as("a"), col("e1.b").as("b"),
        col("e2.b").as("c"))
    val tri = wedge.join(
        o.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("triangles"))
  }
}
