package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines
  * (SURVEY §2.10 extension): train/val/test assignment must be a pure
  * function of the row's identity — `rand()` changes on retry,
  * re-partitioning, or re-run, silently leaking validation rows into
  * training on any reprocessing. Hash-based bucketing is reproducible
  * across runs, engines, AND languages (md5 is everywhere), and
  * map-side only — no shuffle, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the id's md5 (first 8 hex
    * digits — 32 bits is plenty for split assignment and keeps the
    * arithmetic in exact long range on every engine).
    */
  def splitBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Split-label column over percentage weights, e.g.
    * `splitLabel(col("doc_id"), Seq("train" -> 90, "val" -> 5, "test" -> 5))`.
    * Weights must sum to 100; assignment is deterministic per id.
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val b = splitBucket(id, 100)
    val (_, expr0) = weights.foldLeft((0, lit(null).cast("string"))) {
      case ((acc, e), (name, w)) =>
        (acc + w, when(b >= acc && b < acc + w, name).otherwise(e))
    }
    expr0
  }

  /** Keep a deterministic `pct`% of rows by id hash — the reproducible
    * form of `df.sample`.
    */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(splitBucket(col(idCol), 100) < pct)

  /** Leakage-safe train/val/test split: documents in the same
    * near-dup component ALWAYS land in the same split. Plain
    * per-document hash splitting ([[splitLabel]]) puts a training doc
    * and its near-duplicate in different splits ~2·p·(1−p) of the
    * time, silently inflating eval scores — the contamination
    * [[q_decontaminate]]-style post-hoc checks hunt for, prevented at
    * split time instead. Assignment hashes the component
    * REPRESENTATIVE (the component's minimum id — the
    * [[Dedup.dedupByComponents]] survivor rule; a doc in no pair
    * represents itself), so the split stays deterministic under crawl
    * reordering and incremental re-splits agree wherever components
    * are unchanged.
    *
    * Scale shape: [[Dedup.connectedComponents]]'s bounded label
    * rounds over the (sparse) verified-pair graph + ONE left join of
    * the |dups|-sized label table onto the corpus (AQE broadcasts it
    * while duplicate mass is small — the common case) + the map-side
    * hash label. Output: (idCol, rep_id, split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      weights: Seq[(String, Int)]): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("component"))
    df.join(comps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("rep_id"))
      .select(col(idCol), col("rep_id"),
        splitLabel(col("rep_id"), weights).as("split"))
  }

  /** Deterministic stratified sample: per-stratum keep percentages
    * (the data-mix knob — e.g. keep 100% of a rare language, 5% of the
    * dominant one). Same id-hash bucketing as [[deterministicSample]],
    * so membership is stable under retry/re-partition/re-run AND
    * consistent across the strata of one id-space; map-side only, the
    * filter pushes to the scan. Strata absent from `rates` keep
    * `defaultPct`%.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPct: Int = 0): DataFrame = {
    require((rates.map(_._2) :+ defaultPct).forall(p => p >= 0 && p <= 100),
      "per-stratum (and default) percentages must be in [0, 100]")
    val pct = rates.foldLeft(lit(defaultPct)) { case (e, (v, p)) =>
      when(col(strataCol) === v, p).otherwise(e)
    }
    df.filter(splitBucket(col(idCol), 100) < pct)
  }

  /** Deterministic per-key cap (RefinedWeb-style per-domain document
    * cap): keep at most `n` rows per key, selected by stable id-hash
    * order — so the kept subset is reproducible across runs and
    * engines, and adding documents to a key never evicts previously
    * kept ones ahead of them in hash order arbitrarily (the order is a
    * pure function of ids, not arrival). One exchange on the key; the
    * per-key sort is bounded by that key's row count — for skewed
    * domains pair with [[graft.operators.Relational.latestPerKeySalted]]
    * -style two-phase selection.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val rn = "__graft_cap_rn"
    require(!df.columns.contains(rn), s"input already has a $rn column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n).drop(rn)
  }

  /** Sequence packing: assign each key's rows, in `orderCol` order, to
    * consecutive fixed-`capacity` bins by the NEXT-FIT rule — a bin
    * closes the moment a row does not fit; an oversized row occupies a
    * bin alone; null/non-positive weights count as 1. This is the step
    * that turns a curated corpus into training context windows with a
    * deterministic, engine-reproducible layout (next-fit depends only
    * on the order, never on a bin-search heuristic's tie-breaks).
    *
    * Shape: one exchange on the key, then the whole fold runs in a
    * single codegen'd [[graft.functions.NextFitPack]] pass over the
    * key's ordered weight array — packing is inherently sequential
    * WITHIN a key (bin boundaries depend on every prior row), so the
    * key is the parallelism unit, exactly like a window. Per-key data
    * must fit a task (the window contract); for corpus-global packing
    * pass a deterministic spread key (e.g. [[splitBucket]] over 1000
    * buckets) — packing within hash buckets is the standard
    * shard-then-pack layout at 100 TB.
    *
    * Output: key columns + `orderCol` + `weightCol` + `bin` (0-based,
    * per key, monotone in `orderCol`).
    */
  def packByCapacity(df: DataFrame, keyCols: Seq[String], orderCol: String,
      weightCol: String, capacity: Long): DataFrame = {
    require(keyCols.nonEmpty, "packByCapacity needs at least one key")
    val keys = keyCols.map(col)
    df.groupBy(keys: _*)
      .agg(array_sort(collect_list(
        struct(col(orderCol), col(weightCol)))).as("__graft_pack_items"))
      .withColumn("__graft_pack_bins",
        graft.functions.PackExpression.nextFitPack(
          transform(col("__graft_pack_items"),
            it => it.getField(weightCol).cast("long")), capacity))
      .select(keys :+ explode(arrays_zip(col("__graft_pack_items"),
        col("__graft_pack_bins"))).as("__graft_pack_z"): _*)
      .select(keys ++ Seq(
        col(s"__graft_pack_z.__graft_pack_items.$orderCol").as(orderCol),
        col(s"__graft_pack_z.__graft_pack_items.$weightCol").as(weightCol),
        col("__graft_pack_z.__graft_pack_bins").as("bin")): _*)
  }

  /** Pack rows into shards of ~`budget` units (token counts, bytes) in
    * `orderCol` order: shard = floor(running-sum-before-this-row /
    * budget) — the standard way a curation pipeline sizes training
    * shards so each downstream file holds a comparable token count
    * rather than a comparable document count.
    *
    * A prefix sum is inherently sequential in the chosen order, but it
    * is NOT inherently single-task: the global form runs a distributed
    * two-pass prefix sum — (1) range-partition on the order key and sum
    * each partition's weight (one tiny row per partition), (2) collect
    * those partials to the driver, fold them into per-partition starting
    * offsets, and (3) assign shards map-side as
    * floor((offset(partition) + running-sum-within-partition) / budget).
    * The only single-point work is the fold over numPartitions partial
    * sums on the driver — O(partitions), not O(rows) — so the plan holds
    * at 100 TB where a global `Window.orderBy` (one task sorting the
    * whole corpus) dies.
    *
    * With `partitionCols` the prefix sum restarts per partition value
    * (independent shard numbering per bucket) — a different, also
    * useful, semantics; that form parallelizes via the window itself.
    *
    * The range-partitioned frame is persisted: the per-partition totals
    * and the final pass MUST see identical partition boundaries (range
    * sampling re-draws per job otherwise). At cluster scale the
    * equivalent barrier is a parquet staging write; persist is the
    * local-mode stand-in. Project `df` to the columns you need before
    * calling — the persist and the pid shuffle carry every column.
    */
  def shardByBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, partitionCols: Seq[String] = Nil,
      materialize: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (partitionCols.nonEmpty) {
      val w = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("shard",
        floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) / budget))
    } else {
      val run = "_graft_shard_run"
      runningSum(df, orderCol, weightCol, run, materialize)
        .withColumn("shard", floor(col(run) / budget))
        .drop(run)
    }
  }

  /** Distributed EXCLUSIVE prefix sum of `weightCol` in `orderCol`
    * order, appended as `outCol` — the primitive under
    * [[shardByBudget]] and [[systematicSample]]. Two-pass: (1)
    * range-partition on the order key and sum each partition's weight
    * — one tiny row per partition; (2) fold those partials into
    * per-partition starting offsets on the driver (O(partitions), not
    * O(rows)) and assign positions map-side as offset(partition) +
    * running-sum-within-partition. No global single-task window
    * anywhere, so the plan holds at 100 TB.
    *
    * The range-partitioned frame is persisted: the partial-sum pass
    * and the final pass MUST see identical partition boundaries
    * (range sampling re-draws per job otherwise). At cluster scale
    * the equivalent barrier is a parquet staging write; persist is
    * the local-mode stand-in. Project `df` to the columns you need
    * before calling — the persist and the pid shuffle carry every
    * column. Integral weights accumulate as exact longs; fractional
    * ones as doubles.
    */
  def runningSum(df: DataFrame, orderCol: String, weightCol: String,
      outCol: String, materialize: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains(outCol),
      s"input already has a $outCol column")
    locally {
      val pid = "_graft_shard_pid"
      val run = outCol
      val integral = df.schema(weightCol).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      val ranged = df
        .repartitionByRange(col(orderCol))
        .withColumn(pid, spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pass 1: one (pid, partial-sum) row per partition — tiny
      val partials = ranged.groupBy(col(pid))
        .agg(sum(col(weightCol)).as("_w"))
        .collect()
        .sortBy(_.getInt(0))
      // driver-side fold into exclusive starting offsets, O(partitions).
      // Integral weights stay exact longs; everything else (double,
      // float, decimal) folds through Number.doubleValue — a decimal
      // weight column must not ClassCastException the fold
      val offsetCol: Column =
        if (integral) {
          var acc = 0L
          val offsets = partials.map { r =>
            val entry = r.getInt(0) -> acc
            if (!r.isNullAt(1)) acc += r.getLong(1)
            entry
          }.toMap
          if (offsets.isEmpty) lit(0L)
          else coalesce(try_element_at(typedLit(offsets), col(pid)), lit(0L))
        } else {
          var acc = 0.0
          val offsets = partials.map { r =>
            val entry = r.getInt(0) -> acc
            r.get(1) match {
              case null => ()
              case n: java.lang.Number => acc += n.doubleValue()
              case other => throw new IllegalArgumentException(
                s"non-numeric weight column '$weightCol' " +
                  s"(${other.getClass.getName})")
            }
            entry
          }.toMap
          if (offsets.isEmpty) lit(0.0)
          else coalesce(try_element_at(typedLit(offsets), col(pid)), lit(0.0))
        }
      // pass 2: running sum restarts per range partition (parallel),
      // global position = partition offset + local running sum
      val w = Window.partitionBy(col(pid)).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      val summed = ranged
        .withColumn(run,
          offsetCol + coalesce(sum(col(weightCol)).over(w),
            if (integral) lit(0L) else lit(0.0)))
        .drop(pid)
      if (!materialize) summed // plan stays inspectable; cache retained
      else {
        // materialize the prefix sum, then release the big
        // range-partitioned cache — holding it for the session would
        // leak one full-corpus copy per call
        val out = summed.localCheckpoint(true)
        ranged.unpersist(false)
        out
      }
    }
  }

  /** Weight-proportional SYSTEMATIC sample in `orderCol` order: keep
    * exactly the rows that straddle a multiple of `step` in the
    * running-weight axis — row i is kept iff
    * `floor(before_i / step) < floor((before_i + w_i) / step)`. Every
    * kept row represents ~`step` units of corpus weight, so the
    * sample is importance-weighted by construction (a 10× longer
    * document is 10× likelier to carry a boundary), deterministic,
    * and engine-replayable — no `rand()`, no distribution-sensitive
    * `pow`/`ln`. The standard PPS-without-replacement scheme for
    * drawing eval/inspection subsets from a weighted corpus.
    *
    * Built on the same two-pass distributed prefix sum as
    * [[shardByBudget]] ([[runningSum]]); the boundary filter is
    * map-side on top of it.
    */
  def systematicSample(df: DataFrame, orderCol: String,
      weightCol: String, step: Long,
      materialize: Boolean = true): DataFrame = {
    require(step > 0, "step must be positive")
    val run = "_graft_sys_run"
    require(!df.columns.contains(run), s"input already has a $run column")
    runningSum(df, orderCol, weightCol, run, materialize)
      .filter(floor(col(run) / step) <
        floor((col(run) + col(weightCol)) / step))
      .drop(run)
  }

  /** Temperature-flattened domain mixture weights: the data-mix table
    * behind multi-source training corpora — raw per-domain counts are
    * flattened by `count^(1/temperature)` so dominant sources stop
    * drowning rare ones (temperature 1 = proportional, ∞ = uniform).
    * Returns (domain, n_docs, weight, mix_ratio), ratios summing to 1.
    *
    * Numeric portability: the flattened weight is `sqrt` for
    * temperature 2 (an IEEE correctly-rounded op — `pow` is NOT and
    * may differ across libm builds), rounded to 9 dp and carried as
    * DECIMAL so the total is an exact order-independent sum; the final
    * ratio is one double division of two exactly-agreed inputs.
    *
    * Plan shape: one partial+final count aggregate (exchange carries
    * one row per domain per partition), then the grand total as a
    * broadcast ONE-ROW aggregate joined map-side — not a
    * single-partition window, which would serialize the frame into one
    * task (and WARN on every run) while the broadcast stays safe at
    * any domain cardinality. Same exact decimal sum either way.
    */
  /** Square-root temperature rebalancing — the multilingual-corpus
    * downsampling strategy (the α=0.5 point of the exponent-smoothed
    * family mT5/XLM-R sample with): per-stratum keep probability
    *
    *   p_s = sqrt(c_min / c_s)
    *
    * i.e. target shares ∝ sqrt(c_s), scaled so the SMALLEST stratum
    * keeps everything (downsample-only — no stratum is upsampled,
    * duplication is a different operator). The head language is
    * flattened by the square root instead of capped to the tail
    * (α=0: [[stratifiedSample]] with rate c_min/c_s), preserving more
    * total data at the same balance direction.
    *
    * α is FIXED at 0.5 deliberately: p_s is then one IEEE
    * correctly-rounded `sqrt` of an exact count ratio — bit-identical
    * on any engine — where general `pow` differs across libm builds
    * (the [[mixtureWeights]] precedent). Membership is the id-hash
    * bucket of [[splitBucket]] at `buckets` granularity, compared
    * against `keep_prob` rounded to 6dp (whose product with the
    * default 10^6 buckets is integer-valued, so the comparison has no
    * float boundary) — deterministic per id across runs AND engines.
    *
    * Null strata are dropped (their share is undefined), like
    * [[mixtureWeights]]. Output: (idCol, strataCol, keep_prob, kept)
    * for every non-null-stratum row — emitting the flag rather than
    * filtering keeps the rejected complement addressable (audit,
    * rejection sampling).
    *
    * Plan shape: one partial+final count per stratum (bounded), its
    * 1-row min, both BROADCAST back onto the stream — text never
    * shuffles, nothing driver-side, the stratum cardinality is the
    * only table that must fit a broadcast (languages/domains: always).
    */
  def temperatureRebalance(df: DataFrame, idCol: String,
      strataCol: String, buckets: Int = 1000000): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("_c"))
    val minC = counts.agg(min(col("_c")).as("_mc"))
    val p = round(sqrt(col("_mc").cast("double") / col("_c").cast("double")), 6)
    df.filter(col(strataCol).isNotNull)
      .join(broadcast(counts), strataCol)
      .crossJoin(broadcast(minC))
      .select(col(idCol), col(strataCol),
        p.as("keep_prob"),
        (splitBucket(col(idCol), buckets) < p * buckets).as("kept"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis
    * & Spirakis 2006, algorithm A-ES): with u_i a per-id uniform, the
    * k LARGEST keys u_i^(1/w_i) — equivalently ln(u_i)/w_i — are a
    * weighted random sample without replacement; a document with
    * twice the weight is (in the proper sense) twice as likely to be
    * drawn. The LLM-curation use: quality- or length-weighted subset
    * selection in ONE distributed pass, reproducible across runs and
    * engines, no resampling loop.
    *
    * Determinism/portability: u_i = (idBucket + 0.5)/10^6 from the
    * engine's md5 id-hash (never exactly 0, so ln stays finite); the
    * key is ln(u)/w rounded to 9dp — `ln` is only ~1-ulp accurate
    * across libms, and 9dp absorbs that; residual ties break by id.
    * Rows with null/zero/negative weights are excluded (selection
    * probability 0). Top-k via orderBy+limit — TakeOrdered partials
    * for any sane k, never a global sort.
    *
    * Output: (idCol, weightCol, samp_key), the k selected rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (splitBucket(col(idCol), 1000000).cast("double") + 0.5) /
      1000000.0
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        round(log(u) / col(weightCol).cast("double"), 9).as("samp_key"))
      .orderBy(col("samp_key").desc, col(idCol).asc)
      .limit(k)
  }

  def mixtureWeights(df: DataFrame, domainCol: String): DataFrame = {
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val w = round(sqrt(col("n_docs").cast("double")), 9)
      .cast("decimal(28,9)")
    val weighted = counts
      .select(col("domain"), col("n_docs"), w.as("weight"))
    val total = weighted.agg(sum(col("weight")).as("__w_total"))
    weighted.crossJoin(broadcast(total))
      .withColumn("mix_ratio",
        round(col("weight").cast("double") /
          col("__w_total").cast("double"), 9))
      .drop("__w_total")
  }

  /** Scale-safe PER-GROUP rank and percentile — the alternative to a
    * `row_number() OVER (PARTITION BY group ORDER BY value)` window
    * when groups are FEW and huge (languages, sources, event types):
    * a window partition cannot be split, so the biggest group
    * serializes on one task — the same unsplittable-partition hazard
    * as the retired token-keyed surprisal window, just keyed on a
    * low-cardinality column. (Entity-keyed windows with MANY small
    * groups — users, hosts — are fine and keep using windows.)
    *
    * Shape: ONE global [[runningSum]] pass ordered by the composite
    * (group, value, tiebreak) key — the range sort splits a huge
    * group across many partitions because the ordering continues
    * through value — then per-group rank = global position − the
    * group's min position + 1, where the |groups|-row min table
    * broadcasts back. Percentile = rank / |group| from the same
    * bounded table. Ties are broken by `tieCol`, so every row's rank
    * is deterministic.
    *
    * Output: input columns + (rank BIGINT 1-based, pct DOUBLE 6dp in
    * (0, 1]). Null group/value/tiebreak rows are dropped (rank over
    * null is undefined).
    */
  def groupRank(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val keyed = df.filter(col(groupCol).isNotNull &&
        col(valueCol).isNotNull && col(tieCol).isNotNull)
      .withColumn("_ord",
        struct(col(groupCol), col(valueCol), col(tieCol)))
      .withColumn("_one", lit(1L))
    val pos = runningSum(keyed, "_ord", "_one", "_pos")
      .withColumn("_gpos", col("_pos") + 1L)
    val grp = pos.groupBy(col(groupCol))
      .agg(min(col("_gpos")).as("_gmin"), count(lit(1)).as("_gn"))
    pos.join(grp, groupCol)
      .withColumn("rank", col("_gpos") - col("_gmin") + 1L)
      .withColumn("pct",
        round(col("rank").cast("double") / col("_gn"), 6))
      .drop("_ord", "_one", "_pos", "_gpos", "_gmin", "_gn")
  }

  /** Deterministic corpus shuffle: a REPRODUCIBLE pseudo-random
    * training order — position = dense 1-based rank of md5("shuf:" ‖
    * salt ‖ ":" ‖ id). Training runs must shuffle their corpus, and
    * at 100 TB "shuffle" cannot mean a nondeterministic `rand()` sort
    * (irreproducible across retries/engines) or a driver permutation
    * (doesn't exist at this size): hashing every id through the
    * portable md5 family gives an order that is uniform-random in
    * distribution yet bit-identical on every run and engine, with
    * `salt` selecting a fresh permutation per epoch. Domains/sources
    * interleave in expectation — the curriculum-mixing property a
    * sorted-by-source layout destroys.
    *
    * Plan shape: one [[runningSum]] pass over the hash key — a
    * range-partitioned single-column sort (balanced by range sampling
    * — the hash key is uniform by construction, so partitions are
    * even) + the O(partitions) driver offset fold. The full 32-hex
    * digest is the order key, so ties require an md5 collision;
    * `idCol` must be unique (it is a key).
    *
    * Output: (idCol, pos BIGINT 1-based).
    */
  def shuffleOrder(df: DataFrame, idCol: String,
      salt: String = "0"): DataFrame = {
    require(!salt.contains(":"), "salt must not contain ':'")
    val key = md5(concat(lit(s"shuf:$salt:"), col(idCol).cast("string")))
    val keyed = df.filter(col(idCol).isNotNull)
      .select(col(idCol), key.as("_shufkey"))
      .withColumn("_one", lit(1L))
    runningSum(keyed, "_shufkey", "_one", "_pos")
      .select(col(idCol), (col("_pos") + 1L).as("pos"))
  }
}
