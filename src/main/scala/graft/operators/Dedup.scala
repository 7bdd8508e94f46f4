package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2.10):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design (100 TB, 1000 executors):
  *  - Exact dedup shuffles a 256-bit content hash, never document
  *    bodies.
  *  - MinHash/LSH: signatures are computed map-side in codegen'd
  *    expressions; the only shuffle is the band-bucket exchange whose
  *    key is (band index, band hash) — candidate pairs are generated
  *    per-bucket, so cost is Σ|bucket|², not n². Skewed buckets (e.g.
  *    boilerplate) are capped by `maxBucket` — the standard guard
  *    against quadratic blowup on degenerate buckets.
  *  - Verification (exact Jaccard / cosine) runs only on candidate
  *    pairs, joining back to bodies by id, so wide text columns cross
  *    the wire once, not per-pair.
  */
object Dedup {

  /** Exact dedup: canonical winner (min id) per identical content.
    * groupBy on a content hash = one partial-aggregated shuffle of
    * (hash, id) pairs.
    */
  def exactByContent(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val h = sha2(col(contentCol), 256)
    val winners = df.select(col(idCol), h.as("__h"))
      .groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Exact duplicate groups: content hash → ids (for audit/reporting). */
  def duplicateGroups(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol)))
        .as("ids"))
      .filter(col("n") > 1)

  /** MinHash signature of `numHashes` permutations over the shingle
    * set. Permutation i is xxhash64 seeded by prefixing the index —
    * deterministic, codegen'd, zero UDFs. Returns array<long> of
    * length `numHashes`.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    // no array_distinct: the minimum over a multiset equals the minimum
    // over its support, so dedup before min-hashing is pure overhead
    graft.functions.TextExpressions.minhashSignature(shingleArr, numHashes)

  /** LSH band key columns: split the signature into `bands` bands of
    * `rows` hashes; each band's slice hashes to one bucket key (xxhash64
    * hashes array values structurally). Emits one row per (band,
    * bucket) via posexplode downstream.
    *
    * Built as a static `array(...)` of codegen'd slices, NOT a
    * `transform` lambda: transform is CodegenFallback and its lambda
    * body re-evaluates the embedded signature expression once PER BAND
    * (measured 32x the signature cost); the array form stays inside
    * whole-stage codegen where subexpression elimination computes the
    * signature once per row.
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), slice(sig, b * rows + 1, rows))): _*)

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    *
    * df → (id, shingles) → signature → band buckets → self-join within
    * bucket (id< id to orient pairs) → distinct pairs → verify exact
    * Jaccard on the shingle sets → pairs with `jaccard >= threshold`.
    *
    * Returns (id_a, id_b, jaccard). `maxBucket` drops pathological
    * buckets (all-identical boilerplate) before the quadratic step.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 1000,
      broadcastCandidateLimit: Long = 1000000L): DataFrame =
    minhashNearDupPairsBy(df, idCol, textCol,
      c => TextOps.shingles(c, shingleK), numHashes, bands, threshold,
      maxBucket, broadcastCandidateLimit)

  /** [[minhashNearDupPairs]] over a PRECOMPUTED `array<string>` token
    * column — the entry point for callers whose "shingles" already
    * exist as a set-valued column (e.g. per-media frame-hash sets,
    * where joining the hashes into one string only for the pipeline to
    * re-split and re-hash them at `shingleK = 1` paid the whole md5
    * kernel twice). Signature, banding, bucket gating, and exact
    * Jaccard verification are byte-identical to the text form fed the
    * same token multiset: the min over a multiset equals the min over
    * its support, and verification set-ops the distinct tokens — so a
    * caller switching `array_join(toks, " ")` + `shingleK = 1` to this
    * entry point keeps its output (and any replayed oracle) unchanged.
    */
  def minhashNearDupPairsTokens(df: DataFrame, idCol: String,
      tokensCol: String, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 1000,
      broadcastCandidateLimit: Long = 1000000L): DataFrame =
    minhashNearDupPairsBy(df, idCol, tokensCol, identity, numHashes,
      bands, threshold, maxBucket, broadcastCandidateLimit)

  private def minhashNearDupPairsBy(df: DataFrame, idCol: String,
      srcCol: String, shingleOf: Column => Column, numHashes: Int,
      bands: Int, threshold: Double, maxBucket: Int,
      broadcastCandidateLimit: Long): DataFrame = {
    val rows = numHashes / bands
    // Materialize the band keys once: the frame is multiply-consumed
    // (bucket counting + both sides of the self-join), and exploding an
    // unmaterialized signature projection re-evaluates the chain per
    // emitted row (measured 70x slower). At cluster scale the
    // production form of this persist is a parquet staging write of the
    // signature table. Shingle SETS are deliberately NOT materialized
    // corpus-wide — only candidate rows need them (see below).
    val sigs = df.select(col(idCol).as("id"),
      bandHashes(minhashSignature(
        shingleOf(col(srcCol)), numHashes), bands, rows)
        .as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the multi-branch DAG below: the self-join's
    // two sides plus the bucket-count branch otherwise race to fill
    // the cache in one job, computing every partition 3x and fighting
    // over block locks (measured 2-4x slower end to end)
    sigs.count()

    val buckets = sigs.select(col("id"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
    // bucket-size gate via partial-aggregated counts + join back: the
    // map-side combine shrinks the exchange to distinct buckets (a
    // window-count over (band,bucket) was tried and is worse — it
    // forces a full sort of every bucket row and has no combiner)
    val dense = buckets.groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= maxBucket)
      .select("band", "bucket")
    val inPlay = buckets.join(dense, Seq("band", "bucket"))

    val a = inPlay.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = inPlay.select(col("band"), col("bucket"), col("id").as("id_b"))
    // persisted: candidates feed both the id-set broadcast and the
    // verification join; without it the LSH chain re-executes per
    // consumer. Small by construction (LSH-pruned pairs).
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nCandidates = candidates.count()
    val verified = verifyCandidatePairsBy(candidates, df, idCol, srcCol,
      shingleOf, threshold, broadcastCandidateLimit, nCandidates)
    // materialize the (small, LSH-pruned) result eagerly so the two
    // intermediate persists can be released now instead of leaking
    // across a long-lived session; the cluster-scale form of this is a
    // parquet staging write of the verified pairs
    val out = verified.localCheckpoint(true)
    sigs.unpersist(false)
    candidates.unpersist(false)
    out
  }

  /** Candidate pairs for the incremental probe, with history
    * restricted to buckets TOUCHED BY THE BATCH before any
    * aggregation (the r10 shape, VERDICT r9 task 5): `useBroadcast`
    * semi-joins history against the batch's own (band, bucket) set as
    * a broadcast — a map-side filter of the history scan, so no
    * history row outside a touched bucket ever crosses an exchange;
    * false falls back to the plain equi-join (the pre-r10 shuffle
    * shape, correct for batches too large to broadcast their bucket
    * set). The degenerate-bucket guard counts touched rows only —
    * EXACT for touched buckets, since a bucket's rows all carry the
    * same (band, bucket) key. Extracted so PlanSpec can pin the
    * broadcast shape and the two paths' result equality.
    */
  private[graft] def incrementalCandidates(newBands: DataFrame,
      staged: DataFrame, maxBucket: Int, useBroadcast: Boolean)
      : DataFrame = {
    val probeBuckets = newBands.select("band", "bucket").distinct()
    val probeKeyed =
      if (useBroadcast) broadcast(probeBuckets) else probeBuckets
    val touched = staged.select("id", "band", "bucket")
      .unionByName(newBands)
      .join(probeKeyed, Seq("band", "bucket"))
    // counts scan only the narrow (band, bucket) columns, never text.
    // No n>1 requirement here — a new-side singleton may still pair
    // with history.
    val dense = touched.groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket)
      .select("band", "bucket")
    // candidate = new ⋈ touched, normalized to id_a < id_b
    val a = newBands.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = touched.join(dense, Seq("band", "bucket"))
      .select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** Exploded (id, band, bucket) band-key rows — the single definition
    * of the signature layout shared by staging and the incremental
    * probe (a drift here silently empties the bucket join).
    */
  private[graft] def bandKeyRows(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    df.select(col(idCol).as("id"),
      posexplode(bandHashes(minhashSignature(
        TextOps.shingles(col(textCol), shingleK), numHashes),
        bands, rows)).as(Seq("band", "bucket")))
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs: the
    * corpus is semi-joined down to candidate ids FIRST, then shingle
    * sets are computed for just those rows — per-document shingle
    * arrays are never materialized corpus-wide (at 100 TB that cache
    * would be ~5x the text itself). The id set is broadcast only while
    * provably driver-small; a boilerplate-heavy corpus that floods
    * past `broadcastCandidateLimit` pairs falls back to a shuffle
    * semi-join instead of OOMing the driver.
    */
  private[graft] def verifyCandidatePairs(candidates: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, shingleK: Int, threshold: Double,
      broadcastCandidateLimit: Long, nCandidates: Long): DataFrame =
    verifyCandidatePairsBy(candidates, corpus, idCol, textCol,
      c => TextOps.shingles(c, shingleK), threshold,
      broadcastCandidateLimit, nCandidates)

  private def verifyCandidatePairsBy(candidates: DataFrame,
      corpus: DataFrame, idCol: String, srcCol: String,
      shingleOf: Column => Column, threshold: Double,
      broadcastCandidateLimit: Long, nCandidates: Long): DataFrame = {
    val candIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id"))).distinct()
    val candIdsSized =
      if (nCandidates <= broadcastCandidateLimit) broadcast(candIds)
      else candIds
    val candShingles = corpus
      .select(col(idCol).as("id"), col(srcCol).as("__text"))
      .join(candIdsSized, Seq("id"), "left_semi")
      .select(col("id"),
        array_distinct(shingleOf(col("__text"))).as("sh"))
    candidates
      .join(candShingles.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(candShingles.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Stage exploded band keys for a corpus version to parquet — the
    * cluster-scale form of the in-memory signature persist: the
    * signature computation is paid ONCE per corpus version, and
    * incremental dedup of the next batch joins against this table
    * instead of re-hashing 100 TB of history.
    *
    * Layout: (id, band, bucket, shingle_k, num_hashes, bands)
    * partitioned by band — an incoming batch's bucket probe prunes to
    * its band partitions. The hash parameters ride along as constant
    * columns (RLE-compressed to nothing) so the incremental probe can
    * REFUSE mismatched parameters instead of silently joining buckets
    * hashed under a different scheme (which would miss every
    * cross-epoch near-dup with no error).
    */
  def stageBandKeys(df: DataFrame, idCol: String, textCol: String,
      path: String, shingleK: Int = 5, numHashes: Int = 64,
      bands: Int = 16): Unit = {
    bandKeyRows(df, idCol, textCol, shingleK, numHashes, bands)
      .withColumn("shingle_k", lit(shingleK))
      .withColumn("num_hashes", lit(numHashes))
      .withColumn("bands", lit(bands))
      .write.mode("overwrite").partitionBy("band").parquet(path)
  }

  /** Incremental near-dup pairs: verified pairs TOUCHING the new batch
    * — (new × staged-history) ∪ (new × new) — without recomputing any
    * historical signature. `stagedBands` is [[stageBandKeys]] output;
    * `corpus` must contain the text of every id that can appear in a
    * pair (history + batch) for the verification join.
    *
    * Same bucket-join shape as [[minhashNearDupPairs]]: the only
    * data-sized exchange keys on (band, bucket), history arrives
    * pre-hashed from parquet, and verification touches candidate rows
    * only. Pairs wholly inside history are excluded by construction —
    * they were reported when their batches arrived.
    */
  def minhashNearDupPairsIncremental(newDocs: DataFrame, corpus: DataFrame,
      stagedBands: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 1000,
      broadcastCandidateLimit: Long = 1000000L): DataFrame = {
    // refuse parameter drift against the staged metadata columns: a
    // mismatched band scheme would silently miss every cross-epoch pair.
    // Validate ALL rows, not a sampled head — a staged path that
    // accumulated two epochs' schemes must also be refused, or
    // whichever epoch the sample missed silently drops its cross-epoch
    // pairs. All-rows validation = min==max per column (single scheme)
    // plus the probe's own tuple. r10 (VERDICT r9 task 5): the check
    // rides the candidate job as an `observe` metric set — zero extra
    // Spark jobs vs the r7-r9 dedicated aggregate pass (measured as a
    // full scheduling-floor job on every probe call). min/max are
    // merge-idempotent, so the staged scan appearing in BOTH candidate
    // branches (dense counts + probe side) cannot skew them, and the
    // validation still covers every staged row. Refusal happens after
    // the candidate count and before any verify work or output.
    val schemeObs =
      if (stagedBands.columns.contains("num_hashes"))
        Some(new org.apache.spark.sql.Observation())
      else None
    val stagedChecked = schemeObs match {
      case Some(o) => stagedBands.observe(o,
        min(col("shingle_k")).as("k_min"), max(col("shingle_k")).as("k_max"),
        min(col("num_hashes")).as("h_min"), max(col("num_hashes")).as("h_max"),
        min(col("bands")).as("b_min"), max(col("bands")).as("b_max"))
      case None => stagedBands
    }
    val newBands = bandKeyRows(newDocs, idCol, textCol, shingleK,
        numHashes, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBandCount = newBands.count() // materialize before multi-branch use

    // Only buckets TOUCHED BY THE BATCH can produce candidates, so
    // restrict history to them FIRST (r10, VERDICT r9 task 5): the
    // r7-r9 shape aggregated bucket counts over the ENTIRE staged
    // history on every probe call — a full-history shuffle per cron
    // tick, the cost that grows with corpus age, not batch size. A
    // broadcast semi-join on the probe's own (band, bucket) set turns
    // that into a map-side filter of the history scan (no shuffle of
    // history rows outside the touched set); the degenerate-bucket
    // count then aggregates only touched-bucket rows. For a batch too
    // large to broadcast its bucket set, fall back to the plain
    // equi-join — the old shuffle shape, correct at any size.
    val candidates = incrementalCandidates(newBands, stagedChecked,
        maxBucket, useBroadcast = newBandCount <= broadcastCandidateLimit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCandidates = candidates.count()
    schemeObs.foreach { o =>
      // the candidate count above scanned every staged row, so the
      // metrics are normally final here — refuse BEFORE any verify or
      // output work. Non-blocking future check, NOT a bare get: AQE
      // may skip the staged-side stage entirely (empty-batch probe
      // propagates an empty join side), and a blocking get would hang
      // forever on metrics that will never fire. AQE's replan can ALSO
      // complete the Observation with an EMPTY map (the CollectMetrics
      // node dropped from the replanned query — observed r12 on the
      // span probe), so the fallback triggers on MISSING METRICS, not
      // just on an incomplete future: the r7 dedicated aggregate,
      // never a silently skipped validation.
      val observed: Map[String, Any] =
        if (o.future.isCompleted) o.get else Map.empty
      val m: Map[String, Any] =
        if (observed.contains("k_min")) observed
        else {
          val r = stagedBands.agg(
            min(col("shingle_k")).as("k_min"),
            max(col("shingle_k")).as("k_max"),
            min(col("num_hashes")).as("h_min"),
            max(col("num_hashes")).as("h_max"),
            min(col("bands")).as("b_min"),
            max(col("bands")).as("b_max")).collect()(0)
          r.schema.fieldNames.zipWithIndex
            .map { case (n, idx) => n -> r.get(idx) }.toMap
        }
      if (m("k_min") != null) { // null = empty history: nothing to refuse
        def i(k: String): Int = m(k).asInstanceOf[Number].intValue()
        require(i("k_min") == i("k_max") && i("h_min") == i("h_max") &&
            i("b_min") == i("b_max"),
          s"staged band keys mix parameter schemes (shingleK " +
            s"${i("k_min")}..${i("k_max")}, numHashes " +
            s"${i("h_min")}..${i("h_max")}, bands " +
            s"${i("b_min")}..${i("b_max")}) — restage under one scheme")
        require(i("k_min") == shingleK && i("h_min") == numHashes &&
          i("b_min") == bands,
          s"staged band keys were built with (shingleK=${i("k_min")}, " +
          s"numHashes=${i("h_min")}, bands=${i("b_min")}) but the " +
          s"probe uses ($shingleK, $numHashes, $bands)")
      }
    }

    val verified = verifyCandidatePairs(candidates, corpus, idCol, textCol,
      shingleK, threshold, broadcastCandidateLimit, nCandidates)
    val out = verified.localCheckpoint(true)
    newBands.unpersist(false)
    candidates.unpersist(false)
    out
  }

  /** Drop near-duplicates: keep the min-id representative of each
    * connected pair (single-pass approximation of the connected
    * component: a doc is dropped if any retained smaller-id doc pairs
    * with it — for dedup purposes the standard greedy rule).
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame =
    dedupGreedyByPairs(df, idCol,
      minhashNearDupPairs(df, idCol, textCol, shingleK, numHashes, bands,
        threshold))

  /** [[minhashDedup]]'s greedy survivor rule over a PRECOMPUTED verified
    * pair set — the staged operating mode: at 100 TB the pair table is
    * written once per corpus version and every survivor policy
    * (greedy here, transitive closure in [[dedupByComponents]]) reads
    * it instead of re-running sig→band→verify per policy.
    */
  def dedupGreedyByPairs(df: DataFrame, idCol: String, pairs: DataFrame)
      : DataFrame = {
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Connected components of the undirected pair graph by FastSV
    * (Zhang, Azad & Hu 2020 — the linear-algebraic refinement of
    * Shiloach–Vishkin): every node starts labeled with itself
    * (f(u) = u); each round applies three min-updates from the
    * grandparent table gp(u) = f(f(u)):
    *
    *   stochastic hooking:  f(f(u)) ← min over edges (u,v) of gp(v)
    *     — writes to the PARENT's row (a groupBy on f(u)), which is
    *     what lets whole subtrees re-hook at once;
    *   aggressive hooking:  f(u) ← min over edges (u,v) of gp(v);
    *   shortcutting:        f(u) ← min(f(u), gp(u)).
    *
    * Fixpoint = every node carries its component's minimum id, in
    * O(log n) rounds on ANY graph shape. Plain neighbor-min
    * propagation (the pre-r12 implementation) moves the minimum one
    * edge per round — O(diameter), so a chain-shaped dup graph meant
    * one full edge-join round per hop or a maxIters refusal at 100 TB
    * (VERDICT r11 task 5). Simpler fixes measure worse: pointer
    * jumping alone (f(u) ← min(f(u), gp(u), neighbor mins)) is STILL
    * linear-round on chains with adversarial id placement (simulated
    * worst 232 rounds over 200 random 256-node chains — information
    * still crosses bad regions one edge per round), and the
    * alternating large-star/small-star edge-rewrite formulation
    * A/B-measured +0.7–1.0 s per CC query at sf0.1 on the
    * quasi-clique graphs minhash dedup actually makes (edge-set
    * distinct + anti-join per half-round). FastSV keeps the edge list
    * IMMUTABLE (scan-reusable across rounds) and touches it exactly
    * once per round — one equi-join + one map-side-combined
    * groupBy-min, the same edge cost plain propagation paid; the
    * stochastic-hooking aggregate derives from that result grouped by
    * parent, so hooking only adds NODE-sized joins. Simulated worst
    * case 11 rounds at n=256, 15 at n=4096, pinned by spec at
    * maxIters=16 for the 256-node adversarial chains. Returns
    * (id, component) for every node that appears in a pair.
    *
    * Scale shape: no per-node neighbor collection — a hot node
    * (boilerplate matched by millions) costs an aggregate, not a
    * giant array. Near-dup components are quasi-cliques, so the
    * fixpoint lands in 2–3 rounds there; adversarial chains take
    * O(log n). Convergence is detected by the SUM of labels (exact,
    * not probabilistic: every update is a min, so labels decrease
    * monotonically and an unchanged sum implies an unchanged vector) —
    * one aggregate on the already-checkpointed frame instead of a
    * join against the previous round.
    *
    * Every round ends in an EAGER `localCheckpoint`: it materializes
    * the round (the work the convergence sum needs anyway) and — the
    * part `persist` alone cannot do — truncates the LOGICAL plan to
    * the checkpointed RDD. Without that cut each round's plan embeds
    * the previous round's several times (grandparent self-join + two
    * hooking joins), an O(k^rounds) tree that stalls the driver in
    * analysis/plan-string work long before any executor runs.
    * Superseded checkpoint blocks are reclaimed by the ContextCleaner
    * once the previous round's frame is unreferenced.
    */
  /** `localMaxEdges` is the small-graph gate (the pageRank
    * `broadcastRanksMax` convention): when the symmetrized edge list
    * is at most this many rows, the closure runs as ONE driver-side
    * union-find over the (already-materialized) collected edges
    * instead of 2–6 distributed FastSV rounds — the rounds each cost
    * several jobs of fixed latency that dwarf the actual work on
    * entity-resolution name graphs and sf-scale dup graphs (measured:
    * the ER capstone's closure is all round latency on a 64-name
    * graph). Labels are IDENTICAL by construction (min id per
    * component — union-find tracks the same minimum FastSV's
    * monotone min-label fixpoint converges to; differential
    * spec-pinned). The collect is bounded by the gate; web-scale pair
    * tables exceed it and take FastSV unchanged. Pass 0 to force the
    * distributed path (the FastSV specs do). Value types outside the
    * portable ordering set (integral, string — compared exactly as
    * Spark's `least` via binary UTF8String order) fall back to
    * FastSV regardless of size, as do edge lists containing nulls.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIters: Int = 50,
      localMaxEdges: Long = 1000000L): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIters,
      localMaxEdges)._1

  /** Exact total order matching Spark's `least`/sort order for the
    * node types the local closure supports. None = unsupported type
    * (caller falls back to the distributed path).
    */
  private def sparkOrdering(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(Ordering.by((v: Any) => v match {
          case l: Long => l
          case i: Int => i.toLong
          case s: Short => s.toLong
          case b: Byte => b.toLong
        }))
      case StringType =>
        Some(new Ordering[Any] {
          def compare(a: Any, b: Any): Int =
            org.apache.spark.unsafe.types.UTF8String
              .fromString(a.asInstanceOf[String])
              .compareTo(org.apache.spark.unsafe.types.UTF8String
                .fromString(b.asInstanceOf[String]))
        })
      case _ => None
    }
  }

  /** Driver-side union-find closure over a collected edge list —
    * the small-graph arm of [[connectedComponents]]. Returns
    * (id, component) rows with component = the component's minimum
    * node value under `ord` (exactly the distributed fixpoint's
    * labels). Path-compressed, union-by-size: O(E α(E)).
    */
  private def localComponents(spark: SparkSession,
      edges: Array[(Any, Any)], ord: Ordering[Any],
      dt: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types._
    val idx = new java.util.HashMap[Any, Integer]()
    val vals = new scala.collection.mutable.ArrayBuffer[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue
      else {
        val i = vals.length
        idx.put(v, Integer.valueOf(i)); vals += v; i
      }
    }
    edges.foreach { case (a, b) => id(a); id(b) }
    val parent = Array.tabulate(vals.length)(identity)
    val size = Array.fill(vals.length)(1)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(idx.get(a)); val rb = find(idx.get(b))
      if (ra != rb) {
        if (size(ra) >= size(rb)) { parent(rb) = ra; size(ra) += size(rb) }
        else { parent(ra) = rb; size(rb) += size(ra) }
      }
    }
    // component label = min node value among members
    val minOf = new java.util.HashMap[Int, Any]()
    vals.indices.foreach { i =>
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || ord.lt(vals(i), cur)) minOf.put(r, vals(i))
    }
    val rows = new java.util.ArrayList[Row](vals.length)
    vals.indices.foreach { i =>
      rows.add(Row(vals(i), minOf.get(find(i))))
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", dt), StructField("component", dt))))
  }

  /** [[connectedComponents]] plus the number of rounds the fixpoint
    * took — the observable the O(log n) contract is pinned on.
    */
  private[graft] def connectedComponentsWithRounds(pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIters: Int = 50, localMaxEdges: Long = 1000000L)
      : (DataFrame, Int) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist(lvl)
    val symCount = sym.count() // materialize before multi-branch reuse
    // small-graph gate: the count above already materialized the edge
    // list, so the collect below re-reads the cache, never recomputes
    // the (possibly expensive) pair pipeline. Null endpoints fall
    // through to the distributed path (its join/distinct semantics
    // own that case); 0 rounds marks the local arm in the observable.
    if (symCount <= localMaxEdges) {
      sparkOrdering(sym.schema("src").dataType).foreach { ord =>
        val edges =
          try sym.collect().map(r => (r.get(0), r.get(1)))
          catch { case t: Throwable => sym.unpersist(false); throw t }
        if (!edges.exists(e => e._1 == null || e._2 == null)) {
          sym.unpersist(false)
          return (localComponents(pairs.sparkSession, edges, ord,
            sym.schema("src").dataType), 0)
        }
      }
    }
    try {
      // convergence observable: for NUMERIC ids, the exact decimal
      // label sum (labels decrease monotonically under min, so an
      // unchanged sum implies an unchanged vector — one aggregate on
      // the checkpointed frame). Non-numeric ids (string keys — the
      // r13 differential spec caught the old unconditional decimal
      // cast throwing on them) use a changed-row probe against the
      // previous round instead: a node-sized join with early-exit
      // isEmpty, same O(|V|) round cost class.
      val numericIds = sym.schema("src").dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      val sumType = org.apache.spark.sql.types.DecimalType(38, 0)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("component").cast(sumType)))
          .head().getDecimal(0)
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
        .localCheckpoint(true)
      var prevSum = if (numericIds) labelSum(labels) else null
      var it = 0
      var converged = false
      while (!converged && it < maxIters) {
        it += 1
        // grandparent table gp(u) = f(f(u)). Every label value is the
        // id of a component member, so it resolves in the labels
        // table itself (left + coalesce only guards the invariant).
        // Round 1 skips the self-join: labels are the identity, so
        // gp(u) = u — the quasi-clique graphs minhash dedup actually
        // makes converge in 2-3 rounds, and the first is the biggest
        val gp =
          if (it == 1) labels.withColumn("__gp", col("component"))
          else {
            val parent = labels.select(col("id").as("component"),
              col("component").as("__gp"))
            labels.join(parent, Seq("component"), "left")
              .select(col("id"), col("component"),
                least(col("component"),
                  coalesce(col("__gp"), col("component"))).as("__gp"))
          }
        // aggressive hooking per node u: min over neighbors v of
        // gp(v) — the round's ONE pass over the edge list (join +
        // map-side-combined groupBy), same edge cost as plain
        // neighbor-min propagation paid
        val aggr = sym
          .join(gp.select(col("id").as("dst"), col("__gp").as("__gv")),
            Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("__gv")).as("__aggr"))
        // stochastic hooking targets the PARENT row:
        //   stoch(w) = min over edges (u,v) with f(u)=w of gp(v)
        //            = min over u with f(u)=w of aggr(u)
        // so it derives from the NODE-sized aggr table instead of a
        // second pass over the edges. Round 1: f(u) = u, so stoch
        // coincides with aggr — skip the join too
        val stoch =
          if (it == 1) aggr.select(col("id"), col("__aggr").as("__stoch"))
          else aggr
            .join(labels.select(col("id"), col("component").as("__w")),
              Seq("id"))
            .groupBy(col("__w").as("id"))
            .agg(min(col("__aggr")).as("__stoch"))
        val next = gp
          .join(aggr, Seq("id"), "left")
          .join(stoch, Seq("id"), "left")
          .select(col("id"), least(
            col("__gp"), // shortcutting (already min'd with component)
            coalesce(col("__stoch"), col("component")),
            coalesce(col("__aggr"), col("component"))).as("component"))
          .localCheckpoint(true)
        if (numericIds) {
          val nextSum = labelSum(next)
          converged = nextSum.compareTo(prevSum) == 0
          prevSum = nextSum
        } else {
          converged = next
            .join(labels.select(col("id"),
              col("component").as("__prevc")), Seq("id"))
            .filter(col("component") =!= col("__prevc"))
            .isEmpty
        }
        labels = next
      }
      require(converged,
        s"connectedComponents did not converge in $maxIters rounds")
      (labels, it)
    } finally {
      // a non-convergence throw (or any mid-loop failure) must not
      // strand the edge list in the cache
      sym.unpersist(false)
    }
  }

  /** Drop near-duplicates by TRANSITIVE closure: one survivor (the
    * minimum id) per connected component of the pair graph. This is
    * the corpus-curation semantics — a dup chain A~B~C is one content
    * cluster even when A≁C directly — versus [[minhashDedup]]'s greedy
    * single-pass rule, which keeps any doc with no smaller direct
    * neighbor (so a chain 1~2, 2~0 keeps {0, 1}; the closure keeps
    * {0}). Docs in no pair survive untouched.
    */
  def dedupByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
      localMaxEdges: Long = 1000000L): DataFrame = {
    val losers = connectedComponents(pairs,
        localMaxEdges = localMaxEdges)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[minhashDedup]]'s pipeline with [[dedupByComponents]]'s
    * connected-components survivor rule.
    */
  def minhashDedupComponents(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame =
    dedupByComponents(df, idCol,
      minhashNearDupPairs(df, idCol, textCol, shingleK, numHashes, bands,
        threshold))

  /** Engine-portable minhash signature in long form: (id, perm,
    * min_hash), perm 0-based. Base hash = the LEADING 32 bits (first
    * 8 hex chars) of each shingle's md5 — any fixed 32-bit slice of a
    * uniform digest works, and the leading substring is what both
    * engines spell identically; permutation i = (2i+3)·h + (1000003·i + 12345)
    * mod (2³¹−1) — all arithmetic inside signed-64-bit range on every
    * engine, so the whole signature computation (shingling, hashing,
    * permutation family, minima) is replayable by an independent
    * engine and oracle-checked end to end (`q_minhash_sig_md5`). The
    * fused [[minhashSignature]] expression stays the scan-speed path
    * (xxhash64 base + multiply-shift — not reproducible elsewhere).
    * One explode + one partially-aggregated groupBy carrying
    * `numHashes` min partials per (task, doc).
    */
  def minhashSignaturePortable(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 5, numHashes: Int = 32)
      : DataFrame = {
    require(numHashes >= 1)
    val mod = 2147483647L // 2^31 - 1
    val mins = (0 until numHashes).map(i =>
      min((lit(2L * i + 3) * col("__h") + lit(1000003L * i + 12345L))
        % mod).as(s"__m$i"))
    df.select(col(idCol),
        explode(TextOps.shingles(col(textCol), shingleK)).as("__sh"))
      .withColumn("__h",
        conv(substring(md5(col("__sh")), 1, 8), 16, 10).cast("long"))
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), posexplode(
          array((0 until numHashes).map(i => col(s"__m$i")): _*))
        .as(Seq("perm", "min_hash")))
      .select(col(idCol), col("perm").cast("long").as("perm"),
        col("min_hash"))
  }

  /** 64-bit SimHash over the token multiset: per token hash, add ±1 to
    * each of 64 bit planes, sign gives the bit. Whole computation is
    * higher-order array expressions (aggregate + zip_with) — codegen'd,
    * no UDF. Near-dups then differ in ≤ `maxHamming` bits.
    */
  def simhash64(text: Column): Column =
    graft.functions.TextExpressions.simhash64(TextOps.tokens(text))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Engine-portable 60-bit SimHash: per-token hash = the LEADING 60
    * bits (first 15 hex chars) of md5, multiset ±1 bit voting, a
    * strictly-positive vote sets the bit. Returns (id, fingerprint) —
    * docs with zero tokens produce no row (no token multiset ⇒ no
    * fingerprint, both engines agree).
    *
    * This is the oracle-checkable sibling of the fused [[simhash64]]
    * expression (the scan-speed path, whose xxhash64 base no other
    * engine reproduces): every step — tokenization, hashing, voting,
    * sign rule, bit packing — is composable built-ins an independent
    * engine can replay exactly, so the ALGORITHM gets a hash-matched
    * row (`q_simhash_md5`), the same upgrade pattern as
    * `q_knn_ivf_full` / `q_neardup_embedding_full`. One explode + one
    * partially-aggregated groupBy; the exchange carries 60 vote
    * partials per (task, doc).
    */
  def simhash60Portable(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val bits = 60 // 15 hex chars: unsigned value fits a signed long
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"__b$b"))
    val fp = (0 until bits).map(b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    df.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__h",
        conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), fp.as("fingerprint"))
  }

  /** SimHash near-dup pairs: block on rotations of the fingerprint's
    * 16-bit chunks (a ≤3-bit difference leaves at least one chunk
    * intact), verify Hamming ≤ maxHamming. Same bucket-join shape as
    * LSH — no n² pass.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize before the two-sided chunk join (cache-fill race)
    fp.count()
    val chunks = fp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    val pairs = a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    // eager-materialize the small verified set, then release the
    // fingerprint cache (see minhashNearDupPairs)
    val out = pairs.localCheckpoint(true)
    fp.unpersist(false)
    out
  }

  /** n-gram Jaccard similarity for an explicit pair list — the exact
    * verifier used standalone: joins bodies by id, computes set
    * Jaccard over k-shingles.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      array_distinct(TextOps.shingles(col(textCol), k)).as("__sh"))
    pairs
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("sh_a")),
        Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .drop("sh_a", "sh_b")
  }

  /** Corpus-level line deduplication (RefinedWeb-style boilerplate
    * removal): delete every line that occurs in more than
    * `maxOccurrences` distinct documents (nav menus, cookie banners,
    * boilerplate headers), preserving each document's remaining lines
    * in order. Documents reduced to nothing survive with empty text.
    * Lines shorter than `minLineLength` characters are exempt from
    * counting and removal — without this, the empty line between two
    * paragraphs (identical across virtually every document) crosses
    * the threshold and every paragraph break in the corpus silently
    * collapses.
    *
    * Scale shape: the occurrence count shuffles (md5(line), id) pairs
    * with map-side partial aggregation — line BODIES never cross the
    * exchange twice; the kill-list (only lines OVER the threshold)
    * is typically tiny and joins back as a build side. The rebuild
    * groups by document id — one exchange of surviving lines, which at
    * 100 TB is the honest cost of reassembling documents. Line
    * identity is md5 (engine-portable; collisions would merge two
    * lines' counts — the standard trade, same as every hash-keyed
    * dedup in this library).
    */
  def dedupCorpusLines(docs: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long, minLineLength: Int = 1): DataFrame = {
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__k", md5(col("__line")))
    val killList = lines
      .filter(length(col("__line")) >= minLineLength)
      .groupBy(col("__k"))
      .agg(countDistinct(col(idCol)).as("__n"))
      .filter(col("__n") > maxOccurrences)
    val rebuilt = lines.join(killList, Seq("__k"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as(textCol))
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol))
  }

  /** DOMAIN-scoped boilerplate line removal — the CCNet/web-corpus
    * template scrubber, the relative sibling of [[dedupCorpusLines]]'s
    * absolute corpus-wide threshold: a line is boilerplate when it
    * appears in at least `minFraction` of its OWN domain's documents
    * (site navigation, cookie banners, per-site footers), judged only
    * in domains with at least `minDomainDocs` documents (tiny domains
    * cannot establish a template). The relative test catches per-site
    * templates an absolute corpus count misses (a 50-doc site's
    * 50/50 footer) while sparing globally common but per-domain-rare
    * lines the absolute rule would kill.
    *
    * Scale shape: the line explode is map-side; line identity travels
    * as md5, never text, into the (domain, line-hash) count aggregate
    * (partial-combined, so a mega-domain's hot template line arrives
    * as one row per task). Domain doc totals are a domain-cardinality
    * aggregate joined broadcast-small onto the counts. The kill list
    * (only lines OVER threshold) is typically tiny and anti-joins as
    * a build side; the rebuild groups surviving lines by document id
    * — one exchange of surviving text, the honest reassembly cost
    * (the [[dedupCorpusLines]] argument). Docs whose domain is below
    * `minDomainDocs` pass through untouched, including their text —
    * via the same anti-join (their kill set is empty), not a
    * separate code path.
    *
    * Output: (idCol, domainCol, textCol, n_removed) — the rebuilt
    * text with boilerplate lines deleted in place (order preserved)
    * and the per-doc count of removed lines.
    */
  def stripDomainBoilerplate(docs: DataFrame, idCol: String,
      domainCol: String, textCol: String, minDomainDocs: Long = 5L,
      minFraction: Double = 0.5): DataFrame = {
    val lines = boilerplateLines(docs, idCol, domainCol, textCol)
    val killList = boilerplateKillList(docs, lines, idCol, domainCol,
      minDomainDocs, minFraction)
    boilerplateRebuild(docs, lines, killList, idCol, domainCol, textCol)
  }

  /** The (id, domain, pos, line, line-md5) explode both boilerplate
    * passes share — map-side, narrow (line identity travels as md5
    * into every aggregate/join key; the text rides only to the
    * rebuild). */
  private def boilerplateLines(docs: DataFrame, idCol: String,
      domainCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(domainCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__k", md5(col("__line")))

  /** The relative-threshold kill list over an exploded corpus:
    * (domainCol, __k) rows for every line present in ≥ `minFraction`
    * of its domain's docs, judged only in domains with ≥
    * `minDomainDocs` docs. */
  private def boilerplateKillList(docs: DataFrame, lines: DataFrame,
      idCol: String, domainCol: String, minDomainDocs: Long,
      minFraction: Double): DataFrame = {
    require(minDomainDocs >= 1, "minDomainDocs must be >= 1")
    require(minFraction > 0 && minFraction <= 1,
      "minFraction must be in (0, 1]")
    val domainDocs = docs.groupBy(col(domainCol))
      .agg(countDistinct(col(idCol)).as("__dn"))
    // relative threshold in exact integer arithmetic: n/dn >= f
    // ⇔ n * 10^6 >= ceil(f * 10^6) * dn at the ppm resolution the
    // caller's fraction is meaningful to (an IEEE divide here would
    // put a float in the kill/keep decision)
    val fPpm = math.ceil(minFraction * 1000000L).toLong
    lines
      .groupBy(col(domainCol), col("__k"))
      .agg(countDistinct(col(idCol)).as("__n"))
      .join(broadcast(domainDocs.filter(col("__dn") >= minDomainDocs)),
        Seq(domainCol))
      .filter(col("__n") * 1000000L >= lit(fPpm) * col("__dn"))
      .select(col(domainCol), col("__k"))
  }

  /** Anti-join the kill list off the exploded lines and reassemble
    * documents in place: (idCol, domainCol, textCol, n_removed). */
  private def boilerplateRebuild(docs: DataFrame, lines: DataFrame,
      killList: DataFrame, idCol: String, domainCol: String,
      textCol: String): DataFrame = {
    val rebuilt = lines
      .join(killList, Seq(domainCol, "__k"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as(textCol),
        count(lit(1)).as("__kept"))
    val total = lines.groupBy(col(idCol))
      .agg(count(lit(1)).as("__total"))
    docs.select(col(idCol), col(domainCol))
      .join(rebuilt, Seq(idCol), "left")
      .join(total, Seq(idCol), "left")
      .select(col(idCol), col(domainCol),
        coalesce(col(textCol), lit("")).as(textCol),
        (coalesce(col("__total"), lit(0L)) -
          coalesce(col("__kept"), lit(0L))).as("n_removed"))
  }

  /** Stage a corpus version's domain-boilerplate kill list for the
    * incremental/streaming scrub — the frozen-artifact convention
    * ([[stageBandKeys]] / [[stageSpanHashes]] / the ER registry)
    * applied to [[stripDomainBoilerplate]]: the corpus-wide
    * (domain, line) counting is paid ONCE per corpus version; every
    * micro-batch scrubs against the staged list without recounting
    * domains. The thresholds are BAKED into the artifact (a kill
    * list is only meaningful under the thresholds that built it) and
    * recorded per row as `min_domain_docs` / `min_fraction_ppm` for
    * audit. Schema: (domainCol, k, min_domain_docs, min_fraction_ppm)
    * — `k` is the boilerplate line's md5, never its text.
    */
  def stageBoilerplateKillList(docs: DataFrame, idCol: String,
      domainCol: String, textCol: String, path: String,
      minDomainDocs: Long = 5L, minFraction: Double = 0.5): Unit = {
    val lines = boilerplateLines(docs, idCol, domainCol, textCol)
    boilerplateKillList(docs, lines, idCol, domainCol,
        minDomainDocs, minFraction)
      .select(col(domainCol), col("__k").as("k"))
      .withColumn("min_domain_docs", lit(minDomainDocs))
      .withColumn("min_fraction_ppm",
        lit(math.ceil(minFraction * 1000000L).toLong))
      .write.mode("overwrite").parquet(path)
  }

  /** Scrub a NEW batch against a FROZEN kill list
    * ([[stageBoilerplateKillList]] output) — the serving arm of
    * [[stripDomainBoilerplate]], the streaming twin's batch body:
    * each batch doc loses exactly the lines its domain's staged kill
    * list names; batch docs in domains the staging never saw (or
    * domains below the staging's `minDomainDocs`) pass through
    * untouched via the same anti-join, not a separate code path.
    * Deliberate serving semantics (the [[resolveEntitiesAgainst]]
    * convention): the batch does NOT update the counts — a template
    * line newly introduced by the batch is invisible until the next
    * scheduled restage, keeping the tick cost batch-sized.
    *
    * Scale shape: the staged list is filtered to the batch's own
    * (typically few) distinct domains — that domain set broadcasts
    * as a semi-join onto the staged scan, and the surviving
    * (batch-relevant) kill rows broadcast into the line anti-join —
    * so per-tick cost scales with the BATCH, never with the staged
    * corpus's domain population.
    */
  def stripDomainBoilerplateAgainst(batch: DataFrame, idCol: String,
      domainCol: String, textCol: String,
      killList: DataFrame): DataFrame = {
    val lines = boilerplateLines(batch, idCol, domainCol, textCol)
    val domains = batch.select(col(domainCol)).distinct()
    val touched = killList
      .select(col(domainCol), col("k").as("__k"))
      .join(broadcast(domains), Seq(domainCol))
    boilerplateRebuild(batch, lines, broadcast(touched), idCol,
      domainCol, textCol)
  }

  /** Occurrence order key for [[repeatedSpans]]: (doc, pos) packed
    * into one long so the globally-first occurrence is a single
    * `min()` in ANY engine (a lexicographic struct-min does the same
    * job in Spark but has no portable SQL twin). Bound: nonnegative
    * doc ids and < 2^21 tokens per document — generous for any
    * pre-chunking corpus (2M tokens ≈ 10 MB of text in one row).
    */
  private val SpanPosCap = 1L << 21

  /** Corpus-wide exact substring dedup — the suffix-array pass of Lee
    * et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022), re-expressed relationally on bounded windows:
    * every k-token window whose exact text occurs 2+ times corpus-wide
    * is a repeated span, and every occurrence EXCEPT the globally
    * first (minimum (doc, pos)) is marked for removal; overlapping and
    * adjacent marked windows merge into maximal per-document spans.
    * Returns (id, span_start, span_end) token-index ranges [start, end)
    * over the document's whitespace tokens.
    *
    * Scale shape: the window explode is map-side and narrow (id, pos,
    * hash — never the window text); the only exchanges are the hash
    * count aggregate (partial+final) and the occurrence join back on
    * the same hash key, which AQE co-plans with the aggregate and
    * skew-splits if one span is repeated by millions of documents (the
    * hot-boilerplate case — its fan-out IS the output). The per-doc
    * island merge shuffles (id, pos) pairs only for repeated windows,
    * a vanishing fraction of the corpus.
    */
  /** The k-token window explode both span passes share: (id, __pos,
    * __h) with __h = md5 of the window's exact text. Map-side and
    * narrow — the window text itself never leaves the stage.
    */
  private def spanWindows(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k >= 2, "window width k must be >= 2")
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val n = size(col("__toks"))
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(n >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), n - k), i =>
          md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))))
        .as(Seq("__pos", "__h")))
  }

  /** Merge a (id, __pos) masked-window set into maximal per-document
    * spans: all windows are k tokens, so a new island starts exactly
    * when the gap to the previous start exceeds k (gaps-and-islands;
    * the running-max end is monotone because widths are equal).
    */
  private def mergeSpanIslands(masked: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    masked
      .withColumn("__prev", lag(col("__pos"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__pos") > col("__prev") + k, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + k).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val wins = spanWindows(docs, idCol, textCol, k)
    val packed = col(idCol) * SpanPosCap + col("__pos")
    val firsts = wins
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"), min(packed).as("__first"))
      .filter(col("__n") > 1)
    val masked = wins.join(firsts, Seq("__h"))
      .filter(packed =!= col("__first"))
      .select(col(idCol), col("__pos"))
    mergeSpanIslands(masked, idCol, k)
  }

  /** Stage a corpus version's distinct k-token window hashes for the
    * incremental/streaming substring-dedup probe — the span-side
    * analogue of [[stageBandKeys]]: the expensive corpus-wide window
    * pass is paid once per corpus version, and every micro-batch
    * probes the staged hashes without re-tokenizing history. The
    * window width is recorded per row so the probe can refuse
    * parameter drift (a k-mismatched probe would silently miss every
    * cross-epoch repeat).
    */
  def stageSpanHashes(docs: DataFrame, idCol: String, textCol: String,
      path: String, k: Int = 8): Unit = {
    spanWindows(docs, idCol, textCol, k)
      .select(col("__h").as("h")).distinct()
      .withColumn("window_k", lit(k))
      .write.mode("overwrite").parquet(path)
  }

  /** Repeated spans for a NEW batch against a staged corpus version
    * ([[stageSpanHashes]] output) — the incremental continuation of
    * [[repeatedSpans]]: a batch window masks out when its exact text
    * already occurs in the staged corpus (whose own first occurrence
    * is the canonical copy) OR is an all-but-first repeat INSIDE the
    * batch. When every batch id sorts after every staged id — the
    * steady-state ingest invariant — the result equals the full-pass
    * [[repeatedSpans]] over (corpus ∪ batch) restricted to batch ids,
    * which is how the spec pins it.
    *
    * Scale shape (the minhash touched-bucket lesson, VERDICT r9 task
    * 5): the staged table is never shuffled — the batch's own distinct
    * window hashes broadcast as a semi-join filter onto the staged
    * scan, and the surviving (batch-touched) hash set broadcasts back
    * onto the batch windows, so per-tick cost scales with the BATCH,
    * not the corpus age. Parameter drift against the staged `window_k`
    * metadata is refused via an `observe` metric on that same filtered
    * scan — zero extra jobs.
    */
  def repeatedSpansIncremental(batch: DataFrame, idCol: String,
      textCol: String, k: Int, stagedHashes: DataFrame): DataFrame = {
    val wins = spanWindows(batch, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var knownCache: Option[DataFrame] = None
    try {
      wins.count() // materialize before multi-branch use
      val kObs =
        if (stagedHashes.columns.contains("window_k"))
          Some(new org.apache.spark.sql.Observation())
        else None
      val stagedChecked = kObs match {
        case Some(o) => stagedHashes.observe(o,
          min(col("window_k")).as("k_min"),
          max(col("window_k")).as("k_max"),
          count(lit(1)).as("k_rows"))
        case None => stagedHashes
      }
      val touched = wins.select(col("__h")).distinct()
      val known = stagedChecked.select(col("h").as("__h"))
        .join(broadcast(touched), Seq("__h"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      knownCache = Some(known)
      // a DATASET-level action: it both materializes the probe set and
      // fires the observe metrics (an RDD-level materialization like
      // localCheckpoint never publishes them — no SQL execution event)
      known.count()
      kObs.foreach { o =>
        // the count above ran the staged scan synchronously, so the
        // metrics complete momentarily — but they publish on an async
        // listener, AND AQE's replan can drop the CollectMetrics node
        // from the probe query altogether (observed: the Observation
        // completes with an EMPTY map). Bounded wait, then whenever
        // the metrics are absent for ANY reason fall back to a
        // dedicated aggregate over the staged table (the minhash
        // incremental convention) — never a bare blocking get, never
        // a silently skipped validation
        val observed: Map[String, Any] =
          try {
            scala.concurrent.Await.ready(o.future,
              scala.concurrent.duration.Duration(30, "seconds"))
            o.get
          } catch {
            case _: java.util.concurrent.TimeoutException => Map.empty
          }
        val m: Map[String, Any] =
          if (observed.contains("k_rows")) observed
          else {
            val r = stagedHashes.agg(
              min(col("window_k")).as("k_min"),
              max(col("window_k")).as("k_max"),
              count(lit(1)).as("k_rows")).head()
            Map("k_min" -> r.get(0), "k_max" -> r.get(1),
              "k_rows" -> r.getLong(2))
          }
        (m.get("k_rows"), m.get("k_min"), m.get("k_max")) match {
          case (Some(rows: Long), Some(lo: Int), Some(hi: Int))
              if rows > 0L =>
            require(lo == k && hi == k,
              s"staged span hashes were built with window_k in [$lo, $hi]" +
                s" but the probe uses k=$k — restage or match the width")
          case _ => () // empty staging: nothing to drift against
        }
      }
      val histMask = wins.join(broadcast(known), Seq("__h"))
        .select(col(idCol), col("__pos"))
      // intra-batch all-but-first, the same rule the full pass applies
      val packed = col(idCol) * SpanPosCap + col("__pos")
      val firsts = wins
        .groupBy(col("__h"))
        .agg(count(lit(1)).as("__n"), min(packed).as("__first"))
        .filter(col("__n") > 1)
      val batchMask = wins.join(firsts, Seq("__h"))
        .filter(packed =!= col("__first"))
        .select(col(idCol), col("__pos"))
      val spans = mergeSpanIslands(
          histMask.unionByName(batchMask).distinct(), idCol, k)
        .localCheckpoint(true) // the caller composes this with the
                               // batch text cut; unpersisting the
                               // intermediates below must not strand
                               // the lineage
      spans
    } finally {
      wins.unpersist(false)
      knownCache.foreach(_.unpersist(false))
    }
  }

  /** [[substringDedup]]'s incremental/streaming twin: the new batch
    * with every span already present in the staged corpus version
    * ([[stageSpanHashes]]) — or repeated inside the batch — cut out.
    * Mount inside `foreachBatch` for the continuously-ingesting shape.
    */
  def substringDedupIncremental(batch: DataFrame, idCol: String,
      textCol: String, k: Int, stagedHashes: DataFrame): DataFrame =
    substringDedupBySpans(batch, idCol, textCol, k,
      repeatedSpansIncremental(batch, idCol, textCol, k, stagedHashes))

  /** [[repeatedSpans]] applied: documents with every repeated span
    * (all-but-first occurrence) cut out, tokens rejoined by single
    * spaces — compose after [[TextOps.cleanText]], which already
    * normalizes whitespace, and the rejoin is lossless. Docs that lose
    * nothing pass through verbatim (modulo that normalization); docs
    * shorter than k tokens are untouched by construction.
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame =
    substringDedupBySpans(docs, idCol, textCol, k,
      repeatedSpans(docs, idCol, textCol, k))

  /** [[substringDedup]] over a PRECOMPUTED span table — the staged
    * operating mode: at scale the span table is written once per
    * corpus version (it is the expensive corpus-wide pass) and both
    * the audit read and the rebuild consume it.
    */
  def substringDedupBySpans(docs: DataFrame, idCol: String,
      textCol: String, k: Int, spans: DataFrame): DataFrame = {
    val spanArr = spans
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs.select(col(idCol), toks.as("__toks"))
      .join(spanArr, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          filter(
            transform(col("__toks"), (t, i) =>
              when(exists(coalesce(col("__spans"),
                  array().cast("array<struct<s:long,e:long>>")),
                sp => i >= sp.getField("s") && i < sp.getField("e")),
                lit(null)).otherwise(t)),
            t => t.isNotNull),
          " ").as(textCol))
  }

  /** Benchmark decontamination report: per document, the number of
    * distinct k-shingles it shares with an evaluation corpus, and a
    * contamination flag — the standard pre-training scrub that keeps
    * test benchmarks out of the training mix.
    *
    * Scale shape: eval sets are small by construction (benchmarks are
    * thousands of documents, the corpus is billions), so the eval
    * shingle set broadcasts and the overlap test is a map-side
    * broadcast semi-join against the exploded doc shingles — the
    * corpus never shuffles its text. The only exchanges carry
    * (id, count) for documents with at least one hit, and the final
    * enrich join's build side is that same small hit set (AQE
    * broadcasts it). Set `broadcastEval = false` if the eval side ever
    * outgrows the broadcast budget — the same plan runs as a shuffle
    * semi-join.
    */
  def contaminationReport(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      broadcastEval: Boolean = true): DataFrame = {
    val docSh = docs.select(col(idCol),
      explode(array_distinct(TextOps.shingles(col(textCol), k)))
        .as("__sh"))
    val evalSh = evalDocs.select(
      explode(array_distinct(TextOps.shingles(col(textCol), k)))
        .as("__sh")).distinct()
    val evalSide = if (broadcastEval) broadcast(evalSh) else evalSh
    // docSh is distinct per doc, so the semi-join survivor count IS
    // the distinct overlapping-shingle count
    val hits = docSh.join(evalSide, Seq("__sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_eval_hits"))
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        (coalesce(col("n_eval_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** [[contaminationReport]]'s scale path for eval sets too large to
    * broadcast as a raw shingle set: a Bloom-filter prefilter in front
    * of an exact verify, with identical output.
    *
    * Two-stage shape:
    * 1. Build a [[org.apache.spark.util.sketch.BloomFilter]] over the
    *    distinct eval shingles (`stat.bloomFilter` — per-partition
    *    sketches OR-merged treewise to the driver, so the driver holds
    *    O(bits), never O(items); at 1% fpp that is ~1.2 bytes per
    *    shingle vs tens of bytes for the broadcast set, and `fpp` is
    *    the size knob beyond that).
    * 2. Probe the corpus shingles map-side with the codegen'd
    *    [[graft.functions.BloomExpression.mightContain]] — the 100 TB
    *    side discards ~all clean shingles at scan speed with ZERO
    *    exchange — then exact-verify only the sketch survivors with a
    *    shuffle semi-join against the true eval set. False positives
    *    die in the verify, so the report is exact, but the shuffle
    *    carries only (hit-candidate shingle, id) rows: fpp × corpus +
    *    true overlap, not the corpus.
    *
    * `expectedItems <= 0` sizes the sketch from a count of the eval
    * side (one extra tiny job over eval only — never over the corpus).
    */
  def contaminationReportBloom(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val evalSh = evalDocs.select(
      explode(array_distinct(TextOps.shingles(col(textCol), k)))
        .as("__sh")).distinct()
    val n = if (expectedItems > 0) expectedItems
      else math.max(evalSh.count(), 64L)
    val bloom = evalSh.stat.bloomFilter("__sh", n, fpp)
    val docSh = docs.select(col(idCol),
      explode(array_distinct(TextOps.shingles(col(textCol), k)))
        .as("__sh"))
    val candidates = docSh.filter(
      graft.functions.BloomExpression.mightContain(col("__sh"), bloom))
    val hits = candidates.join(evalSh, Seq("__sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_eval_hits"))
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        (coalesce(col("n_eval_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Embedding-cosine near-dup pairs above `threshold`, using the
    * random-hyperplane LSH bucketing from [[Similarity]] to avoid the
    * n² cross join; exact cosine verifies candidates.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8): DataFrame =
    // threshold pushed into the candidate generator: the quadratic
    // per-bucket scored stream never crosses a shuffle at full width
    Similarity.lshCandidatePairs(df, idCol, vecCol, planes,
      minCosine = Some(threshold))

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): semantic near-dup
    * pairs via cluster-scoped exact cosine. Every vector is assigned
    * to its nearest centroid (argmax cosine, ties to the lowest
    * centroid index — [[graft.functions.CentroidTopIds]]'s fused
    * loop), and pairs are compared only WITHIN a cluster. Centroids
    * here are the `nlist` lowest-id vectors — a deterministic,
    * engine-replayable seed; production passes Lloyd-refined
    * centroids from [[Similarity.refineCentroids]] and nothing else
    * changes (assignment, join and policy are centroid-agnostic).
    *
    * Scale shape: assignment is map-side against a broadcast
    * nlist×dim matrix; the only exchange keys on the cluster id. The
    * per-cluster pairing is quadratic BY DESIGN — the paper's
    * operating point scales nlist with the corpus (they run ~10^5
    * clusters web-scale) so clusters stay ~n/nlist members, and AQE
    * skew-splits any cluster the embedding space overloads.
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 8): DataFrame = {
    require(nlist > 0, "nlist must be positive")
    // Fail at plan time with a named-column error, not a runtime
    // ClassCastException deep in a collect: the downstream expressions
    // (CentroidTopIds, CosineSimilarity) accept float AND double
    // vectors, so this entry point must too.
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.DoubleType, _) => ()
      case t => throw new IllegalArgumentException(
        s"$vecCol must be array<float|double>, got ${t.catalogString}")
    }
    // a null embedding can neither seed a centroid (driver-side NPE)
    // nor pair with anything — same contract as the text family's
    // null-text handling: null rows simply never dedup
    val clean = df.filter(col(vecCol).isNotNull)
    val cents: Seq[Seq[Float]] = clean.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nlist)
      .collect().map(_.getSeq[Number](1).map(_.floatValue()).toSeq)
      .toSeq // nlist×dim driver rows; Number covers float and double
    // fewer than one non-null vector: no centroids, no clusters, no
    // pairs — return the (empty) result instead of tripping
    // CentroidTopIds' n <= matrix.length precondition
    if (cents.isEmpty)
      return clean.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0.0).as("cosine")).limit(0)
    val assigned = clean.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      element_at(graft.functions.VectorExpressions.centroidTopIds(
        col(vecCol), cents, 1), 1).as("__c"))
    val a = assigned.select(col("__c"), col("__id").as("id_a"),
      col("__v").as("__va"))
    val b = assigned.select(col("__c"), col("__id").as("id_b"),
      col("__v").as("__vb"))
    a.join(b, Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.functions.VectorExpressions.cosine(
        col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** [[semanticNearDupPairs]] with the greedy min-id survivor rule —
    * one representative per semantic-duplicate pair group, the
    * SemDeDup curation step (the paper keeps the member farthest from
    * the centroid; the survivor rule is a pluggable one-liner and
    * min-id is this library's convention across dedup families).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 8): DataFrame =
    dedupGreedyByPairs(df, idCol,
      semanticNearDupPairs(df, idCol, vecCol, threshold, nlist))

  /** Exact set-similarity join (AllPairs/PPJoin prefix filtering):
    * all (left, right) id pairs whose DISTINCT-element sets have
    * Jaccard >= `minJaccard`, without a cross product — the exact,
    * deterministic sibling of [[minhashNearDupPairs]] (which trades
    * exactness for a bounded signature at extreme scale).
    *
    * Losslessness: J(A,B) >= τ implies |A∩B| >= ceil(τ·max(|A|,|B|)),
    * so ordering every set's elements by global frequency (rare
    * first) and keeping each set's first |s| − ceil(τ·|s|) + 1 makes
    * "some kept element collides" a complete candidate generator —
    * and it collides on RARE elements, so bucket products stay small
    * where an any-element join explodes on stopwords. A 1e-9 slack on
    * the ceil keeps float rounding from ever SHORTENING a prefix
    * (one extra candidate beats one lost pair). Size filter
    * `τ·|A| <= |B| <= |A|/τ` prunes before the exact verify.
    *
    * Input sides carry (id, array-of-tokens) — callers tokenize
    * ([[TextOps.tokens]] / [[TextOps.shingles]]); duplicates inside
    * the array are collapsed (set semantics). Empty sets match
    * nothing. Returns (leftId, rightId, jaccard).
    */
  def jaccardJoin(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, leftSet: String, rightSet: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0, 1], got $minJaccard")
    require(Set(leftId, leftSet, rightId, rightSet).size == 4,
      "left/right id and set column names must be pairwise distinct")
    def prefixLen(n: Column): Column =
      n - ceil(lit(minJaccard) * n - lit(1e-9)).cast("long") + 1L
    def side(df: DataFrame, id: String, s: String, n: String) = df
      .select(col(id), array_distinct(col(s)).as("__set"))
      .filter(size(col("__set")) > 0)
      .withColumn(n, size(col("__set")).cast("long"))
    val ls = side(left, leftId, leftSet, "__ln")
    val rs = side(right, rightId, rightSet, "__rn")
    // (id, size, element) only — the set array must not ride the
    // prefix machinery's exchanges; verify joins it back by id
    def elems(df: DataFrame, id: String, n: String) = df
      .select(col(id), col(n), explode(col("__set")).as("__e"))
    val freq = elems(ls, leftId, "__ln").select(col("__e"))
      .unionAll(elems(rs, rightId, "__rn").select(col("__e")))
      .groupBy(col("__e")).agg(count(lit(1)).as("__ef"))
    def prefix(df: DataFrame, id: String, n: String) = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("__ef").asc, col("__e").asc)
      elems(df, id, n).join(freq, Seq("__e"))
        .withColumn("__rn_p", row_number().over(w))
        .filter(col("__rn_p") <= prefixLen(col(n)))
        .select(col(id), col("__e"))
    }
    val candidates = prefix(ls, leftId, "__ln")
      .join(prefix(rs, rightId, "__rn"), Seq("__e"))
      .select(col(leftId), col(rightId)).distinct()
    candidates
      .join(ls.select(col(leftId), col("__set").as("__lset"),
        col("__ln")), Seq(leftId))
      .join(rs.select(col(rightId), col("__set").as("__rset"),
        col("__rn")), Seq(rightId))
      .filter(lit(minJaccard) * col("__ln") <= col("__rn") + lit(1e-9) &&
        lit(minJaccard) * col("__rn") <= col("__ln") + lit(1e-9))
      .withColumn("__inter",
        size(array_intersect(col("__lset"), col("__rset"))).cast("long"))
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("__ln") + col("__rn") - col("__inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col(leftId), col(rightId), col("jaccard"))
  }

  /** Distinct character q-grams of a string as an array (empty when
    * the string is shorter than q).
    */
  private def qgrams(s: Column, q: Int): Column =
    when(length(s) < q, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(s) - (q - 1)),
        i => s.substr(i, lit(q)))))

  /** Edit-distance similarity join (ED-Join-style): all (left, right)
    * pairs with `levenshtein(leftStr, rightStr) <= maxDist`, WITHOUT
    * the cross product — the fuzzy-match primitive behind entity
    * resolution and typo-tolerant dedup.
    *
    * Candidate generation is PREFIX FILTERING over globally-ordered
    * q-grams (Xiao et al., ED-Join): one edit changes at most q
    * distinct grams, so strings within distance d share
    * `>= max(|G(a)|,|G(b)|) - d·q` grams; ordering every string's
    * grams by global document frequency (rare first) and keeping only
    * the first `d·q + 1` makes "some kept gram collides" a LOSSLESS
    * filter — and collides on RARE grams, so bucket sizes stay small
    * where a naive any-gram join would explode on stopword grams.
    * Strings with `|G| <= 2·d·q` (too short / too repetitive for the
    * count bound) pair within one dedicated bucket instead; any
    * within-distance pair involving a `|G| <= d·q` string lands
    * there, because its partner can have at most `d·q` extra grams.
    *
    * Plan shape, all partial-aggregated equi-joins — no theta join
    * anywhere. The ENTIRE gram/prefix/verify pipeline runs over
    * DISTINCT strings (real corpora — and TPC-H-ish part names — are
    * duplicate-heavy; id-level blocking would re-verify every
    * duplicate pair): gram explode (map-side) → frequency count (one
    * exchange of (gram, partial count)) → per-string rare-prefix pick
    * (window over the string's own <= |G| grams) → gram equi-join →
    * candidate `distinct` → length-difference prefilter → one
    * `levenshtein` per surviving DISTINCT-STRING pair → two hash
    * joins expand matched string pairs back to ids. At 100 TB the
    * verify cost is Σ per-gram bucket products over RARE grams of
    * distinct strings only.
    *
    * Returns (leftId, rightId, dist), dist <= maxDist.
    */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, leftStr: String, rightStr: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 2, "q-gram size must be >= 2")
    require(Set(leftId, leftStr, rightId, rightStr).size == 4,
      "left/right id and string column names must be pairwise distinct " +
        "(rename before joining)")
    val prefixLen = maxDist * q + 1
    val shortG = 2 * maxDist * q // |G| at or below this → short bucket
    val SHORT = " __graft_short__" // leading space: not a real gram shape
    // a short/repetitive string emits the bucket token IN ADDITION to
    // its grams: within distance d, a partner of a |G| <= d*q string
    // has |G| <= 2*d*q (so both emit SHORT and collide there), while a
    // |G| in (d*q, 2*d*q] string can still meet a normal partner
    // through the gram path -- dropping its grams would lose pairs
    def sideGrams(df: DataFrame, s: String, out: String) = {
      val base = df.filter(col(s).isNotNull)
        .select(col(s).as(out)).distinct()
        .select(col(out), qgrams(col(out), q).as("__gs"))
      base.select(col(out), explode(col("__gs")).as("__g"))
        .unionAll(base.filter(size(col("__gs")) <= shortG)
          .select(col(out), lit(SHORT).as("__g")))
    }
    val gl = sideGrams(left, leftStr, "__lstr")
    val gr = sideGrams(right, rightStr, "__rstr")
    // global gram rarity over BOTH sides; the short bucket is exempt
    val freq = gl.select(col("__g"))
      .unionAll(gr.select(col("__g")))
      .filter(col("__g") =!= SHORT)
      .groupBy(col("__g")).agg(count(lit(1)).as("__gf"))
    def rarePrefix(grams: DataFrame, strCol: String) = {
      // SHORT rows carry no freq -> sorted last (never consuming a
      // prefix slot), passing the filter via the explicit bypass
      val w = Window.partitionBy(col(strCol))
        .orderBy(coalesce(col("__gf"), lit(Long.MaxValue)).asc,
          col("__g").asc)
      grams.join(freq, Seq("__g"), "left")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__g") === SHORT || col("__rn") <= prefixLen)
        .select(col(strCol), col("__g"))
    }
    val matched = rarePrefix(gl, "__lstr")
      .join(rarePrefix(gr, "__rstr"), Seq("__g"))
      .select(col("__lstr"), col("__rstr"))
      .distinct()
      // length prefilter: cheap, removes most candidates before the
      // O(len²) levenshtein
      .filter(abs(length(col("__lstr")) - length(col("__rstr")))
        <= maxDist)
      .withColumn("dist", levenshtein(col("__lstr"), col("__rstr")))
      .filter(col("dist") <= maxDist)
    // expand matched DISTINCT-string pairs back to ids: two hash
    // equi-joins on the string value (the matched side is small —
    // AQE broadcasts it while it fits)
    matched
      .join(left.select(col(leftId), col(leftStr)),
        col("__lstr") === col(leftStr))
      .join(right.select(col(rightId), col(rightStr)),
        col("__rstr") === col(rightStr))
      .select(col(leftId), col(rightId), col("dist"))
  }

  /** Entity resolution over a fuzzy string key — the record-linkage
    * composition of the library's own primitives: [[editDistanceJoin]]
    * (prefix-filtered blocking + levenshtein verify, never a cross
    * product) builds the match graph, [[connectedComponents]] (FastSV,
    * O(log n) rounds on any graph shape) closes transitive chains —
    * A~B~C is one entity even when A and C differ by `2·maxDist` —
    * and each record gets its component's minimum id as `entity_id`.
    * Records matching nothing resolve to themselves. Output: every
    * record column plus `entity_id`.
    *
    * Resolution runs on the DISTINCT-NAME graph, not the record
    * graph: each distinct string becomes ONE node labeled with its
    * min record id, edges come from the string-level fuzzy join, and
    * records attach to their name's component by an equi-join at the
    * end. Semantics are identical (min over per-name minima is the
    * global component minimum; identical names unify through the
    * shared node), but the cost model is not: duplicate-heavy corpora
    * (real entity tables are — measured here, 20k part rows share 64
    * names) would otherwise expand every matched string pair back to
    * id level, materializing a C(n,2) clique per duplicate group —
    * 4.6M pairs from 22k records in the first cut, with the closure
    * then iterating over them. The name graph has one node per
    * distinct string regardless of duplication.
    *
    * NULL-name records carry no identity evidence, so each resolves
    * to ITSELF (`entity_id = idCol`) — they never fuzzy-match
    * anything and, unlike equal non-null names, two NULLs do NOT
    * unify (ADVICE r12: the inner attach join used to drop them
    * silently).
    */
  def resolveEntities(records: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    // same collision guard as the serving arm (ADVICE r13): the
    // nullNamed branch withColumn's "entity_id", so pre-existing input
    // columns of that name would yield duplicate/ambiguous columns and
    // an opaque analysis error instead of this clear refusal
    require(!records.columns.contains("entity_id"),
      "records already has an 'entity_id' column — the output entity " +
        "column would collide; rename it first")
    val outCols = records.columns.map(col) :+ col("entity_id")
    val nullNamed = records.filter(col(strCol).isNull)
      .withColumn("entity_id", col(idCol))
      .select(outCols: _*)
    val named = records.filter(col(strCol).isNotNull)
    val names = named.groupBy(col(strCol))
      .agg(min(col(idCol)).as("__graft_er_rep"))
      .localCheckpoint(true) // feeds both join sides + the attach
    val right = names.select(col("__graft_er_rep").as("__graft_er_rid"),
      col(strCol).as("__graft_er_str"))
    val pairs = editDistanceJoin(names, right, "__graft_er_rep",
        "__graft_er_rid", strCol, "__graft_er_str", maxDist, q)
      .filter(col("__graft_er_rep") < col("__graft_er_rid"))
      .select(col("__graft_er_rep").as("id_a"),
        col("__graft_er_rid").as("id_b"))
    val comp = connectedComponents(pairs)
      .select(col("id").as("__graft_er_rep"), col("component"))
    val nameEntity = names.join(comp, Seq("__graft_er_rep"), "left")
      .select(col(strCol),
        coalesce(col("component"), col("__graft_er_rep"))
          .as("entity_id"))
    named.join(nameEntity, Seq(strCol))
      .select(outCols: _*)
      .unionByName(nullNamed)
  }

  /** The SERVING arm of [[resolveEntities]] — incremental entity
    * assignment against a FROZEN resolved registry (the staged-bands /
    * frozen-BPE convention: the corpus-wide resolution is paid once
    * per registry version; every ingest tick assigns new records
    * against it without re-resolving history): each batch record gets
    * the minimum `entity_id` among registry entries within
    * `maxDist` of its string (ties to the smallest — deterministic);
    * names matching nothing become PROVISIONAL entities labeled with
    * the batch's minimum record id for that exact string (so
    * identical novel strings in one tick share one provisional
    * entity), to be folded in at the next registry rebuild. Batch
    * records do NOT fuzzy-link to each other — deliberate serving
    * semantics (two novel near-twins in one tick stay separate
    * provisional entities; the rebuild merges them), keeping the tick
    * cost batch×registry, never batch².
    *
    * Scale shape: one [[editDistanceJoin]] of batch names against
    * registry names (rare-gram blocking, both sides distinct-string),
    * one min aggregate, one attach join — per-tick cost scales with
    * the batch and the registry's DISTINCT names.
    *
    * The OUTPUT column is named `entityCol` (the registry's own
    * convention — output unions cleanly with the registry at the
    * next rebuild); `records` must not already carry a column of
    * that name. NULL-name batch records match nothing by definition
    * and become per-RECORD provisional entities (`entityCol =
    * idCol`) — NULL is not a name, so two NULL-named records do not
    * share a provisional entity the way identical novel strings do
    * (ADVICE r12: the inner fallback join used to drop them).
    */
  def resolveEntitiesAgainst(records: DataFrame, registry: DataFrame,
      idCol: String, strCol: String, entityCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(!records.columns.contains(entityCol),
      s"records already has a '$entityCol' column — the output entity " +
        "column would collide; rename one side")
    val outCols = records.columns.map(col) :+ col(entityCol)
    val nullNamed = records.filter(col(strCol).isNull)
      .withColumn(entityCol, col(idCol))
      .select(outCols: _*)
    val named = records.filter(col(strCol).isNotNull)
    val regNames = registry
      .select(col(strCol).as("__graft_era_str"), col(entityCol))
      .groupBy(col("__graft_era_str"))
      .agg(min(col(entityCol)).as("__graft_era_ent"))
    val names = named.select(col(strCol)).distinct()
      .select(col(strCol), col(strCol).as("__graft_era_key"))
    val matched = editDistanceJoin(names, regNames,
      "__graft_era_key", "__graft_era_ent", strCol, "__graft_era_str",
      maxDist, q)
    val assigned = matched
      .groupBy(col("__graft_era_key").as(strCol))
      .agg(min(col("__graft_era_ent")).as("__graft_era_best"))
    val fallback = named.groupBy(col(strCol))
      .agg(min(col(idCol)).as("__graft_era_self"))
    named.join(assigned, Seq(strCol), "left")
      .join(fallback, Seq(strCol))
      .withColumn(entityCol,
        coalesce(col("__graft_era_best"), col("__graft_era_self")))
      .select(outCols: _*)
      .unionByName(nullNamed)
  }

  /** Content-defined chunking (the FastCDC/rsync family): split each
    * document at positions where the hash of the `window`-char
    * context is ≡ 0 mod `divisor` — boundaries are decided by the
    * CONTENT, not by offsets, so a shared region chunks identically
    * in two documents even when an insertion shifts it (fixed-size
    * chunking would misalign every block after the edit). The
    * chunk-hash join is then the cross-crawl/cross-snapshot
    * shared-region detector fixed-stride shingling cannot be:
    * expected chunk length ≈ `divisor` chars, tunable independently
    * of the window.
    *
    * Boundary hash = leading 32 md5 bits of the window (the engine's
    * portable hash family); a boundary at position i starts a new
    * chunk AT i (i ∈ [2, n−window+1]; position 1 always starts chunk
    * 0). Output: (idCol, chunk_no 0-based, start 1-based, chunk_len,
    * chunk_md5) — one row per chunk; empty/null documents produce no
    * rows. Entirely ROW-LOCAL (HOF transform + explode — no exchange,
    * no state), so it scales embarrassingly; the md5-per-position
    * cost is the [[graft.operators.Similarity.randomProject]]
    * trade — replayable everywhere now, a rolling-hash codegen
    * kernel when profiles demand it.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 16): DataFrame = {
    require(window > 0, "window must be positive")
    require(divisor > 0, "divisor must be positive")
    // one fused kernel per document: boundary scan + per-chunk md5
    // over a single char-offset table ([[cdcChunksBuiltin]] is the
    // bit-identical composed reference)
    docs.filter(length(col(textCol)) > 0)
      .select(col(idCol),
        explode(graft.functions.TextExpressions.cdcChunkRows(
          col(textCol), window, divisor)).as("_c"))
      .select(col(idCol),
        col("_c.chunk_no"), col("_c.start"), col("_c.chunk_len"),
        col("_c.chunk_md5"))
  }

  /** Shared-region detection over [[cdcChunks]] — what the chunking
    * exists FOR: document pairs sharing ≥ `minShared` distinct chunk
    * hashes, i.e. pairs with substantial verbatim regions in common
    * even when insertions shifted them (the cross-crawl / cross-
    * snapshot near-dup signal fixed-stride shingling misses).
    * `minChunkLen` drops sub-window slivers whose collisions are
    * noise, and — like every bucket join in this module — the
    * equi-join on the chunk hash costs Σ|bucket|²: a chunk shared by
    * b documents contributes b² candidate pairs, so corpus-wide
    * boilerplate chunks are the hazard; at scale apply the
    * [[minhashNearDupPairs]] `maxBucket` guard (drop chunks shared by
    * more documents than any real duplicate cluster — they are
    * boilerplate by definition, exactly the C4 line-dedup argument).
    * Output: (id_a, id_b, n_shared), id_a < id_b.
    */
  def cdcSharedRegions(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 16, minShared: Int = 2,
      minChunkLen: Int = 1): DataFrame = {
    val chunks = cdcChunks(docs, idCol, textCol, window, divisor)
      .filter(col("chunk_len") >= minChunkLen)
      .select(col(idCol), col("chunk_md5")).distinct()
    val a = chunks.select(col(idCol).as("id_a"), col("chunk_md5"))
    val b = chunks.select(col(idCol).as("id_b"), col("chunk_md5"))
    a.join(b, Seq("chunk_md5"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Composed built-in formulation of [[cdcChunks]] (starts kernel +
    * get/substr/md5 expressions) — the differential reference for the
    * fully fused [[graft.functions.CdcChunkRows]] kernel.
    */
  def cdcChunksBuiltin(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 16): DataFrame = {
    val text = col(textCol)
    val n = length(text)
    val starts = cdcStartsBuiltin(text, window, divisor)
    // next chunk's start bounds this one; the last chunk runs to n.
    // get() (0-based, null out of range) keeps the lookup ANSI-safe
    val chunks = transform(starts, (s, idx) => struct(
      idx.as("chunk_no"), s.as("start"),
      (coalesce(get(starts, idx + 1), n + 1) - s).as("chunk_len")))
    docs.filter(n > 0)
      .select(col(idCol), text.as("_t"), explode(chunks).as("_c"))
      .select(col(idCol),
        col("_c.chunk_no"), col("_c.start"), col("_c.chunk_len"),
        md5(col("_t").substr(col("_c.start"), col("_c.chunk_len")))
          .as("chunk_md5"))
  }

  /** Reference formulation of [[cdcChunks]]'s boundary scan via
    * built-in expressions — the differential check for the fused
    * [[graft.functions.CdcStarts]] kernel (the `pqSqDistBuiltin`
    * precedent): same starts array (leading 1 included), each
    * boundary decided by conv(substring(md5(substr(i, window))))
    * mod `divisor`.
    */
  def cdcStartsBuiltin(text: Column, window: Int, divisor: Int): Column = {
    val n = length(text)
    def boundary(i: Column): Column =
      conv(substring(md5(text.substr(i, lit(window))), 1, 8), 16, 10)
        .cast("long") % divisor === 0
    val lastCand = n - window + 1
    val bounds = when(lastCand >= 2,
        filter(transform(sequence(lit(2), lastCand),
          i => when(boundary(i), i).otherwise(lit(null))),
          x => x.isNotNull))
      .otherwise(array().cast("array<int>"))
    concat(array(lit(1)), bounds)
  }
}
