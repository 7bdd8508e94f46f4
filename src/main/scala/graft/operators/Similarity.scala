package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over embedding columns (SURVEY §2.10):
  * brute-force cosine top-k as the exact baseline; random-hyperplane
  * LSH bucketing as the scale path.
  *
  * Scale design (100 TB / billions of vectors):
  *  - The scorer is a codegen'd Catalyst expression
  *    ([[VectorExpressions.cosine]]): one fused loop per pair, no
  *    interpreted higher-order lambdas in the hot path.
  *  - Brute force broadcasts the (small) query set and aggregates with
  *    a bounded top-k ([[VectorExpressions.topKByScore]]): map-side
  *    partial aggregation keeps k candidates per partition per query,
  *    so the shuffle carries O(queries × partitions × k) rows — never
  *    the full corpus×queries score matrix.
  *  - LSH buckets on sign-patterns of random hyperplane projections:
  *    candidate generation is a bucket-key equi-join (hash shuffle on
  *    the bucket key), cost Σ|bucket|² instead of n².
  */
object Similarity {

  /** L2-normalize a vector column. Two-step projection on purpose: the
    * norm is computed ONCE into its own column and the per-element
    * lambda references that attribute — embedding the norm expression
    * inside the lambda would re-evaluate the full reduction per
    * element (the interpreted-HOF trap).
    */
  def withL2Normalized(df: DataFrame, vecCol: String,
      outCol: String): DataFrame = {
    require(!df.columns.contains("__norm") && !df.columns.contains(outCol),
      s"input already has a __norm or $outCol column")
    val norm = sqrt(aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    df.withColumn("__norm", norm)
      .withColumn(outCol,
        when(col("__norm") === 0, col(vecCol).cast("array<double>"))
          .otherwise(transform(col(vecCol),
            x => x.cast("double") / col("__norm"))))
      .drop("__norm")
  }

  /** Symmetric int8 scalar quantization: per-vector scale = 127/max|x|,
    * q_i = floor(x_i·scale + 0.5). floor(+0.5) rather than round():
    * half-rounding conventions differ across engines, floor is
    * bit-portable — the quantized codes hash-match any engine
    * computing the same formula. Adds (scale, int codes); dequantize
    * error is bounded by 0.5/scale per element.
    */
  def withQuantizedInt8(df: DataFrame, vecCol: String): DataFrame = {
    require(Seq("__maxabs", "q_scale", "q_codes")
      .forall(c => !df.columns.contains(c)),
      "input already has a __maxabs/q_scale/q_codes column")
    val maxAbs = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    df.withColumn("__maxabs", maxAbs)
      .withColumn("q_scale",
        when(col("__maxabs") === 0, 0.0)
          .otherwise(lit(127.0) / col("__maxabs")))
      .withColumn("q_codes",
        transform(col(vecCol), x =>
          floor(x.cast("double") * col("q_scale") + 0.5).cast("int")))
      .drop("__maxabs")
  }

  /** Inverse of [[withQuantizedInt8]]: x̂_i = q_i / scale. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    when(scale === 0, transform(codes, _ => lit(0.0d)))
      .otherwise(transform(codes, q => q.cast("double") / scale))

  /** Product-quantization encode (Jégou et al. 2011, the IVF-PQ
    * compression arm): split each `dim`-vector into `subspaces`
    * contiguous subvectors and replace each with the code of its
    * nearest codebook entry (squared L2) — `subspaces` small codes
    * instead of `dim` floats, the memory trick that makes
    * billion-vector ANN fit a cluster.
    *
    * The codebook here is SEED-BASED and deterministic: the
    * `codebookSize` vectors with the smallest ids, codes assigned in
    * id order (0-based) — the k-means++-free variant an independent
    * engine can replay exactly, which is what makes the operator
    * oracle-checkable; Lloyd refinement of the same seeds is what
    * [[ivfTopK]]'s trainer adds when recall matters more than
    * replayability (spec-pinned there, same assignment step).
    *
    * Numeric portability: each per-position squared difference is
    * bit-identical in double on any engine (float subtraction is
    * exact in double; one IEEE multiply rounds identically), is
    * round()ed to 12 dp — both engines half-up the same double — and
    * carried as DECIMAL(28,12), so the distance sum is EXACT and
    * order-independent (the [[mixtureWeights]] round-then-decimal
    * precedent) and the argmin (ties → smaller code) has no float
    * boundary at all.
    *
    * Output: one row per (idCol, subspace, code) — the flat form the
    * oracle hashes; pack to an array column downstream if a struct
    * per vector is wanted.
    *
    * At 100 TB: the codebook is `codebookSize`×`subspaces` subvector
    * rows — broadcast forever (the driver holds `codebookSize` seed
    * rows, the bounded-collect contract [[ivfTopK]]'s centroids
    * already use); the corpus explodes ×`subspaces` within its own
    * stage, the only exchange carries (id, subspace, code) — never
    * vectors.
    */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, subspaces: Int, codebookSize: Int): DataFrame = {
    require(dim > 0 && subspaces > 0 && dim % subspaces == 0,
      s"dim $dim must be a positive multiple of subspaces $subspaces")
    require(codebookSize > 0, "codebookSize must be positive")
    val sd = dim / subspaces
    pqEncodeWith(vecs, idCol, vecCol, subspaces, sd,
      pqCodebookSubs(vecs, idCol, vecCol, subspaces, sd, codebookSize))
  }

  /** FROZEN PQ codebook — the train-once split ([[pqEncode]] derives
    * it internally; production trains per corpus version and reuses):
    * (code, vector) rows, `codebookSize` of them, buildable offline
    * and broadcast at every later encode. The deterministic seed rule
    * (smallest ids, 0-based codes in id order) makes two builds from
    * the same corpus identical.
    */
  def pqCodebook(vecs: DataFrame, idCol: String, vecCol: String,
      codebookSize: Int): DataFrame = {
    require(codebookSize > 0, "codebookSize must be positive")
    // the collect below reads Seq[Float]; an array<double> corpus
    // would ClassCastException deep inside createDataFrame — name the
    // problem at plan time instead
    vecs.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => ()
      case other => throw new IllegalArgumentException(
        s"pq codebook requires $vecCol: array<float>, got " +
          other.simpleString + " (cast the vectors before encoding)")
    }
    // a null vector among the smallest ids would NPE the build — a
    // null can't seed a centroid
    val seedRows = vecs.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(codebookSize)
      .select(col(vecCol)).collect()
    val sess = vecs.sparkSession
    sess.createDataFrame(
      sess.sparkContext.parallelize(
        seedRows.zipWithIndex.toSeq.map { case (r, i) =>
          org.apache.spark.sql.Row(i, r.getSeq[Float](0))
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("vector",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = false))))
  }

  /** Encode against a FROZEN [[pqCodebook]] — works identically in a
    * foreachBatch micro-batch (the frozen codebook makes streaming
    * codes equal batch codes by definition, spec-pinned like the
    * frozen LM/DSIR artifacts). `dim` must match the codebook's
    * vectors; `subspaces` is part of the artifact's identity.
    */
  def pqEncodeAgainst(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, subspaces: Int, codebook: DataFrame): DataFrame = {
    require(dim > 0 && subspaces > 0 && dim % subspaces == 0,
      s"dim $dim must be a positive multiple of subspaces $subspaces")
    val sd = dim / subspaces
    val cb = pqToSubs(codebook, col("code"), "_c", col("vector"), "_cs",
      subspaces, sd)
    pqEncodeWith(vecs, idCol, vecCol, subspaces, sd, cb)
  }

  private def pqEncodeWith(vecs: DataFrame, idCol: String,
      vecCol: String, subspaces: Int, sd: Int,
      cb: DataFrame): DataFrame = {
    val sub = pqToSubs(vecs, col(idCol), "_id", col(vecCol), "_sub",
      subspaces, sd)
    sub.join(broadcast(cb), Seq("_j"))
      .select(col("_id"), col("_j"), col("_c"),
        pqSqDist(col("_sub"), col("_cs")).as("_d"))
      .groupBy(col("_id"), col("_j"))
      .agg(min(struct(col("_d"), col("_c"))).getField("_c").as("code"))
      .select(col("_id").as(idCol), col("_j").as("subspace"), col("code"))
  }

  /** ADC (asymmetric distance) top-k over PQ codes — the search arm
    * of IVF-PQ: the corpus lives as `subspaces` small codes per
    * vector ([[pqEncode]]), the QUERY stays exact, and the distance
    * is the sum of per-subspace lookup-table entries
    * d(q_j, centroid(code_j)) — one table scan of the code rows, no
    * corpus vector ever touched at query time. Approximate by
    * construction (quantization error), but the COMPUTATION is
    * deterministic and exactly replayable: the LUT distances use the
    * same round(·,12)→DECIMAL(28,12) trick as the encoder, so ranks
    * have no float boundary (neighbor order = double-cast score desc,
    * ties id asc — the [[bruteForceTopK]] output contract).
    *
    * At 100 TB: the LUT is queries × subspaces × codebookSize rows —
    * BROADCAST; the codes table is the only data-sized input and it
    * carries (id, subspace, code) — the whole point of PQ; the
    * per-query aggregate is a bounded [[VectorExpressions.topKByScore]]
    * partial, never a per-query window.
    */
  def pqSearchTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, dim: Int, subspaces: Int,
      codebookSize: Int, k: Int, excludeSelf: Boolean = true): DataFrame = {
    require(dim > 0 && subspaces > 0 && dim % subspaces == 0,
      s"dim $dim must be a positive multiple of subspaces $subspaces")
    val sd = dim / subspaces
    // one seed collect serves both the encode and the query LUT
    val cb = pqCodebookSubs(corpus, idCol, vecCol, subspaces, sd,
      codebookSize)
    val codes = pqEncodeWith(corpus, idCol, vecCol, subspaces, sd, cb)
    val qsub = pqToSubs(queries, col(qidCol), "_qid", col(vecCol),
      "_qs", subspaces, sd)
    val lut = qsub.join(broadcast(cb), Seq("_j"))
      .select(col("_qid"), col("_j"), col("_c"),
        pqSqDist(col("_qs"), col("_cs")).as("_d"))
    codes.join(broadcast(lut),
        codes("subspace") === lut("_j") && codes("code") === lut("_c"))
      .groupBy(col("_qid"), col(idCol))
      .agg(sum(col("_d")).as("_adist"))
      .filter(if (excludeSelf) col("_qid") =!= col(idCol) else lit(true))
      .groupBy(col("_qid"))
      .agg(VectorExpressions.topKByScore(
        -col("_adist").cast("double"), col(idCol), k).as("neighbors"))
      .select(col("_qid").as("query_id"), col("neighbors"))
  }

  /** Seed codebook exploded to (code, subspace, subvector) — bounded
    * driver collect (≤ codebookSize rows, the IVF-centroid contract).
    */
  private def pqCodebookSubs(vecs: DataFrame, idCol: String,
      vecCol: String, subspaces: Int, sd: Int,
      codebookSize: Int): DataFrame =
    pqToSubs(pqCodebook(vecs, idCol, vecCol, codebookSize),
      col("code"), "_c", col("vector"), "_cs", subspaces, sd)

  private def pqToSubs(df: DataFrame, keep: Column, as: String,
      vec: Column, out: String, subspaces: Int, sd: Int): DataFrame = df
    .select(keep.as(as),
      explode(sequence(lit(0), lit(subspaces - 1))).as("_j"),
      pqCheckDim(vec, subspaces * sd).as("_w"))
    .select(col(as), col("_j"),
      slice(col("_w"), col("_j") * sd + 1, lit(sd)).as(out))

  /** A wrong-dim vector would silently slice short and zip_with-pad
    * nulls, and a NULL ELEMENT would null every candidate distance —
    * whereupon min(struct(null, code)) resolves by null-first struct
    * ordering to code 0: a WRONG code, not an error. Fail the row
    * loudly on either (the SemDeDup element-type-validation
    * precedent).
    */
  private def pqCheckDim(vec: Column, dim: Int): Column = {
    val sz = org.apache.spark.sql.functions.size(vec)
    when(sz =!= dim, raise_error(concat(
        lit("pq: vector of dim "), sz.cast("string"),
        lit(s", expected $dim"))))
      .when(exists(vec, x => x.isNull), raise_error(
        lit("pq: vector contains null elements")))
      .otherwise(vec)
  }

  /** Exact, engine-portable squared L2 between two float subvectors
    * as DECIMAL(28,12): the fused codegen kernel
    * ([[graft.functions.VectorExpressions.pqSqDist]] — per-term
    * round(·,12) with Spark's own double-round semantics, unscaled
    * longs accumulated exactly).
    */
  private def pqSqDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.pqSqDist(a, b)

  /** Reference formulation of [[pqSqDist]] via built-in HOFs
    * (interpreted lambdas) — the differential check for the codegen
    * kernel, the [[cosineBuiltin]] precedent: each squared diff is a
    * bit-identical double, round()ed to 12 dp, summed as
    * DECIMAL(28,12) (the decimal `+` re-cast keeps the fold type
    * fixed where plain promotion would drift to (29,12)).
    */
  def pqSqDistBuiltin(a: Column, b: Column): Column = {
    val dec = "decimal(28,12)"
    val term = zip_with(a, b, (x, y) =>
      round((x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double")), 12).cast(dec))
    aggregate(term, lit(0).cast(dec), (acc, v) => (acc + v).cast(dec))
  }

  /** Reference-implementation cosine via built-ins (zip_with +
    * aggregate). Interpreted lambdas — correct everywhere, used as the
    * differential check for the codegen'd expression.
    */
  def cosineBuiltin(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  /** Exact top-k neighbors for each query vector.
    *
    * queries: (qidCol, vecCol); corpus: (idCol, vecCol). Returns
    * (query_id, neighbors: array<struct<score, id>>) with `neighbors`
    * sorted score-descending, ties id-ascending, self-matches excluded
    * when `excludeSelf`.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      col(vecCol).as("__qvec")))
    val scored = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cvec"))
      .crossJoin(q)
      .filter(if (excludeSelf) col("__cid") =!= col("query_id") else lit(true))
      .select(col("query_id"),
        VectorExpressions.cosine(col("__cvec"), col("__qvec")).as("score"),
        col("__cid"))
    scored.groupBy(col("query_id"))
      .agg(VectorExpressions.topKByScore(col("score"), col("__cid"), k)
        .as("neighbors"))
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the
    * 13-gram benchmark-overlap scrub ([[graft.operators.TextOps]]
    * decontamination family): drop every corpus row whose embedding
    * lies within cosine `threshold` of ANY vector in a frozen
    * benchmark/eval set (the Phi/LLM-report "semantic dedup vs eval
    * sets" pass — paraphrased test questions that n-gram overlap
    * cannot see). Returns the SURVIVING corpus rows, all columns.
    *
    * Scale shape: the benchmark set is model-sized (eval suites, not
    * corpora) and BROADCASTS; each corpus partition streams its rows
    * against it in one whole-stage pipeline — cosines are computed
    * map-side with the fused [[VectorExpressions.cosine]] kernel and
    * collapse to a distinct id list BEFORE anything is exchanged, so
    * no vector array ever crosses a shuffle (the library-wide ANN
    * invariant) and the only shuffled payload is the contaminated-id
    * set. The final anti-join builds on that (typically tiny) id set.
    * The early-exit `>= threshold` filter means no per-row max is
    * materialized — one hit condemns the row.
    *
    * The "tiny id set" assumption is GUARDED, not assumed (ADVICE
    * r12): the contaminated set is checkpointed and counted; at or
    * under `broadcastIdsMax` it broadcasts into the anti join (the
    * common case — benchmark-similar rows are a vanishing corpus
    * fraction), above it the hint is withheld and the anti join
    * shuffles the ids (the [[graft.operators.Behavior.pageRank]]
    * `broadcastRanksMax` pattern — a low threshold or a
    * benchmark-heavy corpus cannot blow driver/executor memory).
    * Either way only ID scalars cross the exchange; the checkpoint
    * also means the expensive cosine sweep runs exactly once.
    */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      broadcastIdsMax: Long = 4000000L): DataFrame = {
    val b = broadcast(bench.select(col(vecCol).as("__graft_bvec")))
    val contaminated = corpus.select(col(idCol), col(vecCol))
      .crossJoin(b)
      .filter(VectorExpressions.cosine(col(vecCol), col("__graft_bvec"))
        >= threshold)
      .select(col(idCol))
      .distinct()
      .localCheckpoint(true)
    // the id set BROADCASTS into the anti join while it fits: without
    // the hint Catalyst cannot see through the distinct that the build
    // side is small, and plans a sort-merge anti join that ships every
    // corpus row (vector included) through an exchange — the exact
    // leak the PlanSpec pin catches
    val build = if (contaminated.count() <= broadcastIdsMax)
      broadcast(contaminated) else contaminated
    corpus.join(build, Seq(idCol), "left_anti")
  }

  /** Per-label mean embedding (class centroids) in long form:
    * (label, dim, mean), dim 1-based. The workhorse for label-cluster
    * statistics, centroid-distance features, and drift monitoring over
    * an embedding corpus.
    *
    * One hash aggregation over posexploded (label, dim) pairs —
    * partial aggregation combines map-side, so the exchange carries
    * labels × dim partial sums per task, never the vectors. Sums go
    * through decimal (exact, order-independent), division to double —
    * the result is bit-identical across engines and partitionings.
    */
  /** Greedy k-center coreset (Gonzalez 1985 farthest-first traversal)
    * — DIVERSITY selection over an embedding corpus: start from the
    * min-id vector, repeatedly add the point farthest from every
    * chosen center (2-approximation of the optimal k-center cover).
    * The selection a curation pipeline runs to pick a maximally-
    * spread-out exemplar subset (seed sets for labeling, eval probes,
    * dedup anchors) — the diversity complement of [[semanticDedup]]'s
    * redundancy removal.
    *
    * Distributed shape: k−1 passes, each pass ONE row-local distance
    * to the single NEW center (its vector rides as a literal array —
    * model-sized, like IVF centroids) folded into a running min
    * column, then ONE argmax via TakeOrdered(1) — never a pairwise
    * join, never corpus state on the driver (k vectors only). The
    * running-min column is eagerly localCheckpoint'ed per round (the
    * PageRank lineage guard). Distances are the [[pqSqDist]] exact-
    * decimal kernel rounded to 6dp, argmax ties break by ascending
    * id — every step engine-replayable; the oracle unrolls all k
    * rounds as chained CTEs. Output: (rank, idCol, dist) where dist
    * is the point's min squared L2 to the previously chosen centers
    * (0 for the seed).
    */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k >= 2 && k <= 64, "k must be in [2,64]")
    val spark = df.sparkSession
    val vecs = df
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) === dim)
      .select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .localCheckpoint(true)
    def litVec(v: Seq[Double]) = array(v.map(lit(_)): _*)
    def distTo(center: Seq[Double]) =
      round(VectorExpressions.pqSqDist(col("_v"), litVec(center))
        .cast("double"), 6)
    val seedRow = vecs.orderBy(col("_id").asc).limit(1).collect()
    require(seedRow.nonEmpty, "kCenterCoreset: empty input")
    var centerVec = seedRow(0).getSeq[Double](1)
    val centers = scala.collection.mutable.ArrayBuffer(
      (1L, seedRow(0).getLong(0), 0.0))
    var cur = vecs.withColumn("_mind", distTo(centerVec))
      .localCheckpoint(true)
    (2 to k).foreach { t =>
      val next = cur.orderBy(col("_mind").desc, col("_id").asc)
        .limit(1).collect()(0)
      centers += ((t.toLong, next.getLong(0), next.getDouble(2)))
      centerVec = next.getSeq[Double](1)
      cur = cur.withColumn("_mind",
        least(col("_mind"), distTo(centerVec)))
        .localCheckpoint(true)
    }
    import spark.implicits._
    centers.toSeq.toDF("rank", idCol, "dist")
  }

  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String)
      : DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .groupBy(col("label"), (col("__pos") + 1).cast("long").as("dim"))
      // avg semantics: divide by the NON-NULL element count — a null
      // component must lower the sample size, not deflate the mean
      // toward zero
      .agg((sum(col("__x").cast("decimal(28,12)")).cast("double") /
        count(col("__x"))).as("mean"))

  /** Per-label centroid-distance outliers — the embedding-corpus
    * contamination/drift detector: squared L2 of every vector to its
    * label's mean embedding, z-scored within the label, flagged at
    * `zThreshold`. A mislabeled or corrupted vector sits far from its
    * class centroid; a drifting class shows a fattening tail.
    *
    * Every numeric step is an established engine-portable pattern,
    * so the whole operator oracles exactly: centroid means via
    * decimal sums rounded to 6dp ([[labelCentroids]] precedent),
    * cast to FLOAT and packed per label (bounded rows, broadcast);
    * distances via the decimal-exact [[VectorExpressions.pqSqDist]]
    * kernel, rounded to 6dp doubles; label moments via exact
    * DECIMAL(28,6) sums (the corr-moments pattern — order-independent,
    * so mu/sigma are bit-identical); z rounded to 4dp and the flag
    * compared on the ROUNDED value (no float boundary). Degenerate
    * labels (σ = 0 or a single vector) z-score to 0 — never outliers.
    *
    * Plan shape: one (label, dim) aggregate (bounded), one (label)
    * moment aggregate (bounded), both BROADCAST back; the vectors
    * themselves never shuffle. Null labels are dropped (no class, no
    * centroid).
    */
  def centroidOutliers(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, zThreshold: Double = 2.0): DataFrame = {
    val cents = labelCentroids(df.filter(col(labelCol).isNotNull),
      labelCol, vecCol)
    val centArr = cents.groupBy(col("label").as("__clabel"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean")))),
        s => round(s.getField("mean"), 6).cast("float")).as("__cvec"))
    // rows whose vector cannot be scored (null vector, null element,
    // length ≠ the label's centroid dim → pqSqDist null) are DROPPED
    // before the moments: a null dist must not deflate μ/σ for the
    // rest of its label (count would include it, the decimal sums
    // would not)
    val withD = df.filter(col(labelCol).isNotNull)
      .join(broadcast(centArr), col(labelCol) === col("__clabel"))
      .select(col(idCol), col(labelCol),
        round(VectorExpressions.pqSqDist(col(vecCol), col("__cvec"))
          .cast("double"), 6).as("dist"))
      .filter(col("dist").isNotNull)
    val moments = withD.groupBy(col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__n"),
        sum(col("dist").cast("decimal(28,6)")).as("__s"),
        sum(round(col("dist") * col("dist"), 6).cast("decimal(28,6)"))
          .as("__s2"))
    withD.join(broadcast(moments), col(labelCol) === col("__l"))
      .select(col(idCol), col(labelCol), col("dist"), {
        // decimal→double casts can differ by an ulp across engines
        // (the labelCentroids 8dp lesson): round each derived moment
        // to 6dp immediately so everything downstream starts from
        // bit-agreed values
        val n = col("__n").cast("double")
        val mu = round(col("__s").cast("double") / n, 6)
        val ex2 = round(col("__s2").cast("double") / n, 6)
        val variance = round(ex2 - mu * mu, 6)
        round(when(col("__n") > 1 && variance > 0,
          (col("dist") - mu) / sqrt(variance)).otherwise(0.0), 4)
          .as("z")
      })
      .withColumn("is_outlier", col("z") > zThreshold)
  }

  /** Gram matrix AᵀA of an embedding column — the bounded summary
    * behind PCA whitening, covariance drift checks and linear probes:
    * the corpus reduces to dim(dim+1)/2 cells no matter how many
    * vectors feed it (the CMS/dsirModel artifact class). Cell (i,j) =
    * Σ_rows round(vᵢ·vⱼ, 12) summed as DECIMAL(38,12) — the
    * reduce-order-independent kernel every oracled iteration here
    * uses (GD, PageRank), so the matrix is bit-identical across
    * partitionings and engines.
    *
    * Plan shape: per row the upper triangle of the outer product
    * (two chained posexplodes, j ≥ i) feeds ONE hash aggregate;
    * map-side combine caps the exchange at dim(dim+1)/2 partial rows
    * per task, so vectors never shuffle. CPU is the algorithm's
    * Θ(dim²) per row; for dim beyond ~128, project first
    * ([[randomProject]]) — the JL-then-Gram composition.
    *
    * Output: (i, j, g DECIMAL(38,12)) for 0 ≤ i ≤ j < dim; mirror
    * cells on the consumer side (the matrix is symmetric).
    */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).cast("array<double>").as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "__x")), col("__v"))
      .select(col("i"), col("__x"),
        posexplode(col("__v")).as(Seq("j", "__y")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(round(col("__x") * col("__y"), 12)
        .cast("decimal(38,12)")).as("g"))
  }

  /** Top principal direction by fixed-step power iteration over the
    * [[gramMatrix]] — the whitening/centrality direction SemDeDup-style
    * curation uses to strip the dominant component before cosine
    * comparisons. The gram matrix COLLECTS to the driver (≤
    * dim(dim+1)/2 cells — the IVF-centroid class of bounded driver
    * state: model-sized, not data-sized).
    *
    * The iteration runs in PURE exact-decimal arithmetic: per step
    * u ← round(G·w, 12) with exact sums, then a DECIMAL POWER-OF-TEN
    * rescale w ← round(u·10⁻ᵉ, 12) where e is the digit count of the
    * integer part of max|u| (so |w| ≤ 1 always — integer/decimal
    * logic, no float log). No doubles inside the loop — this is
    * load-bearing for engine replay: decimal-HALF_UP rounding of an
    * exact decimal product is deterministic in every engine, whereas
    * rounding a DOUBLE product hits exact half boundaries whenever
    * 12-scale decimals multiply dyadic constants (G·(1/8) ends in …5
    * at the 15th decimal), and there the binary value falls on an
    * engine-dependent side of the half (measured: 11/64 final cells
    * flipped vs DuckDB before this design). The rescale, unlike ‖u‖
    * division, is exact — and the direction is scale-invariant, so
    * the one true normalization happens at the END: w/‖w‖ rounded to
    * 6dp, where a half-boundary hit needs a quotient within ~1e-10 of
    * a 6dp half — negligible.
    *
    * Deterministic and engine-replayable: the DuckDB oracle replays
    * all `steps` as chained CTEs bit-for-bit (the linearFitGD
    * convention). Start vector is uniform 1/√dim. Gram cells must
    * stay under 1e8 (checked) so every product fits DuckDB's
    * 38-digit decimal cap.
    */
  def pcaTopComponent(df: DataFrame, vecCol: String, dim: Int,
      steps: Int): Array[Double] =
    pcaTopComponentFromGram(gramMatrix(df, vecCol, dim), dim, steps)

  /** [[pcaTopComponent]] over an already-built (possibly memoized /
    * checkpointed) [[gramMatrix]] — production builds the gram once
    * per corpus version and derives every downstream artifact from
    * it, so the expensive pass must be shareable.
    */
  def pcaTopComponentFromGram(gram: DataFrame, dim: Int,
      steps: Int): Array[Double] = {
    require(steps >= 1 && steps <= 10, "steps must be in [1,10]")
    import java.math.{BigDecimal => JBD, RoundingMode}
    val cells = gram.collect()
    require(cells.nonEmpty, "pcaTopComponent: empty input")
    val g = Array.fill[JBD](dim, dim)(JBD.ZERO)
    cells.foreach { r =>
      val (i, j, d) = (r.getInt(0), r.getInt(1), r.getDecimal(2))
      require(d.abs.doubleValue < 1e8,
        s"gram cell ($i,$j) too large for the decimal replay chain: $d")
      g(i)(j) = d; g(j)(i) = d
    }
    var w = Array.fill(dim)(
      JBD.valueOf(1.0 / math.sqrt(dim.toDouble))
        .setScale(12, RoundingMode.HALF_UP))
    (1 to steps).foreach { _ =>
      val u = Array.tabulate(dim) { j =>
        var acc = JBD.ZERO
        (0 until dim).foreach { i =>
          acc = acc.add(g(i)(j).multiply(w(i))
            .setScale(12, RoundingMode.HALF_UP))
        }
        acc
      }
      // digit count of ⌊max|u|⌋: the exact power-of-ten rescale that
      // keeps |w| ≤ 1 (m = 0 ⇒ already sub-unit, no shift)
      val m = u.map(_.abs.setScale(0, RoundingMode.FLOOR).toBigInteger)
        .max
      val e = if (m.signum == 0) 0 else m.toString.length
      w = u.map(_.movePointLeft(e).setScale(12, RoundingMode.HALF_UP))
    }
    var n2 = JBD.ZERO
    w.foreach { x =>
      n2 = n2.add(x.multiply(x).setScale(12, RoundingMode.HALF_UP))
    }
    val norm = math.sqrt(n2.doubleValue)
    require(norm > 0, "pcaTopComponent: zero gram matrix")
    w.map(x => JBD.valueOf(x.doubleValue / norm)
      .setScale(6, RoundingMode.HALF_UP).doubleValue)
  }

  /** Project vectors onto a fixed direction (the serving arm of
    * [[pcaTopComponent]]): proj = Σ round(vⱼ·wⱼ, 12) as an exact
    * decimal fold, 6dp-rounded — row-local, no shuffle, weights carried
    * as a literal array (model-sized). Rows whose vector is null or
    * of the wrong length are dropped (the centroidOutliers rule).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
      weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val dec = "decimal(38,12)"
    val wArr = array(weights.map(lit(_)): _*)
    df.filter(col(vecCol).isNotNull &&
        size(col(vecCol)) === weights.length)
      .select(col(idCol),
        round(aggregate(
          zip_with(col(vecCol).cast("array<double>"), wArr,
            (x, wj) => round(x * wj, 12).cast(dec)),
          lit(0).cast(dec), (acc, p) => (acc + p).cast(dec))
          .cast("double"), 6).as("proj"))
  }

  /** Rank-1 whitening: strip the [[pcaTopComponent]] direction from
    * every vector, v′ = v − (v·w)·w — the SemDeDup preprocessing step
    * (dominant-component energy swamps cosine comparisons; removing
    * it makes near-dup thresholds meaningful). Row-local like
    * [[pcaProject]]: weights ride as a reference object, the
    * projection is the same 6dp decimal fold, each component
    * subtracts the 12dp-rounded proj·wⱼ and re-rounds to 6dp — every
    * step engine-replayable. One fused codegen loop
    * ([[VectorExpressions.rankOneStrip]]); the built-in HOF
    * formulation is [[pcaWhitenBuiltin]] (differential spec-pinned),
    * which CollapseProject quietly turns quadratic — the projection
    * fold re-inlines into the per-element lambda (measured 5.3 s vs
    * sub-second at sf0.1). Output: (idCol, whitened ARRAY<double>);
    * null/wrong-length rows dropped.
    */
  def pcaWhiten(df: DataFrame, idCol: String, vecCol: String,
      weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        VectorExpressions.rankOneStrip(col(vecCol), weights.toArray)
          .as("whitened"))
      .filter(col("whitened").isNotNull)
  }

  /** [[pcaWhiten]] spelled with built-in HOFs — the semantic
    * reference the fused kernel is differentially pinned against
    * (the [[randomProjectBuiltin]] convention). Not the production
    * path: see [[pcaWhiten]] for the CollapseProject hazard.
    */
  def pcaWhitenBuiltin(df: DataFrame, idCol: String, vecCol: String,
      weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val dec = "decimal(38,12)"
    val wArr = array(weights.map(lit(_)): _*)
    df.filter(col(vecCol).isNotNull &&
        size(col(vecCol)) === weights.length)
      .select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__proj",
        round(aggregate(
          zip_with(col("__v"), wArr,
            (x, wj) => round(x * wj, 12).cast(dec)),
          lit(0).cast(dec), (acc, p) => (acc + p).cast(dec))
          .cast("double"), 6))
      .select(col(idCol),
        zip_with(col("__v"), wArr,
          (x, wj) => round(x - round(col("__proj") * wj, 12), 6))
          .as("whitened"))
  }

  /** Sign-bit bucket key from `planes` random hyperplanes
    * (deterministic Rademacher directions). Same key ⇒ likely-similar
    * direction; recomputable on both sides of any join. Fused codegen
    * expression — see [[VectorExpressions.lshBucket]].
    */
  def lshBucket(vec: Column, planes: Int, planeOffset: Int = 0): Column =
    VectorExpressions.lshBucket(vec, planes, planeOffset)

  /** Candidate pairs via LSH bucket equi-join, scored with exact
    * cosine: (id_a, id_b, cosine), id_a < id_b. Recall can be raised by
    * lowering `planes` (coarser buckets) at quadratic-bucket cost.
    * `planes = 0` is the exact degenerate mode — one bucket, so the
    * equi-join IS the all-pairs join and candidate generation is
    * provably lossless (the `nprobe = nlist` trick for LSH): the
    * oracle-proof configuration at verify scale; real corpora run with
    * planes > 0.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Int, minCosine: Option[Double] = None): DataFrame = {
    require(planes >= 0, "planes must be >= 0 (0 = exact single-bucket)")
    val bucketKey =
      if (planes == 0) lit(0L) else lshBucket(col(vecCol), planes)
    val keyed = df.select(col(idCol).as("__id"), col(vecCol).as("__vec"),
      bucketKey.as("__bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize before the self-join consumes it from two branches
    // at once (cache-fill race computes partitions twice)
    keyed.count()
    val a = keyed.select(col("__bucket"), col("__id").as("id_a"),
      col("__vec").as("__vec_a"))
    val b = keyed.select(col("__bucket"), col("__id").as("id_b"),
      col("__vec").as("__vec_b"))
    val scored = a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorExpressions.cosine(col("__vec_a"), col("__vec_b"))
          .as("cosine"))
    // the score threshold is pushed BELOW the materialization barrier:
    // the quadratic scored stream shrinks to the above-threshold
    // survivors before anything is shuffled or checkpointed. No
    // distinct: every vector maps to exactly ONE bucket key, so a
    // pair can emerge from at most one bucket — deduplication here
    // would shuffle the dominant intermediate to remove nothing
    // (multi-table variants dedup in their own post-score step,
    // see lshTopK)
    val pairs =
      minCosine.fold(scored)(t => scored.filter(col("cosine") >= t))
    // eager-materialize the bucket-pruned pairs, then release the keyed
    // cache so repeated calls in one session don't accumulate blocks
    val out = pairs.localCheckpoint(true)
    keyed.unpersist(false)
    out
  }

  /** IVF-style ANN: coarse-quantize the corpus into `nlist` inverted
    * lists (nearest-centroid assignment), probe each query's `nprobe`
    * closest lists, score only those lists' vectors exactly.
    *
    * Centroids are a deterministic nlist-row sample collected to the
    * driver (nlist × dim floats — trivially small) and carried as a
    * reference object inside [[graft.functions.CentroidTopIds]] (NOT
    * literal expression trees, which bloat the plan nlist×dim-fold and
    * dominate codegen compile time), so BOTH assignment and probing
    * are pure map-side codegen'd expressions: the corpus is never
    * shuffled for assignment. The only exchange is the (bucket)
    * equi-join between
    * corpus lists and query probes, then the bounded top-k aggregate.
    * `nprobe = nlist` degenerates to an exact search (full scan) —
    * asserted in tests; recall/cost scales down with nprobe.
    *
    * Centroid quality: the deterministic nlist-row sample is only the
    * INIT; `refineIters` Lloyd iterations (default 2) re-estimate each
    * centroid as the mean of its assigned vectors — fully distributed
    * (assignment is map-side codegen; the element-wise mean is one
    * exchange on (list, dim-position) pairs), deterministic given the
    * seeded init, and empty lists keep their previous centroid. At
    * 100 TB the refinement pass runs on a corpus sample — the centroid
    * estimate converges long before the full data is seen.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, nlist: Int,
      nprobe: Int, excludeSelf: Boolean = true,
      refineIters: Int = 2): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, refineIters)
    // corpus smaller than nlist ⇒ fewer centroids than asked: probing
    // every collected list is then a full scan — degrade to the exact
    // brute-force path instead of failing plan construction (the
    // slice-based probe this replaced degraded the same way)
    if (cents.length <= 1)
      return bruteForceTopK(corpus, queries, idCol, vecCol, qidCol, k,
        excludeSelf)
    ivfTopKAgainst(corpus, queries, idCol, vecCol, qidCol, k, cents,
      nprobe, excludeSelf)
  }

  /** FROZEN IVF coarse quantizer — the train-once split (the
    * [[pqCodebook]]/[[unigramModel]] pattern applied to the inverted
    * index): deterministic smallest-id seed init + `refineIters`
    * Lloyd passes, as the nlist×dim driver matrix [[ivfTopKAgainst]]
    * and streaming micro-batches reuse. Deterministic given the
    * corpus, so two builds agree.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, refineIters: Int = 2): Seq[Seq[Float]] = {
    val init: Seq[Seq[Float]] = corpus
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(nlist)
      .collect().map(_.getSeq[Float](1).toSeq).toSeq
    if (init.length <= 1) init
    else refineCentroids(corpus, vecCol, init, refineIters)
  }

  /** IVF probe against a FROZEN centroid matrix: assignment and
    * probing are pure map-side codegen'd expressions; the only
    * exchange is the (bucket) equi-join, then the bounded top-k
    * aggregate. Works identically inside foreachBatch — a frozen
    * index serves every micro-batch of queries (spec-pinned
    * streaming == batch).
    */
  def ivfTopKAgainst(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      centroids: Seq[Seq[Float]], nprobe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(centroids.length > 1,
      s"need at least 2 centroids, got ${centroids.length}")
    val probeN = math.min(nprobe, centroids.length)

    val corpusAssigned = corpus.select(col(idCol).as("__cid"),
      col(vecCol).as("__cvec"),
      element_at(
        VectorExpressions.centroidTopIds(col(vecCol), centroids, 1), 1)
        .as("__bucket"))

    val probes = queries.select(col(qidCol).as("query_id"),
        col(vecCol).as("__qvec"),
        explode(
          VectorExpressions.centroidTopIds(col(vecCol), centroids, probeN))
          .as("__bucket"))

    corpusAssigned.join(probes, Seq("__bucket"))
      .filter(if (excludeSelf) col("__cid") =!= col("query_id")
        else lit(true))
      .select(col("query_id"),
        VectorExpressions.cosine(col("__cvec"), col("__qvec")).as("score"),
        col("__cid"))
      .groupBy(col("query_id"))
      .agg(VectorExpressions.topKByScore(col("score"), col("__cid"), k)
        .as("neighbors"))
  }

  /** Lloyd refinement of IVF centroids: assign every vector to its
    * nearest centroid (map-side codegen'd loop against the reference
    * matrix), take the element-wise mean per list, repeat. The mean is
    * ONE hash aggregation with `dim` per-dimension avg states — the
    * exchange carries nlist × dim partial averages per map task (a
    * posexplode formulation was tried: it shuffles n×dim ROWS and
    * needs a second aggregation to re-assemble vectors). No
    * driver-side vector math beyond the nlist×dim collect of the new
    * centroids themselves.
    */
  private def refineCentroids(corpus: DataFrame, vecCol: String,
      init: Seq[Seq[Float]], iters: Int): Seq[Seq[Float]] = {
    if (init.isEmpty) return init
    val dim = init.head.length
    var cents = init
    (1 to iters).foreach { _ =>
      val means = corpus.select(col(vecCol).as("__vec"))
        .select(col("__vec"),
          element_at(
            VectorExpressions.centroidTopIds(col("__vec"), cents, 1), 1)
            .as("__b"))
        .groupBy(col("__b"))
        .agg(avg(element_at(col("__vec"), 1)).as("m0"),
          (1 until dim).map(i =>
            avg(element_at(col("__vec"), i + 1)).as(s"m$i")): _*)
        .collect()
        // a dimension's mean can be null (null elements, or ragged
        // vectors shorter than `dim` under try-semantics): keep the
        // previous centroid component rather than NPE mid-refinement,
        // mirroring the empty-list fallback below
        .map { r =>
          val b = r.getAs[Int]("__b")
          b -> (0 until dim).map { i =>
            if (r.isNullAt(i + 1)) cents(b)(i)
            else r.getDouble(i + 1).toFloat
          }
        }
        .toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        means.getOrElse(j, old)
      }
    }
    cents
  }

  /** Decimal-exact K-means (Lloyd) — the ORACLED clustering operator
    * (cluster-then-curate: SemDeDup buckets, data-mix strata, eval
    * probes all start from one). Unlike [[refineCentroids]] (the IVF
    * index builder, float-avg and benchOnly-approximate), every step
    * here replays bit-for-bit in another engine: seeds are the first
    * k vectors by id, assignment argmin uses the
    * [[graft.functions.VectorExpressions.pqSqDist]] round(·,12)→
    * DECIMAL(28,12) distance with ties to the smaller cluster id,
    * and each centroid update is a per-dimension DECIMAL(28,10)-exact
    * sum divided by the count in double. `iters` (assign → update)
    * rounds, then one final assignment against the final centroids.
    * An empty cluster keeps its previous centroid.
    *
    * Plan per round: ONE broadcast of the k×dim centroid literal
    * frame onto the corpus (crossJoin fan-out ×k map-side), a
    * min(struct) argmin aggregate (partial-combined — at most one row
    * per id per task crosses), and a k-row × dim-column mean
    * aggregate whose collect is model-sized (k×dim doubles — the
    * parameter-server class). The corpus is scanned per round but
    * never shuffled as vectors beyond the id-keyed argmin exchange.
    * Output: (idCol, cluster, dist).
    */
  def kmeansLloyd(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16], got $iters")
    val spark = corpus.sparkSession
    val clean = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__vec"))
    var cents: Seq[Seq[Double]] = clean.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    require(cents.length == k, s"corpus has fewer than $k vectors")
    val dim = cents.head.length
    def centFrame(cs: Seq[Seq[Double]]): DataFrame =
      spark.range(1).select(explode(array(cs.zipWithIndex.map {
        case (v, j) => struct(lit(j).as("__cl"),
          array(v.map(lit): _*).as("__cvec"))
      }: _*)).as("c"))
        .select(col("c.__cl").as("__cl"), col("c.__cvec").as("__cvec"))
    def assign(cs: Seq[Seq[Double]]): DataFrame =
      clean.crossJoin(broadcast(centFrame(cs)))
        .select(col("__id"), col("__vec"), col("__cl"),
          graft.functions.VectorExpressions
            .pqSqDist(col("__vec"), col("__cvec")).as("__d"))
        .groupBy(col("__id"))
        .agg(min(struct(col("__d"), col("__cl"), col("__vec")))
          .as("__m"))
        .select(col("__id"), col("__m.__cl").as("__cl"),
          col("__m.__d").as("__d"), col("__m.__vec").as("__vec"))
    (1 to iters).foreach { _ =>
      val means = assign(cents)
        .groupBy(col("__cl"))
        .agg(count(lit(1)).as("__n"),
          (0 until dim).map(i =>
            (sum(element_at(col("__vec"), i + 1).cast("decimal(28,10)"))
              .cast("double") / count(lit(1)).cast("double"))
              .as(s"__m$i")): _*)
        .collect()
        .map(r => r.getAs[Int]("__cl") ->
          (0 until dim).map(i => r.getDouble(i + 2)))
        .toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        means.getOrElse(j, old)
      }
    }
    assign(cents)
      .select(col("__id").as(idCol), col("__cl").as("cluster"),
        round(col("__d").cast("double"), 6).as("dist"))
  }

  /** Composed IVF-PQ search — the production ANN shape at corpus
    * scale (Jégou et al. 2011): a coarse quantizer partitions the
    * corpus into `nlist` inverted lists, each query probes its
    * `nprobe` nearest lists, and within the probed lists distance is
    * ADC over the PQ codes ([[pqSearchTopK]]'s arm) — the corpus is
    * touched only as (id, bucket, subspace, code), never as vectors.
    *
    * Unlike the float-path IVF ([[ivfTopK]], whose partial-probe
    * configs are benchOnly), EVERY arithmetic step here is the
    * decimal-exact [[VectorExpressions.pqSqDist]] kernel, so the
    * partial-probe result itself replays exactly in another engine:
    * the coarse quantizer is literally a PQ codebook with ONE
    * subspace spanning the full vector ([[pqEncodeAgainst]] with
    * `subspaces = 1` — argmin by exact decimal distance, ties to the
    * smaller list id), and probe order is double-cast decimal
    * distance asc, list id asc (the [[bruteForceTopK]] neighbor
    * contract). Approximate METRIC, deterministic COMPUTATION.
    *
    * At 100 TB: the coarse codebook is `nlist` rows and the PQ
    * codebook `codebookSize` rows — both broadcast forever; probes
    * and the per-query LUT (queries × subspaces × codebookSize) are
    * query-sized broadcasts; the corpus-sized tables carry only ids,
    * buckets and codes. The probe filter runs BEFORE the code join,
    * so the ADC aggregate sees only candidates from probed lists —
    * candidate volume scales with nprobe/nlist of the corpus, the
    * IVF contract. Exchanges: the two encode argmins (map-side
    * combined to one row per (id, subspace) per task) and the
    * id-keyed candidate⋈codes join (AQE-splittable).
    */
  def ivfPqSearchTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, dim: Int,
      subspaces: Int, codebookSize: Int, nlist: Int, nprobe: Int,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    require(nlist > 0, "nlist must be positive")
    require(nprobe > 0, "nprobe must be positive")
    val coarse = pqCodebook(corpus, idCol, vecCol, nlist)
    ivfPqSearchAgainst(corpus, queries, idCol, vecCol, qidCol, dim,
      subspaces, nprobe, k, coarse,
      pqCodebook(corpus, idCol, vecCol, codebookSize), excludeSelf)
  }

  /** IVF-PQ search against FROZEN artifacts — the train-once split:
    * `coarse` and `codebook` are [[pqCodebook]]-shaped (code, vector)
    * tables built offline per corpus version; every later batch or
    * foreachBatch micro-batch of queries reuses them, making
    * streaming results equal batch results by definition.
    */
  def ivfPqSearchAgainst(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, dim: Int,
      subspaces: Int, nprobe: Int, k: Int, coarse: DataFrame,
      codebook: DataFrame, excludeSelf: Boolean = true): DataFrame = {
    require(dim > 0 && subspaces > 0 && dim % subspaces == 0,
      s"dim $dim must be a positive multiple of subspaces $subspaces")
    val nlist = coarse.count()
    // a degenerate quantizer (≤1 list) cannot filter anything: the
    // probe join would be a rename of the full ADC — run the plain
    // PQ search instead (the ivfTopK degrade precedent)
    if (nlist <= 1)
      return pqSearchAgainst(corpus, queries, idCol, vecCol, qidCol,
        dim, subspaces, codebook, k, excludeSelf)
    val probeN = math.min(nprobe, nlist.toInt)
    val sd = dim / subspaces

    // corpus → one bucket per id: exact-decimal argmin against the
    // coarse codebook (= PQ encode with a single full-width subspace)
    val buckets = pqEncodeAgainst(corpus, idCol, vecCol, dim, 1, coarse)
      .select(col(idCol), col("code").cast("long").as("__bucket"))

    // query → nprobe buckets, ordered by double-cast decimal distance
    // asc then list id asc (TopKByScore's contract on negated score)
    val coarseSubs = pqToSubs(coarse, col("code"), "_c", col("vector"),
      "_cs", 1, dim)
    val probes = pqToSubs(queries, col(qidCol), "_qid", col(vecCol),
        "_qs", 1, dim)
      .join(broadcast(coarseSubs), Seq("_j"))
      .select(col("_qid"), col("_c"),
        pqSqDist(col("_qs"), col("_cs")).as("_d"))
      .groupBy(col("_qid"))
      .agg(VectorExpressions.topKByScore(-col("_d").cast("double"),
        col("_c").cast("long"), probeN).as("_pb"))
      .select(col("_qid"), explode(col("_pb")).as("_p"))
      .select(col("_qid"), col("_p").getField("id").as("__bucket"))

    // candidate pairs FIRST (probe filter before any code math), then
    // the candidates pick up their codes and LUT entries
    val pairs = buckets.join(broadcast(probes), Seq("__bucket"))
      .select(col(idCol), col("_qid"))
    val cbSubs = pqToSubs(codebook, col("code"), "_c", col("vector"),
      "_cs", subspaces, sd)
    val codes = pqEncodeWith(corpus, idCol, vecCol, subspaces, sd, cbSubs)
    val lut = pqToSubs(queries, col(qidCol), "_qid", col(vecCol),
        "_qs", subspaces, sd)
      .join(broadcast(cbSubs), Seq("_j"))
      .select(col("_qid"), col("_j"), col("_c"),
        pqSqDist(col("_qs"), col("_cs")).as("_d"))
    pairs.join(codes, Seq(idCol))
      .join(broadcast(lut),
        col("subspace") === lut("_j") && col("code") === lut("_c") &&
          pairs("_qid") === lut("_qid"))
      .groupBy(pairs("_qid"), col(idCol))
      .agg(sum(col("_d")).as("_adist"))
      .filter(if (excludeSelf) pairs("_qid") =!= col(idCol) else lit(true))
      .groupBy(pairs("_qid"))
      .agg(VectorExpressions.topKByScore(
        -col("_adist").cast("double"), col(idCol), k).as("neighbors"))
      .select(pairs("_qid").as("query_id"), col("neighbors"))
  }

  /** [[pqSearchTopK]] against a FROZEN [[pqCodebook]] (the Against
    * split of the ADC search; also [[ivfPqSearchAgainst]]'s degenerate
    * single-list fallback).
    */
  def pqSearchAgainst(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, dim: Int,
      subspaces: Int, codebook: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(dim > 0 && subspaces > 0 && dim % subspaces == 0,
      s"dim $dim must be a positive multiple of subspaces $subspaces")
    val sd = dim / subspaces
    val cb = pqToSubs(codebook, col("code"), "_c", col("vector"), "_cs",
      subspaces, sd)
    val codes = pqEncodeWith(corpus, idCol, vecCol, subspaces, sd, cb)
    val qsub = pqToSubs(queries, col(qidCol), "_qid", col(vecCol),
      "_qs", subspaces, sd)
    val lut = qsub.join(broadcast(cb), Seq("_j"))
      .select(col("_qid"), col("_j"), col("_c"),
        pqSqDist(col("_qs"), col("_cs")).as("_d"))
    codes.join(broadcast(lut),
        codes("subspace") === lut("_j") && codes("code") === lut("_c"))
      .groupBy(col("_qid"), col(idCol))
      .agg(sum(col("_d")).as("_adist"))
      .filter(if (excludeSelf) col("_qid") =!= col(idCol) else lit(true))
      .groupBy(col("_qid"))
      .agg(VectorExpressions.topKByScore(
        -col("_adist").cast("double"), col(idCol), k).as("neighbors"))
      .select(col("_qid").as("query_id"), col("neighbors"))
  }

  /** Seeded random-projection (Johnson–Lindenstrauss / Achlioptas
    * 2003) embedding compression: project `dimIn`-dim vectors to
    * `dimOut` dims with a deterministic ±1 sign matrix,
    *
    *   y_k = round( (Σ_j sign(k,j) · x_j) / √dimOut , 6 ),
    *
    * sign(k,j) = +1 iff the leading 32 bits of md5(k ‖ ':' ‖ j) are
    * even — the engine's portable hash family, so the matrix needs no
    * storage, no broadcast, and no seed handshake: any engine (and
    * the oracle) regenerates it bit-identically. The standard
    * dimensionality-reduction step before ANN indexing/clustering
    * when the raw embedding width dominates memory: distances are
    * preserved within (1±ε) w.h.p. for dimOut = O(ln n / ε²).
    *
    * Entirely ROW-LOCAL — a map over the corpus with no exchange, no
    * driver state, nothing collected: the scale-optimal shape (the
    * sign matrix is recomputed per row from md5, dimOut×dimIn hashes;
    * at production widths amortize with a codegen kernel the way
    * [[VectorExpressions.pqSqDist]] replaced the HOF formulation).
    * Per-term round(·,12)→DECIMAL(28,12) accumulation makes the sum
    * exact and order-independent (the PQ trick), so the projected
    * values are engine-portable at 6dp. Output: (idCol, projected
    * array<float>). Wrong-width vectors fail loudly ([[pqEncode]]'s
    * guard precedent).
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dimIn: Int, dimOut: Int): DataFrame = {
    require(dimIn > 0, "dimIn must be positive")
    require(dimOut > 0, "dimOut must be positive")
    df.select(col(idCol),
      VectorExpressions.randomProjection(pqCheckDim(col(vecCol), dimIn),
        dimIn, dimOut).as("projected"))
  }

  /** Reference formulation of [[randomProject]]'s kernel via built-in
    * HOFs — the differential check for the fused codegen expression
    * (the [[pqSqDistBuiltin]] precedent): the sign matrix re-derived
    * per row from conv(md5(k:j)), per-term round(·,12) decimal
    * accumulation, decimal→double, /√dimOut, round(·,6), float cast.
    */
  def randomProjectBuiltin(df: DataFrame, idCol: String, vecCol: String,
      dimIn: Int, dimOut: Int): DataFrame = {
    require(dimIn > 0, "dimIn must be positive")
    require(dimOut > 0, "dimOut must be positive")
    val dec = "decimal(28,12)"
    def signAt(k: Column, j: Column): Column =
      when(conv(substring(md5(concat(k.cast("string"), lit(":"),
        j.cast("string"))), 1, 8), 16, 10).cast("long") % 2 === 0,
        lit(1.0d)).otherwise(lit(-1.0d))
    val checked = pqCheckDim(col(vecCol), dimIn)
    val proj = transform(sequence(lit(0), lit(dimOut - 1)), k =>
      round(
        aggregate(sequence(lit(0), lit(dimIn - 1)),
          lit(0).cast(dec),
          (acc, j) => (acc + round(signAt(k, j) *
            element_at(checked, j + 1).cast("double"), 12).cast(dec))
            .cast(dec))
          .cast("double") / math.sqrt(dimOut.toDouble), 6)
        .cast("float"))
    df.select(col(idCol), proj.as("projected"))
  }

  /** Bucketed ANN top-k: like [[bruteForceTopK]] but each query only
    * scores corpus vectors sharing an LSH bucket — the IVF-style probe
    * path. Exactness traded for a Σ|bucket|² candidate set.
    *
    * `tables` is the standard multi-table LSH recall knob: each table
    * hashes with an independent plane family (seeded offset), a
    * candidate matches if it collides in ANY table, and recall grows
    * as 1-(1-r)^L while per-table precision is unchanged. Duplicate
    * (query, candidate) collisions across tables are deduplicated
    * AFTER scoring (score is deterministic), so the bounded top-k
    * never double-counts a neighbor.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, planes: Int,
      excludeSelf: Boolean = true, tables: Int = 1): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    require(planes >= 0, "planes must be >= 0 (0 = exact single-bucket)")
    // planes = 0 is the lossless degenerate mode (one bucket, the
    // bucket join IS the full pairing): the oracle-proof configuration
    // exercising the whole LSH pipeline — bucket join, post-score
    // dedup, bounded top-k — with recall 1. Extra tables would only
    // replicate the identical bucket (and re-score the full cross
    // join per copy), so exact mode collapses to one table.
    val effTables = if (planes == 0) 1 else tables
    def buckets(vec: Column): Column = posexplode(array(
      (0 until effTables).map(t =>
        if (planes == 0) lit(0L)
        else lshBucket(vec, planes, t * planes)): _*))
    val ck = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cvec"),
      buckets(col(vecCol)).as(Seq("__tbl", "__bucket")))
    val qk = queries.select(col(qidCol).as("query_id"),
      col(vecCol).as("__qvec"),
      buckets(col(vecCol)).as(Seq("__tbl", "__bucket")))
    val scored = ck.join(qk, Seq("__tbl", "__bucket"))
      .filter(if (excludeSelf) col("__cid") =!= col("query_id")
        else lit(true))
      .select(col("query_id"),
        VectorExpressions.cosine(col("__cvec"), col("__qvec")).as("score"),
        col("__cid"))
    // single table ⇒ at most one collision per (query, candidate):
    // skip the dedup exchange entirely
    val deduped = if (effTables == 1) scored else scored.distinct()
    deduped
      .groupBy(col("query_id"))
      .agg(VectorExpressions.topKByScore(col("score"), col("__cid"), k)
        .as("neighbors"))
  }
}
