package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiling, Relational, Sampling}

/** Profiling, KMV sketch, CDC merge, and systematic-sampling
  * semantics (round-3 additions).
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ------------------------------------------------------------ //
  // Profiling.profile

  test("profile: null counts, cardinalities, portable min/max") {
    val df = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), Some("b"), Some(2.25)),
      (Some(2L), None, Some(2.25)),
      (None, Some("a"), None)
    ).toDF("id", "tag", "score")
    val got = Profiling.profile(df, Seq("id", "tag", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "tag", "score"))
    val id = got("id")
    assert(id.getLong(1) == 4L)   // n_rows
    assert(id.getLong(2) == 1L)   // n_nulls
    assert(id.getLong(3) == 2L)   // n_distinct (nulls excluded)
    assert(id.getString(4) == "1" && id.getString(5) == "2")
    val tag = got("tag")
    assert(tag.getLong(2) == 1L && tag.getLong(3) == 2L)
    assert(tag.getString(4) == "a" && tag.getString(5) == "b")
    val sc = got("score")
    // doubles render through DECIMAL(28,6): fixed scale, no E-notation
    assert(sc.getString(4) == "1.500000" && sc.getString(5) == "2.250000")
  }

  test("profile: timestamps render second-precision") {
    val df = Seq(
      Tuple1(ts("2024-01-02 03:04:05")),
      Tuple1(ts("2024-03-02 03:04:05"))
    ).toDF("t")
    val r = Profiling.profile(df, Seq("t")).head()
    assert(r.getString(4) == "2024-01-02 03:04:05")
    assert(r.getString(5) == "2024-03-02 03:04:05")
  }

  test("profile: per-column pre-aggregation, never the Expand plan") {
    val df = spark.range(1000).select(
      col("id"), (col("id") % 10).as("m"))
    val plan = Profiling.profile(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    // the multi-count(distinct) Expand would ship every row once per
    // profiled column at full width — the per-column two-level
    // aggregate form must not plan it
    assert(!plan.contains("Expand"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  // ------------------------------------------------------------ //
  // Profiling.kmvDistinct

  test("checkConstraints: each violation measure exact; empty table passes") {
    import Profiling.Constraint._
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val facts = Seq(
      (Some(1L), 10.0, "a"), (Some(1L), 10.0, "b"), // dup key 1
      (Some(2L), 99.0, "c"),                        // out of range
      (None, 5.0, "d"),                             // null key
      (Some(7L), 5.0, "e"))                         // orphan vs dim
      .toDF("k", "v", "tag")
    val report = Profiling.checkConstraints(facts, Seq(
        NotNull("k", maxNullFraction = 0.25),
        NotNull("tag"),
        InRange("v", 0.0, 50.0),
        Unique(Seq("k")),
        ForeignKey("k", dim, "k")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1),
        r.getBoolean(2)))).toMap
    assert(report("not_null(k)") == ((0.2, true)))    // 1/5 <= 0.25
    assert(report("not_null(tag)") == ((0.0, true)))
    assert(report("in_range(v,0.0,50.0)") == ((1.0, false)))
    assert(report("unique(k)") == ((1.0, false)))     // one surplus row
    assert(report("foreign_key(k)") == ((1.0, false))) // k=7 orphaned
    assert(report.size == 5)
    // an empty table trips nothing (the guards, not div-by-zero nulls)
    val empty = Profiling.checkConstraints(
        facts.filter(lit(false)), Seq(NotNull("k"), InRange("v", 0, 1),
          Unique(Seq("k")), ForeignKey("k", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(empty.size == 4 && empty.values.forall(identity))
  }

  test("kmvDistinct: exact when distinct < k, estimate close above k") {
    val df = spark.range(2000).select(
      when(col("id") % 2 === 0, "small").otherwise("big").as("g"),
      // 'small' has 10 distinct values, 'big' has 1000
      when(col("id") % 2 === 0, (col("id") / 2).cast("long") % 10)
        .otherwise(col("id")).as("v"))
    val got = Profiling.kmvDistinct(df, "g", "v", 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    val (smallKept, smallEst) = got("small")
    assert(smallKept == 10L && smallEst == 10.0) // exact below k
    val (bigKept, bigEst) = got("big")
    assert(bigKept == 64L)
    // KMV with k=64 has ~12.5% relative stddev; 1000 ± 40% is a
    // deterministic fixture, not a statistical test
    assert(bigEst > 600 && bigEst < 1400, s"est $bigEst")
  }

  test("hllDistinct: estimate within HLL error; registers mergeable " +
      "(duplication/partitioning-invariant)") {
    val base = spark.range(3000).select(
      when(col("id") % 2 === 0, "small").otherwise("big").as("g"),
      when(col("id") % 2 === 0, (col("id") / 2).cast("long") % 20)
        .otherwise(col("id")).as("v"))
    val got = Profiling.hllDistinct(base, "g", "v", 9)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // p=9 -> ~4.6% relative stddev; generous deterministic bounds
    val (_, smallEst) = got("small")
    assert(smallEst > 15 && smallEst < 25, s"small $smallEst")
    val (bigRegs, bigEst) = got("big")
    assert(bigRegs <= 512L)
    assert(bigEst > 1100 && bigEst < 1900, s"big $bigEst")
    // max-merge register semantics: duplicating and repartitioning
    // the input cannot move a single register, hence not the estimate
    val dup = base.union(base).repartition(13)
    val a = Profiling.hllDistinct(base, "g", "v", 9)
      .orderBy("g").collect().toSeq
    val b = Profiling.hllDistinct(dup, "g", "v", 9)
      .orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("hllDistinct: linear-counting regime is exact-ish and engages " +
      "below 2.5m") {
    val df = spark.range(40).select(lit("g").as("g"), col("id").as("v"))
    val r = Profiling.hllDistinct(df, "g", "v", 9).head()
    // 40 distinct over 512 registers: raw << 1280 and empties exist,
    // so the m*ln(m/V) branch must fire; it is near-exact down here
    assert(r.getLong(1) <= 40L)
    assert(math.abs(r.getDouble(2) - 40.0) < 3.0, s"est ${r.getDouble(2)}")
  }

  test("kmvDistinct: insensitive to duplication and partitioning") {
    val base = spark.range(500).select(lit("g").as("g"),
      (col("id") % 200).as("v"))
    val dup = base.union(base).repartition(13)
    val a = Profiling.kmvDistinct(base, "g", "v", 32).head()
    val b = Profiling.kmvDistinct(dup, "g", "v", 32).head()
    assert(a.getLong(1) == b.getLong(1))
    assert(a.getLong(2) == b.getLong(2))
    assert(a.getDouble(3) == b.getDouble(3))
  }

  // ------------------------------------------------------------ //
  // Relational.applyChangelog

  private def changelogFixture = {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v")
    val changes = Seq(
      // id 1: update then delete (latest wins → deleted)
      (1L, "a2", ts("2024-01-01 10:00:00"), 1L, "U"),
      (1L, "a3", ts("2024-01-01 11:00:00"), 2L, "D"),
      // id 2: delete then re-insert (latest wins → v = b2)
      (2L, "xx", ts("2024-01-01 10:00:00"), 3L, "D"),
      (2L, "b2", ts("2024-01-01 11:00:00"), 4L, "U"),
      // id 4: insert of a key absent from the base
      (4L, "d", ts("2024-01-01 10:00:00"), 5L, "U")
    ).toDF("id", "v", "ts", "seq", "op")
    (base, changes)
  }

  test("applyChangelog: upsert, tombstone, insert, untouched") {
    val (base, changes) = changelogFixture
    val got = Relational.applyChangelog(base, changes, Seq("id"),
        "ts", "seq", "op")
      .as[(Long, String)].collect().toMap
    // 1 deleted; 2 updated; 3 untouched; 4 inserted
    assert(got == Map(2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("applyChangelog: an update's null field overwrites (atomic row)") {
    val base = Seq((1L, Some("a"), Some(10.0))).toDF("id", "v", "w")
    val changes = Seq(
      (1L, None: Option[String], Some(20.0),
        ts("2024-01-01 10:00:00"), 1L, "U")
    ).toDF("id", "v", "w", "ts", "seq", "op")
    val got = Relational.applyChangelog(base, changes, Seq("id"),
        "ts", "seq", "op")
      .as[(Long, Option[String], Option[Double])].head()
    assert(got == ((1L, None, Some(20.0))))
  }

  test("applyChangelog: ties broken by the tie-break column") {
    val base = Seq.empty[(Long, String)].toDF("id", "v")
    val t = ts("2024-01-01 10:00:00")
    val changes = Seq(
      (1L, "first", t, 1L, "U"),
      (1L, "last", t, 2L, "U")
    ).toDF("id", "v", "ts", "seq", "op")
    val got = Relational.applyChangelog(base, changes, Seq("id"),
      "ts", "seq", "op").as[(Long, String)].head()
    assert(got == ((1L, "last")))
  }

  // ------------------------------------------------------------ //
  // Sampling.systematicSample

  test("systematicSample: exactly the boundary-straddling rows") {
    val df = Seq(
      (1L, 30L),  // [0,30)   — straddles nothing
      (2L, 80L),  // [30,110) — straddles 100
      (3L, 10L),  // [110,120)
      (4L, 250L), // [120,370) — straddles 200 AND 300
      (5L, 40L)   // [370,410) — straddles 400
    ).toDF("id", "w")
    val got = Sampling.systematicSample(df, "id", "w", 100L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L, 5L))
  }

  test("systematicSample: total weight / step bounds the sample size") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("n_chars"))
    val total = docs.agg(sum("n_chars")).as[Long].head()
    val step = 5000L
    val n = Sampling.systematicSample(docs, "doc_id", "n_chars", step)
      .count()
    // selected rows = distinct rows covering the floor(total/step)
    // boundaries: at most one per boundary, at least one if any exist
    assert(n <= total / step, s"n=$n total=$total")
    assert(total < step || n >= 1)
  }

  test("systematicSample == sequential scan replay") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("n_chars"))
    val got = Sampling.systematicSample(docs, "doc_id", "n_chars", 3000L)
      .select("doc_id").as[Long].collect().toSet
    // driver-side sequential replay of the definition
    var run = 0L
    val want = docs.orderBy("doc_id").as[(Long, Long)].collect()
      .flatMap { case (id, w) =>
        val hit = run / 3000L < (run + w) / 3000L
        run += w
        if (hit) Some(id) else None
      }.toSet
    assert(got == want)
  }

  // ------------------------------------------------------------ //
  // Profiling.countMinSketch / cmsEstimate

  test("countMinSketch: estimate never undercounts; exact when " +
      "collision-free; absent values stay bounded") {
    // 5 values with known multiplicities
    val occurrences = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(5)("c") ++ Seq("d") ++ Seq.fill(2)("e")
    val df = occurrences.toDF("v")
    val exact = occurrences.groupBy(identity).view.mapValues(_.size).toMap
    // width 2 forces collisions: every estimate must still be >= exact
    val tiny = Profiling.countMinSketch(df, "v", depth = 3, width = 2)
    val estTiny = Profiling.cmsEstimate(tiny,
        exact.keys.toSeq.toDF("v"), "v", depth = 3, width = 2)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (v, n) =>
      assert(estTiny(v) >= n, s"$v: est ${estTiny(v)} < exact $n")
    }
    // the sketch never exceeds depth x width cells, and each depth
    // row's cells sum to the full stream
    val cells = tiny.as[(Int, Long, Long)].collect()
    assert(cells.length <= 3 * 2)
    (0 until 3).foreach { d =>
      assert(cells.filter(_._1 == d).map(_._3).sum == occurrences.size)
    }
    // wide sketch: verify collision-freeness directly, then est == exact
    val wide = Profiling.countMinSketch(df, "v", depth = 4, width = 4096)
    val estWide = Profiling.cmsEstimate(wide,
        exact.keys.toSeq.toDF("v"), "v", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    val collisionFree = wide.as[(Int, Long, Long)].collect()
      .length == 4 * exact.size
    if (collisionFree) exact.foreach { case (v, n) =>
      assert(estWide(v) == n, s"$v: est ${estWide(v)} != exact $n")
    }
    // a value never inserted can only pick up collision mass — its
    // estimate is >= 0 and 0 in the collision-free sketch
    val absent = Profiling.cmsEstimate(wide, Seq("zzz").toDF("v"), "v",
      depth = 4, width = 4096).as[(String, Long)].collect().head._2
    assert(absent >= 0)
    if (collisionFree) assert(absent == 0)
  }

  test("countMinSketch merges: CMS(A ++ B) == cell-wise sum of parts") {
    val a = Seq("x", "x", "y", "z").toDF("v")
    val b = Seq("y", "w", "w", "w").toDF("v")
    val merged = Profiling.countMinSketch(a.union(b), "v",
        depth = 3, width = 8)
      .as[(Int, Long, Long)].collect().toSet
    val summed = Profiling.countMinSketch(a, "v", depth = 3, width = 8)
      .union(Profiling.countMinSketch(b, "v", depth = 3, width = 8))
      .groupBy(col("d"), col("w")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == summed)
  }

  test("rankSelect: exact discrete quantiles, ties and edges") {
    val df = (1 to 100).map(i => i.toDouble).toDF("x")
    val got = Profiling.rankSelect(df, "x", Seq(0.01, 0.5, 1.0))
      .as[(Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0.01) == ((1L, 1.0)))   // ceil(0.01*100)=1
    assert(got(0.5) == ((50L, 50.0)))  // ceil(50)=50
    assert(got(1.0) == ((100L, 100.0)))
    // duplicates: every rank inside a tie run maps to the same value
    val dup = Seq(1.0, 2.0, 2.0, 2.0, 9.0).toDF("x")
    val med = Profiling.rankSelect(dup, "x", Seq(0.5))
      .as[(Double, Long, Double)].collect().head
    assert(med == ((0.5, 3L, 2.0)))
    // q smaller than 1/n clamps to rank 1, and nulls are ignored
    val tiny = Seq(Some(5.0), None, Some(3.0)).toDF("x")
    val lo = Profiling.rankSelect(tiny, "x", Seq(0.001))
      .as[(Double, Long, Double)].collect().head
    assert(lo == ((0.001, 1L, 3.0)))
  }

  test("groupRank == the window form it replaces; partitioning-invariant") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, "en", 30L), (2L, "en", 10L), (3L, "en", 10L), (4L, "en", 50L),
      (5L, "de", 7L), (6L, "de", 7L), (7L, "fr", 1L),
      (8L, null.asInstanceOf[String], 9L)
    ).toDF("id", "lang", "n")
    val got = Sampling.groupRank(df, "lang", "n", "id")
      .select("id", "lang", "n", "rank", "pct")
      .as[(Long, String, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("lang")).orderBy(col("n"), col("id"))
    val wind = df.filter(col("lang").isNotNull)
      .select(col("id"), col("lang"), col("n"),
        row_number().over(w).cast("long").as("rank"),
        round(row_number().over(w).cast("double") /
          count(lit(1)).over(Window.partitionBy(col("lang"))), 6)
          .as("pct"))
      .as[(Long, String, Long, Long, Double)].collect().toSet
    assert(got == wind, s"$got != $wind")
    assert(!got.exists(_._2 == null)) // null group dropped
    assert(got == Sampling.groupRank(df.repartition(7), "lang", "n", "id")
      .select("id", "lang", "n", "rank", "pct")
      .as[(Long, String, Long, Long, Double)].collect().toSet)
  }

  test("shuffleOrder: a reproducible permutation; salt re-shuffles") {
    import graft.operators.Sampling
    val df = (1L to 200L).toDF("id")
    def order(salt: String) =
      Sampling.shuffleOrder(df, "id", salt).as[(Long, Long)]
        .collect().sortBy(_._1).map(_._2).toSeq
    val o1 = order("epoch1")
    // a permutation of 1..n
    assert(o1.sorted == (1L to 200L))
    // bit-identical on re-run and partitioning-invariant
    assert(o1 == order("epoch1"))
    assert(o1 == Sampling.shuffleOrder(df.repartition(7), "id", "epoch1")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq)
    // a different salt is a genuinely different permutation, and the
    // order is not the identity (it actually shuffles)
    assert(o1 != order("epoch2"))
    assert(o1 != (1L to 200L))
  }

  test("linearFitGD: loss decreases, partitioning-invariant, guards") {
    // y = 2x exactly: each GD step must cut the squared error
    val df = (1 to 50).map(i => (i / 50.0, 2.0 * i / 50.0))
      .toDF("x", "y")
    def weights(d: org.apache.spark.sql.DataFrame, steps: Int) =
      Profiling.linearFitGD(d, Seq("x"), "y", steps = steps, lr = 0.5)
        .as[(String, Double)].collect().toMap
    def loss(w: Map[String, Double]) =
      (1 to 50).map { i =>
        val x = i / 50.0
        val p = w("bias") + w("x") * x
        val e = p - 2.0 * x; e * e
      }.sum
    val l1 = loss(weights(df, 1)); val l3 = loss(weights(df, 3))
    assert(l3 < l1, s"loss did not decrease: $l1 -> $l3")
    assert(weights(df, 3)("x") > 0.0) // moving toward the true slope 2
    // decimal gradient sums make the fit reduce-order-independent
    assert(weights(df, 3) == weights(df.repartition(7), 3))
    // empty input refuses instead of dividing by zero
    intercept[IllegalArgumentException] {
      Profiling.linearFitGD(df.filter(col("x") > 99), Seq("x"), "y")
    }
  }

  test("equiDepthBins: equal counts on distinct values; ties stay together") {
    val df = (1 to 64).map(_.toDouble).toDF("x")
    val bins = Profiling.equiDepthBins(df, "x", 4)
      .orderBy("bin").as[(Long, Long, Double, Double)].collect()
    assert(bins.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(bins.forall(_._2 == 16L)) // 64/4 exactly
    // bins tile the range: next vmin follows prev vmax
    assert(bins.sliding(2).forall {
      case Array(a, b) => b._3 == a._4 + 1.0; case _ => true })
    // a dominant tie run lands in ONE bin (ntile would split it)
    val ties = (Seq.fill(30)(5.0) ++ Seq(1.0, 9.0)).toDF("x")
    val tb = Profiling.equiDepthBins(ties, "x", 4)
      .as[(Long, Long, Double, Double)].collect()
    val five = tb.filter(r => r._3 <= 5.0 && 5.0 <= r._4)
    assert(five.length == 1 && five.head._2 >= 30L)
  }

  // ------------------------------------------------------------ //
  // Profiling.sampleQuantiles / freqItemsByKey (bounded sketches)

  test("sampleQuantiles: k >= n degrades to exact rankSelect") {
    val df = (1 to 90).map(i => (s"id$i", i.toDouble)).toDF("id", "x")
    val exact = Profiling.rankSelect(df, "x", Seq(0.25, 0.5, 0.99))
      .as[(Double, Long, Double)].collect().sortBy(_._1)
    val got = Profiling.sampleQuantiles(df, "id", "x", 128,
      Seq(0.25, 0.5, 0.99)).as[(Double, Long, Double)].collect()
      .sortBy(_._1)
    assert(got.sameElements(exact))
  }

  test("sampleQuantiles: deterministic under repartitioning, " +
      "bounded rank error below k") {
    val n = 4000
    val df = (1 to n).map(i => (s"row-$i", i.toDouble)).toDF("id", "x")
    val k = 500
    val a = Profiling.sampleQuantiles(df, "id", "x", k, Seq(0.5, 0.9))
      .as[(Double, Long, Double)].collect().sortBy(_._1)
    val b = Profiling.sampleQuantiles(df.repartition(13), "id", "x", k,
      Seq(0.5, 0.9)).as[(Double, Long, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // values are 1..n, so a value IS its global rank: the sampled
    // median/p90 must sit within a few DKW standard errors
    // (~n/sqrt(k) ≈ 180 rows) of the true rank
    val tol = 3.0 * n / math.sqrt(k)
    assert(math.abs(a(0)._3 - 0.5 * n) < tol, a(0).toString)
    assert(math.abs(a(1)._3 - 0.9 * n) < tol, a(1).toString)
    // and the sample really was capped at k: rank never exceeds it
    assert(a.forall(_._2 <= k))
  }

  test("rankSelectWeighted: interval semantics, ties safe, " +
      "degenerates to rankSelect at weight 1") {
    // values 1..4, weights (1,1,2,4): W=8, intervals 1:(0,1] 2:(1,2]
    // 3:(2,4] 4:(4,8]
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L), (4.0, 4L))
      .toDF("x", "w")
    val got = Profiling.rankSelectWeighted(df, "x", "w",
        Seq(0.25, 0.5, 0.51, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(got == Map(0.25 -> 2.0, 0.5 -> 3.0, 0.51 -> 4.0, 1.0 -> 4.0))
    // zero/negative weights drop; ties share the output value
    val ties = Seq((5.0, 3L), (5.0, 3L), (9.0, 0L), (1.0, 2L))
      .toDF("x", "w")
    val med = Profiling.rankSelectWeighted(ties, "x", "w", Seq(0.5))
      .as[(Double, Double)].collect()
    assert(med.toSeq == Seq((0.5, 5.0))) // W=8 (9.0 dropped), t=4 → 5.0
    // weight ≡ 1 == plain discrete quantiles
    val vals = (1 to 97).map(i => (i.toDouble, 1L)).toDF("x", "w")
    val a = Profiling.rankSelectWeighted(vals.repartition(7), "x", "w",
        Seq(0.3, 0.9)).as[(Double, Double)].collect().toMap
    val b = Profiling.rankSelect(vals.select($"x"), "x", Seq(0.3, 0.9))
      .as[(Double, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(a == b)
  }

  test("sampleQuantilesByKey: per-group == global on one group; " +
      "exact below k; partitioning-invariant") {
    val one = (1 to 300).map(i => ("g", s"id$i", i.toDouble))
      .toDF("g", "id", "x")
    val grouped = Profiling.sampleQuantilesByKey(one, "g", "id", "x",
        50, Seq(0.5, 0.9))
      .as[(String, Double, Long, Double)].collect()
      .map(r => (r._2, r._3, r._4)).toSet
    val global = Profiling.sampleQuantiles(
        one.select($"id", $"x"), "id", "x", 50, Seq(0.5, 0.9))
      .as[(Double, Long, Double)].collect().toSet
    assert(grouped == global)
    // two groups, both under k → exact per-group rankSelect semantics
    val two = (1 to 9).map(i => ("a", s"a$i", i.toDouble)) ++
      (1 to 5).map(i => ("b", s"b$i", i * 10.0))
    val df = two.toDF("g", "id", "x")
    val got = Profiling.sampleQuantilesByKey(df.repartition(5), "g",
        "id", "x", 16, Seq(0.5))
      .as[(String, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got("a") == ((5L, 5.0)) && got("b") == ((3L, 30.0)))
    val again = Profiling.sampleQuantilesByKey(df.repartition(2), "g",
        "id", "x", 16, Seq(0.5))
      .as[(String, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(again == got)
  }

  test("freqItemsByKey: exact regime == plain counts, any partitioning") {
    val rows = for {
      g <- Seq("a", "b"); i <- 1 to 60
    } yield (g, s"v${i % 5}") // 5 distinct values per group
    val df = rows.toDF("g", "v")
    val expect = df.groupBy("g", "v").count()
      .as[(String, String, Long)].collect().toSet
    for (parts <- Seq(1, 7)) {
      val got = Profiling.freqItemsByKey(df.repartition(parts), "g", "v", 8)
        .as[(String, String, Long)].collect().toSet
      assert(got == expect)
    }
  }

  test("freqItemsByKey: MG guarantees on a skewed stream beyond k") {
    // Zipf-ish: item i appears ceil(600/i) times, 40 distinct, k=10
    val rows = for {
      i <- 1 to 40; _ <- 1 to math.ceil(600.0 / i).toInt
    } yield ("g", f"item$i%02d")
    val n = rows.size.toLong
    val df = rows.toDF("g", "v").repartition(5)
    val k = 10
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = Profiling.freqItemsByKey(df, "g", "v", k)
      .as[(String, String, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got.size <= k)
    val bound = n / (k + 1)
    got.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t, s"$item overcounted: $est > $t")
      assert(t - est <= bound, s"$item undercount ${t - est} > $bound")
    }
    // every item above the n/(k+1) frequency threshold must appear
    truth.filter(_._2 > bound).keys.foreach { item =>
      assert(got.contains(item), s"heavy hitter $item missing")
    }
  }

  test("freqItems aggregate: output sorted (cnt desc, item asc)") {
    val df = Seq("b", "a", "a", "c", "b", "a", "c").map(("g", _))
      .toDF("g", "v")
    val got = Profiling.freqItemsByKey(df, "g", "v", 8)
      .as[(String, String, Long)].collect().map(r => (r._2, r._3))
    assert(got.toSeq == Seq(("a", 3L), ("b", 2L), ("c", 2L)))
  }

  test("abTest: hand-checked 2x2 chi-square; equal arms give 0; " +
      "degenerate margins give null; strong effect significant") {
    // k1: A 10/20 vs B 10/20 -> chi2 = 0, not significant
    // k2: A 18/20 hits vs B 2/20 -> ad-bc = 18*18-2*2 = 320,
    //     chi2 = 40*320^2/(20*20*20*20) = 25.6 -> significant
    // k3: everyone hits (c+d = 0 margin) -> null
    // k4: only arm A present -> n_b = 0 margin -> null
    def arm(k: String, a: Boolean, hits: Int, misses: Int) =
      Seq.fill(hits)((k, a, true)) ++ Seq.fill(misses)((k, a, false))
    val rows = (arm("k1", true, 10, 10) ++ arm("k1", false, 10, 10) ++
      arm("k2", true, 18, 2) ++ arm("k2", false, 2, 18) ++
      arm("k3", true, 5, 0) ++ arm("k3", false, 5, 0) ++
      arm("k4", true, 3, 3)).toDF("k", "arm", "hit")
    val got = Profiling.abTest(rows, Seq("k"), "arm", "hit")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getBoolean(6))))).toMap
    assert(got("k1") == ((20L, 10L, 20L, 10L, Some(0.0), Some(false))))
    assert(got("k2") == ((20L, 18L, 20L, 2L, Some(25.6), Some(true))))
    assert(got("k3") == ((5L, 5L, 5L, 5L, None, None)))
    assert(got("k4") == ((6L, 3L, 0L, 0L, None, None)))
  }

  test("ksTest: hand-checked ECDF gap with ties; identical samples " +
      "give D=0; one-sample keys drop; disjoint supports give D=1") {
    // k1: A=[1,2], B=[2,3] — gaps at distinct v: 2,2,0 over n_a·n_b=4
    // -> D=0.5. k2: A=B=[1,2,3] -> D=0. k3: only A -> no row.
    // k4: A=[1,2], B=[5,6] disjoint -> D=1, still not significant at
    // these tiny n.
    val rows = Seq(
      ("k1", 1.0, true), ("k1", 2.0, true),
      ("k1", 2.0, false), ("k1", 3.0, false),
      ("k2", 1.0, true), ("k2", 2.0, true), ("k2", 3.0, true),
      ("k2", 1.0, false), ("k2", 2.0, false), ("k2", 3.0, false),
      ("k3", 1.0, true),
      ("k4", 1.0, true), ("k4", 2.0, true),
      ("k4", 5.0, false), ("k4", 6.0, false))
      .toDF("k", "v", "tag")
    val got = Profiling.ksTest(rows, Seq("k"), "v", "tag")
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set("k1", "k2", "k4"))
    assert(got("k1") == ((2L, 2L, 0.5, false)), got("k1"))
    assert(got("k2") == ((3L, 3L, 0.0, false)), got("k2"))
    assert(got("k4") == ((2L, 2L, 1.0, false)), got("k4"))
    // a large genuinely-shifted pair IS significant: A uniform on
    // 0..99, B uniform on 50..149 (D=0.5 at n=100 each)
    val big = ((0 until 100).map(i => ("s", i.toDouble, true)) ++
      (0 until 100).map(i => ("s", 50.0 + i, false)))
      .toDF("k", "v", "tag")
    val sig = Profiling.ksTest(big, Seq("k"), "v", "tag")
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(sig._4 == 0.5 && sig._5, sig.toString)
  }
}
