package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Time-series shaping: RRD-style multi-resolution consolidation and
  * gaps-and-islands interval merging (fixtures with hand-computed
  * expectations; the sf-scale paths are oracle-checked via
  * `q_consolidate` / `q_merge_intervals`).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("consolidate: per-resolution buckets with exact stats") {
    val pts = Seq(
      ("a", 10L, 1.0, 1L), ("a", 70L, 3.0, 2L), ("a", 130L, 2.0, 3L),
      ("b", 10L, 5.0, 4L))
      .toDF("k", "sec", "v", "id")
      .withColumn("ts", col("sec").cast("timestamp"))
    val got = TimeSeries.consolidate(pts, Seq("k"), "ts", "v", "id",
        Seq("1m" -> 60L, "2m" -> 120L))
      .as[(String, String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2, r._3) -> (r._4, r._5, r._6, r._7, r._8))
      .toMap

    // 1m: each point alone in its bucket
    assert(got(("a", "1m", 0L)) == ((1L, 1.0, 1.0, 1.0, 1.0)))
    assert(got(("a", "1m", 60L)) == ((1L, 3.0, 3.0, 3.0, 3.0)))
    assert(got(("a", "1m", 120L)) == ((1L, 2.0, 2.0, 2.0, 2.0)))
    // 2m: first two points share [0, 120); last = the max-id point
    assert(got(("a", "2m", 0L)) == ((2L, 1.0, 3.0, 2.0, 3.0)))
    assert(got(("a", "2m", 120L)) == ((1L, 2.0, 2.0, 2.0, 2.0)))
    assert(got(("b", "1m", 0L)) == ((1L, 5.0, 5.0, 5.0, 5.0)))
    assert(got(("b", "2m", 0L)) == ((1L, 5.0, 5.0, 5.0, 5.0)))
    assert(got.size == 7)
  }

  test("consolidateStream on a batch frame == consolidate at that resolution") {
    val ev = Seq(
      ("a", 10L, 1.0, 1L), ("a", 70L, 3.0, 2L), ("a", 130L, 2.0, 3L),
      ("b", 10L, 5.0, 4L))
      .toDF("k", "sec", "v", "id")
      .withColumn("ts", col("sec").cast("timestamp"))
    val streamed = TimeSeries.consolidateStream(ev, Seq("k"), "ts", "v",
        "id", 120L, "0 seconds")
      .select("k", "bucket_start", "n", "v_min", "v_max", "v_avg", "v_last")
    val batch = TimeSeries.consolidate(ev, Seq("k"), "ts", "v", "id",
        Seq("2m" -> 120L))
      .select("k", "bucket_start", "n", "v_min", "v_max", "v_avg", "v_last")
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("mergeIntervals: chains, containment, touching, per-key isolation") {
    val iv = Seq(
      // chain with containment: cummax (not lag) must carry [0,100]'s
      // end across the contained [10,20] and [30,40]
      ("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L), ("a", 90L, 150L),
      ("a", 200L, 210L),          // separate island
      ("b", 0L, 5L), ("b", 5L, 9L), // touching endpoints merge
      ("b", 10L, 12L))             // gap of 1 splits
      .toDF("k", "lo", "hi")
    val got = TimeSeries.mergeIntervals(iv, Seq("k"), "lo", "hi")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 0L, 150L, 4L), ("a", 200L, 210L, 1L),
      ("b", 0L, 9L, 2L), ("b", 10L, 12L, 1L)))
  }

  test("fillGaps: densifies the grid, forward-fills, flags synthesized rows") {
    val sparse = Seq(
      ("a", 0L, 1.0), ("a", 30L, 4.0),   // gaps at 10, 20
      ("b", 10L, 9.0))                    // single bucket, no gaps
      .toDF("k", "bucket", "v")
    val got = TimeSeries.fillGaps(sparse, Seq("k"), "bucket", 10L, "v")
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(got == Set(
      ("a", 0L, 1.0, true), ("a", 10L, 1.0, false),
      ("a", 20L, 1.0, false), ("a", 30L, 4.0, true),
      ("b", 10L, 9.0, true)))
  }

  test("ewma: exact fold, null-hold, leading nulls, key isolation") {
    val df = Seq(
      ("a", 1L, Some(8.0)),   // y = 8
      ("a", 2L, Some(4.0)),   // y = 0.25*4 + 0.75*8 = 7
      ("a", 3L, None),        // held: 7
      ("a", 4L, Some(3.0)),   // y = 0.25*3 + 0.75*7 = 6
      ("b", 1L, None),        // leading null: null
      ("b", 2L, Some(2.0))    // y = 2 (first observation)
    ).toDF("k", "seq", "v")
    val got = TimeSeries.ewma(df, Seq("k"), Seq("seq"), "v", 0.25)
      .select($"k", $"seq", $"ewma")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(got == Set(
      ("a", 1L, Some(8.0)), ("a", 2L, Some(7.0)), ("a", 3L, Some(7.0)),
      ("a", 4L, Some(6.0)), ("b", 1L, None), ("b", 2L, Some(2.0))))
  }

  test("ewma: codegen and interpreted paths agree") {
    val vals = (1 to 200).map(i => ((i % 7).toString, i.toLong,
      Some(math.sin(i) * 100)))
    val df = vals.toDF("k", "seq", "v")
    val a = TimeSeries.ewma(df, Seq("k"), Seq("seq"), "v", 0.3)
      .select($"k", $"seq", $"ewma")
      .as[(String, Long, Double)].collect().toSet
    // force the interpreted path by disabling whole-stage codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val b = TimeSeries.ewma(df, Seq("k"), Seq("seq"), "v", 0.3)
        .select($"k", $"seq", $"ewma")
        .as[(String, Long, Double)].collect().toSet
      assert(a == b)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("mergeIntervals: single interval and empty input") {
    val one = Seq(("x", 1L, 2L)).toDF("k", "lo", "hi")
    assert(TimeSeries.mergeIntervals(one, Seq("k"), "lo", "hi")
      .as[(String, Long, Long, Long)].collect().toSeq ==
      Seq(("x", 1L, 2L, 1L)))
    val none = Seq.empty[(String, Long, Long)].toDF("k", "lo", "hi")
    assert(TimeSeries.mergeIntervals(none, Seq("k"), "lo", "hi")
      .count() == 0L)
  }

  test("counterRate: increases, reset-to-raw-value, first-sample and " +
      "duplicate-timestamp drops; hand-checked rates") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val samples = Seq(
      ("h1", t(0), 1L, 100.0), // first sample: dropped
      ("h1", t(1), 2L, 160.0), // +60 over 60s -> 1.0/s
      ("h1", t(2), 3L, 40.0),  // RESET: increase = 40, rate 40/60
      ("h1", t(4), 4L, 100.0), // +60 over 120s -> 0.5/s
      ("h1", t(4), 5L, 130.0), // duplicate ts: dropped (gap 0)
      ("h2", t(0), 6L, 10.0)   // lone sample: dropped
    ).toDF("host", "ts", "event_id", "value")
    val got = TimeSeries.counterRate(samples, Seq("host"), "ts",
        "value", "event_id")
      .select($"host", $"value", $"increase", $"rate_per_s")
      .as[(String, Double, Double, Double)].collect().toSet
    assert(got == Set(
      ("h1", 160.0, 60.0, 1.0),
      ("h1", 40.0, 40.0, round6(40.0 / 60)),
      ("h1", 100.0, 60.0, 0.5)), got.toString)
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("lttb: hand-checked picks (spike kept, endpoints kept); " +
      "pass-through below budget; partitioning-invariant") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // 10 points, buckets=4 -> middle buckets i=1..4 and i=5..8; the
    // spike at i=2 dominates bucket 0; bucket 1 (all zeros) picks the
    // largest |45-5i| => i=5
    val vs = Seq(0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val pts = vs.zipWithIndex.map { case (v, i) =>
      ("k", t(i), i.toLong, v) }.toDF("key", "ts", "event_id", "value")
    val got = TimeSeries.lttb(pts, Seq("key"), "ts", "value",
        "event_id", buckets = 4)
      .select($"sel_rank", $"ts_epoch", $"value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(0L, 2L, 5L, 9L), got.toSeq)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // n <= buckets: every point passes through
    val small = TimeSeries.lttb(pts.limit(3), Seq("key"), "ts",
        "value", "event_id", buckets = 4)
    assert(small.count() == 3)
    val rep = TimeSeries.lttb(pts.repartition(7), Seq("key"), "ts",
        "value", "event_id", buckets = 4)
      .select($"sel_rank", $"ts_epoch", $"value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rep.sameElements(got))
  }

  test("lttb: monitoring-counter magnitudes (|v| > 9.2e6 overflows " +
      "the scale-12 unscaled long) select without error and " +
      "translation-invariantly") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val base = Seq(0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    def picks(offset: Double) = TimeSeries.lttb(
        base.zipWithIndex.map { case (v, i) =>
          ("k", t(i), i.toLong, v + offset) }
          .toDF("key", "ts", "event_id", "value"),
        Seq("key"), "ts", "value", "event_id", buckets = 4)
      .select($"ts_epoch").as[Long].collect().sorted.toSeq
    // triangle areas are translation-invariant (all v-terms are
    // differences), so a 3.5e9 byte-counter baseline must reproduce
    // the small-value picks — it used to throw ArithmeticException
    // out of the bucket-average fold instead
    assert(picks(3.5e9) == picks(0.0))
    assert(picks(0.0) == Seq(0L, 2L, 5L, 9L))
  }

  test("lttb: bounded streaming pass == LttbExpression array fold " +
      "bit-for-bit on randomized series (magnitudes, dup timestamps)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(20260814L)
    val rows = (0 until 40).flatMap { ent =>
      val n = 3 + rnd.nextInt(60)
      val scaleUp = if (ent % 3 == 0) 1e9 else 1.0 // overflow regime
      (0 until n).map { j =>
        // ~20% duplicate timestamps exercise the (e, tb, v) tie chain
        val sec = if (j > 0 && rnd.nextDouble() < 0.2) j - 1 else j
        (s"e$ent", new java.sql.Timestamp(sec * 1000L),
          (ent * 1000 + j).toLong,
          rnd.nextDouble() * scaleUp - scaleUp / 3)
      }
    }
    val df = rows.toDF("key", "ts", "event_id", "value")
      .repartition(13)
    for (buckets <- Seq(3, 4, 7, 16)) {
      val streaming = TimeSeries.lttb(df, Seq("key"), "ts", "value",
          "event_id", buckets)
        .select($"key", $"sel_rank", $"ts_epoch", $"value")
        .as[(String, Long, Long, Double)].collect().sorted.toSeq
      // the array-fold reference: the pre-round-8 collect_list shape
      val folded = df
        .select($"key", struct(
          unix_timestamp($"ts").as("e"),
          $"event_id".cast("long").as("tb"),
          $"value".cast("double").as("v")).as("__s"))
        .groupBy($"key")
        .agg(array_sort(collect_list($"__s")).as("__items"))
        .withColumn("__ev", transform($"__items",
          it => struct(it.getField("e").as("e"),
            it.getField("v").as("v"))))
        .select($"key", $"__ev", posexplode(
          graft.functions.LttbExpression.lttbSelect($"__ev", buckets))
          .as(Seq("sel_rank", "__idx")))
        .select($"key", $"sel_rank".cast("long"),
          element_at($"__ev", $"__idx" + 1).getField("e"),
          element_at($"__ev", $"__idx" + 1).getField("v"))
        .as[(String, Long, Long, Double)].collect().sorted.toSeq
      assert(streaming == folded, s"buckets=$buckets")
    }
  }

  test("m4: hand-checked bucket aggregates; every extreme kept; " +
      "first/last tie rule deterministic") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // e 0..7 over 2 buckets (span 8): bucket 0 = e 0..3, 1 = e 4..7
    val pts = Seq(
      ("k", t(0), 1L, 5.0), ("k", t(1), 2L, 9.0), ("k", t(2), 3L, 1.0),
      ("k", t(3), 4L, 6.0), ("k", t(4), 5L, 2.0), ("k", t(7), 6L, 8.0))
      .toDF("key", "ts", "event_id", "value")
    val got = TimeSeries.m4(pts, Seq("key"), "ts", "value", "event_id",
        buckets = 2)
      .select($"bucket", $"n", $"v_min", $"v_max", $"v_first", $"v_last")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 4L, 1.0, 9.0, 5.0, 6.0),
      (1L, 2L, 2.0, 8.0, 2.0, 8.0)), got.toSeq)
  }

  test("holt: hand-checked level/trend recursion; forecast tracks a " +
      "perfect linear ramp; non-exact smoothing complements refused") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // x = 10, 12: l1=10 b1=0; l2 = .25*12 + .75*10 = 10.5;
    // b2 = .5*(10.5-10) + .5*0 = 0.25; forecast2 = 10.75
    val pts = Seq(("k", t(0), 1L, 10.0), ("k", t(1), 2L, 12.0))
      .toDF("key", "ts", "event_id", "value")
    val got = TimeSeries.holt(pts, Seq("key"), Seq("ts", "event_id"),
        "value", alpha = 0.25, beta = 0.5)
      .select($"event_id", $"level", $"trend", $"forecast")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10.0, 0.0, 10.0),
      (2L, 10.5, 0.25, 10.75)), got.toSeq)
    // a long perfect ramp converges to the true slope: the forecast
    // becomes exact (the property EWMA alone can never achieve)
    val ramp = (0 until 200).map(i => ("r", t(i), i.toLong, 100.0 + 3.0 * i))
      .toDF("key", "ts", "event_id", "value")
    val tail = TimeSeries.holt(ramp, Seq("key"), Seq("ts", "event_id"),
        "value", alpha = 0.25, beta = 0.5)
      .orderBy($"event_id".desc).limit(1)
      .select($"value", $"forecast").as[(Double, Double)].head()
    assert(math.abs(tail._2 - (tail._1 + 3.0)) < 1e-6, tail.toString)
    // drift-prone parameters fail loudly, not as an oracle mismatch
    val e = intercept[IllegalArgumentException] {
      TimeSeries.holt(pts, Seq("key"), Seq("ts", "event_id"),
        "value", alpha = 0.3, beta = 0.5).collect()
    }
    assert(e.getMessage.contains("complement"))
  }

  test("holtWinters: hand-checked seasonal recursion; warmup emits " +
      "nothing; seasonal series forecasts exactly; refusal") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // m=2, α=β=γ=0.5, x = 1,2,3,4: warmup l0=1.5, ring=[-0.5, 0.5];
    // x=3: l=2.5 b=0.5 s=0.0 fc=2.5+0.5+0.5=3.5
    // x=4: l=3.25 b=0.625 s=0.625 fc=3.25+0.625+0.0=3.875
    val pts = (1 to 4).map(i => ("k", t(i), i.toLong, i.toDouble))
      .toDF("key", "ts", "event_id", "value")
    val got = TimeSeries.holtWinters(pts, Seq("key"),
        Seq("ts", "event_id"), "value", alpha = 0.5, beta = 0.5,
        gamma = 0.5, period = 2)
      .select($"event_id", $"level", $"trend", $"season", $"forecast")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (3L, 2.5, 0.5, 0.0, 3.5),
      (4L, 3.25, 0.625, 0.625, 3.875)), got.toSeq)
    // a perfectly periodic series (no trend) converges to exact
    // one-step forecasts — the property Holt alone can never achieve
    val season = Seq(10.0, 20.0, 40.0, 20.0)
    val per = (0 until 200).map(i =>
      ("p", t(i), i.toLong, season(i % 4)))
      .toDF("key", "ts", "event_id", "value")
    val tail = TimeSeries.holtWinters(per, Seq("key"),
        Seq("ts", "event_id"), "value", alpha = 0.25, beta = 0.25,
        gamma = 0.5, period = 4)
      .orderBy($"event_id".desc).limit(2)
      .select($"event_id", $"forecast")
      .as[(Long, Double)].collect().sortBy(_._1)
    tail.foreach { case (id, fc) =>
      assert(math.abs(fc - season(((id + 1) % 4).toInt)) < 1e-6,
        s"id=$id fc=$fc")
    }
    // a series shorter than one period emits nothing
    assert(TimeSeries.holtWinters(pts.filter($"event_id" <= 2),
      Seq("key"), Seq("ts", "event_id"), "value", 0.5, 0.5, 0.5,
      period = 2).count() == 0L)
    // drift-prone gamma fails loudly, not as an oracle mismatch
    val e = intercept[IllegalArgumentException] {
      TimeSeries.holtWinters(pts, Seq("key"), Seq("ts", "event_id"),
        "value", alpha = 0.5, beta = 0.5, gamma = 0.3,
        period = 2).collect()
    }
    assert(e.getMessage.contains("complement"))
  }

  test("cusum: hand-checked drift accumulation, alarm at threshold, " +
      "reset after alarm; one-sided excursions don't cross-charge") {
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // target 10, slack 2, threshold 5: values 18,16 accumulate
    // (18-10-2)+(16-10-2)=6+4 -> s_pos 6 then 10 -> alarm at i=1,
    // reset; then 3 gives s_neg (10-3-2)=5 (NOT >5: no alarm); then 1
    // adds (10-1-2)=7 -> s_neg 12 -> alarm; 10 after reset: all zero
    val pts = Seq(
      ("k", t(0), 1L, 18.0), ("k", t(1), 2L, 16.0),
      ("k", t(2), 3L, 3.0), ("k", t(3), 4L, 1.0),
      ("k", t(4), 5L, 10.0))
      .toDF("key", "ts", "event_id", "value")
    val got = TimeSeries.cusum(pts, Seq("key"), Seq("ts", "event_id"),
        "value", target = 10.0, slack = 2.0, threshold = 5.0)
      .select($"event_id", $"cusum_pos", $"cusum_neg", $"alarm")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 6.0, 0.0, true),   // 6 > 5 immediately
      (2L, 4.0, 0.0, false),  // post-reset: 16 contributes 4
      (3L, 0.0, 5.0, false),  // 5 is NOT > 5
      (4L, 0.0, 12.0, true),
      (5L, 0.0, 0.0, false)), got.toSeq)
  }

  test("availability: overlap union, window clamping, out-of-window " +
      "drop; hand-checked fractions") {
    // window [100, 199] (100s). h1: [90,120]+[110,140] union-> clamp
    // [100,140] = 41s; [180,260] clamps to [180,199] = 20s -> 61/100.
    // h2: one exact-window interval -> 1.0. h3: fully outside -> no row
    val iv = Seq(
      ("h1", 90L, 120L), ("h1", 110L, 140L), ("h1", 180L, 260L),
      ("h2", 100L, 199L),
      ("h3", 0L, 50L), ("h3", 300L, 400L))
      .toDF("host", "lo", "hi")
    val got = TimeSeries.availability(iv, Seq("host"), "lo", "hi",
        windowLo = 100L, windowHi = 199L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "h1" -> ((61L, 100L, 610000L)),
      "h2" -> ((100L, 100L, 1000000L))), got.toString)
  }

  test("subtractIntervals: splits, truncation, full erasure, touching " +
      "fragments coalesce, per-key isolation") {
    val a = Seq(
      // one B hole in the middle -> split into two fragments
      ("h1", 0L, 100L),
      // B covers it entirely -> erased
      ("h1", 200L, 210L),
      // B clips the head only
      ("h1", 300L, 320L),
      // two overlapping A intervals minus nothing -> one merged island
      ("h2", 0L, 10L), ("h2", 5L, 20L),
      // key with no B at all -> passes through verbatim
      ("h3", 50L, 60L))
      .toDF("host", "lo", "hi")
    val b = Seq(
      ("h1", 40L, 59L), ("h1", 195L, 220L), ("h1", 290L, 309L),
      // B for a key with no A: must not invent coverage
      ("h9", 0L, 1000L))
      .toDF("host", "lo", "hi")
    val got = TimeSeries.subtractIntervals(a, b, Seq("host"), "lo", "hi")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      ("h1", 0L, 39L), ("h1", 60L, 100L), ("h1", 310L, 320L),
      ("h2", 0L, 20L), ("h3", 50L, 60L)), got.toString)
    // closed-second lengths of the h1 fragments: 40 + 41 + 11
    assert(got.filter(_._1 == "h1").map(r => r._3 - r._2 + 1).sum == 92L)
  }

  test("availabilityDowntimeAdjusted: downtime leaves numerator AND " +
      "denominator; all-downtime key reads 0 covered; down-only key " +
      "emits no row") {
    // window [100, 199] (100s)
    val up = Seq(
      // h1: up [100,179] (80s), downtime [140,159] (20s in window)
      // -> covered 60 of adjusted 80 -> 750000 ppm
      ("h1", 100L, 179L),
      // h2: up the whole window, no downtime -> 100% of 100s
      ("h2", 100L, 199L),
      // h3: uptime entirely inside downtime -> row with covered 0
      ("h3", 120L, 129L),
      // h4: out-of-window uptime only -> no row
      ("h4", 0L, 50L))
      .toDF("host", "lo", "hi")
    val down = Seq(
      ("h1", 140L, 159L),
      ("h3", 100L, 150L),
      // h5 has downtime but no uptime -> no row
      ("h5", 100L, 199L))
      .toDF("host", "lo", "hi")
    val got = TimeSeries.availabilityDowntimeAdjusted(up, down,
        Seq("host"), "lo", "hi", windowLo = 100L, windowHi = 199L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      "h1" -> ((60L, 20L, 100L, 80L, 750000L)),
      "h2" -> ((100L, 0L, 100L, 100L, 1000000L)),
      "h3" -> ((0L, 51L, 100L, 49L, 0L))), got.toString)
  }

  test("availabilityDowntimeAdjusted: empty downtime degenerates to " +
      "availability") {
    val up = Seq(("h1", 90L, 120L), ("h1", 110L, 140L),
      ("h1", 180L, 260L), ("h2", 100L, 199L)).toDF("host", "lo", "hi")
    val down = Seq.empty[(String, Long, Long)].toDF("host", "lo", "hi")
    val adj = TimeSeries.availabilityDowntimeAdjusted(up, down,
        Seq("host"), "lo", "hi", 100L, 199L)
      .select($"host", $"covered_s", $"window_s", $"availability_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    val plain = TimeSeries.availability(up, Seq("host"), "lo", "hi",
        100L, 199L)
      .select($"host", $"covered_s", $"window_s", $"availability_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(adj == plain, s"$adj vs $plain")
  }

  test("availabilityMulti: one merge pass over the hull reproduces " +
      "per-window availability exactly, for every window") {
    // windows: long [100,199], short [150,169]; h1 covers 61s of long
    // (41 + 20) of which [150..169] ∩ ([100,140] ∪ [180,199]) = 0s of
    // short; h2 covers both fully; h4 touches ONLY the short window
    val iv = Seq(
      ("h1", 90L, 120L), ("h1", 110L, 140L), ("h1", 180L, 260L),
      ("h2", 100L, 199L),
      ("h3", 0L, 50L),
      ("h4", 155L, 160L))
      .toDF("host", "lo", "hi")
    val windows = Seq(("long", 100L, 199L), ("short", 150L, 169L))
    val got = TimeSeries.availabilityMulti(iv, Seq("host"), "lo", "hi",
        windows)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "h1" -> ((61L, 610000L, 0L, 0L)),
      "h2" -> ((100L, 1000000L, 20L, 1000000L)),
      "h4" -> ((6L, 60000L, 6L, 300000L))), got.toString)
    // equivalence: for each window, (covered, ppm) must equal the
    // single-window availability chain over the same input
    for ((name, lo, hi) <- windows) {
      val single = TimeSeries.availability(iv, Seq("host"), "lo", "hi",
          lo, hi)
        .select($"host", $"covered_s", $"availability_ppm")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val multi = got.collect {
        case (h, (cl, pl, cs, ps)) =>
          h -> (if (name == "long") (cl, pl) else (cs, ps))
      }.filter(_._2._1 >= 1L)
      assert(multi == single, s"window $name: $multi vs $single")
    }
  }

  test("concurrencySweep: hand-checked curve; closed-interval edge " +
      "touch counts; returns to zero; partitioning-invariant") {
    // [0,10], [5,15], [10,20], [30,30]: peak 3 exactly at t=10 (the
    // closed-end touch), back to 0 after 21 and after 31
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L), (30L, 30L),
      (40L, 35L)) // malformed: dropped
      .toDF("s", "t")
    val got = TimeSeries.concurrencySweep(iv, "s", "t")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // deltas: +1@{0,5,10,30}, −1@{11,16,21,31} (closed ends + 1)
    val deltas = Map(0L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> -1L,
      16L -> -1L, 21L -> -1L, 30L -> 1L, 31L -> -1L)
    var acc = 0L
    val manual = deltas.toSeq.sortBy(_._1).map { case (t, d) =>
      acc += d; (t, d, acc) }
    assert(got.toSeq == manual, s"${got.toSeq} vs $manual")
    assert(got.map(_._3).max == 3L) // peak: 10 ∈ all three intervals
    assert(got.last._3 == 0L)      // sweep closes at zero
    val rep = TimeSeries.concurrencySweep(iv.repartition(13), "s", "t")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rep.sameElements(got))
  }

  test("theilSen: outlier-immune slope, lower-median ranks, equal-x " +
      "pairs excluded") {
    // slopes of (1,1)(2,2)(3,3)(4,100): [1,1,1,33,49,97] -> median
    // rank ceil(6/2)=3 -> 1.0; residuals [0,0,0,96] -> rank 2 -> 0.0
    // (least squares would report slope ~28 on the same points)
    val df = (Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 100.0))
      .map { case (x, y) => ("k", x, y) } ++
      // a second key where two points share x: only the unequal-x
      // pair contributes -> slope (9-5)/(2-1) = 4
      Seq(("dup", 1.0, 5.0), ("dup", 1.0, 7.0), ("dup", 2.0, 9.0)))
      .toDF("k", "x", "y")
    val got = TimeSeries.theilSen(df, Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("k") == ((6L, 1.0, 0.0)))
    // dup: pairs (5,9) and (7,9) vs x=1 -> slopes [2,4], rank 1 -> 2
    // residuals y - 2x = [3, 5, 5] -> rank 2 -> 5
    assert(got("dup") == ((2L, 2.0, 5.0)))
  }

  test("theilSen: maxPointsPerSeries hard-raises naming the hot key " +
      "instead of detonating the quadratic pair join") {
    val df = ((1 to 6).map(i => ("hot", i.toDouble, i.toDouble)) ++
      (1 to 3).map(i => ("cool", i.toDouble, i.toDouble)))
      .toDF("k", "x", "y")
    val e = intercept[Exception] {
      TimeSeries.theilSen(df, Seq("k"), "x", "y",
        maxPointsPerSeries = 5).collect()
    }
    assert(e.getMessage.contains("exceeds 5 points") &&
      e.getMessage.contains("hot"), e.getMessage)
    // under the cap the same frame computes normally
    val ok = TimeSeries.theilSen(df, Seq("k"), "x", "y",
      maxPointsPerSeries = 6).collect()
    assert(ok.length == 2)
  }

  test("theilSen: oversizePairSampleMod degrades a hot series to a " +
      "deterministic pair subsample instead of aborting") {
    // hot: 200 clean-line points y = 2x + 1 (noise-free so ANY pair
    // subsample has slope exactly 2); cool: 4 points, under the cap
    val df = ((1 to 200).map(i => ("hot", i.toDouble, 2.0 * i + 1.0)) ++
      (1 to 4).map(i => ("cool", i.toDouble, 3.0 * i)))
      .toDF("k", "x", "y")
    // exact mode raises on the hot key...
    intercept[Exception] {
      TimeSeries.theilSen(df, Seq("k"), "x", "y",
        maxPointsPerSeries = 64).collect()
    }
    // ...the sampled arm produces a result for BOTH keys
    val got = TimeSeries.theilSen(df, Seq("k"), "x", "y",
      maxPointsPerSeries = 64, oversizePairSampleMod = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (hotPairs, hotSlope, hotIcept) = got("hot")
    // ~1/7 of the 19900 pairs survive the hash filter; the exact fit
    // is recovered because the input is a clean line
    assert(hotPairs > 0 && hotPairs < 19900L / 3, hotPairs.toString)
    assert(hotSlope == 2.0 && hotIcept == 1.0, got("hot").toString)
    // the under-cap series is EXACT — identical to the raise-mode fit
    val exactCool = TimeSeries.theilSen(
      df.filter(col("k") === "cool"), Seq("k"), "x", "y")
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).head
    assert(got("cool") == exactCool, s"${got("cool")} vs $exactCool")
    // determinism: same frame, same sample, bit-identical output
    val again = TimeSeries.theilSen(df.repartition(13), Seq("k"), "x",
        "y", maxPointsPerSeries = 64, oversizePairSampleMod = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(again == got)
  }

  test("theilSen: checkpointed pair-pool staging + fit is " +
      "bit-identical to the one-shot operator for BOTH policies " +
      "(the q_theil_sen shared-staging contract)") {
    // hot series (noisy so pair subsampling could plausibly diverge)
    // + a small exact series — both policies over ONE staged pool
    val df = ((1 to 100).map(i =>
        ("hot", i.toDouble, 2.0 * i + (i % 7) - 3.0)) ++
      (1 to 9).map(i => ("cool", i.toDouble, 3.0 * i + (i % 2))))
      .toDF("k", "x", "y")
    val (pts, pool) = TimeSeries.theilSenPairPool(df, Seq("k"), "x", "y")
    val (ptsC, poolC) = (pts.localCheckpoint(true),
      pool.localCheckpoint(true)) // as SparkEntry stages it
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(rows(TimeSeries.theilSenFit(ptsC, poolC, Seq("k"))) ==
      rows(TimeSeries.theilSen(df, Seq("k"), "x", "y")))
    assert(rows(TimeSeries.theilSenFit(ptsC, poolC, Seq("k"),
        maxPointsPerSeries = 64, oversizePairSampleMod = 7)) ==
      rows(TimeSeries.theilSen(df, Seq("k"), "x", "y",
        maxPointsPerSeries = 64, oversizePairSampleMod = 7)))
    // the exact policy still hard-raises over the staged pool
    val e = intercept[Exception] {
      TimeSeries.theilSenFit(ptsC, poolC, Seq("k"),
        maxPointsPerSeries = 64).collect()
    }
    assert(e.getMessage.contains("exceeds 64 points") &&
      e.getMessage.contains("hot"), e.getMessage)
  }

  test("theilSen: exact mode raises on an over-cap series even when " +
      "ALL its points share one x (zero pairs — the degenerate shape " +
      "the pooled raise alone would silently drop, VERDICT r14)") {
    // 6 points, one x: the pair pool is EMPTY for this series (the
    // join condition needs a.__x < b.__x), so a pair-riding raise
    // never evaluates — the per-series guard must still fire
    val df = ((1 to 6).map(i => ("flat", 1.0, i.toDouble)) ++
      (1 to 3).map(i => ("cool", i.toDouble, 2.0 * i)))
      .toDF("k", "x", "y")
    val e = intercept[Exception] {
      TimeSeries.theilSen(df, Seq("k"), "x", "y",
        maxPointsPerSeries = 5).collect()
    }
    assert(e.getMessage.contains("exceeds 5 points") &&
      e.getMessage.contains("flat"), e.getMessage)
    // sampling mode keeps its documented behavior for the same shape:
    // no pairs -> no fit for the degenerate series, the cool one fits
    val sampled = TimeSeries.theilSen(df, Seq("k"), "x", "y",
        maxPointsPerSeries = 5, oversizePairSampleMod = 7)
      .collect().map(_.getString(0)).toSeq
    assert(sampled == Seq("cool"), sampled.toString)
  }

  test("acf: alternating series -1/+1, ramp +1, constant dropped") {
    val df = (
      (1 to 5).map(i => ("alt", i.toLong, (1 - i % 2).toDouble)) ++
      (1 to 5).map(i => ("ramp", i.toLong, i.toDouble)) ++
      (1 to 5).map(i => ("flat", i.toLong, 7.0))
    ).toDF("k", "t", "v")
    val got = TimeSeries.acf(df, Seq("k"), Seq("t"), "v", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // x alternates 0,1,0,1,0: lag-1 pairs perfectly anti-correlated,
    // lag-2 pairs perfectly correlated — both exact under the integer
    // moment sums
    assert(got(("alt", 1L)) == ((4L, -1.0)))
    assert(got(("alt", 2L)) == ((3L, 1.0)))
    assert(got(("ramp", 1L)) == ((4L, 1.0)))
    assert(got(("ramp", 2L)) == ((3L, 1.0)))
    // constant series: zero variance on both sides -> no row
    assert(!got.contains(("flat", 1L)))
  }

  test("apdex: boundary membership (v = T satisfied, v = 4T " +
      "tolerating), score arithmetic") {
    val df = Seq(
      ("svc", 50.0), ("svc", 10.0),   // satisfied (<= T, inclusive)
      ("svc", 50.1), ("svc", 200.0),  // tolerating (T < v <= 4T]
      ("svc", 200.1), ("svc", 999.0)  // frustrated
    ).toDF("k", "v")
    val r = TimeSeries.apdex(df, Seq("k"), "v", 50.0).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 6L)
    assert(r.getDouble(4) == 0.5) // (2 + 2*0.5) / 6
  }

  test("pChart: pooled center line, per-period widths, flag fires " +
      "only outside the period's own limits; lcl clamps at 0") {
    // 9 calm periods at 2/100 + one hot period at 30/100:
    // pbar = 48/1000; the hot period is far outside its ucl
    val rows =
      (1 to 9).flatMap(d => (1 to 100).map(i =>
        (f"d$d%02d", i <= 2))) ++
      (1 to 100).map(i => ("d10", i <= 30))
    val df = rows.toDF("day", "fail")
    val got = TimeSeries.pChart(df, Seq.empty, "day", "fail")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7))).toMap
    val (n, x, lcl, ucl, out) = got("d10")
    assert(n == 100L && x == 30L && out)
    assert(ucl < 0.3 && ucl > 0.048)
    val (_, _, lcl1, ucl1, out1) = got("d01")
    assert(!out1 && lcl1 == 0.0) // pbar - 3 sigma < 0 -> clamped
    assert(got.count(_._2._5) == 1) // only the hot day flags
  }

  test("sax: segments of segmentRows, symbols from breakpoints, " +
      "constant key dropped") {
    // key 'k': 4 values with mu = 5, sigma = sqrt((4+4+16+16)/4 - 0)
    // ... use simple values where z-signs are obvious: 1,3,7,9
    // mu = 5, var = (1+9+49+81)/4 - 25 = 10, sigma = sqrt(10)
    val df = (Seq(("k", 1L, 1.0), ("k", 2L, 3.0), ("k", 3L, 7.0),
      ("k", 4L, 9.0)) ++ Seq(("flat", 1L, 2.0), ("flat", 2L, 2.0)))
      .toDF("k", "t", "v")
    val got = TimeSeries.sax(df, Seq("k"), Seq("t"), "v",
        segmentRows = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    // segment 0 mean = 2 -> z = -3/sqrt(10) ~ -0.95 -> 'a'
    // segment 1 mean = 8 -> z = +3/sqrt(10) ~ +0.95 -> 'd'
    val (n0, z0, s0) = got(("k", 0L))
    val (n1, z1, s1) = got(("k", 1L))
    assert(n0 == 2L && s0 == "a" && z0 < -0.6745)
    assert(n1 == 2L && s1 == "d" && z1 > 0.6745)
    assert(!got.keys.exists(_._1 == "flat")) // sigma = 0 dropped
  }
}
