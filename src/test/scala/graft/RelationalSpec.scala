package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Join-operator edge semantics not covered by the pipeline specs. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin: most recent build row at or before probe ts per key") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 5.0),  // after s1
      (2L, 10L, ts("2024-01-01 12:00:00"), 6.0),  // after s2
      (3L, 10L, ts("2024-01-01 08:00:00"), 7.0),  // before any signup
      (4L, 20L, ts("2024-01-01 11:00:00"), 8.0),  // exactly at s3 (inclusive)
      (5L, 30L, ts("2024-01-01 11:00:00"), 9.0)   // key with no build rows
    ).toDF("event_id", "user_id", "ts", "value")
    val build = Seq(
      (10L, ts("2024-01-01 09:00:00"), 100.0),    // s1
      (10L, ts("2024-01-01 11:00:00"), 200.0),    // s2
      (20L, ts("2024-01-01 11:00:00"), 300.0)     // s3
    ).toDF("user_id", "ts", "signup_value")

    val got = Relational.asOfJoin(probe, build, Seq("user_id"), "ts")
      .select($"event_id", $"signup_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> None,
      4L -> Some(300.0), 5L -> None))
  }

  test("asOfJoin forward: earliest build row at or after probe ts") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // between s1 and s2 → s2
      (2L, 10L, ts("2024-01-01 12:00:00")), // after everything → null
      (3L, 10L, ts("2024-01-01 09:00:00")), // exactly at s1 (inclusive)
      (4L, 30L, ts("2024-01-01 11:00:00"))  // key with no build rows
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 09:00:00"), 100.0), // s1
      (10L, ts("2024-01-01 11:00:00"), 200.0)  // s2
    ).toDF("user_id", "ts", "next_value")
    val got = Relational.asOfJoin(probe, build, Seq("user_id"), "ts",
        forward = true)
      .select($"event_id", $"next_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(200.0), 2L -> None, 3L -> Some(100.0), 4L -> None))
  }

  test("asOfJoin carries build rows atomically (null fields don't mix rows)") {
    val probe = Seq((1L, 10L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 09:00:00"), Some(5.0), 100L),
      (10L, ts("2024-01-01 11:00:00"), None, 200L) // null field in latest
    ).toDF("user_id", "ts", "signup_value", "signup_event_id")
    val got = Relational.asOfJoin(probe, build, Seq("user_id"), "ts")
      .select($"signup_value", $"signup_event_id")
      .as[(Option[Double], Long)].head()
    // must be the LATEST row as-is: (null, 200) — not (5.0, 200)
    assert(got == (None, 200L))
  }

  test("asOfJoin: a null-ts build row never matches (both directions)") {
    // a null build ts sorts FIRST in both scan directions; unfiltered,
    // its payload would leak into every probe row with no real match
    val probe = Seq(
      (1L, 10L, Some(ts("2024-01-01 08:00:00"))), // before s1 → null
      (2L, 10L, Some(ts("2024-01-01 10:00:00"))), // after s1 → s1
      (3L, 20L, Some(ts("2024-01-01 10:00:00"))), // key with only null-ts build
      (4L, 10L, None)                             // null probe ts → null
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, Some(ts("2024-01-01 09:00:00")), 100.0), // s1
      (10L, None, 666.0),                            // must never match
      (20L, None, 777.0)                             // must never match
    ).toDF("user_id", "ts", "signup_value")
    for (fwd <- Seq(false, true)) {
      val got = Relational.asOfJoin(probe, build, Seq("user_id"), "ts",
          forward = fwd)
        .select($"event_id", $"signup_value")
        .as[(Long, Option[Double])].collect().toMap
      val s1 = Some(100.0)
      val expected =
        if (fwd) Map(1L -> s1, 2L -> None, 3L -> None, 4L -> None)
        else Map(1L -> None, 2L -> s1, 3L -> None, 4L -> None)
      assert(got == expected, s"forward=$fwd")
    }
  }

  test("asOfJoin preserves probe row count (left semantics)") {
    val probe = spark.range(100).select(
      col("id").as("event_id"), (col("id") % 7).as("user_id"),
      timestamp_seconds(col("id") * 1000).as("ts"))
    val build = spark.range(10).select(
      (col("id") % 7).as("user_id"),
      timestamp_seconds(col("id") * 9000).as("ts"),
      col("id").as("payload"))
    val out = Relational.asOfJoin(probe, build, Seq("user_id"), "ts")
    assert(out.count() == 100)
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "payload"))
  }

  test("rangeJoin equals the naive containment join; bounds inclusive") {
    import org.apache.spark.sql.functions.{col, floor}
    val points = spark.range(0, 500).select(
      col("id").as("pid"), (col("id") * 37 % 1000).as("pt"))
    val intervals = spark.range(0, 40).select(
      col("id").as("iid"),
      (col("id") * 25).as("s"),
      // varied lengths, some spanning several bins, some empty-range
      (col("id") * 25 + col("id") % 4 * 30).as("e"))
    val got = Relational.rangeJoin(points, intervals, "pt", "s", "e",
        binWidth = 50L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
    // inclusive at both bounds, exclusive just outside
    val p2 = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "pt")
    val i2 = Seq((7L, 10L, 20L)).toDF("iid", "s", "e")
    val b = Relational.rangeJoin(p2, i2, "pt", "s", "e", 8L)
      .select($"pid").as[Long].collect().toSet
    assert(b == Set(1L, 2L))
  }

  test("intervalOverlapJoin == naive overlap join, each pair ONCE; " +
      "malformed dropped; over-wide interval raises") {
    import org.apache.spark.sql.functions.col
    val a = spark.range(0, 60).select(col("id").as("aid"),
      (col("id") * 17 % 300).as("sa"),
      (col("id") * 17 % 300 + col("id") % 5 * 40).as("ta"))
    val b = spark.range(0, 50).select(col("id").as("bid"),
      (col("id") * 23 % 280).as("sb"),
      (col("id") * 23 % 280 + col("id") % 7 * 25).as("tb"))
    // multi-bin spans included (binWidth 50 vs lengths up to 160):
    // exact MULTISET equality proves the canonical bin fires once
    val got = Relational.intervalOverlapJoin(a, b, "sa", "ta", "sb",
        "tb", binWidth = 50L)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq.sorted
    val naive = a.crossJoin(b)
      .filter(col("sa") <= col("tb") && col("sb") <= col("ta"))
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == naive && got.nonEmpty)
    // inclusive edge touch counts as overlap; disjoint does not;
    // malformed (t < s) interval drops
    val x = Seq((1L, 0L, 10L), (2L, 50L, 40L)).toDF("xid", "sx", "tx")
    val y = Seq((7L, 10L, 20L), (8L, 11L, 20L)).toDF("yid", "sy", "ty")
    val edge = Relational.intervalOverlapJoin(x, y, "sx", "tx", "sy",
        "ty", binWidth = 8L)
      .select($"xid", $"yid").as[(Long, Long)].collect().toSet
    assert(edge == Set((1L, 7L)))
    // over-wide interval: hard error, not a silent candidate blowup
    val wide = Seq((9L, 0L, 1000000L)).toDF("xid", "sx", "tx")
    val err = intercept[Exception] {
      Relational.intervalOverlapJoin(wide, y, "sx", "tx", "sy", "ty",
        binWidth = 10L, maxBinsPerInterval = 16L).collect()
    }
    assert(err.getMessage != null)
  }

  test("snapshotDiff: added/removed/changed classification, nulls compared") {
    val prev = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val cur = Seq(
      (1L, Some("a"), 10.0),              // unchanged -> dropped
      (2L, Some("B"), 20.0),              // changed string
      (3L, Some("c"), 30.0),              // null -> value is a CHANGE
      (5L, Some("e"), 50.0))              // added; 4 removed
      .toDF("k", "s", "v")
    val got = Relational.snapshotDiff(prev, cur, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // column order must not matter: hashes serialize sorted-name
    val curReordered = cur.select($"k", $"v", $"s")
    val got2 = Relational.snapshotDiff(prev, curReordered, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got2 == got)
  }

  test("enrich applies defaults only to missing keys") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "x")
    val dims = Seq((1L, "named")).toDF("k", "name")
    val got = Relational.enrich(fact, dims, Seq("k"),
        Map("name" -> "unknown"))
      .select($"k", $"name").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "named", 2L -> "unknown"))
  }
}
