package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Sampling, TextOps}

/** Event-behavior analytics (funnel, cohort retention, transitions,
  * SCD2 history, MAD outliers) + the chunking/mixture curation ops —
  * semantics pinned on hand-built fixtures where ordering and edge
  * cases are known exactly.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, user_id, type, ts) — user 1 completes the full funnel;
  // user 2 views BEFORE signing up (its view must not count); user 3
  // signs up only; user 4 has no signup at all.
  private lazy val funnelEvents = Seq(
    (1L, 1L, "signup", ts("2024-01-01 10:00:00")),
    (2L, 1L, "view", ts("2024-01-01 10:05:00")),
    (3L, 1L, "click", ts("2024-01-01 10:06:00")),
    (4L, 1L, "purchase", ts("2024-01-01 10:30:00")),
    (5L, 2L, "view", ts("2024-01-02 09:00:00")),
    (6L, 2L, "signup", ts("2024-01-02 09:30:00")),
    (7L, 2L, "click", ts("2024-01-02 09:45:00")),
    (8L, 3L, "signup", ts("2024-01-03 08:00:00")),
    (9L, 4L, "view", ts("2024-01-04 08:00:00"))
  ).toDF("event_id", "user_id", "event_type", "ts")

  test("funnel: steps only count at-or-after the previous step") {
    val per = Behavior.funnel(funnelEvents, "user_id", "event_type",
      "ts", Seq("signup", "view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(per.length == 4)
    // user 1: all four steps
    assert((1 to 4).forall(i => !per(0).isNullAt(i)))
    // user 2: signup reached, but its only view PRECEDES signup → the
    // funnel stops (click can't qualify without a qualifying view)
    assert(!per(1).isNullAt(1) && per(1).isNullAt(2) && per(1).isNullAt(3))
    // user 3: signup only; user 4: nothing
    assert(!per(2).isNullAt(1) && per(2).isNullAt(2))
    assert((1 to 4).forall(per(3).isNullAt))
  }

  test("funnel counts are monotonically non-increasing") {
    val rows = Behavior.funnelCounts(funnelEvents, "user_id",
      "event_type", "ts", Seq("signup", "view", "click", "purchase"))
      .orderBy("step").collect()
    val counts = rows.map(_.getAs[Long]("entities"))
    assert(counts.toSeq == Seq(3L, 1L, 1L, 1L))
    assert(rows.map(_.getAs[String]("step_name")).toSeq ==
      Seq("signup", "view", "click", "purchase"))
  }

  test("cohort retention: offsets anchor to each user's first week") {
    // user 1 first active Mon Jan 1 week, returns 2 weeks later;
    // user 2 first active Jan 8 week only
    val ev = Seq(
      (1L, 1L, ts("2024-01-02 10:00:00")),
      (2L, 1L, ts("2024-01-16 10:00:00")),
      (3L, 2L, ts("2024-01-09 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Behavior.cohortRetention(ev, "user_id", "ts", "week")
      .orderBy("cohort", "offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("transitions: lag pairs per user, counted across the stream") {
    val got = Behavior.transitions(funnelEvents, "user_id",
      "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // user1: s→v→c→p; user2: v→s→c; user3/4: single events, no pairs
    assert(got(("signup", "view")) == 1L)
    assert(got(("view", "click")) == 1L)
    assert(got(("click", "purchase")) == 1L)
    assert(got(("view", "signup")) == 1L)
    assert(got(("signup", "click")) == 1L)
    assert(got.values.sum == 5L)
  }

  test("scd2: consecutive equal states merge; open interval null") {
    val snaps = Seq(
      (1L, 10L, "OK", ts("2024-01-01 00:00:00")),
      (2L, 10L, "OK", ts("2024-01-02 00:00:00")), // same state → merge
      (3L, 10L, "CRIT", ts("2024-01-03 00:00:00")),
      (4L, 10L, "OK", ts("2024-01-04 00:00:00")) // state may recur
    ).toDF("event_id", "host", "status", "ts")
    val got = Behavior.scd2History(snaps, "host", "status", "ts",
      "event_id").orderBy("valid_from").collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[String]("state")).toSeq ==
      Seq("OK", "CRIT", "OK"))
    // each interval closes at the NEXT change, not the next snapshot
    assert(got(0).getAs[Timestamp]("valid_to") ==
      ts("2024-01-03 00:00:00"))
    assert(got(1).getAs[Timestamp]("valid_to") ==
      ts("2024-01-04 00:00:00"))
    assert(got(2).isNullAt(3)) // current state: open interval
  }

  test("reliability: episode merge, open-outage exclusion from MTTR, " +
      "MTBF between failure starts; hand-checked seconds") {
    val snaps = Seq(
      // h1: DOWN [00:00,01:00) (two equal snapshots = ONE episode),
      // UP, DOWN [03:00,03:30), UP, DOWN open at 05:00
      (1L, "h1", "DOWN", ts("2024-01-01 00:00:00")),
      (2L, "h1", "DOWN", ts("2024-01-01 00:20:00")),
      (3L, "h1", "UP", ts("2024-01-01 01:00:00")),
      (4L, "h1", "DOWN", ts("2024-01-01 03:00:00")),
      (5L, "h1", "UP", ts("2024-01-01 03:30:00")),
      (6L, "h1", "DOWN", ts("2024-01-01 05:00:00")),
      // h2: never down -> no row
      (7L, "h2", "UP", ts("2024-01-01 00:00:00")),
      // h3: one open outage -> counted, but no MTTR/MTBF yet
      (8L, "h3", "DOWN", ts("2024-01-01 02:00:00"))
    ).toDF("event_id", "host", "status", "ts")
    val got = Behavior.reliability(snaps, "host", "status", "ts",
        "event_id", downState = "DOWN")
      .collect().map(r => r.getAs[String]("host") ->
        (r.getAs[Long]("n_failures"),
          Option(r.getAs[java.lang.Double]("mttr_s")),
          Option(r.getAs[java.lang.Double]("mtbf_s")))).toMap
    // h1: 3 failures; closed durations 3600s + 1800s -> MTTR 2700;
    // starts 00:00, 03:00, 05:00 -> gaps 10800, 7200 -> MTBF 9000
    assert(got("h1") == ((3L, Some(2700.0), Some(9000.0))), got.toString)
    assert(got("h3") == ((1L, None, None)))
    assert(!got.contains("h2"))
  }

  test("mad outliers: a masked extreme survives where z-score hides it") {
    // 20 tight points + 2 extremes: the extremes inflate stddev enough
    // that 3σ z-scoring misses them at small n, while the median/MAD
    // pair is untouched by the contamination
    val vals = (1 to 20).map(i => 100.0 + (i % 5)) ++ Seq(100000.0, -100000.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
      .toDF("event_id", "grp", "value")
    val mad = Behavior.madOutliers(df, "grp", "value", 3.0)
      .select("event_id").as[Long].collect().toSet
    assert(mad == Set(20L, 21L))
  }

  test("chunkText: stride windows, short doc = one chunk, empty = none") {
    val docs = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")), // 12 toks
      (2L, "only three tokens"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.chunkText(docs, "doc_id", "text", size = 5,
      stride = 3).orderBy("doc_id", "chunk_no").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // ceil((12-5)/3)+1 = 4 chunks; last starts at token 10
    assert(d1.length == 4)
    assert(d1(0).getAs[String]("chunk") == "w1 w2 w3 w4 w5")
    assert(d1(1).getAs[String]("chunk") == "w4 w5 w6 w7 w8")
    assert(d1(3).getAs[String]("chunk") == "w10 w11 w12") // short tail
    assert(got.count(_.getLong(0) == 2L) == 1)
    assert(!got.exists(_.getLong(0) == 3L))
    // adjacent chunks overlap by size - stride = 2 tokens
    assert(d1(0).getAs[String]("chunk").split(" ").takeRight(2).toSeq ==
      d1(1).getAs[String]("chunk").split(" ").take(2).toSeq)
  }

  test("sessionize: splits at gap > threshold, second resolution") {
    // user 1: three events 10 min apart (one session), then a 31-min
    // silence starts session 2; user 2: single event = its own session
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:10:00")),
      (3L, 1L, ts("2024-01-01 10:20:00")),
      (4L, 1L, ts("2024-01-01 10:51:00")),
      (5L, 1L, ts("2024-01-01 10:52:00")),
      (6L, 2L, ts("2024-01-01 09:00:00")),
      (7L, 3L, null)
    ).toDF("event_id", "user_id", "ts")
    val got = Behavior.sessionize(ev, "user_id", "ts", 1800L)
      .orderBy("user_id", "session_no").collect()
    assert(got.length == 3) // null ts row dropped
    val s11 = got(0); val s12 = got(1); val s2 = got(2)
    assert(s11.getAs[Long]("session_no") == 1L &&
      s11.getAs[Long]("n_events") == 3L &&
      s11.getAs[Timestamp]("session_end") == ts("2024-01-01 10:20:00"))
    assert(s12.getAs[Long]("session_no") == 2L &&
      s12.getAs[Long]("n_events") == 2L &&
      s12.getAs[Timestamp]("session_start") == ts("2024-01-01 10:51:00"))
    assert(s2.getAs[Long]("user_id") == 2L &&
      s2.getAs[Long]("n_events") == 1L)
    // boundary: a gap of EXACTLY the threshold does not split
    val edge = Seq((1L, 9L, ts("2024-01-01 00:00:00")),
      (2L, 9L, ts("2024-01-01 00:30:00"))).toDF("event_id", "user_id", "ts")
    assert(Behavior.sessionize(edge, "user_id", "ts", 1800L).count() == 1L)
  }

  test("pageRank: sums to node count on a regular graph; hub ranks higher") {
    // 3-cycle is 1-regular both ways: stationary pr = 1.0 everywhere
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val prC = Behavior.pageRank(cyc, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prC.values.forall(v => math.abs(v - 1.0) < 1e-9))
    // star: every leaf points at the hub — hub outranks leaves, and
    // leaves (in-degree 0, teleport only) sit at exactly 1 - d
    val star = Seq(("l1", "h"), ("l2", "h"), ("l3", "h"), ("h", "l1"))
      .toDF("src", "dst")
    val prS = Behavior.pageRank(star, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prS("h") > prS("l1"))
    assert(math.abs(prS("l2") - 0.15) < 1e-9) // no in-edges
    assert(prS("l1") > prS("l2")) // fed by the hub
  }

  test("pageRank: broadcast-rank and shuffled-rank layouts are " +
      "bit-identical (r12 layout policy)") {
    // the |V|-gated layout choice (dst-partitioned edges + broadcast
    // ranks vs src-partitioned edges + shuffled ranks) must never be
    // observable in the result: decimal contribution sums are order-
    // independent by design, so both paths hash-match exactly
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L),
      (5L, 1L), (5L, 3L), (2L, 4L)
    ).toDF("src", "dst")
    val bcast = Behavior.pageRank(edges, "src", "dst", iters = 5,
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shuffled = Behavior.pageRank(edges, "src", "dst", iters = 5,
        broadcastRanksMax = 0L, localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bcast == shuffled,
      s"layout changed the result: $bcast vs $shuffled")
    // r13: the driver-side small-graph arm replays the same decimal
    // dataflow — all THREE regimes bit-identical
    val local = Behavior.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local == bcast,
      s"local arm changed the result: $local vs $bcast")
  }

  test("personalizedPageRank: hand-replayed 2 iterations; restart mass " +
      "only at seeds; seedless far nodes read 0; layouts bit-identical") {
    // a -> b, a -> c, b -> a; seed {a}, d = 0.85, 2 iterations:
    // it1: a = 0.15, b = c = 0.85 * (1/2) = 0.425
    // it2: a = 0.15 + 0.85*0.425 = 0.51125, b = c = 0.85*0.075 = 0.06375
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val pr = Behavior.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr == Map("a" -> 0.51125, "b" -> 0.06375, "c" -> 0.06375),
      pr.toString)
    // a disconnected pair never reachable from the seed scores 0
    val edges2 = edges.unionAll(Seq(("x", "y"), ("y", "x"))
      .toDF("src", "dst"))
    val pr2 = Behavior.personalizedPageRank(edges2, "src", "dst",
        seeds, "node", iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2("x") == 0.0 && pr2("y") == 0.0, pr2.toString)
    assert(pr2("a") > pr2("b"))
    // layout gate invisible in values (the pageRank r12 contract)
    val shuffled = Behavior.personalizedPageRank(edges2, "src", "dst",
        seeds, "node", iters = 4, broadcastRanksMax = 0L,
        localMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2 == shuffled)
    // r13: and the distributed broadcast regime == the local arm that
    // produced pr2 (string keys exercise the Any-keyed index path)
    val dist = Behavior.personalizedPageRank(edges2, "src", "dst",
        seeds, "node", iters = 4, localMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2 == dist, s"local vs distributed: $pr2 vs $dist")
  }

  test("personalizedPageRank: an ISOLATED seed (no edges) still emits " +
      "its teleport mass instead of vanishing (ADVICE r12)") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val seeds = Seq("a", "z").toDF("node") // z touches no edge
    val pr = Behavior.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // z: rank = (1-d)*r = 0.15 every round; nothing flows in or out
    assert(pr.contains("z") && pr("z") == 0.15, pr.toString)
    assert(pr("a") == 0.15, pr.toString) // a's mass all exits to b
  }

  test("triangleCounts: K4 exact, pendant absent, dirt canonicalized") {
    // K4 on 1..4 (four triangles, each node in three) + pendant node 5
    // + a self-loop, a duplicate edge, and a reversed edge — all of
    // which canonicalization must absorb without changing a count
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L),          // pendant: in zero triangles -> absent
      (2L, 2L),          // self-loop: dropped
      (2L, 1L), (3L, 1L) // reversed duplicates of existing edges
    ).toDF("s", "d")
    val got = Behavior.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // r13 differential: the distributed wedge join returns the same
    // rows as the driver-side arm the default gate just took
    val dist = Behavior.triangleCounts(edges, "s", "d",
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == got, s"local vs distributed: $got vs $dist")
  }

  test("kaplanMeier: hand-checked curve — censored subjects shrink " +
      "the risk set but never count as deaths") {
    // durations (event?): 1(+), 2(censored), 3(+), 3(+), 4(censored)
    // risk sets: t=1 n=5, t=3 n=3 → S(1)=0.8, S(3)=0.8·(1/3)=0.266667
    val subj = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false)).map { case (d, e) => ("c", d, e) }
      .toDF("cohort", "dur", "ev")
    val got = Behavior.kaplanMeier(subj, Seq("cohort"), "dur", "ev")
      .orderBy("duration")
      .select("duration", "d", "n_at_risk", "survival")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 5L, 0.8), (3L, 2L, 3L, 0.266667)), got)
    // naive failure fraction at t=3 would read 3/5 = 0.6 survival
    // 0.4 — KM's 0.267 correctly charges the censored subjects
  }

  test("notificationSchedule: initial page, slot-gated repeats, " +
      "escalation ordinal; recovery and healthy start page nothing") {
    def ts2(s: String) = ts(s)
    // maxAttempts=1 (every check confirms), interval=1h, escalate at 2
    val snap = Seq(
      (1L, 9L, "ok",   "2024-01-01 09:00:00"),
      (2L, 9L, "crit", "2024-01-01 10:00:00"), // page 0 (slot 0)
      (3L, 9L, "crit", "2024-01-01 10:30:00"), // same slot: silent
      (4L, 9L, "crit", "2024-01-01 11:10:00"), // slot 1 → page 1
      (5L, 9L, "crit", "2024-01-01 12:30:00"), // slot 2 → page 2 (escalated)
      (6L, 9L, "ok",   "2024-01-01 13:00:00"), // recovery: no page row
      (7L, 9L, "crit", "2024-01-01 14:00:00")) // NEW episode → page 0
      .map { case (id, u, st, t) => (id, u, st, ts2(t)) }
      .toDF("event_id", "user_id", "state", "ts")
    val got = Behavior.notificationSchedule(snap, "user_id", "state",
        "ts", "event_id", okState = "ok", maxAttempts = 1,
        intervalSeconds = 3600L, escalateAfter = 2L)
      .orderBy("ts")
      .select("state", "notification_no", "escalated")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("crit", 0L, false), ("crit", 1L, false),
      ("crit", 2L, true), ("crit", 0L, false)), got)
  }

  test("kCore: chain and pendant peel away, clique survives with " +
      "in-core degrees; k above the clique empties; cascade rounds") {
    // 4-clique {1,2,3,4} + chain 4-5-6 + pendant 7 on 1: k=2 peels
    // 6,7 (round 1) then 5 (round 2 — the CASCADE: 5 had degree 2
    // until 6 left), keeping the clique at degree 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (1L, 7L))
      .toDF("s", "d")
    val k2 = Behavior.kCore(edges, "s", "d", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), k2)
    // k=4: nobody keeps degree 4 once the periphery goes — empty
    assert(Behavior.kCore(edges, "s", "d", k = 4).count() == 0L)
    // duplicate/reversed/self-loop edges canonicalize away
    val messy = edges.unionByName(Seq((2L, 1L), (3L, 3L), (1L, 2L))
      .toDF("s", "d"))
    val again = Behavior.kCore(messy, "s", "d", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == k2)
    // r13 differentials: the distributed peel matches the driver-side
    // arm (same rows, same empty-at-k=4, cascade included)
    val dist = Behavior.kCore(edges, "s", "d", k = 2, localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == k2, s"local vs distributed: $k2 vs $dist")
    assert(Behavior.kCore(edges, "s", "d", k = 4,
      localMaxEdges = 0L).count() == 0L)
  }

  test("triangleCounts: two shared-edge triangles; partition-invariant") {
    // triangles {1,2,3} and {2,3,4} share edge 2-3
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val expect = Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
    val a = Behavior.triangleCounts(base, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == expect)
    val b = Behavior.triangleCounts(base.repartition(7), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == expect)
  }

  test("flapDetection: exact weighted pct, STRICT threshold " +
      "hysteresis (boundary rows keep the previous verdict)") {
    // historyLen=3 → m=2 comparisons, weights 1.2 (newest) / 0.8
    // (oldest), pct = 60·chg₀ + 40·chg₁. States a,b,a,b,a,a,a →
    // pct 0, 60, 100, 100, 100, 40, 0. high=90 / low=40 strict:
    // row1 0<40 stop(already off), row3 100>90 start, row6 pct==40
    // is NOT <40 → still flapping, row7 0<40 → stop.
    val snap = Seq("a", "b", "a", "b", "a", "a", "a").zipWithIndex
      .map { case (st, i) =>
        (i.toLong, 7L, st, ts(f"2024-01-01 10:${i}%02d:00")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavior.flapDetection(snap, "user_id", "event_type",
        "ts", "event_id", highPct = 90.0, lowPct = 40.0,
        historyLen = 3)
      .orderBy("ts").select("pct", "flapping")
      .as[(Double, Boolean)].collect().toSeq
    assert(got == Seq((0.0, false), (60.0, false), (100.0, true),
      (100.0, true), (100.0, true), (40.0, true), (0.0, false)), got)
    // strict high: pct exactly 100 must NOT start at highPct=100
    val never = Behavior.flapDetection(snap, "user_id", "event_type",
        "ts", "event_id", highPct = 100.0, lowPct = 40.0,
        historyLen = 3)
      .filter(col("flapping")).count()
    assert(never == 0L)
  }

  test("hardSoftState: retry counter spans differing non-OK states; " +
      "starts-healthy fires nothing; starts-broken fires on harden") {
    // svc 1: ok, warn, crit, crit, ok, warn, ok — warn→crit is
    // attempt 2 (Nagios current_attempt), hardens at the 3rd non-OK
    // check with the state observed THERE (crit), recovery fires,
    // the healthy start does not.
    val svc1 = Seq("ok", "warn", "crit", "crit", "ok", "warn", "ok")
      .zipWithIndex.map { case (st, i) =>
        (i.toLong, 1L, st, ts(f"2024-01-01 10:${i}%02d:00")) }
    // svc 2: crit, crit, crit — first CONFIRMED state is non-OK →
    // the hardening row must fire even with no previous hard state
    val svc2 = Seq("crit", "crit", "crit").zipWithIndex
      .map { case (st, i) =>
        (100L + i, 2L, st, ts(f"2024-01-01 11:${i}%02d:00")) }
    val snap = (svc1 ++ svc2)
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavior.hardSoftState(snap, "user_id", "event_type",
        "ts", "event_id", okState = "ok", maxAttempts = 3)
      .orderBy("user_id", "ts")
      .select("attempt", "state_type", "hard_state", "hard_change")
      .as[(Long, String, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "HARD", "ok", false),   // healthy start: no notification
      (1L, "SOFT", "ok", false),   // warn, attempt 1
      (2L, "SOFT", "ok", false),   // crit continues the run: attempt 2
      (3L, "HARD", "crit", true),  // hardens as crit → page
      (1L, "HARD", "ok", true),    // recovery → page
      (1L, "SOFT", "ok", false),   // soft blip never notifies
      (1L, "HARD", "ok", false),   // back ok, confirmed unchanged
      (1L, "SOFT", null, false),   // svc2: no confirmed state yet
      (2L, "SOFT", null, false),
      (3L, "HARD", "crit", true)), // first confirmation IS the page
      got)
  }

  test("mixtureWeights: sqrt flattening, ratios sum to 1") {
    val df = (Seq.fill(81)("big") ++ Seq.fill(9)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "src")
    val rows = Sampling.mixtureWeights(df, "src")
      .orderBy("domain").collect()
    val big = rows(0); val small = rows(1)
    assert(big.getAs[Long]("n_docs") == 81L)
    // raw ratio 9:1 flattens to sqrt: 9:3 = 0.75 / 0.25
    assert(math.abs(big.getAs[Double]("mix_ratio") - 0.75) < 1e-9)
    assert(math.abs(small.getAs[Double]("mix_ratio") - 0.25) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("mix_ratio")).sum - 1.0) < 1e-9)
  }
}
