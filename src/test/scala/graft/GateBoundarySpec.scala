package graft

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Dedup}

/** Boundary probes for the four small-graph driver gates (VERDICT r13
  * task 4): the differential specs pin local == distributed on small
  * fixtures, but nothing exercised the GATE itself — these tests set
  * `localMaxEdges` exactly at / just under the fixture's canonical
  * edge count and prove, via job callsites, that (a) the driver arm
  * engages exactly at the declared constant, (b) one edge past it the
  * operator NEVER materializes the edge list on the driver (the
  * tripwire that catches a future "bump the constant to 50M" slip),
  * and (c) the two regimes agree bit-for-bit across the flip. Plus
  * the two fall-throughs that must hold at size: CC's null-endpoint
  * edges and PPR's seed/edge dataType mismatch (ADVICE r13 — boxed
  * HashMap keys would mis-key an IntegerType seed against LongType
  * edges where the distributed union widens).
  */
class GateBoundarySpec extends SparkSpec {
  import spark.implicits._

  /** Job callsites (short form) fired while `body` runs — flushed via
    * a marker job group, the ExtensionOpsSpec lazy-probe convention.
    */
  private def jobCallsites(body: => Unit): Seq[String] = {
    val events =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // the action callsite rides on the STAGE names ("collect at
        // Behavior.scala:702"), not on a job property
        val group = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id", "")).getOrElse("")
        j.stageInfos.foreach(si => events.add((group, si.name)))
        if (j.stageInfos.isEmpty) events.add((group, ""))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      spark.sparkContext.setJobGroup("gate-probe-marker", "")
      spark.range(1).count()
      spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10_000_000_000L
      import scala.jdk.CollectionConverters._
      while (!events.asScala.exists(_._1 == "gate-probe-marker") &&
          System.nanoTime() < deadline) Thread.sleep(20)
      events.asScala.toSeq.takeWhile(_._1 != "gate-probe-marker")
        .map(_._2)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def driverCollects(sites: Seq[String], file: String): Int =
    sites.count(_.startsWith(s"collect at $file"))

  // chain 0-1-2-…-19 plus skip edges (i, i+2) at even i: triangles at
  // every even vertex, degrees mixed — canonical count measured below
  private lazy val triGraph = {
    val chain = (0L until 19L).map(i => (i, i + 1))
    val skips = (0L until 18L by 2).map(i => (i, i + 2))
    (chain ++ skips).toDF("u", "v")
  }

  test("pageRank gate: driver arm exactly at localMaxEdges, one past " +
      "it never collects, regimes agree across the flip") {
    val edges = (0L until 30L).map(i => (i, (i + 1) % 30L))
      .toDF("src", "dst")
    val cnt = 30L
    var local: Array[(Long, Double)] = null
    val sitesAt = jobCallsites {
      local = Behavior.pageRank(edges, "src", "dst", iters = 3,
          localMaxEdges = cnt)
        .as[(Long, Double)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAt, "Behavior.scala") >= 1,
      s"at-gate run took the distributed arm: $sitesAt")
    var dist: Array[(Long, Double)] = null
    val sitesAbove = jobCallsites {
      dist = Behavior.pageRank(edges, "src", "dst", iters = 3,
          localMaxEdges = cnt - 1)
        .as[(Long, Double)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAbove, "Behavior.scala") == 0,
      s"just-above-gate run collected the edge list: $sitesAbove")
    assert(local.sameElements(dist),
      s"regimes disagree across the gate: ${local.toSeq} vs ${dist.toSeq}")
  }

  test("personalizedPageRank gate: seed/edge dataType mismatch falls " +
      "through to the distributed path and matches the same-type " +
      "local fit (ADVICE r13)") {
    val edges = (0L until 20L).map(i => (i, (i + 3) % 20L))
      .toDF("src", "dst") // LongType
    val seedsInt = Seq(0, 5, 10).toDF("node") // IntegerType
    val seedsLong = Seq(0L, 5L, 10L).toDF("node")
    var mismatch: Map[Long, Double] = null
    val sites = jobCallsites {
      mismatch = Behavior.personalizedPageRank(edges, "src", "dst",
          seedsInt, "node", iters = 3, localMaxEdges = 1000)
        .as[(Long, Double)].collect().toMap
    }
    assert(driverCollects(sites, "Behavior.scala") == 0,
      s"mismatched seed type took the driver arm (boxed-key bug): $sites")
    // same-type seeds DO take the driver arm under the same gate…
    var local: Map[Long, Double] = null
    val sitesLocal = jobCallsites {
      local = Behavior.personalizedPageRank(edges, "src", "dst",
          seedsLong, "node", iters = 3, localMaxEdges = 1000)
        .as[(Long, Double)].collect().toMap
    }
    assert(driverCollects(sitesLocal, "Behavior.scala") >= 1, sitesLocal)
    // …and the two fits are identical: the widened distributed run
    // keyed every seed correctly
    assert(mismatch == local, s"$mismatch vs $local")
    assert(mismatch(0L) > mismatch(1L), "seed must outrank non-seed")
  }

  test("triangleCounts gate: flips exactly at localMaxEdges, " +
      "just-above never collects, counts agree") {
    val cnt = triGraph.distinct().count() // canonical: already u<v
    var local: Array[(Long, Long)] = null
    val sitesAt = jobCallsites {
      local = Behavior.triangleCounts(triGraph, "u", "v",
          localMaxEdges = cnt)
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAt, "Behavior.scala") >= 1, sitesAt)
    var dist: Array[(Long, Long)] = null
    val sitesAbove = jobCallsites {
      dist = Behavior.triangleCounts(triGraph, "u", "v",
          localMaxEdges = cnt - 1)
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAbove, "Behavior.scala") == 0, sitesAbove)
    assert(local.nonEmpty && local.sameElements(dist),
      s"${local.toSeq} vs ${dist.toSeq}")
  }

  test("kCore gate: flips exactly at localMaxEdges, just-above never " +
      "collects, cores agree") {
    val cnt = triGraph.distinct().count()
    var local: Array[(Long, Long)] = null
    val sitesAt = jobCallsites {
      local = Behavior.kCore(triGraph, "u", "v", k = 2,
          localMaxEdges = cnt)
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAt, "Behavior.scala") >= 1, sitesAt)
    var dist: Array[(Long, Long)] = null
    val sitesAbove = jobCallsites {
      dist = Behavior.kCore(triGraph, "u", "v", k = 2,
          localMaxEdges = cnt - 1)
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAbove, "Behavior.scala") == 0, sitesAbove)
    assert(local.nonEmpty && local.sameElements(dist),
      s"${local.toSeq} vs ${dist.toSeq}")
  }

  test("connectedComponents gate: counted in SYMMETRIZED edges, " +
      "flips at the constant, just-above never collects, labels agree") {
    val pairs = (0L until 25L by 5L).flatMap(base =>
      Seq((base, base + 1), (base + 1, base + 2)))
      .toDF("id_a", "id_b") // 10 pairs -> 20 sym edges, 5 components
    var local: Array[(Long, Long)] = null
    val sitesAt = jobCallsites {
      local = Dedup.connectedComponents(pairs, localMaxEdges = 20)
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAt, "Dedup.scala") >= 1, sitesAt)
    var dist: Array[(Long, Long)] = null
    val sitesAbove = jobCallsites {
      dist = Dedup.connectedComponents(pairs, localMaxEdges = 19)
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    assert(driverCollects(sitesAbove, "Dedup.scala") == 0, sitesAbove)
    assert(local.sameElements(dist),
      s"${local.toSeq} vs ${dist.toSeq}")
    assert(local.map(_._2).distinct.length == 5)
  }

  /** Physical-plan descriptions of every SQL execution fired while
    * `body` runs — the plan observable for the broadcastRanksMax
    * layout-flip probe (job callsites can't tell the two layouts
    * apart; the executed plans can).
    */
  private def sqlPlans(body: => Unit): Seq[String] = {
    val plans =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart =>
            plans.add(s.physicalPlanDescription); ()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // flush marker: the bus is FIFO, so once the marker's own
      // execution-start lands, every event from `body` has too
      spark.range(1).select(col("id").as("__plan_marker")).collect()
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!plans.asScala.exists(_.contains("__plan_marker")) &&
          System.nanoTime() < deadline) Thread.sleep(20)
      plans.asScala.toSeq.takeWhile(!_.contains("__plan_marker"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pageRank broadcastRanksMax: the rank-broadcast layout flips " +
      "exactly at the constant (plan observable), ranks identical " +
      "across the flip (VERDICT r14 task 6)") {
    // ring + chords: |V| = 24, |E| = 36 — distributed path forced via
    // localMaxEdges = 0. Auto-broadcast is disabled for the probe so
    // the ONLY broadcast in any plan is the one the layout decision
    // plants; otherwise Spark would broadcast these tiny sides on
    // size estimation in both regimes and the observable would lie.
    val edges = ((0L until 24L).map(i => (i, (i + 1) % 24L)) ++
      (0L until 24L by 2).map(i => (i, (i + 7) % 24L)))
      .toDF("src", "dst")
    val nV = 24L
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try {
      var bc: Array[(Long, Double)] = null
      val plansAt = sqlPlans {
        bc = Behavior.pageRank(edges, "src", "dst", iters = 3,
            localMaxEdges = 0L, broadcastRanksMax = nV)
          .as[(Long, Double)].collect().sortBy(_._1)
      }
      assert(plansAt.exists(_.contains("BroadcastExchange")),
        "at-gate run planted no rank broadcast")
      var shuf: Array[(Long, Double)] = null
      val plansAbove = sqlPlans {
        shuf = Behavior.pageRank(edges, "src", "dst", iters = 3,
            localMaxEdges = 0L, broadcastRanksMax = nV - 1)
          .as[(Long, Double)].collect().sortBy(_._1)
      }
      assert(!plansAbove.exists(_.contains("BroadcastExchange")),
        "just-above-gate run still broadcast the ranks")
      // the huge-|V| layout pays its one extra |E| exchange: the
      // src-repartition flip is one additional SQL execution (the
      // eager checkpoint) vs the broadcast layout
      assert(plansAbove.size == plansAt.size + 1,
        s"expected exactly one extra execution (the src-layout " +
          s"checkpoint): ${plansAt.size} vs ${plansAbove.size}")
      assert(bc.nonEmpty && bc.sameElements(shuf),
        s"layouts disagree across the flip: ${bc.toSeq} vs ${shuf.toSeq}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("personalizedPageRank broadcastRanksMax: layout flips at the " +
      "constant, seeded ranks identical across it") {
    val edges = ((0L until 24L).map(i => (i, (i + 1) % 24L)) ++
      (0L until 24L by 3).map(i => (i, (i + 5) % 24L)))
      .toDF("src", "dst")
    val seeds = Seq(0L, 6L, 12L).toDF("node")
    val nV = 24L
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try {
      var bc: Array[(Long, Double)] = null
      val plansAt = sqlPlans {
        bc = Behavior.personalizedPageRank(edges, "src", "dst", seeds,
            "node", iters = 3, localMaxEdges = 0L,
            broadcastRanksMax = nV)
          .as[(Long, Double)].collect().sortBy(_._1)
      }
      assert(plansAt.exists(_.contains("BroadcastExchange")),
        "at-gate run planted no rank broadcast")
      var shuf: Array[(Long, Double)] = null
      val plansAbove = sqlPlans {
        shuf = Behavior.personalizedPageRank(edges, "src", "dst",
            seeds, "node", iters = 3, localMaxEdges = 0L,
            broadcastRanksMax = nV - 1)
          .as[(Long, Double)].collect().sortBy(_._1)
      }
      assert(!plansAbove.exists(_.contains("BroadcastExchange")),
        "just-above-gate run still broadcast the ranks")
      assert(bc.nonEmpty && bc.sameElements(shuf),
        s"layouts disagree across the flip: ${bc.toSeq} vs ${shuf.toSeq}")
      assert(bc.toMap.apply(0L) > bc.toMap.apply(1L),
        "seed must outrank non-seed")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("connectedComponents gate: null endpoints under the gate fall " +
      "through to the distributed closure (rounds > 0)") {
    val pairs = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 3L), (10L, 11L), (20L, null))
      .toDF("id_a", "id_b")
    val (res, rounds) = Dedup.connectedComponentsWithRounds(
      pairs, localMaxEdges = 1000)
    assert(rounds > 0,
      "null-endpoint edges must not be closed by the driver union-find")
    val got = res.filter($"id".isNotNull)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L &&
      got(10L) == 10L && got(11L) == 10L, got.toString)
  }
}
