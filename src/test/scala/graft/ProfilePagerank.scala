package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch attribution for the `pagerank_edges` scale row (VERDICT r12
  * task 2, the ProfileWedges convention): decompose the 5-round
  * PageRank on the exact graphs the probe runs — the sf0.1 lineitem
  * (order, supplier) bipartite graph and its 10× replica (orderkeys
  * shift per copy, suppliers are shared dims, so supplier hubs gain
  * 10× degree while order nodes multiply) — into
  *
  *  - DETERMINISTIC work terms: |V|, |E|, per-round broadcast payload
  *    rows (= |nodes with out-edges| = |V| on this symmetric graph),
  *    per-round rank-join output (= |E|), per-round aggregate output
  *    (= |distinct dst| = |V|);
  *  - MEASURED per-run shuffle volume (listener-accumulated task
  *    shuffle write records/bytes across the whole 5-round run) and
  *    wall (min of 2), in BOTH layout regimes (|V|-gated broadcast
  *    ranks vs shuffled ranks, forced via broadcastRanksMax).
  *
  * What the wall numbers canNOT be read for: absolute truth — the
  * host swings 1.6–9.9 s for identical code across sessions. What
  * they CAN be read for within one session: the broadcast-vs-shuffled
  * delta at each scale and the shape of the x1→x10 growth, next to
  * work terms that are exact.
  */
object ProfilePagerank {
  /** The probe graph at `factor`: same data the ScaleProbe replica
    * produces (l_orderkey += 1e9·copy, suppliers shared), built
    * in-memory so the profiler needs no replica dir. */
  private def edges(s: SparkSession, dir: String, factor: Int): DataFrame = {
    val base = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("o0"),
        col("l_suppkey").cast("long").as("sk"))
    val all = (0 until factor).map { i =>
      base.select(concat(lit("O"), col("o0") + lit(1000000000L * i)).as("o"),
        concat(lit("S"), col("sk")).as("p"))
    }.reduce(_ unionByName _).distinct()
    all.select(col("o").as("src"), col("p").as("dst"))
      .union(all.select(col("p").as("src"), col("o").as("dst")))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // listener-accumulated shuffle totals (all tasks, whole run)
    val recs = new java.util.concurrent.atomic.AtomicLong
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    for (f <- Seq(1, 10)) {
      val e0 = edges(spark, dir, f).localCheckpoint(true)
      val nE = e0.count()
      val nV = e0.select(col("src")).union(e0.select(col("dst")))
        .distinct().count()
      val nSrc = e0.select(col("src")).distinct().count()
      val nDst = e0.select(col("dst")).distinct().count()
      System.err.println(s"[pr-decomp] factor=$f V=$nV E=$nE " +
        s"broadcastRowsPerRound=$nSrc aggOutPerRound=$nDst " +
        s"rankJoinOutPerRound=$nE")
      for ((regime, bMax) <- Seq("broadcast" -> 4000000L,
          "shuffled" -> 0L)) {
        val walls = (1 to 2).map { _ =>
          recs.set(0); bytes.set(0)
          val t0 = System.nanoTime()
          graft.operators.Behavior.pageRank(e0, "src", "dst",
              iters = 5, broadcastRanksMax = bMax, localMaxEdges = 0L)
            .write.mode("overwrite").format("noop").save()
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events drain asynchronously (the bus is
          // private[spark]); poll until the counters stabilize
          var last = -1L
          while (recs.get() != last) {
            last = recs.get(); Thread.sleep(300)
          }
          (wall, recs.get(), bytes.get())
        }
        val best = walls.minBy(_._1)
        System.err.println(f"[pr-decomp] factor=$f regime=$regime " +
          f"wall=${best._1}%.2f s shuffleRecords=${best._2} " +
          f"shuffleMB=${best._3 / 1e6}%.1f")
      }
    }
    spark.stop()
  }
}
