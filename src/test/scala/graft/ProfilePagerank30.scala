package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Beyond-10× attribution for the `pagerank_edges` scale row (VERDICT
  * r14 task 3): the 30× probe crosses TWO regime lines at once — the
  * graph leaves the 4M-|V| rank-broadcast layout (sf0.1 × 30 →
  * |V| ≈ 4.5M) AND each shuffled round moves 3× the 10× edge volume —
  * so the raw 30×/1× wall ratio cannot be read without separating
  *
  *  - the layout flip (forced per-regime via `broadcastRanksMax`:
  *    10M = broadcast at every probed factor, 0 = shuffled always);
  *  - fixed setup vs per-iteration marginal (iters = 1 vs 5: marginal
  *    = (t5 − t1) / 4 — the term that must scale linearly in |E|);
  *  - memory pressure (listener-accumulated spill bytes: a spilling
  *    30× round is a memory-regime artifact of local[32], not an
  *    algorithmic term).
  *
  * Deterministic work terms (|V|, |E|, per-round broadcast rows,
  * per-round agg output) are exact counts; walls are min-of-2 within
  * one session and comparable only within it (the ProfileWedges
  * convention).
  *
  * Usage: SPARK_GRAFT_PR_FACTORS=10,30 sbt "Test/runMain graft.ProfilePagerank30"
  */
object ProfilePagerank30 {
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
    val factors = sys.env.getOrElse("SPARK_GRAFT_PR_FACTORS", "10,30")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = new java.util.concurrent.atomic.AtomicLong
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
            ()
          }
        }
      })
    for (f <- factors) {
      val tD0 = System.nanoTime()
      val e0 = edges(spark, dir, f).localCheckpoint(true)
      val derivWall = (System.nanoTime() - tD0) / 1e9
      val nE = e0.count()
      val nV = e0.select(col("src")).union(e0.select(col("dst")))
        .distinct().count()
      System.err.println(f"[pr30] factor=$f V=$nV E=$nE " +
        f"derivation=$derivWall%.2f s (default layout gate at 4M |V|: " +
        s"${if (nV <= 4000000L) "broadcast" else "shuffled"})")
      for ((regime, bMax) <- Seq("broadcast" -> 10000000L,
          "shuffled" -> 0L); it <- Seq(1, 5)) {
        val walls = (1 to 2).map { _ =>
          recs.set(0); bytes.set(0); spillMem.set(0); spillDisk.set(0)
          val t0 = System.nanoTime()
          graft.operators.Behavior.pageRank(e0, "src", "dst",
              iters = it, broadcastRanksMax = bMax, localMaxEdges = 0L)
            .write.mode("overwrite").format("noop").save()
          val wall = (System.nanoTime() - t0) / 1e9
          var last = -1L
          while (recs.get() != last) {
            last = recs.get(); Thread.sleep(300)
          }
          (wall, recs.get(), bytes.get(), spillMem.get(), spillDisk.get())
        }
        val best = walls.minBy(_._1)
        System.err.println(f"[pr30] factor=$f regime=$regime iters=$it " +
          f"wall=${best._1}%.2f s shuffleRecords=${best._2} " +
          f"shuffleMB=${best._3 / 1e6}%.1f " +
          f"spillMemMB=${best._4 / 1e6}%.1f spillDiskMB=${best._5 / 1e6}%.1f")
      }
      e0.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
