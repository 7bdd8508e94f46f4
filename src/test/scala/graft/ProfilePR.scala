package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for q_pagerank's per-round exchange pair (round 12,
  * VERDICT item 6): counts shuffle records/bytes actually written per
  * stage across the 5 iterations and times A/B variants, so the
  * "irreducible pair" claim is measured, not argued.
  */
object ProfilePR {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.scheduler._
    val shufRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val shufBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shufRecords.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        shufBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    val dir = "/root/testdata/sf0.1"
    val pairs = sources.Tables.lineitem(spark, dir)
      .select((col("l_orderkey").cast("long") * 2).as("o"),
        (col("l_suppkey").cast("long") * 2 + 1).as("p"))
      .distinct()
    val edges = pairs.select(col("o").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("o").as("dst")))
    edges.count() // warm
    def run(name: String)(f: => DataFrame): Unit = {
      val r0 = shufRecords.get(); val b0 = shufBytes.get()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
      println(f"=== $name%-12s ${(System.nanoTime()-t0)/1e9}%6.2f s  " +
        f"shufRec=${(shufRecords.get()-r0)/1e6}%.1fM shufMB=${(shufBytes.get()-b0)/1000000L}%d")
    }
    // variant: edges partitioned by DST + broadcast ranks -> the
    // contrib aggregate reuses the edge partitioning, zero per-iter
    // big-data exchange
    def prBroadcast(edges: DataFrame, iters: Int): DataFrame = {
      val e = edges.select(col("src"), col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .repartition(col("dst"))
        .localCheckpoint(true)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().localCheckpoint(true)
      val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
        .localCheckpoint(true)
      var pr = nodes.withColumn("pr", lit(1.0))
      for (_ <- 1 to iters) {
        val prW = pr.join(outDeg, pr("node") === outDeg("src"))
          .select(col("node"),
            round(col("pr") / col("_deg"), 12)
              .cast("decimal(38,12)").as("_w"))
        val contrib = e.join(broadcast(prW), e("src") === prW("node"))
          .select(col("dst").as("node"), col("_w").as("_c"))
          .groupBy(col("node"))
          .agg(sum(col("_c")).as("_in"))
        pr = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            round(lit(1.0 - 0.85) +
              lit(0.85) * coalesce(col("_in").cast("double"), lit(0.0)),
              12).as("pr"))
          .localCheckpoint(true)
      }
      pr.select(col("node"), round(col("pr"), 6).as("pagerank"))
    }
    // alternating passes: order bias cancels
    for (p <- 1 to 3) {
      run(s"shuffle_p$p")(operators.Behavior.pageRank(edges, "src", "dst", 5, localMaxEdges = 0L,
        broadcastRanksMax = 0L)) // force the shuffle path
      run(s"bcast_p$p")(operators.Behavior.pageRank(edges, "src", "dst", 5, localMaxEdges = 0L))
    }
    // cross-check results identical
    val a = operators.Behavior.pageRank(edges, "src", "dst", 5, broadcastRanksMax = 0L, localMaxEdges = 0L)
    val b = operators.Behavior.pageRank(edges, "src", "dst", 5)
    println("=== diff rows: " + a.except(b).union(b.except(a)).count())
    spark.stop()
  }
}
