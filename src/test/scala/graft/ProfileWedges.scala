package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch attribution for the `triangles_zipf` scale row (VERDICT r11
  * task 7): measure the DETERMINISTIC work terms of the oriented
  * triangle count on the exact Zipf-degree graphs the probe generates
  * (same hash-draw construction as ScaleProbe.zipfEdges), at 1x and
  * 10x — candidate wedge count Σ C(d⁺(a), 2) (the wedge join's output
  * cardinality) and the final triangle count. If wedges grow
  * superlinearly, the wall ratio floor is algorithmic, not a plan
  * defect; the wall numbers themselves swing with the host window
  * (sessions measured 1.6–9.9 s at 1x for identical code) and are NOT
  * what this profiler reads.
  */
object ProfileWedges {
  private def zipfEdges(s: SparkSession, factor: Int): DataFrame = {
    val nEdges = 200000L * factor
    val nodes = 20000L * factor
    def zipfNode(seed: Int) =
      floor(pow(lit(nodes.toDouble),
        pmod(hash(col("id"), lit(seed)), lit(1 << 20)).cast("double")
          / (1 << 20))).cast("long")
    s.range(nEdges)
      .select(zipfNode(1).as("src"), zipfNode(2).as("dst"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (f <- Seq(1, 10)) {
      val e0 = zipfEdges(spark, f)
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull &&
          col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      val nE = e0.count()
      val deg = e0.select(col("u").as("node"))
        .union(e0.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val maxDeg = deg.agg(max(col("d"))).head.getLong(0)
      // oriented: low-degree endpoint first (ties by id), as in
      // Behavior.triangleCounts
      val withDeg = e0
        .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val o = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("a"))
      val stats = o.groupBy(col("a")).agg(count(lit(1)).as("od"))
        .agg(max(col("od")).as("max_out"),
          sum(((col("od") * (col("od") - 1)) / 2).cast("long")).as("wedges"))
        .head
      val tri = graft.operators.Behavior
        .triangleCounts(e0, "u", "v")
        .agg(sum(col("triangles"))).head.getLong(0) / 3
      System.err.println(s"[wedges] factor=$f edges=$nE maxDeg=$maxDeg " +
        s"maxOrientedOutDeg=${stats.getLong(0)} " +
        s"wedges=${stats.getLong(1)} triangles=$tri")
    }
    spark.stop()
  }
}
