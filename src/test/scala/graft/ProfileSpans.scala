package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch plan/skew capture for substring_spans_full at 1x/10x
  * (round 8, VERDICT task 5): prints the occurrence join's physical
  * strategy and the skew stats of the repeated-window key.
  */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def corpus(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"),
            lit(" all rights reserved contact the legal department" +
              " for licensing terms and conditions apply")))
            .otherwise(col("text")).as("text"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[spans] $tag%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s")
      r
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/tmp/scale10x")) {
      System.err.println(s"=== $dir ===")
      val spans = operators.Dedup.repeatedSpans(corpus(dir), "doc_id",
        "text", k = 8)
      // join strategy in the EXECUTED (AQE-final) plan
      t("run1") { spans.write.mode("overwrite").format("noop").save() }
      val plan = spans.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("skew")).take(8).toList
      joins.foreach(l => System.err.println("[plan] " + l.trim.take(150)))
      t("run2") { spans.write.mode("overwrite").format("noop").save() }
      // key skew of the repeated-window hash
      val toks = filter(split(col("text"), "\\s+"), x => length(x) > 0)
      val n = size(col("__toks"))
      val wins = corpus(dir)
        .select(col("doc_id"), toks.as("__toks"))
        .filter(n >= 8)
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), n - 8), i =>
            md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(8))))))
          .as(Seq("__pos", "__h")))
      val top = wins.groupBy("__h").count()
        .orderBy(col("count").desc).limit(5).collect()
      val tot = wins.count()
      System.err.println(s"[skew] total windows=$tot top5=" +
        top.map(r => r.getLong(1)).mkString(","))
    }
    // the 100TB regime: firsts outgrows the broadcast ceiling and the
    // join falls back to SMJ — prove AQE's skew-split fires once a
    // hot window key actually dominates partitions. The probe corpus'
    // boilerplate is only 0.4% of windows (no statistical skew), so
    // build the adversarial version: EVERY doc carries the
    // boilerplate, making its ~14 window hashes the majority keys.
    System.err.println("=== forced-SMJ + AQE skew split (adversarial) ===")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // cluster-width partitioning: at 1000 executors the per-partition
    // median shrinks ~20x vs local[32], which is exactly when a hot
    // window key crosses AQE's (5x median) skew bar
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val adversarial = spark.read
      .parquet("/root/repo/tmp/scale10x/documents.parquet")
      .select(col("doc_id"), concat(col("text"),
        lit(" all rights reserved contact the legal department" +
          " for licensing terms and conditions apply")).as("text"))
    val spansAdv = operators.Dedup.repeatedSpans(adversarial, "doc_id",
      "text", k = 8)
    // execute THIS queryExecution (a .write spawns its own), so the
    // printed plan is the AQE-final one
    t("run_smj_adv") { spansAdv.queryExecution.toRdd.count() }
    val plan10 = spansAdv.queryExecution.executedPlan.toString
    plan10.linesIterator.filter(l => l.contains("Join") ||
        l.toLowerCase.contains("skew") || l.contains("AQEShuffleRead") ||
        l.contains("Exchange")).take(14)
      .foreach(l => System.err.println("[plan-smj] " + l.trim.take(160)))
    spark.stop()
  }
}
