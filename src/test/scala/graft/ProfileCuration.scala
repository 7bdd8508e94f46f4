package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for q_curation_v5 (round 12, VERDICT item 1:
  * the r11 window-consistent 1.58→3.35 s mover). Mirrors
  * SparkEntry's q_curation_v5 stage by stage and times each stage in
  * isolation plus the full composition, so the expensive stage is
  * named by measurement, not argument. Not part of the bench surface.
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curation] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def run(name: String)(df: => DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())

    val docs = sources.Tables.documents(spark, dir)
    docs.count() // warm FS cache outside the measured stages

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      run("s1_surprisal_band") {
        operators.TextOps.surprisal(docs, "doc_id", "text")
          .filter(col("surprisal").between(3.39, 3.41)).select("doc_id")
      }
      run("s2_exact_reps") {
        docs.groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      }
      val band = operators.TextOps.surprisal(docs, "doc_id", "text")
        .filter(col("surprisal").between(3.39, 3.41)).select("doc_id")
      val reps = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val base = docs.join(reps, "doc_id").join(band, "doc_id")
      run("s3_rebalance(+s1+s2)") {
        operators.Sampling.temperatureRebalance(base, "doc_id", "lang")
          .filter(col("kept")).select("doc_id")
      }
      val kept = operators.Sampling
        .temperatureRebalance(base, "doc_id", "lang")
        .filter(col("kept")).select("doc_id")
      run("s4_weighted(+s1..s3)") {
        operators.Sampling.weightedSample(
          docs.join(kept, "doc_id")
            .select(col("doc_id"), operators.TextOps.tokenCount(col("text"))
              .cast("long").as("weight")),
          "doc_id", "weight", k = 100)
      }
      val sel = operators.Sampling.weightedSample(
        docs.join(kept, "doc_id")
          .select(col("doc_id"), operators.TextOps.tokenCount(col("text"))
            .cast("long").as("weight")),
        "doc_id", "weight", k = 100)
      run("s5_full(+merge)") {
        operators.TextOps.mergePhrases(
            docs.join(sel.select("doc_id"), "doc_id"),
            "doc_id", "text", SparkEntry.phraseTable)
          .join(sel.select(col("doc_id"), col("weight")), "doc_id")
          .select(col("doc_id"), col("weight"), col("text_merged"),
            col("n_merged"))
      }
      run("full_query") {
        SparkEntry.queries("q_curation_v5")(spark, dir)
      }
    }
    spark.stop()
  }
}
