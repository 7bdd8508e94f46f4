package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic work terms for the Zipf-axis text rows
  * (`surprisal_zipf`, `surprisal_bigram_zipf`, `tfidf_zipf`,
  * `inverted_index_zipf`) — the ProfileWedges convention applied to
  * the text family: count, on the MATERIALIZED 1x and 10x zipf
  * corpora the probe actually reads, the exact cardinalities each
  * plan's exchanges and broadcasts carry — token instances (the
  * explode width), distinct (doc, token) rows (the tf exchange),
  * distinct tokens (the head build input; fixed vocab by
  * construction), bigram instances, distinct (doc, prev, cur) rows
  * (the bigram tf exchange), and distinct (prev, cur) pairs (the
  * pair-head build input). If every term is ~linear, the wall ratio
  * floor is saturation + fixed-cost amortization, not an algorithmic
  * blowup — the numbers let BASELINE.md say which.
  */
object ProfileZipfTerms {
  def main(args: Array[String]): Unit = {
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/root/repo/tmp/scale10x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((tag, path) <- Seq(
        "1x" -> s"$scaleDir/zipf_documents_1x.parquet",
        "10x" -> s"$scaleDir/zipf_documents.parquet")) {
      val docs = spark.read.parquet(path)
      val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
      val inst = docs.select(col("doc_id"),
        explode(toks).as("_tok")).localCheckpoint(true)
      val nInst = inst.count()
      val nTf = inst.select(col("doc_id"), col("_tok"))
        .distinct().count()
      val nVocab = inst.select(col("_tok")).distinct().count()
      val big = docs.select(col("doc_id"), explode(arrays_zip(
          toks.as("_prev"),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
            .as("_cur"))).as("_z"))
        .select(col("doc_id"), col("_z._prev").as("_prev"),
          col("_z._cur").as("_cur"))
        .filter(col("_cur").isNotNull)
        .localCheckpoint(true)
      val nBig = big.count()
      val nBigTf = big.distinct().count()
      val nPairs = big.select(col("_prev"), col("_cur"))
        .distinct().count()
      System.err.println(s"[zipf-terms] $tag docs=${docs.count()} " +
        s"tokens=$nInst tfRows=$nTf vocab=$nVocab " +
        s"bigrams=$nBig bigramTfRows=$nBigTf distinctPairs=$nPairs")
    }
    spark.stop()
  }
}
