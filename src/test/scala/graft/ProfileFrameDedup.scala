package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Same-session A/B for the q_frame_dedup token-array rewrite (VERDICT
  * r14 task 2): OLD = sorted frame hashes array_join'ed into one
  * string re-split by the minhash pipeline at shingleK=1; NEW =
  * collect_set frame hashes fed through the token-array entry point.
  * Plus a stage split (frame explode+hash+group vs the near-dup
  * pipeline) so the floor row's residual is attributed, not guessed.
  */
object ProfileFrameDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def corpus(): DataFrame = {
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      docs.unionByName(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" near dup suffix")).as("text")))
    }
    def media() = Multimodal.fromBinary(corpus(), "doc_id", "text",
      "text/plain")
    def frames() = Multimodal.explodeFrames(media(), stride = 32,
      frameLen = 32)

    def newFrameDocs() = frames()
      .groupBy("media_id")
      .agg(collect_set(md5(col("frame"))).as("frames"))
    def oldFrameDocs() = frames()
      .select(col("media_id"),
        struct(col("frame_no"), md5(col("frame")).as("fh")).as("__s"))
      .groupBy("media_id")
      .agg(array_join(transform(
        array_sort(collect_list(col("__s"))),
        x => x.getField("fh")), " ").as("frames"))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def best(f: => Unit): Double = {
      f // warm
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }

    val tFramesNew = best(noop(newFrameDocs()))
    val tFramesOld = best(noop(oldFrameDocs()))
    val tNew = best(noop(
      Dedup.minhashNearDupPairsTokens(newFrameDocs(), "media_id",
          "frames", numHashes = 64, bands = 32, threshold = 0.7)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"))))
    val tOld = best(noop(
      Dedup.minhashNearDupPairs(oldFrameDocs(), "media_id", "frames",
          shingleK = 1, numHashes = 64, bands = 32, threshold = 0.7)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"))))
    val nFrames = frames().count()
    val nMedia = corpus().count()
    System.err.println(
      f"[framededup] media=$nMedia frames=$nFrames " +
        f"stage_frames_new=$tFramesNew%.2f s stage_frames_old=$tFramesOld%.2f s " +
        f"full_new=$tNew%.2f s full_old=$tOld%.2f s " +
        f"pipeline_new=${tNew - tFramesNew}%.2f s " +
        f"pipeline_old=${tOld - tFramesOld}%.2f s")
    spark.stop()
  }
}
