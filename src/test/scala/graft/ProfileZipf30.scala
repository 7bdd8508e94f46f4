package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Beyond-10× attribution for the `surprisal_zipf` scale row (VERDICT
  * r14 task 3): the Zipf corpora are MATERIALIZED parquet
  * (`zipf_documents_1x` = 5k docs, `zipf_documents` = 5k·factor docs,
  * vocab fixed at 20k), so every deterministic work term is an exact
  * count — docs, token instances, (doc, token) tf rows (the one
  * data-sized exchange), distinct tokens (the head aggregate's key
  * cardinality, bounded by the vocab). If those grow ≤ factor while
  * the wall grows faster, the residual is either memory pressure
  * (spill bytes, reported) or host scheduling — not an algorithmic
  * term, because the plan has no key whose per-partition load grows
  * faster than the input.
  *
  * Usage: SPARK_GRAFT_ZIPF_DIRS=tmp/scale10x,tmp/scale30x
  *   sbt "Test/runMain graft.ProfileZipf30"
  * (each dir contributes its 1x and its factor-sized corpus)
  */
object ProfileZipf30 {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_ZIPF_DIRS",
      "/root/repo/tmp/scale10x,/root/repo/tmp/scale30x")
      .split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
            ()
          }
        }
      })
    val tables = (s"${dirs.head}/zipf_documents_1x.parquet" -> "1x") +:
      dirs.map(d => s"$d/zipf_documents.parquet" -> d.split("/").last)
    for ((path, tag) <- tables) {
      val docs = spark.read.parquet(path)
      val nDocs = docs.count()
      val toks = docs.select(explode(
        graft.operators.TextOps.tokens(col("text"))).as("_tok"))
      val nTok = toks.count()
      val tfRows = docs.select(col("doc_id"),
          explode(graft.operators.TextOps.tokens(col("text"))).as("_tok"))
        .groupBy("doc_id", "_tok").count().count()
      val nVocab = toks.distinct().count()
      System.err.println(s"[zipf30] $tag docs=$nDocs tokens=$nTok " +
        s"tfRows=$tfRows vocab=$nVocab")
      val walls = (1 to 3).map { i =>
        recs.set(0); spillMem.set(0); spillDisk.set(0)
        val t0 = System.nanoTime()
        graft.operators.TextOps.surprisal(docs, "doc_id", "text")
          .write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        var last = -1L
        while (recs.get() != last) { last = recs.get(); Thread.sleep(300) }
        (wall, recs.get(), spillMem.get(), spillDisk.get(), i)
      }
      // pass 1 warms codegen; min of the rest
      val best = walls.drop(1).minBy(_._1)
      System.err.println(f"[zipf30] $tag surprisal wall=${best._1}%.2f s " +
        f"shuffleRecords=${best._2} spillMemMB=${best._3 / 1e6}%.1f " +
        f"spillDiskMB=${best._4 / 1e6}%.1f")
    }
    spark.stop()
  }
}
