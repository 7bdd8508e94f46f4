package graft

import org.apache.spark.sql.functions._

import graft.jobs.NagiosEtlJob

/** End-to-end run of the committed §3.1 cron-tick job: landed response
  * files → AvailableNow stream → melt → dedup-vs-sink → partitioned
  * parquet. Pins the orchestration contract the reference runs from
  * cron: already-consumed files are never re-read (checkpoint),
  * already-landed rows are never duplicated (whole-row dedup), new
  * data appends.
  */
class JobSpec extends SparkSpec {
  import spark.implicits._

  private val cpuBody =
    """{"data":{"row":[{"t":"1700000000","v":"42.50"}]}}"""
  private val swapBody =
    """{"data":{"row":[{"t":"1700000000","v":["1.00","2.00","1.00"]}]}}"""

  private def land(inDir: String, rows: (String, String, String)*): Unit =
    rows.toSeq.toDF("host_name", "service_name", "body")
      .coalesce(1).write.mode("append").json(inDir)

  test("NagiosEtlJob cron tick: AvailableNow consumes once, sink dedup " +
      "makes re-delivery and mid-batch restart idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graftjob").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val services = Seq("CPU Usage", "Swap Usage")
    def sink() = spark.read.parquet(s"$out/data")

    // tick 1: one CPU doc (scalar v) + one Swap doc (list v)
    land(in, ("h1", "CPU Usage", cpuBody), ("h1", "Swap Usage", swapBody))
    NagiosEtlJob.runOnce(spark, in, out, ckpt, services)
    val first = sink().collect()
    assert(first.length == 4) // 1 cpu metric + 3 swap metrics
    assert(sink().select("metric_family").distinct()
      .as[String].collect().sorted.toSeq == Seq("cpu", "swap"))
    assert(sink().filter($"metric_name" === "percent_used")
      .count() == 1)

    // tick 2 with NO new files: the checkpoint skips everything
    NagiosEtlJob.runOnce(spark, in, out, ckpt, services)
    assert(sink().count() == 4)

    // tick 3: the same payload re-delivered as a NEW file (the
    // monitoring exporter re-sending an extract) — consumed, then
    // whole-row dedup against the sink drops every row
    land(in, ("h1", "CPU Usage", cpuBody))
    NagiosEtlJob.runOnce(spark, in, out, ckpt, services)
    assert(sink().count() == 4)

    // tick 4: a genuinely new host appends exactly its rows
    land(in, ("h2", "CPU Usage", cpuBody))
    NagiosEtlJob.runOnce(spark, in, out, ckpt, services)
    assert(sink().count() == 5)
    assert(sink().filter($"host_name" === "h2").count() == 1)

    // mid-batch restart equivalence: a fresh checkpoint re-reads ALL
    // files (the crashed-before-commit worst case) and the sink still
    // ends bit-identical — append + dedup composes to exactly-once
    NagiosEtlJob.runOnce(spark, in, out, s"$base/ckpt2", services)
    assert(sink().count() == 5)
  }
}
