package graft

import org.apache.spark.sql.functions._
import graft.model.NagiosModel
import graft.operators.Relational
import graft.pipelines.HostMetrics
import graft.sources.Sinks

/** §3.1 as ONE collapsed DAG, end-to-end: DSv2 rest source (S2) →
  * registry pivot (F8) → completeness gate (P3) → melt → cross-run
  * dedup (J3) → family routing (P4) → partitioned parquet (K6) and
  * JDBC (K4) sinks — the reference's three cron-chained processes in
  * a single lineage.
  */
class EndToEndSpec extends SparkSpec {

  private lazy val endpointDir: String = {
    val d = java.nio.file.Files.createTempDirectory("grafte2e")
    def write(host: String, service: String, body: String): Unit =
      java.nio.file.Files.writeString(
        d.resolve(graft.sources.rest.NagiosRestSource.taskFile(host, service)),
        body)
    for (host <- Seq("web01", "web02")) {
      write(host, "CPU Usage",
        """{"data": {"row": [
          |  {"t": "1723402800", "v": "42.123"},
          |  {"t": "1723406400", "v": "NaN"},
          |  {"t": "1723410000", "v": "55.5"}
          |]}}""".stripMargin)
      write(host, "Swap Usage",
        """{"data": {"row": [
          |  {"t": "1723402800", "v": ["1.0", "8.0", "7.0"]},
          |  {"t": "1723406400", "v": ["1.5", "8.0"]}
          |]}}""".stripMargin)
    }
    d.toString
  }

  test("host-metric ETL: rest scan -> pivot -> clean -> dedup -> sinks") {
    val raw = spark.read.format("nagios-rest")
      .option("endpointDir", endpointDir).load()

    // registry-driven pivot + completeness gate per family
    val payload = HostMetrics.longPayload(raw)
    // surviving: CPU 2 pts x2 hosts x1 metric + Swap 1 pt x2 hosts x3 metrics
    assert(payload.count() == 4 + 6)

    // cross-run dedup: previous run saw the first CPU point of web01
    val previous = payload.filter(
      col("host_name") === "web01" && col("service_name") === "CPU Usage" &&
      col("timestamp") === "2024-08-11 19:00:00")
    val fresh = HostMetrics.dedupAgainst(payload, previous)
    assert(fresh.count() == 9)

    // K6: partitioned parquet by metric family
    val outDir = java.nio.file.Files.createTempDirectory("grafte2eout").toString
    HostMetrics.writePartitioned(fresh, outDir)
    val back = spark.read.parquet(outDir)
    assert(back.select("metric_family").distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet == Set("cpu", "swap"))

    // K4: per-family JDBC tables (embedded Derby), host_{family}_usage
    val url = "jdbc:derby:memory:grafte2e;create=true"
    val families = Map(
      "cpu" -> HostMetrics.familyFrame(raw, "CPU Usage"),
      "swap" -> HostMetrics.familyFrame(raw, "Swap Usage"))
    val props = new java.util.Properties()
    HostMetrics.writeJdbc(families, url, props)
    val cpuBack = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "host_cpu_usage").load()
    assert(cpuBack.count() == 4)
    assert(cpuBack.columns.map(_.toLowerCase).toSet ==
      Set("host_name", "timestamp", "service_name", "percent_used"))

    // A-counts attach for free via observe
    assert(Sinks.observed(fresh, "payload").count() == 9)
  }

  test("inventory + fan-out drive the fetch task table (J4 shape)") {
    import spark.implicits._
    val hosts = Seq(("web01", "hostgroup1"), ("web02", "hostgroup1"))
      .toDF("host_name", "host_group")
    val tasks = Relational.fanOut(hosts, NagiosModel.services,
      "service_name")
    assert(tasks.count() == 2 * NagiosModel.services.size)
    // tasks match exactly what the rest source exposes as partitions
    val fetched = spark.read.format("nagios-rest")
      .option("endpointDir", endpointDir).load()
      .join(tasks, Seq("host_name", "service_name"), "left_semi")
    assert(fetched.select("host_name", "service_name").distinct()
      .count() == 4)
  }
}
