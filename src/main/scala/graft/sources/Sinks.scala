package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink surface K1–K6 (SURVEY §2.2) as thin, uniform wrappers over the
  * DataFrameWriter — the reference's hand-rolled serialization, backup
  * copies and dynamic INSERT text all collapse into writer options.
  */
object Sinks {

  /** K1 — JSON payload sink (`extract.py:145,156`). Line-delimited JSON
    * (the scalable form of the reference's single indented array).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K1 compat form — ONE file holding ONE JSON array, the payload
    * shape the reference writes and re-reads (`extract.py:145`:
    * `json.dump(..., indent=4)`; `load_to_db.py:22-23`): one element
    * per row, array-level indentation, row fields in sorted-name order
    * (the reference's `sort_keys=True` canonical form,
    * `extract.py:119,127`). The array is assembled on the driver —
    * correct ONLY for driver-sized payloads, which is the reference's
    * own operating envelope (its whole payload lives in one Python
    * list). `maxRows` guards that contract: a payload past it belongs
    * in [[writeJson]] (line-delimited, distributed), and failing fast
    * beats an OOM'd driver.
    */
  def writeJsonArrayFile(df: DataFrame, file: String,
      maxRows: Int = 1000000): Unit = {
    val cols = df.columns.sorted.toIndexedSeq
    // keep null fields: json.dump writes "k": null, and dropping keys
    // would change the canonical row shape consumers key on
    val jsonRows = df.select(to_json(struct(cols.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .limit(maxRows + 1).collect().map(_.getString(0))
    require(jsonRows.length <= maxRows,
      s"payload exceeds $maxRows rows — use writeJson (line-delimited) " +
        "for distributed payloads")
    val body = jsonRows.mkString("[\n    ", ",\n    ", "\n]")
    val p = java.nio.file.Paths.get(file)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, body)
  }

  /** K2/K3 — CSV sink with header (`hosts_to_csv.py:48`,
    * `url...py:128-133`).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** K6 — versioned snapshot write: partition path stamped with the run
    * date (`load_to_db.py:17-18`'s dated backup, F14), so every run's
    * payload is retained and replayable — the engine form of
    * `data_extract_last.txt` + dated backups.
    */
  def writeVersioned(df: DataFrame, base: String, runDate: String): Unit =
    df.write.mode("overwrite").parquet(s"$base/run_date=$runDate")

  /** Columnar archive pair beyond parquet: ORC round-trip for
    * Hive/Trino-estate interop (ORC ships in stock Spark; no extra
    * dependency). Same writer contract as the parquet sinks; ORC
    * stripes carry min/max indexes, so filters push to the scan and
    * projection prunes columns exactly like parquet
    * (SinksSpec-verified on the explain output).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** K4 failure path (`load_to_db.py:60-62`): attempt the primary
    * write; on failure, quarantine the payload to a dated parquet path
    * for manual replay instead of losing it.
    */
  def writeWithQuarantine(df: DataFrame, quarantineBase: String,
      runDate: String)(primary: DataFrame => Unit): Either[String, Unit] =
    try Right(primary(df))
    catch {
      case e: Exception =>
        df.write.mode("overwrite")
          .parquet(s"$quarantineBase/failed_run_date=$runDate")
        Left(e.getMessage)
    }

  /** K4 — JDBC batched append (`load_to_db.py:27-56`): schema-driven
    * INSERT replaces the reference's dynamic SQL text; `batchsize`
    * replaces `fast_executemany`.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    // never mutate the caller's Properties; default batchsize only
    // when the caller didn't choose one. Copy via stringPropertyNames,
    // NOT putAll: putAll ignores a layered `new Properties(defaults)`
    // chain (the standard place JDBC credentials live)
    val p = new java.util.Properties()
    props.stringPropertyNames().forEach { k =>
      p.setProperty(k, props.getProperty(k))
    }
    if (!p.containsKey("batchsize")) p.setProperty("batchsize", "10000")
    df.write.mode("append").jdbc(url, table, p)
  }

  /** A1–A5 — reconciliation counts (`url...py:136-137,156-159`;
    * `extract.py:132`): attach named count metrics to the frame via
    * `observe` — collected for free during whatever action runs the
    * plan, instead of extra count() jobs.
    */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))
}
