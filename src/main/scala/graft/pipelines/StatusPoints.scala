package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ScalarOps
import graft.model.NagiosModel.StatusPoint
import graft.operators.Relational

/** Pipeline §3.2 — service status → tagged time-series points
  * (`url_service_status_InfluxDB_insert.py`).
  *
  * Reference: 3 API fetches, a Python-set semi-join, a dict-probe
  * enrichment join, per-row normalization, two sinks. Here:
  * `status ⋈(semi) members ⋈(broadcast-left) details` → column
  * transforms → one cached frame feeding both sinks. The whole plan is
  * a single stage (both joins broadcast); at 100 TB of status rows the
  * fact side streams straight through map tasks.
  */
object StatusPoints {

  /** Polymorphic customvars (`url...py:87-95`): the detail table
    * carries either `customvars_map: map<string,string>` or
    * `customvars_list: array<struct<name,value>>` (one null per row,
    * the two-parse-paths normalization of SURVEY §7.4.1).
    */
  def customvarsListType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType), StructField("value", StringType))))

  /** The full §3.2 dataflow. Inputs:
    *  - members: (host_name, service_description) — servicegroup
    *    membership (`url...py:49-54`)
    *  - status: (host_name, service_description, current_state,
    *    last_check) — current state snapshot (`url...py:60-64`)
    *  - details: (host_name, service_description, display_name,
    *    customvars_map, customvars_list) (`url...py:67-73`)
    *
    * Output: point-shaped rows (measurement, tags..., fields..., time)
    * (`url...py:110-123`).
    */
  def points(status: DataFrame, members: DataFrame, details: DataFrame,
      measurement: String): DataFrame = {
    val keys = Seq("host_name", "service_description")
    val filtered = Relational.semiJoinMembers(status, members, keys)
    // Pre-filter the build side to member keys like `url...py:72` —
    // keeps the broadcast table minimal.
    val detailsSlim = Relational.semiJoinMembers(details, members, keys)
    val enriched = filtered.join(broadcast(detailsSlim), keys, "left")

    enriched
      // P6: drop rows missing last_check (`url...py:97-100`); "" is
      // falsy in Python, so empty string drops too.
      .filter(col("last_check").isNotNull && col("last_check") =!= "")
      // P7: drop rows whose timestamp fails to parse (`url...py:101-105`)
      .withColumn("time", ScalarOps.datetime2ToEpoch(col("last_check")))
      .filter(col("time").isNotNull)
      // F4/F5 with defaults (`url...py:107-108`)
      .withColumn("service_status",
        ScalarOps.statusText(coalesce(col("current_state"), lit("3"))))
      .withColumn("service_status_numeric",
        ScalarOps.statusNumeric(col("service_status")))
      // F10: polymorphic customvars with defaults (`url...py:85-95`)
      .withColumn("friendlyname", ScalarOps.customVar(
        col("customvars_map"), col("customvars_list"),
        "FRIENDLYNAME", "unknown"))
      .withColumn("crownjewel", ScalarOps.customVar(
        col("customvars_map"), col("customvars_list"),
        "CROWNJEWEL", "no"))
      .select(
        lit(measurement).as("measurement"),
        col("host_name"),
        col("service_description"),
        coalesce(col("display_name"), lit("unknown")).as("display_name"),
        col("friendlyname"), col("crownjewel"),
        col("service_status"), col("service_status_numeric"),
        col("time"))
  }

  /** Typed view of the point stream (fixed shape ⇒ Dataset[T]). */
  def typedPoints(df: DataFrame)(implicit s: SparkSession): Dataset[StatusPoint] = {
    import s.implicits._
    df.select(col("measurement"), col("service_description"),
        col("display_name"), col("friendlyname"), col("crownjewel"),
        col("service_status"),
        col("service_status_numeric").cast("int"), col("time"))
      .as[StatusPoint]
  }

  /** K3 — the 4-column CSV audit projection (`url...py:80,128-133`),
    * taken off the same cached frame as the point sink so the plan runs
    * once.
    */
  def auditRows(points: DataFrame): DataFrame =
    points.select("host_name", "service_description", "friendlyname",
      "crownjewel")

  /** K5 — partition-parallel point sink. The reference writes via one
    * InfluxDB client (`url...py:141-159`); the engine opens one client
    * per partition inside `foreachPartition` so writes scale with the
    * cluster, `writeFn` abstracting the actual client (tested with a
    * collector; production would wrap an HTTP line-protocol client).
    */
  def sinkPoints(points: Dataset[StatusPoint])(
      writeFn: Iterator[StatusPoint] => Unit): Unit =
    points.foreachPartition(writeFn)

  /** Raised by [[sinkPoints]]'s precondition check before any
    * partition work — the typed form of the reference's fail-fast when
    * the target database is missing (`url...py:151-152`).
    */
  class SinkPreconditionException(msg: String)
    extends RuntimeException(msg)

  /** K5 with the reference's DB-exists precondition: `listDatabases`
    * is one driver-side metadata call against the target store (the
    * Influx `SHOW DATABASES` equivalent); a missing database fails the
    * job with a typed error BEFORE any executor opens a client or
    * sends a point — a misconfigured target must not surface as
    * thousands of per-partition write failures.
    */
  def sinkPoints(points: Dataset[StatusPoint], database: String,
      listDatabases: () => Set[String])(
      writeFn: Iterator[StatusPoint] => Unit): Unit = {
    val existing = listDatabases()
    if (!existing.contains(database))
      throw new SinkPreconditionException(
        s"target database '$database' does not exist " +
          s"(available: ${existing.toSeq.sorted.mkString(", ")}); " +
          "create it before writing")
    points.foreachPartition(writeFn)
  }
}
