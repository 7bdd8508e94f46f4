package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ScalarOps
import graft.operators.Relational
import graft.sources.Tables

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle in [[oracleSql]].
  *
  * Role mapping (FIXTURES.md §A): `events` plays the status/metric
  * stream, `customer`/`nation` the membership + enrichment dimensions,
  * `lineitem` the wide metric fact table, `part` the type-routing
  * table, `documents`/`embeddings` the §2.10 extension operators.
  */
object SparkEntry {

  /** Flagship: the §3.2 status-enrichment pipeline shape
    * (semi-join membership → broadcast enrichment → status CASE maps →
    * validity filters → typed point projection) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    statusEnrich(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- //

  /** J1+J2+F3+F4+F5+P6+P8 — the full status pipeline shape (§3.2).
    * members = customers of one segment (the "servicegroup"); details =
    * customer⋈nation (the dimension with customvars-style attributes);
    * status stream = events. Both dimension joins broadcast: the fact
    * side never shuffles.
    */
  private def statusEnrich(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cust = Tables.customer(s, dir)
    val members = cust.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    val details = cust.join(Tables.nation(s, dir),
        cust("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("c_name"),
        col("n_name").as("nation_name"), col("c_acctbal"))
    val enriched = Relational.enrich(
      Relational.semiJoinMembers(ev, members, Seq("user_id")),
      details, Seq("user_id"),
      Map("c_name" -> "unknown", "nation_name" -> "unknown"))
    enriched
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(
        col("event_id"), col("user_id"),
        ScalarOps.datetime2ToEpoch(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("ts_epoch"),
        col("c_name"), col("nation_name"), col("event_type"),
        when(col("event_type") === "click", 0)
          .when(col("event_type") === "view", 1)
          .when(col("event_type") === "purchase", 2)
          .when(col("event_type") === "signup", 3)
          .otherwise(-1).as("status_code"),
        round(col("value"), 2).as("value2"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -------- core aggregation surface (§2.5) --------
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("count_order"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // -------- flagship pipeline (§3.2 shape) --------
    "q_status_enrich" -> ((s, dir) => statusEnrich(s, dir)),

    // -------- J1 semi join (membership filter) --------
    "q_semi_join" -> ((s, dir) => {
      val members = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("user_id"))
      Relational.semiJoinMembers(Tables.events(s, dir), members,
          Seq("user_id"))
        .select("event_id", "user_id", "event_type")
    }),

    // -------- J3 anti-join dedup vs previous snapshot --------
    "q_anti_dedup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val current = ev.filter(col("ts") >= lit("2024-01-10"))
      val previous = ev.filter(col("ts") < lit("2024-01-15"))
      Relational.antiJoinDedup(current, previous)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }),

    // -------- latest-per-key snapshot (§2.9) --------
    "q_latest_per_key" -> ((s, dir) => {
      Relational.latestPerKey(Tables.events(s, dir), Seq("user_id"),
          "ts", "event_id")
        .select("user_id", "event_id", "ts", "event_type", "value")
    }),

    // -------- P4 substring type routing --------
    "q_type_route" -> ((s, dir) => {
      val routed = Tables.part(s, dir).withColumn("metric_family",
        when(ScalarOps.familyPredicate(col("p_type"), "promo"), "promo")
          .when(ScalarOps.familyPredicate(col("p_type"), "small"), "small")
          .when(ScalarOps.familyPredicate(col("p_type"), "large"), "large")
          .otherwise(lit(null).cast("string")))
      routed.groupBy(col("metric_family"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast("decimal(18,2)")).as("sum_price"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS count_order, min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_status_enrich" ->
      """SELECT e.event_id, e.user_id,
        | CAST(epoch(date_trunc('second', e.ts)) AS BIGINT) AS ts_epoch,
        | c.c_name AS c_name, n.n_name AS nation_name, e.event_type,
        | CASE e.event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
        |   WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE -1 END
        |   AS status_code,
        | round(e.value, 2) AS value2
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND e.value IS NOT NULL AND e.ts IS NOT NULL""".stripMargin,

    "q_semi_join" ->
      """SELECT e.event_id, e.user_id, e.event_type FROM events e
        |WHERE EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_custkey = e.user_id
        |    AND c.c_mktsegment = 'MACHINERY')""".stripMargin,

    "q_anti_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10'
        |  AND ts >= TIMESTAMP '2024-01-15'""".stripMargin,

    "q_latest_per_key" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) t WHERE rn = 1""".stripMargin,

    "q_type_route" ->
      """SELECT CASE WHEN lower(p_type) LIKE '%promo%' THEN 'promo'
        |  WHEN lower(p_type) LIKE '%small%' THEN 'small'
        |  WHEN lower(p_type) LIKE '%large%' THEN 'large'
        |  ELSE NULL END AS metric_family,
        | count(*) AS n,
        | sum(CAST(p_retailprice AS DECIMAL(18,2))) AS sum_price
        |FROM part GROUP BY 1""".stripMargin
  )
}
