package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage breakdown for q_entity_resolution at sf0.1 (round
  * 12): where does the ~10 s 1x scale-row read go — gram blocking,
  * levenshtein verify, FastSV closure, or the id attach?
  */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[er] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = sources.Tables.part(spark, dir)
      .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
    val twins = sources.Tables.part(spark, dir)
      .filter(col("p_partkey") % 10 === 0)
      .select((col("p_partkey") + 10000000L).as("rec_id"),
        concat(substring(col("p_name"), 1, 2), lit("q"),
          substring(col("p_name"), 4, 10000)).as("name"))
    val records = base.unionByName(twins).localCheckpoint(true)
    t("records count")(records.count())
    val names = records.groupBy(col("name"))
      .agg(min(col("rec_id")).as("rep")).localCheckpoint(true)
    System.err.println("[er] n_names=" + t("names agg")(names.count()))
    val right = names.select(col("rep").as("__rid"),
      col("name").as("__rname"))
    val joined = operators.Dedup.editDistanceJoin(names, right,
      "rep", "__rid", "name", "__rname", maxDist = 1, q = 3)
    System.err.println("[er] n_pairs_raw=" + t("editDistanceJoin name pairs")(joined.count()))
    val pairs = joined.filter(col("rep") < col("__rid"))
      .select(col("rep").as("id_a"), col("__rid").as("id_b"))
      .localCheckpoint(true)
    System.err.println("[er] n_pairs=" + t("pairs checkpointed")(pairs.count()))
    val comp = t("connectedComponents")(
      operators.Dedup.connectedComponents(pairs).localCheckpoint(true))
    System.err.println("[er] n_cc=" + t("cc count")(comp.count()))
    t("attach")(records.join(names.join(comp.select(
        col("id").as("rep"), col("component")), Seq("rep"), "left")
      .select(col("name"), coalesce(col("component"), col("rep"))
        .as("entity_id")), Seq("name")).count())
    t("full resolveEntities")(operators.Dedup.resolveEntities(
      records, "rec_id", "name", maxDist = 1).count())
    t("full again (warm)")(operators.Dedup.resolveEntities(
      records, "rec_id", "name", maxDist = 1).count())
    spark.stop()
  }
}
