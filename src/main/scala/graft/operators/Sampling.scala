package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines
  * (SURVEY §2.10 extension): train/val/test assignment must be a pure
  * function of the row's identity — `rand()` changes on retry,
  * re-partitioning, or re-run, silently leaking validation rows into
  * training on any reprocessing. Hash-based bucketing is reproducible
  * across runs, engines, AND languages (md5 is everywhere), and
  * map-side only — no shuffle, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the id's md5 (first 8 hex
    * digits — 32 bits is plenty for split assignment and keeps the
    * arithmetic in exact long range on every engine).
    */
  def splitBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Split-label column over percentage weights, e.g.
    * `splitLabel(col("doc_id"), Seq("train" -> 90, "val" -> 5, "test" -> 5))`.
    * Weights must sum to 100; assignment is deterministic per id.
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val b = splitBucket(id, 100)
    val (_, expr0) = weights.foldLeft((0, lit(null).cast("string"))) {
      case ((acc, e), (name, w)) =>
        (acc + w, when(b >= acc && b < acc + w, name).otherwise(e))
    }
    expr0
  }

  /** Keep a deterministic `pct`% of rows by id hash — the reproducible
    * form of `df.sample`.
    */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(splitBucket(col(idCol), 100) < pct)

  /** Pack rows into shards of ~`budget` units (token counts, bytes) in
    * `orderCol` order: shard = floor(running-sum-before-this-row /
    * budget) — the standard way a curation pipeline sizes training
    * shards so each downstream file holds a comparable token count
    * rather than a comparable document count.
    *
    * One global window (single partition) is deliberate and documented:
    * shard assignment is a prefix-sum, inherently sequential in the
    * chosen order. At 100 TB the order key is usually a composite
    * (bucket, intra-bucket order) so the window partitions by bucket —
    * pass `partitionCols` for that form; with partitions the prefix sum
    * parallelizes per partition.
    */
  def shardByBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    val w0 = if (partitionCols.isEmpty)
      org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
    else org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = w0.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard",
      floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) / budget))
  }
}
