package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming semantics of the host-metric pipeline (SURVEY §2.9).
  *
  * The reference hand-rolls micro-batch incremental ingestion:
  * a 25 h lookback for a 24 h cadence (1 h deliberate overlap,
  * `extract.py:29-31`), drops not-yet-mature points ("ramdisk spool
  * hasn't emptied", `extract.py:94-95`), and anti-joins against the
  * previous run's payload file to undo the overlap
  * (`extract.py:115-132`). Structured Streaming expresses all three
  * declaratively: watermark = maturity horizon, state store = the
  * `_last.txt` snapshot, `dropDuplicatesWithinWatermark` = the
  * anti-join.
  *
  * Scale: dedup state is keyed by a 256-bit row hash, not the row
  * payload, and the watermark bounds state retention — the two fixes
  * SURVEY §7.4.3 calls out for the reference's O(run size) snapshot
  * diff.
  */
object StreamingDedup {

  /** Watermarked cross-batch dedup over a streaming frame: rows that
    * re-arrive within `horizon` of the max seen event time (the
    * reference's 1 h overlap re-fetch) are emitted once. The dedup key
    * is the full row identity (F11 canonical hash) so any re-extracted
    * point is recognized regardless of column order.
    */
  def dedupedStream(stream: DataFrame, tsCol: String, horizon: String)
      : DataFrame = {
    val cols = stream.columns.toSeq
    stream
      .withColumn("__row_key",
        graft.functions.ScalarOps.canonicalRowKey(cols))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__row_key")
      .drop("__row_key")
  }

  /** Late-data gate: windowed per-key aggregation with watermarking —
    * points later than `horizon` behind the stream's max event time are
    * dropped (never aggregated), reproducing the reference's "skip
    * recent entries whose rrd data isn't written" maturity rule as an
    * engine guarantee instead of an overlap heuristic.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String,
      horizon: String, window: String): DataFrame =
    stream
      .withWatermark(tsCol, horizon)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Latest-state-per-key over a stream (the status-snapshot semantics
    * of §3.2, `url...py:60-64`): flatMapGroupsWithState keeping one row
    * of state per key would be the unbounded-stream form; for the
    * harness's bounded micro-batch replay, `max_by` per key in update
    * mode expresses the same contract declaratively.
    */
  def latestPerKeyStream(stream: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame =
    stream
      .groupBy(col(keyCol))
      .agg(max(col(tsCol)).as(tsCol),
        valueCols.map(c => max_by(col(c), col(tsCol)).as(c)): _*)

  /** Exactly-once sink contract (K4/K5 streaming form): idempotent
    * foreachBatch writer — each batch lands in its own
    * `__batch_id=<id>` partition under dynamic partition overwrite, so
    * a retried batch REPLACES its partition instead of appending
    * duplicates. The reference's equivalent is the dated backup +
    * manual replay (`load_to_db.py:60-62`).
    */
  def foreachBatchParquetSink(out: String)(df: DataFrame, batchId: Long): Unit =
    df.withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id")
      .parquet(out)
}
