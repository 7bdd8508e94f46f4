package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** The unbounded-stream form of [[latestPerKeyStream]]: one row of
    * state per key via `flatMapGroupsWithState`, with EVENT-TIME STATE
    * EVICTION — what §2.9 actually promises at scale, where the
    * declarative `max_by` form's complete-mode state grows with the
    * key universe forever.
    *
    * Contract: append mode; a key's latest row is emitted exactly once,
    * when the key has been quiet for `horizon` of event time (the
    * status-snapshot "flush on quiet" semantics of `url...py:60-64`).
    * State is then removed, so total state is bounded by the number of
    * concurrently-active keys, not all keys ever seen. A key that
    * re-appears after eviction starts a fresh state epoch.
    *
    * Rows with a null key or null event time are DROPPED at entry (the
    * completeness-gate rule): a poison row must not crash a query that
    * replays it from the checkpoint forever. Ties at equal event time
    * resolve to an arbitrary-but-single row of that timestamp (stream
    * shuffle order is not deterministic), matching `dropDuplicates`'s
    * tie behavior rather than the batch forms' tieBreak-column order.
    */
  def latestPerKeyStateful(stream: DataFrame, keyCol: String, tsCol: String,
      horizon: String): DataFrame = {
    val schema = stream.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val tsIdx = schema.fieldIndex(tsCol)
    // fail fast at construction: a wrong-typed event-time column must
    // not become a ClassCastException inside the stateful function,
    // where the failing batch replays from the checkpoint forever
    schema(tsIdx).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => ()
      case dt => throw new IllegalArgumentException(
        s"latestPerKeyStateful: event-time column '$tsCol' must be a " +
          s"timestamp, got ${dt.simpleString}")
    }
    val rowEnc: Encoder[Row] = Encoders.row(schema)
    // state is one Row — kryo, since two implicit Encoder[Row] would
    // be ambiguous and the state payload never crosses a SQL boundary
    val stateEnc: Encoder[Row] = Encoders.kryo[Row]

    // the JVM value backing a timestamp cell varies with session conf:
    // java.sql.Timestamp classically, java.time.Instant under
    // datetimeJava8API, java.time.LocalDateTime for TIMESTAMP_NTZ —
    // extract epoch millis tolerantly instead of hard-casting
    def tsMs(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp     => t.getTime
      case i: java.time.Instant      => i.toEpochMilli
      case l: java.time.LocalDateTime =>
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => throw new IllegalStateException(
        s"unsupported event-time value ${other.getClass.getName}")
    }

    stream
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withWatermark(tsCol, horizon)
      .groupByKey((r: Row) => r.get(keyIdx).toString)(Encoders.STRING)
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          if (state.hasTimedOut) {
            val out = state.get
            state.remove()
            Iterator.single(out)
          } else {
            val candidates =
              (if (state.exists) Iterator.single(state.get) else Iterator.empty) ++ rows
            val latest = candidates.maxBy(tsMs)
            state.update(latest)
            // timeout must land strictly past the current watermark;
            // horizon > 0 guarantees it from the max() base
            state.setTimeoutTimestamp(
              math.max(tsMs(latest), state.getCurrentWatermarkMs()), horizon)
            Iterator.empty
          }
      }(stateEnc, rowEnc)
  }

  /** Stream-stream interval join (§2.9 engine surface): each fact row
    * pairs with the dimension rows of the same key whose event time is
    * at or before the fact's and at most `maxAge` older — the
    * streaming form of "enrich with the dimension version that was
    * current at fact time" (the batch as-of join's windowed
    * approximation; true as-of needs per-key ordered state).
    *
    * BOTH sides are watermarked and the join condition is
    * time-BOUNDED in both directions — that is what lets Spark drop
    * buffered rows: a dim row older than watermark + maxAge can never
    * match a future fact and is evicted, so state is bounded by
    * (arrival rate × (horizon + maxAge)), not the stream's history.
    * An unbounded condition would buffer both streams forever — the
    * classic stream-join OOM.
    *
    * Column contract: `facts` carries (key, factTs, ...), `dims`
    * carries (key, dimTs, ...) with otherwise disjoint column names;
    * the dim key column is renamed internally for the non-equi
    * condition.
    */
  def streamIntervalJoin(facts: DataFrame, dims: DataFrame, keyCol: String,
      factTs: String, dimTs: String, horizon: String, maxAge: String)
      : DataFrame = {
    val dimKey = "__dim_key"
    val f = facts.withWatermark(factTs, horizon)
    val d = dims.withColumnRenamed(keyCol, dimKey)
      .withWatermark(dimTs, horizon)
    f.join(d,
      col(keyCol) === col(dimKey) &&
        col(dimTs) <= col(factTs) &&
        col(factTs) <= col(dimTs) + expr(s"INTERVAL $maxAge"))
      .drop(dimKey)
  }

  /** Exactly-once sink contract (K4/K5 streaming form): idempotent
    * foreachBatch writer — each batch lands in its own
    * `__batch_id=<id>` partition under dynamic partition overwrite, so
    * a retried batch REPLACES its partition instead of appending
    * duplicates. The reference's equivalent is the dated backup +
    * manual replay (`load_to_db.py:60-62`).
    *
    * Layout contract: `out` must be a fresh directory (or one written
    * by this sink). Directories written by a root-level append sink
    * can't be upgraded in place — dynamic overwrite never removes old
    * root files, and `__batch_id` becomes a partition column
    * (partition-inferred integer type) rather than a data column.
    */
  def foreachBatchParquetSink(out: String)(df: DataFrame, batchId: Long): Unit =
    df.withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id")
      .parquet(out)

  /** Cross-batch streaming twin of
    * [[graft.operators.TimeSeries.counterRate]]: per-entity state is
    * the LAST (epoch-second, value) sample — 16 bytes per entity,
    * bounded by fleet size — so a counter's rate stream continues
    * seamlessly across micro-batches with the exact batch semantics
    * (reset ⇒ increase = raw value; duplicate-timestamp rows advance
    * the state but emit nothing; rounding via the same fast-round
    * chain, so streaming == batch bit-for-bit on in-order input).
    *
    * In-order contract: rows within a batch sort by (ts, tiebreak);
    * across batches per-entity arrival must be monotone (the
    * monitoring poller's property). A strictly-late sample (older
    * than the state) is dropped without advancing state — a rate
    * stream never rewrites history. No state timeout: idle entities
    * keep their 16 bytes so a counter surviving a long gap still
    * rates correctly on return (evict upstream if fleet churn is
    * adversarial).
    */
  def rateStream(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, tieBreakCol: String): DataFrame = {
    require(keyCols.nonEmpty, "rateStream needs at least one key")
    val schema = stream.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    val vIdx = schema.fieldIndex(valueCol)
    val tieIdx = schema.fieldIndex(tieBreakCol)
    schema(tsIdx).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => ()
      case dt => throw new IllegalArgumentException(
        s"rateStream: event-time column '$tsCol' must be a " +
          s"timestamp, got ${dt.simpleString}")
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      keyIdx.map(schema(_)) ++ Seq(schema(tsIdx),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("increase",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rate_per_s",
          org.apache.spark.sql.types.DoubleType)))
    val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    def tsMs(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp      => t.getTime
      case i: java.time.Instant       => i.toEpochMilli
      case l: java.time.LocalDateTime =>
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => throw new IllegalStateException(
        s"unsupported event-time value ${other.getClass.getName}")
    }
    def num(r: Row, i: Int): Double =
      r.get(i).asInstanceOf[Number].doubleValue()
    stream
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupByKey((r: Row) =>
        keyIdx.map(i => String.valueOf(r.get(i))).mkString(""))(
        Encoders.STRING)
      .flatMapGroupsWithState[(Long, Double), Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row],
            state: GroupState[(Long, Double)]) =>
          val ordered = rows.toSeq.sortBy(r =>
            (tsMs(r), String.valueOf(r.get(tieIdx))))
          var last: Option[(Long, Double)] = state.getOption
          val out = Seq.newBuilder[Row]
          ordered.foreach { r =>
            val e = Math.floorDiv(tsMs(r), 1000L)
            val v = num(r, vIdx)
            last match {
              case Some((pe, pv)) if e > pe =>
                val rawInc = if (v >= pv) v - pv else v
                out += Row.fromSeq(keyIdx.map(r.get) ++ Seq(
                  r.get(tsIdx), v,
                  graft.functions.DecimalRound.fastRound(rawInc, 6),
                  graft.functions.DecimalRound.fastRound(
                    rawInc / (e - pe), 6)))
                last = Some((e, v))
              case Some((pe, _)) if e == pe =>
                last = Some((e, v)) // duplicate ts: advance, emit none
              case Some(_) => () // strictly late: drop, keep state
              case None => last = Some((e, v))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }(stateEnc, rowEnc)
  }
}
