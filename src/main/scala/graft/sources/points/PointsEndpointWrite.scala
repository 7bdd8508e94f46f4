package graft.sources.points

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}

/** Live-endpoint (HTTP) mode of the points sink — the engine-grade
  * form of the reference's InfluxDB client write
  * (`url_service_status_InfluxDB_insert.py:141-159`:
  * `InfluxDBClient(host, ssl=True, verify_ssl=..., cert=(cert, key))`
  * then `write_points(points, time_precision='s', protocol='line')`).
  *
  * Each task renders its partition to line protocol and POSTs it in
  * batches of `batchRows` lines through the pluggable
  * [[PointsTransport]] (retry/backoff/deadline enforced by
  * [[PointsTransport.guarded]]). The driver-side commit is a no-op by
  * design: a POST the server acknowledged is already durable
  * server-side, so there is nothing to publish — and nothing to
  * un-send on abort. Delivery is therefore at-least-once per batch
  * (a task retried after some flushes re-sends them), which is safe
  * for line protocol by construction: a point is keyed by
  * (measurement, tag set, timestamp) and a duplicate write is an
  * idempotent upsert — the exact property the reference's
  * fire-and-forget `write_points` relies on.
  *
  * At 100 TB: every executor streams its own partitions to the
  * endpoint in bounded batches — no driver involvement, no state that
  * scales with data; the endpoint's ingest capacity is the only
  * ceiling, tunable via `batchRows` and partition count.
  *
  * Timestamps render as epoch SECONDS (the reference's
  * `time_precision='s'`): against a real InfluxDB `/write` endpoint,
  * encode that in the URL — `endpointUrl = "https://host:8086/write?
  * db=...&precision=s"`; query strings pass through untouched.
  */
class PointsEndpointBatchWrite(conf: PointsWriteConf) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new PointsEndpointWriterFactory(conf)

  // acknowledged POSTs are already durable server-side; commit
  // publishes nothing (and uses the default commit coordinator, so
  // only one attempt per partition ever flushes to completion)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  // a live endpoint cannot un-receive: abort drops only the unsent
  // buffer (task-side); earlier acknowledged batches remain — the
  // at-least-once contract documented above
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class PointsEndpointWriterFactory(conf: PointsWriteConf)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new PointsEndpointDataWriter(conf, partitionId, taskId)

  // streaming epochs share the writer: the endpoint keys points by
  // (measurement, tags, timestamp), so epoch identity adds nothing
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new PointsEndpointDataWriter(conf, partitionId, taskId)
}

/** Streaming twin: same per-task POST path; epoch commit is a no-op
  * for the same reason as batch (server-side durability + idempotent
  * point upserts make replayed epochs safe without a marker).
  */
class PointsEndpointStreamingWrite(conf: PointsWriteConf)
    extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new PointsEndpointWriterFactory(conf)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

/** Task-side writer: buffers rendered lines and flushes every
  * `batchRows` through the guarded transport. The transport is
  * instantiated by class name ON THE EXECUTOR (zero-arg constructor) —
  * the same seam the REST source uses, and the test seam for
  * fault-injection without a live endpoint.
  */
class PointsEndpointDataWriter(conf: PointsWriteConf, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val ep = conf.endpoint.getOrElse(throw new IllegalStateException(
    "endpoint writer without endpoint conf"))
  private val transport = Class.forName(ep.transportClass)
    .getDeclaredConstructor().newInstance().asInstanceOf[PointsTransport]
  private val renderer = new PointsLineRenderer(conf)

  private val buf = new java.lang.StringBuilder
  private var buffered = 0
  private var rows = 0L

  private def flush(): Unit = if (buffered > 0) {
    PointsTransport.guarded(transport, ep.url, buf.toString, conf.tls,
      ep.maxRetries, ep.backoffMs, ep.timeoutMs)
    buf.setLength(0)
    buffered = 0
  }

  override def write(row: InternalRow): Unit = {
    buf.append(renderer.render(row)).append('\n')
    buffered += 1
    rows += 1L
    if (buffered >= ep.batchRows) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    PointsCommitMessage(partitionId, taskId, stagedFile = "", rows)
  }

  override def abort(): Unit = {
    // unsent buffer only; acknowledged batches are the server's
    buf.setLength(0)
    buffered = 0
  }

  override def close(): Unit = ()
}
