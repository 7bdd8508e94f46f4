package graft.sources.rest

import java.util

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the Nagios XI rrdexport API shape
  * (SURVEY §2.1 S2, §4 pushdown row): `spark.read.format("nagios-rest")
  * .option("endpointDir", dir).load()`.
  *
  * Architecture mirrors the production design exactly; only transport
  * differs. One InputPartition per (host, service) fetch task — the
  * engine's replacement for the reference's
  * `ThreadPoolExecutor(max_workers=5)` (`extract.py:150`): on a
  * cluster, fetch parallelism = partition parallelism. Pushdown
  * (SupportsPushDownFilters) turns `host_name`/`service_name`
  * equality/IN predicates into task pruning (fewer "requests") and a
  * `epoch >= ts` bound into the request's `start=` parameter
  * (`extract.py:71`) — filters are evaluated at the source, not after
  * ingestion.
  *
  * Transport: zero-egress environment, so a "request" reads
  * `$endpointDir/rrdexport__<host>__<service>.json` (the same document
  * the HTTP GET would return). A production build swaps
  * [[RestPartitionReader.fetchBody]] for a pooled HTTP client; nothing
  * else changes.
  *
  * Output schema: (host_name, service_name, epoch long, values
  * array<string>) — the normalized form consumed by
  * `HostMetrics.familyFrame`; the polymorphic scalar-or-list `v`
  * (`extract.py:87-93`) is normalized to a 1-element array here.
  */
class NagiosRestSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "nagios-rest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NagiosRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(properties.get("endpointDir"))
}

object NagiosRestSource {
  val schema: StructType = StructType(Seq(
    StructField("host_name", StringType, nullable = false),
    StructField("service_name", StringType, nullable = false),
    StructField("epoch", LongType, nullable = true),
    StructField("values", ArrayType(StringType), nullable = true)))

  /** endpointDir file name for one fetch task. */
  def taskFile(host: String, service: String): String =
    s"rrdexport__${host}__${service}.json"
}

class RestTable(endpointDir: String) extends Table with SupportsRead {
  override def name(): String = s"nagios-rest($endpointDir)"
  override def schema(): StructType = NagiosRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(endpointDir)
}

/** Pushdown: equality/IN on host_name & service_name prune fetch
  * tasks; `epoch >= ts` becomes the start parameter. Everything else
  * stays for Spark to evaluate (returned from pushFilters).
  */
class RestScanBuilder(endpointDir: String) extends ScanBuilder
    with SupportsPushDownFilters {

  private var hosts: Option[Set[String]] = None
  private var services: Option[Set[String]] = None
  private var startEpoch: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // multiple predicates on one column must COMBINE (intersect sets,
    // max epoch bound), never last-wins-overwrite
    def narrow(cur: Option[Set[String]], vs: Set[String]) =
      Some(cur.fold(vs)(_ intersect vs))
    val accepted = filters.filter {
      case EqualTo("host_name", v: String) =>
        hosts = narrow(hosts, Set(v)); true
      case In("host_name", vs) =>
        hosts = narrow(hosts, vs.collect { case s: String => s }.toSet); true
      case EqualTo("service_name", v: String) =>
        services = narrow(services, Set(v)); true
      case In("service_name", vs) =>
        services = narrow(services,
          vs.collect { case s: String => s }.toSet); true
      case GreaterThanOrEqual("epoch", v: Long) =>
        startEpoch = Some(startEpoch.fold(v)(math.max(_, v))); true
      case _ => false
    }
    pushed = accepted
    // host/service pruning is EXACT (task-name equality) so those are
    // fully handled; the epoch bound is INEXACT at the source (rows
    // with missing/garbage `t` can't evaluate it), so hand it back as
    // a residual for Spark to re-check — source-side it still prunes.
    val residual = accepted.filter {
      case GreaterThanOrEqual("epoch", _) => true
      case _ => false
    }
    filters.filterNot(accepted.contains) ++ residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new RestScan(endpointDir, hosts, services, startEpoch, pushed)
}

class RestScan(endpointDir: String, hosts: Option[Set[String]],
    services: Option[Set[String]], startEpoch: Option[Long],
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = NagiosRestSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"NagiosRestScan PushedFilters: [${pushed.mkString(", ")}]"

  /** Enumerate fetch tasks = the catalog of available endpoint docs,
    * pruned by pushed host/service predicates. (Production: the task
    * list comes from the inventory table, exactly like
    * `extract.py:107-112`.)
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(endpointDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("rrdexport__"))
    files.flatMap { f =>
      f.getName.stripSuffix(".json").split("__") match {
        case Array(_, host, service)
            if hosts.forall(_.contains(host)) &&
               services.forall(_.contains(service)) =>
          Some(RestInputPartition(host, service, f.getAbsolutePath,
            startEpoch): InputPartition)
        case _ => None
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

case class RestInputPartition(host: String, service: String, path: String,
    startEpoch: Option[Long]) extends InputPartition

class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(p.asInstanceOf[RestInputPartition])
}

/** One "API call": read + parse the response document, emit one row per
  * data point at or after the start bound.
  */
class RestPartitionReader(part: RestInputPartition)
    extends PartitionReader[InternalRow] {

  protected def fetchBody(): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(part.path)), "UTF-8")

  private lazy val rows: Iterator[InternalRow] = {
    val mapper = new ObjectMapper()
    val doc = mapper.readTree(fetchBody())
    val row = doc.path("data").path("row")
    val out = ArrayBuffer.empty[InternalRow]
    if (row.isArray) {
      row.forEach { point =>
        val epoch = point.path("t").asText(null) match {
          case null => null
          case t => try { java.lang.Long.valueOf(t.trim.toLong) }
            catch { case _: NumberFormatException => null }
        }
        if (epoch == null ||
            part.startEpoch.forall(s => epoch.longValue() >= s)) {
          val v = point.path("v")
          val values: Array[UTF8String] =
            if (v.isArray) {
              val b = ArrayBuffer.empty[UTF8String]
              v.forEach((n: JsonNode) => b += UTF8String.fromString(n.asText()))
              b.toArray
            } else if (v.isMissingNode || v.isNull) Array.empty
            else Array(UTF8String.fromString(v.asText()))
          out += InternalRow(
            UTF8String.fromString(part.host),
            UTF8String.fromString(part.service),
            epoch,
            new GenericArrayData(values))
        }
      }
    }
    out.iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
