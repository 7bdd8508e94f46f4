package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the harness testdata (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst's scan-level optimizations
  * (column pruning → `ReadSchema`, predicate pushdown → `PushedFilters`,
  * partition pruning) all apply — SURVEY §4's pushdown rewrites come for
  * free as long as nothing opaque sits between the scan and the filters.
  */
object Tables {
  /** One analyzed DataFrame per (session, dir, table): `read.parquet`
    * re-infers the schema from file footers on EVERY call — a metadata
    * job whose cost is pure waste for the harness's immutable testdata
    * and which a slow-IO host turns into a per-query stall (observed:
    * a 0.1 s query spending minutes in footer reads during a host IO
    * degradation). The memo pins the footer read to once per session,
    * exactly like a catalog table's relation cache. Testdata dirs are
    * immutable for a session's lifetime; anything mutable must go
    * through `spark.read` directly.
    */
  private val loadMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Memoized immutable-path parquet read (see [[loadImmutable]]'s rationale).
    * Only for paths whose content never changes within a session —
    * testdata tables and version-tagged staging dirs qualify; anything
    * rewritten in place does not. Entries of stopped sessions are
    * evicted on access, so a long-lived JVM cycling sessions (test
    * suites, repeated bench mains) cannot leak them through the memo.
    */
  def memoRead(spark: SparkSession, path: String): DataFrame = {
    val key = (spark, path)
    val hit = loadMemo.get(key)
    if (hit != null) return hit
    // Miss path only: evict dead-session entries and build the
    // DataFrame OUTSIDE any map lock — computeIfAbsent would hold the
    // bin lock across a whole parquet footer read, serializing
    // unrelated keys that share the bin. Two racing builders cost one
    // duplicate read; putIfAbsent keeps the memo single-valued.
    loadMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val built = spark.read.parquet(path)
    val prev = loadMemo.putIfAbsent(key, built)
    if (prev != null) prev else built
  }

  /** Memoized read of a table whose directory is NEVER rewritten in
    * place during the session — the name is the contract. A caller
    * with a mutable path must use `spark.read` directly, or it gets
    * the stale memoized relation with no error.
    */
  def loadImmutable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memoRead(spark, s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "region")
  /** Normalize `events.ts` to session-zoned TimestampType whatever the
    * generator wrote, so every downstream operator (and the DuckDB
    * oracle, which reads the same file as a naive timestamp under a
    * UTC session) sees identical values:
    *   - INT64 TIMESTAMP(NANOS) (early harness data): vectorized
    *     reader rejects it — read nanos as long (`nanosAsLong`) and
    *     integer-`div` down to micros (`/` goes through double and
    *     loses precision above 2^53 ns, and truncation matches
    *     DuckDB's TIMESTAMP_NS → TIMESTAMP);
    *   - plain `timestamp[us]` without UTC adjustment (current data):
    *     Spark reads TIMESTAMP_NTZ; cast to TIMESTAMP, which under the
    *     UTC session timezone is value-identical to DuckDB's naive
    *     read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = loadImmutable(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = loadImmutable(s, d, "embeddings")

  /** 64-bit sha-256 tag of a path string — the shared cache/memo key
    * encoding for per-dir derived artifacts (bucketed tables, staged
    * band keys). A 32-bit String.hashCode collision between two dirs
    * would silently serve one scale factor's data for another.
    */
  def dirTag(d: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Bucketed view of a table: write-once into the session warehouse
    * (bucketBy + sortBy on `key`), then serve from the catalog. At
    * cluster scale the bucketed copy is the long-lived layout paid once
    * at ingest; every subsequent equi-join/agg on `key` plans with NO
    * exchange. The table name encodes the source dir so different SFs
    * never alias, and the write is skipped when the table already
    * exists (amortized across queries in one session, exactly like
    * production).
    */
  def bucketed(s: SparkSession, d: String, name: String, key: String,
      buckets: Int): DataFrame = {
    // the memo key must cover EVERY layout-determining input — a name
    // that omitted `key` would silently serve a table bucketed on the
    // wrong column to the second caller
    val table = s"graft_b_${name}_${key}_${buckets}_${dirTag(d)}"
    if (!s.catalog.tableExists(table)) {
      // a previous JVM may have left the managed location behind (the
      // in-memory catalog dies with the session; its files do not)
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.operators.Relational.writeBucketed(
        loadImmutable(s, d, name), table, Seq(key), buckets)
    }
    s.table(table)
  }
}
