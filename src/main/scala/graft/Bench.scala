package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force FULL evaluation of every output column with a noop sink:
    // a count() action lets Catalyst prune the projection, so
    // map-heavy queries (langid, doc stats, signatures) would be timed
    // as bare row-count scans. (BASELINE.md protocol v2.)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()
    // Warm the JVM + codegen/plan caches on the smallest SF so timed
    // numbers measure the queries, not first-query JIT startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache() // drop warmup persists before timing
    // min-of-3 per query (BASELINE.md protocol): this host shows random
    // 3-6s single-run spikes on arbitrary queries; the min is the
    // reproducible statistic. Full passes (not back-to-back repeats) so
    // one sustained host stall can't poison all three samples of a query.
    val passes = (1 to 3).map { _ =>
      SparkEntry.queries.map { case (name, fn) =>
        // a failing pass must not contribute its time-to-failure as a
        // "fast" sample — record it as +inf so min() only ever picks
        // successful runs; all-failed surfaces as -1 in the JSON
        val t0 = System.nanoTime()
        val ok = try { run(fn, sfDir); true }
          catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9
          else Double.PositiveInfinity)
      }
    }
    val results = SparkEntry.queries.keys.map { name =>
      val best = passes.map(_(name)).min
      name -> (if (best.isInfinity) -1.0 else best)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
