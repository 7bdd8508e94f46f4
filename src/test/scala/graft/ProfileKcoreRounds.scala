package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic work terms for the `kcore_zipf` scale row (the
  * ProfileWedges convention): replay the k-core peel on the exact
  * Zipf-degree graphs the probe generates (same hash-draw
  * construction as ScaleProbe.zipfEdges) at 1x and 10x, counting
  * PEEL ROUNDS to the fixpoint and the per-round surviving edge
  * totals — the peel's round count is data-dependent (shell
  * structure), so if rounds GROW with scale the wall ratio floor is
  * (rounds ratio) x (per-round fixed cost) + linear work, an
  * algorithmic term no plan change removes. Wall times are NOT what
  * this profiler reads (host-window hostage); the round counts and
  * edge sums are exact.
  */
object ProfileKcoreRounds {
  private def zipfEdges(s: SparkSession, factor: Int): DataFrame = {
    val nEdges = 200000L * factor
    val nodes = 20000L * factor
    def zipfNode(seed: Int) =
      floor(pow(lit(nodes.toDouble),
        pmod(hash(col("id"), lit(seed)), lit(1 << 20)).cast("double")
          / (1 << 20))).cast("long")
    s.range(nEdges)
      .select(zipfNode(1).as("src"), zipfNode(2).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 3
    for (f <- Seq(1, 10)) {
      // canonical undirected simple edges, as kCore builds them
      var e = zipfEdges(spark, f)
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct().localCheckpoint(true)
      val e0 = e.count()
      var rounds = 0
      var edgeWork = e0 // Σ per-round edges scanned (the honest work)
      var changed = true
      while (changed && rounds < 100) {
        val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
        val keep = deg.filter(col("d") >= k).select(col("n"))
        val e2 = e.join(keep.withColumnRenamed("n", "u"), Seq("u"))
          .join(keep.withColumnRenamed("n", "v"), Seq("v"))
          .select(col("u"), col("v")).localCheckpoint(true)
        val n2 = e2.count()
        changed = n2 != e.count()
        e = e2
        rounds += 1
        edgeWork += n2
      }
      System.err.println(s"[kcore-rounds] factor=$f edges0=$e0 " +
        s"rounds=$rounds survivingEdges=${e.count()} " +
        s"sumPerRoundEdges=$edgeWork")
    }
    spark.stop()
  }
}
