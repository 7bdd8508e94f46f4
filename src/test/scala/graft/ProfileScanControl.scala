package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Session-condition CONTROL for the scale artifact (r14): a bare
  * parquet scan+fold is work-linear by construction — no joins, no
  * state, nothing the library can get wrong — so its measured 1×/10×
  * wall ratio in THIS session is the host-throughput term every other
  * row's ratio rides on (page-cache pressure, co-tenant I/O). Read the
  * per-operator rows against this control before attributing residue
  * to the operator: a kcore_zipf 2.2 in a session whose scan control
  * reads 2.0 carries ~0.2 of operator, not 1.2. The r12/r13 precedent
  * measured the same uniform-shift signature on the FLAT bench
  * (125–194 s back-to-back same-code runs); this is the 10×-axis
  * analogue, run adjacent to the probe samples it controls for.
  */
object ProfileScanControl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir1 = "/root/testdata/sf0.1"
    val dir10 = "/root/repo/tmp/scale10x"
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // two shapes: a row-count fold over the widest fact table and a
    // hash+agg fold over the documents text column (CPU-heavier, the
    // text-tier scan shape) — warmup pass then min-of-2, the probe's
    // own protocol
    def scanLineitem(dir: String): Unit =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(sum(col("l_quantity")), count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    def scanDocs(dir: String): Unit =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(length(md5(col("text"))).as("h"))
        .agg(sum(col("h")), count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    for ((name, f) <- Seq(
        ("lineitem_scan", scanLineitem _),
        ("documents_md5_scan", scanDocs _))) {
      f(dir1); f(dir10) // warmup both sides
      val t1 = (1 to 2).map(_ => wall(f(dir1))).min
      val t10 = (1 to 2).map(_ => wall(f(dir10))).min
      System.err.println(
        f"[scan-control] $name%-20s x1=$t1%6.2f s  x10=$t10%6.2f s  " +
          f"ratio=${t10 / t1}%5.2f")
    }
    spark.stop()
  }
}
