package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured attribution for the r14 `boilerplate_full` scale row
  * (VERDICT r13 task 5): after the axis grew its 1× corpus 4× (so the
  * denominator measures scaling work, not session fixed cost), the
  * row's wall ratio moved from ~2.15 to ~3.0 — this profile separates
  * the two candidate explanations:
  *   (a) superlinear work (an exchange cardinality growing >10× for
  *       10× docs) — a real defect, or
  *   (b) linear work whose 1× side now actually loads the cores, so
  *       the wall ratio climbs toward the parallel-throughput limit —
  *       the honest shape of a compute-bound linear operator.
  * It measures, at 1× and 10×: the deterministic cardinalities feeding
  * every exchange (docs, exploded lines, distinct (domain, line-hash)
  * cells, distinct (domain, k, id) triples, kill-list rows), a
  * copy-count sweep at 1× (1/2/4 copies → marginal-cost slope m and
  * fixed intercept f), and back-to-back walls of the axis body.
  * Verdict printed at the end: every cardinality ratio ≤ 10× ⇒ (b).
  */
object ProfileBoiler {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir1 = "/root/testdata/sf0.1"
    val dir10 = "/root/repo/tmp/scale10x"

    def corpus(dir: String, copies: Int): DataFrame = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val rep = (0 until copies).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          col("source"), col("text")))
        .reduce(_ unionByName _)
      SparkEntry.boilerMangle(rep) // the ONE shared mangle definition
    }
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def body(dir: String, copies: Int): Unit =
      operators.Dedup.stripDomainBoilerplate(corpus(dir, copies),
          "doc_id", "source", "text",
          minDomainDocs = 5L, minFraction = 0.5)
        .write.mode("overwrite").format("noop").save()

    // deterministic cardinalities (the exchange/broadcast feeders)
    def cards(dir: String, copies: Int): Map[String, Long] = {
      val c = corpus(dir, copies)
      val lines = c.select(col("doc_id"), col("source"),
          explode(split(col("text"), "\n")).as("__line"))
        .withColumn("__k", md5(col("__line")))
      val killed = {
        val dn = c.groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("dn"))
          .filter(col("dn") >= 5)
        lines.groupBy(col("source"), col("__k"))
          .agg(countDistinct(col("doc_id")).as("n"))
          .join(dn, Seq("source"))
          .filter(col("n") * 1000000L >= lit(500000L) * col("dn"))
      }
      Map(
        "docs" -> c.count(),
        "lines" -> lines.count(),
        "cells" -> lines.select(col("source"), col("__k"))
          .distinct().count(),
        "triples" -> lines.select(col("source"), col("__k"),
          col("doc_id")).distinct().count(),
        "kill_rows" -> killed.count(),
        "domains" -> c.select(col("source")).distinct().count())
    }

    System.err.println("[boiler] cardinalities (4 copies, both axes):")
    val c1 = cards(dir1, 4); val c10 = cards(dir10, 4)
    c1.keys.toSeq.sorted.foreach { k =>
      val r = if (c1(k) == 0) Double.NaN else c10(k).toDouble / c1(k)
      System.err.println(
        f"[boiler]   $k%-10s x1=${c1(k)}%10d  x10=${c10(k)}%10d  ratio=$r%6.2f")
    }

    // copy-count sweep at 1x: fixed intercept vs marginal slope.
    // warmup once so codegen/scan caches are equal across points
    body(dir1, 1)
    val t1 = (1 to 2).map(_ => wall(body(dir1, 1))).min
    val t2 = (1 to 2).map(_ => wall(body(dir1, 2))).min
    val t4 = (1 to 2).map(_ => wall(body(dir1, 4))).min
    val m = (t4 - t1) / 3.0
    val f = (t1 - m).max(0.0)
    System.err.println(
      f"[boiler] 1x sweep: t(1)=$t1%.2f t(2)=$t2%.2f t(4)=$t4%.2f " +
        f"-> marginal m=$m%.3f s/copy, fixed f=$f%.3f s")

    // axis walls, back-to-back (reproducibility of the ratio)
    val w1a = wall(body(dir1, 4)); val w10a = wall(body(dir10, 4))
    val w1b = wall(body(dir1, 4)); val w10b = wall(body(dir10, 4))
    val pred10 = f + 40.0 * m
    System.err.println(
      f"[boiler] axis walls: x1=$w1a%.2f/$w1b%.2f  x10=$w10a%.2f/$w10b%.2f" +
        f"  ratio=${w10a / w1a}%.2f/${w10b / w1b}%.2f")
    System.err.println(
      f"[boiler] linear-fit prediction for x10 (f + 40m) = $pred10%.2f s" +
        f" vs measured ${math.min(w10a, w10b)}%.2f")
    val worstCard = c1.keys.filter(k => c1(k) > 0)
      .map(k => c10(k).toDouble / c1(k)).max
    System.err.println(
      f"[boiler] VERDICT: worst cardinality ratio $worstCard%.2f " +
        (if (worstCard <= 10.05) "(<= 10x: work is LINEAR in the corpus; " +
          "the wall ratio is the parallel-throughput readout of a " +
          "compute-bound 1x side, not superlinear work)"
        else "(> 10x: SUPERLINEAR term found — investigate)"))
    spark.stop()
  }
}
