package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage breakdown for q_triangles at sf0.1 (round 8): where
  * do the ~7 s go — pair generation, support filter, or the triangle
  * phase?
  */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[tri] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    t("lineitem count")(li.count())
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"),
        col("a.l_orderkey").as("ok"))
      .distinct()
    t("pairs distinct")(pairs.count())
    val edges = pairs.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2).select(col("u"), col("v"))
    t("edges support>=2")(edges.count())
    t("warm full query")(operators.Behavior
      .triangleCounts(edges, "u", "v", localMaxEdges = 0L).count())
    t("second full query")(operators.Behavior
      .triangleCounts(edges, "u", "v", localMaxEdges = 0L).count())
    pairs.sparkSession.sharedState.cacheManager.clearCache()
    spark.stop()
  }
}
