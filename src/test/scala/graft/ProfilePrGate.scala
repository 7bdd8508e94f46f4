package graft

/** Scratch A/B for the round-13 pageRank small-graph gate: local arm vs
  * distributed on the exact q_pagerank sf0.1 graph (1.2M edges).
  * Measured when landed: warm local 2.61 s vs distributed 7.15 s.
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfilePrGate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val pairs = sources.Tables.lineitem(spark, dir)
      .select((col("l_orderkey").cast("long")*2).as("o"),
        (col("l_suppkey").cast("long")*2+1).as("p")).distinct()
    val edges = pairs.select(col("o").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("o").as("dst")))
      .localCheckpoint(true)
    println("edges=" + edges.count())
    def t(tag: String)(f: => Unit): Unit = {
      val t0=System.nanoTime(); f
      println(f"$tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (i <- 1 to 2) {
      t(s"local  run$i")(operators.Behavior.pageRank(edges,"src","dst",5)
        .write.mode("overwrite").format("noop").save())
      t(s"dist   run$i")(operators.Behavior.pageRank(edges,"src","dst",5,
          localMaxEdges=0L)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
