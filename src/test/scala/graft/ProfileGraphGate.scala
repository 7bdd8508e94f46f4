package graft

/** Scratch A/B for the round-13 kCore/triangle small-graph arms on the
  * exact q_kcore / q_triangles co-purchase graph at sf0.1.
  */
object ProfileGraphGate {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val q = SparkEntry.queries
    def t(tag: String)(f: => Unit): Unit = {
      val t0=System.nanoTime(); f
      System.err.println(f"[graph-gate] $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (i <- 1 to 2; name <- Seq("q_triangles", "q_kcore"))
      t(s"$name run$i")(q(name)(spark, dir)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
