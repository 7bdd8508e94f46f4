package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val emb = sources.Tables.embeddings(spark, dir).cache(); emb.count()
    val df = operators.Similarity.randomProject(emb, "vec_id", "embedding", 64, 16)
    t("plan") { df.queryExecution.executedPlan }
    t("run1") { df.write.mode("overwrite").format("noop").save() }
    t("run2") { df.write.mode("overwrite").format("noop").save() }
    t("run3-count") { println("  n=" + df.count()) }
    val df2 = emb.select(col("vec_id"),
      graft.functions.VectorExpressions.randomProjection(col("embedding"), 64, 16).as("p"))
    t("nocheck-run1") { df2.write.mode("overwrite").format("noop").save() }
    t("nocheck-run2") { df2.write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
