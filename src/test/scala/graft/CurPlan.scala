package graft
import org.apache.spark.sql.SparkSession
object CurPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_curation_v5")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("=== hashEx: " + "Exchange hashpartitioning".r.findAllIn(plan).size)
    println("=== allEx: " + "Exchange ".r.findAllIn(plan).size)
    println("=== sortmerge: " + "SortMergeJoin".r.findAllIn(plan).size)
    println("=== bhj: " + "BroadcastHashJoin".r.findAllIn(plan).size)
    println("=== scans: " + "Scan parquet".r.findAllIn(plan).size)
    println("=== text-in-exchange: " + plan.split("\n").count(l => l.contains("Exchange") && l.contains("text")))
    spark.stop()
  }
}
