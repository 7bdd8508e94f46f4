package graft

import org.apache.spark.sql.SparkSession

/** Driver t1 replica for tools/round_gate.sh: run the flagship
  * `SparkEntry.entry` (pinned to sf0.001 by the driver contract) and
  * fail (non-zero exit) if it returns no rows — the same rows>0
  * smoke the harness applies. Usage: runMain graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke":"entry","rows":$n}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
