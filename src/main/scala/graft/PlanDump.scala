package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: run one registered probe and print its AQE-final
  * executed plan (the artifact PLANS.md captures). Usage:
  * `runMain graft.PlanDump <sfDir> <probeName>`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize AQE
    println(s"== $name ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
