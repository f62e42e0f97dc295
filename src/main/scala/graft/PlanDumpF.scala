package graft

import org.apache.spark.sql.SparkSession

/** Scratch (r19 optimization round): print explain("formatted") plus the
  * AQE-final executed plan for a list of probes — the plans/r19 artifact
  * dumper. Not part of the driver contract.
  */
object PlanDumpF {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name formatted =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      df.collect()
      println(s"===== $name AQE-final executed =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
