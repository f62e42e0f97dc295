package graft

import org.apache.spark.sql.SparkSession
import graft.plans.PlanSignature

/** Capture (or refresh) the committed plan-signature snapshot for the
  * flagship probes — the write side of the plan-snapshot regression gate
  * (VERDICT r11 item 3; the read side is in [[Verify]]). Usage:
  *
  *   runMain graft.PlanSnap <sfDir> [<sfDir> ...]
  *
  * Re-signs every [[PlanSignature.flagshipProbes]] probe at each given
  * scale and REPLACES those keys in `plan_signatures.json`
  * (`SPARK_GRAFT_PLAN_SIGS` overrides the path), leaving other scales'
  * entries intact. Run this deliberately after an INTENTIONAL plan
  * change, diff the canonical text in review, and commit the file — the
  * gate then holds the new shape.
  *
  * Capture config mirrors the driver's Verify defaults (AQE on,
  * shuffle.partitions = cpus); the signature itself is
  * parallelism-invariant by construction, so the cpu count here need not
  * match the gate run's.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanSnap <sfDir> [<sfDir> ...]")
    val sigPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_SIGS", "plan_signatures.json"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val existing =
      if (java.nio.file.Files.exists(sigPath))
        PlanSignature.parse(java.nio.file.Files.readString(sigPath))
      else Map.empty[String, (String, String)]
    val updated = args.foldLeft(existing) { (acc, sfDir) =>
      val key = PlanSignature.sfKey(sfDir)
      acc ++ PlanSignature.probesFor(key).map { probe =>
        val sig = PlanSignature.of(SparkEntry.queries(probe)(spark, sfDir))
        println(s"[plansnap] $key/$probe -> ${PlanSignature.digest(sig)}")
        s"$key/$probe" -> ((PlanSignature.digest(sig), sig))
      }
    }
    java.nio.file.Files.writeString(sigPath, PlanSignature.render(updated))
    println(s"[plansnap] wrote ${updated.size} entries to $sigPath")
    spark.stop()
  }
}
