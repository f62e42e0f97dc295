package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val old =
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "text")
  private lazy val cur =
    Seq((1L, "alpha"), (2L, "BETA2"), (5L, "epsilon"))
      .toDF("id", "text")
  private def fp = Snapshots.fingerprint(col("text"))

  test("snapshotDelta classifies added/removed/changed/unchanged") {
    val d = Snapshots.snapshotDelta(old, cur, "id", fp)
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "removed", 5L -> "added"))
  }

  test("changedRows carries the CURRENT payload for added ∪ changed only") {
    val rows = Snapshots.changedRows(old, cur, "id", fp)
      .as[(Long, String)].collect().toMap
    assert(rows === Map(2L -> "BETA2", 5L -> "epsilon"))
  }

  test("removedIds names exactly the retired ids") {
    val ids = Snapshots.removedIds(old, cur, "id", fp).as[Long].collect().sorted
    assert(ids.toSeq === Seq(3L, 4L))
  }

  test("identical snapshots: everything unchanged, nothing to process") {
    val d = Snapshots.snapshotDelta(old, old, "id", fp)
    assert(d.where(col("status") =!= "unchanged").isEmpty)
    assert(Snapshots.changedRows(old, old, "id", fp).isEmpty)
  }

  test("the delta join ships digests, not text: fp computed below the exchange") {
    val plan = Snapshots.snapshotDelta(old, cur, "id", fp)
      .queryExecution.optimizedPlan.toString
    // the payload column is projected away before the join inputs
    assert(!plan.contains("text#") || plan.indexOf("sha2") < plan.indexOf("Join"),
      plan.take(1500))
  }
}
