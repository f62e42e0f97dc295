package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanSignature

/** The plan-snapshot regression gate's own contract (VERDICT r11 item 3):
  * the canonical signature must be STABLE under everything that is noise
  * (re-execution, fresh expression ids, parallelism) and must FLIP on a
  * real physical-strategy change — the intentional-drift negative the
  * gate's value rests on. Also pins the snapshot file round-trip.
  */
class PlanGateSpec extends SparkSpec {

  test("signature is rerun-stable and flips when a broadcast degrades to a shuffled join") {
    val cust = Tables.customer(spark, sf001)
    val nat = Tables.nation(spark, sf001)
    def query() = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    // two separate constructions → fresh expression ids, same signature
    val s1 = PlanSignature.of(query())
    val s2 = PlanSignature.of(query())
    assert(s1 == s2, s"re-execution must not change the signature:\n$s1\nvs\n$s2")
    assert(s1.contains("BroadcastHashJoin"), s1)
    assert(s1.contains("FileScan["), s1)
    // intentional drift: forbid broadcast → the join strategy changes and
    // the digest MUST move (this is the regression the gate exists for)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val s3 = PlanSignature.of(query())
      assert(!s3.contains("BroadcastHashJoin"), s3)
      assert(PlanSignature.digest(s3) != PlanSignature.digest(s1),
        "a broadcast→shuffle flip must change the digest")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    // and after restoring the conf the original digest comes back —
    // the flip above was the plan, not ambient state
    assert(PlanSignature.digest(PlanSignature.of(query())) ==
      PlanSignature.digest(s1))
  }

  test("signature ignores partition counts but keeps partitioning class") {
    val ev = Tables.events(spark, sf001)
    def agg() = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val s1 = PlanSignature.of(agg())
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try {
      val s2 = PlanSignature.of(agg())
      assert(s1 == s2,
        s"shuffle-partition count is parallelism, not plan shape:\n$s1\nvs\n$s2")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(s1.contains("ShuffleExchange(HashPartitioning"), s1)
  }

  test("snapshot file: render/parse round-trip, including escapes") {
    val entries = Map(
      "sf0.01/q01" -> (("abc123", "A\n  B\n    C\"quoted\"\\back\tslash\n")),
      "sf0.1/q148" -> (("def456", "X\n")))
    val parsed = PlanSignature.parse(PlanSignature.render(entries))
    assert(parsed == entries)
    // a multi-KB canonical must parse without blowing the stack (the
    // regex parser this replaced overflowed here)
    val big = Map("sf0.01/qBig" -> (("d" * 32, ("Node\n  Child\n" * 2000))))
    assert(PlanSignature.parse(PlanSignature.render(big)) == big)
  }
}
