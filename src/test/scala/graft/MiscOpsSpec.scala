package graft

import org.apache.spark.sql.functions._

/** Coverage stragglers: approx distinct tolerance (A3 — sketch-incompatible
  * with DuckDB, so no oracle), right/full outer joins (J3 beyond the q04
  * left-outer probe).
  */
class MiscOpsSpec extends SparkSpec {

  test("A3: approx_count_distinct within 5% of exact on events.user_id") {
    val ev = Tables.events(spark, sf001)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.agg(approx_count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("J3: right and full outer joins keep unmatched sides") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val b = Seq((2, "b2"), (3, "b3")).toDF("k2", "bv")
    val right = a.join(b, col("k") === col("k2"), "right_outer")
      .select(col("k2"), col("av")).orderBy("k2").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(right == Seq((2, "a2"), (3, null)))
    val full = a.join(b, col("k") === col("k2"), "full_outer")
      .select(coalesce(col("k"), col("k2")).as("kk")).orderBy("kk")
      .as[Int].collect().toSeq
    assert(full == Seq(1, 2, 3))
  }

  test("LmScore: trigram probabilities exact, unseen floor, mean log-prob") {
    import spark.implicits._
    import graft.operators.LmScore
    // reference corpus "abcabc": trigrams abc, bca, cab, abc → counts
    // abc=2, bca=1, cab=1; contexts ab·=2, bc·=1, ca·=1 → P(abc)=1,
    // P(bca)=1, P(cab)=1 (each context fully determines its successor)
    val ref = Seq(Tuple1("abcabc")).toDF("text")
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val probs = model.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(probs("abc") == ((2L, 2L, 0.0)))
    assert(probs("bca") == ((1L, 1L, 0.0)))
    assert(probs("cab") == ((1L, 1L, 0.0)))
    // "abca": abc (ln 1 = 0), bca (0) → avg 0; "xyz": unseen → floor
    val scored = LmScore.scoreDocs(
      Seq((1L, "abca"), (2L, "xyz"), (3L, "ab")).toDF("id", "text"),
      "id", col("text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scored(1L) == ((2L, 0.0)))
    // the DECIMAL(24,12) sum rounds at 1e-12 (identically in the oracle)
    assert(scored(2L)._1 == 1L &&
      math.abs(scored(2L)._2 - LmScore.UnseenLogProb) < 1e-12)
    assert(!scored.contains(3L)) // <3 chars: no trigrams, absent
    // mixed-case input folds: "ABCabc" scores like "abcabc"
    val folded = LmScore.scoreDocs(
      Seq((9L, "ABCabc")).toDF("id", "text"), "id", col("text"), model)
      .collect().head
    assert(folded.getLong(1) == 4L && folded.getDouble(2) == 0.0)
  }

  test("q90/q91: correlated subqueries decorrelate to joins (no per-row subquery)") {
    // Catalyst must rewrite the correlated scalar subquery (q90) and the
    // EXISTS (q91) into aggregate+join / left-semi join. If decorrelation
    // regressed, the physical plan would carry a Subquery/InSubquery node
    // re-evaluated per row — the one shape that cannot scale.
    val p90 = Queries.q90CorrelatedScalar(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p90.contains("InSubqueryExec") && !p90.contains("ScalarSubquery"),
      s"q90 plan still carries a per-row subquery:\n$p90")
    assert(p90.contains("Join"), s"q90 plan lost the decorrelated join:\n$p90")
    val p91 = Queries.q91ExistsSubquery(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p91.contains("LeftSemi"),
      s"q91 EXISTS did not become a left-semi join:\n$p91")
    // q96: the NOT EXISTS must become a left-anti join; the uncorrelated
    // scalar threshold stays a one-shot subquery (evaluated once, not
    // per row) — that one is the CORRECT shape, so only anti is asserted
    val p96 = Queries.q96ScalarAnti(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p96.contains("LeftAnti"),
      s"q96 NOT EXISTS did not become a left-anti join:\n$p96")
  }
}
