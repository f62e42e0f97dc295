package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Sampling

/** Deterministic sampling / budgeting / PII redaction (EXT pipeline ops). */
class SamplingSpec extends SparkSpec {

  test("sampleByHash: deterministic, partition-independent, fraction-honoring") {
    import spark.implicits._
    val keys = (1L to 10000L).toDF("k")
    val a = Sampling.sampleByHash(keys, col("k"), 0.25, "s")
      .select("k").as[Long].collect().sorted.toSeq
    val b = Sampling.sampleByHash(keys.repartition(13), col("k"), 0.25, "s")
      .select("k").as[Long].collect().sorted.toSeq
    assert(a == b) // same selection regardless of layout
    assert(math.abs(a.size / 10000.0 - 0.25) < 0.02, s"got ${a.size}")
    // different salt → a different (roughly independent) draw
    val c = Sampling.sampleByHash(keys, col("k"), 0.25, "other")
      .select("k").as[Long].collect().toSet
    assert(c != a.toSet)
  }

  test("splitByHash: exact partition — disjoint, exhaustive") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("k")
    val (sel, rest) = Sampling.splitByHash(keys, col("k"), 0.4, "v1")
    val s = sel.select("k").as[Long].collect().toSet
    val r = rest.select("k").as[Long].collect().toSet
    assert(s.intersect(r).isEmpty)
    assert(s.union(r).size == 2000)
  }

  test("stratifiedSampleByHash: per-group fractions honored, default applies, deterministic") {
    import spark.implicits._
    val df = (1L to 6000L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    val out = Sampling.stratifiedSampleByHash(df, col("k"), col("g"),
      Map("g0" -> 0.5, "g1" -> 0.1), defaultFraction = 0.25, salt = "s")
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("g0") / 2000.0 - 0.5) < 0.05, counts.toString)
    assert(math.abs(counts("g1") / 2000.0 - 0.1) < 0.05, counts.toString)
    assert(math.abs(counts("g2") / 2000.0 - 0.25) < 0.05, counts.toString)
    // repartition-stable
    val again = Sampling.stratifiedSampleByHash(df.repartition(17), col("k"), col("g"),
      Map("g0" -> 0.5, "g1" -> 0.1), defaultFraction = 0.25, salt = "s")
      .select("k").as[Long].collect().sorted.toSeq
    assert(again == out.select("k").as[Long].collect().sorted.toSeq)
  }

  test("tokenBudgetFilter: per-group prefix under budget, later rows cut") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 500), ("a", 2L, 900), ("a", 3L, 700), // a: 500,1400,2100 → keep 1,2
      ("b", 4L, 2000), ("b", 5L, 1)).toDF("src", "id", "n") // b: 2000,2001 → keep 4
    val kept = Sampling.tokenBudgetFilter(df, col("src"), col("n"), Seq(col("id")), 2000L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L))
  }

  test("redactPii: emails, phones, IPv4 replaced; prose untouched") {
    import spark.implicits._
    val texts = Seq(
      "mail me at jo.doe+x@mail.example.org today",
      "call +1 (555) 123-4567 now",
      "server at 192.168.1.100 is up",
      "no pii here, just words and one 7 digit")
    val out = texts.toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
      .as[String].collect().toSeq
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "call <PHONE> now")
    assert(out(2) == "server at <IP> is up")
    assert(out(3) == texts(3))
  }
}
