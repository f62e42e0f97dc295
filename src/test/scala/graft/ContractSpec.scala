package graft

/** Driver-contract wiring guards: every oracle entry must have a registered
  * query, names must be well-formed, and the flagship entry must exist —
  * catching map-wiring mistakes before the driver does.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("probe names are well-formed and stable") {
    val names = SparkEntry.queries.keySet
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    assert(names.size == SparkEntry.queries.size)
    assert(names.size >= 70, s"probe count regressed: ${names.size}")
    assert(SparkEntry.oracleSql.size >= 61, s"oracle count regressed: ${SparkEntry.oracleSql.size}")
  }

  test("rows-only probes are exactly the declared set (new probes need oracles)") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    val declared = Set.empty[String] // reasons in SURVEY §2.11-2.12
    // (q42/q45 gained oracles in round 4; q40/q41/q44 in round 5 via the
    // portable md5-TF embedder, sparse cosine, and decimal-quantized sums;
    // q47 in round 6 via the pinned (df desc, term asc) vocabulary;
    // q50/q51 in round 10 via the drained-stream batch twin and the
    // lossless file-ingest round-trip; q43 — the last holdout, MLlib's
    // data-order-dependent hash family — became a BOUNDED pass in round
    // 19: it emits the exact-pair census (real SQL in DuckDB) plus a
    // recall-≥-frozen-floor verdict, so the oracle set is now TOTAL)
    assert(rowsOnly == declared,
      s"undeclared rows-only probes: ${rowsOnly.diff(declared)}; stale declarations: ${declared.diff(rowsOnly)}")
  }

  test("oracle SQL strings are DuckDB-shaped (no Spark-only spellings)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("get_json_object"), s"$name uses Spark JSON fn in oracle")
      assert(!sql.contains("(?<="), s"$name uses lookbehind (RE2-unsafe)")
      assert(!sql.toLowerCase.contains("approx_"), s"$name uses approx fn in oracle")
    }
  }

  test("flagship entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
