package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** The custom codegen'd vector expressions must be bit-identical to the
  * higher-order-function reference forms (same left-to-right double
  * accumulation) — that identity is what keeps the DuckDB oracle green
  * after the hot path switched to the fused expressions.
  */
class VectorExprSpec extends SparkSpec {

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sf001)
    e.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      .crossJoin(e.select(col("vec_id").as("id2"), col("embedding").as("v2")))
      .where(col("id1") < 3)
  }

  test("fused cosine ≡ HOF cosine, bit-for-bit on real vectors") {
    val n = pairs
      .select(VectorFunctions.cosine(col("v1"), col("v2")).as("fast"),
        VectorFunctions.cosineHof(col("v1"), col("v2")).as("ref"))
      .where(col("fast") =!= col("ref") ||
        (col("fast").isNull =!= col("ref").isNull))
      .count()
    assert(n == 0)
  }

  test("fused dot and l2 ≡ HOF forms, bit-for-bit") {
    val n = pairs
      .select(VectorFunctions.dot(col("v1"), col("v2")).as("fd"),
        VectorFunctions.dotHof(col("v1"), col("v2")).as("rd"),
        VectorFunctions.l2Distance(col("v1"), col("v2")).as("fl"),
        VectorFunctions.l2DistanceHof(col("v1"), col("v2")).as("rl"))
      .where(col("fd") =!= col("rd") || col("fl") =!= col("rl"))
      .count()
    assert(n == 0)
  }

  test("null semantics: zero vector → null cosine; length mismatch → null") {
    import spark.implicits._
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)),   // zero norm
      (Seq(1f, 2f), Seq(1f, 2f, 3f)) // length mismatch
    ).toDF("a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
    val rows = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("c"),
      VectorFunctions.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0)) // zero-norm cosine null
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // mismatch null
  }

  test("int8 quantization: codes bounded, round-trip error ≤ scale/2, cosine close") {
    val e = Tables.embeddings(spark, sf001).where(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
      .withColumn("s", VectorFunctions.i8Scale(col("embedding")))
      .withColumn("codes", VectorFunctions.i8Codes(col("embedding")))
    // codes within [-127, 127] (symmetric range — floor(x+0.5) of |x|≤127)
    val outOfRange = e.select(explode(col("codes")).as("c"))
      .where(abs(col("c")) > 127).count()
    assert(outOfRange == 0)
    // per-element reconstruction error ≤ scale/2
    val badErr = e
      .select(col("s"), explode(
        zip_with(VectorFunctions.toDouble(col("embedding")),
          VectorFunctions.i8Dequantize(col("codes"), col("s")),
          (x, y) => abs(x - y))).as("err"))
      .where(col("err") > col("s") * 0.5 + 1e-12).count()
    assert(badErr == 0)
    // quantized cosine tracks exact cosine (both vs vec 0's codes)
    val q = e.where(col("vec_id") === 0)
      .select(col("codes").as("qc"), col("embedding").as("qv"))
    val drift = e.where(col("vec_id") =!= 0).crossJoin(q)
      .select(abs(VectorFunctions.i8Cosine(col("codes"), col("qc")) -
        VectorFunctions.cosine(col("embedding"), col("qv"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(drift < 0.02, s"int8 cosine drift $drift")
    // zero vector quantizes to zero codes and 0.0 similarity
    import spark.implicits._
    val z = Seq((Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))).toDF("za", "vb")
      .select(VectorFunctions.i8Cosine(
        VectorFunctions.i8Codes(col("za")), VectorFunctions.i8Codes(col("vb"))).as("c"))
      .head().getDouble(0)
    assert(z == 0.0)
  }

  test("SQL registration: graft_cosine usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0f, 2.0f), array(2.0f, 4.0f)) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("GraftSql.registerTables: full SQL surface ≡ the DataFrame form") {
    import graft.plans.GraftSql
    GraftSql.registerTables(spark, "/root/testdata/sf0.001")
    // vector search in pure SQL ≡ the q15 DataFrame form
    val viaSql = spark.sql(
      """SELECT vec_id, graft_cosine(embedding, q.qv) AS sim
         FROM embeddings, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         WHERE vec_id <> 0
         ORDER BY sim DESC, vec_id LIMIT 5""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qv = emb.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toSeq
    val viaDf = emb.where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedLit(qv)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql === viaDf)
    // the events view goes through the PRECISION-AWARE loader — the raw
    // nanos footer (when present) must not leak into SQL-land
    val ts = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType)
    assert(GraftSql.tableNames.forall(spark.catalog.tableExists))
    // idempotent re-registration
    GraftSql.registerTables(spark, "/root/testdata/sf0.001")
  }

  test("graft_* SQL surface complete: nearest-centroid, normalize, adc-sum (VERDICT r12 item 8)") {
    GraftFunctions.register(spark)
    // nearest centroid: cosine argmax, ties -> lowest 0-based index
    val nc = spark.sql(
      """SELECT graft_nearest_centroid(array(1.0f, 0.1f),
           array(array(0.0f, 1.0f), array(1.0f, 0.0f))) AS idx""").head().getInt(0)
    assert(nc === 1)
    // normalize: unit length as double[]; zero vector unchanged
    assert(spark.sql("SELECT graft_normalize(array(3.0f, 4.0f)) AS v")
      .head().getSeq[Double](0) == Seq(0.6, 0.8))
    assert(spark.sql("SELECT graft_normalize(array(0.0f, 0.0f)) AS v")
      .head().getSeq[Double](0) == Seq(0.0, 0.0))
    // ADC table-sum: SUM_s tables[s][codes[s]+1] — the PQ scan kernel
    val adc = spark.sql(
      """SELECT graft_adc_sum(array(1, 0),
           array(array(10.0d, 20.0d), array(30.0d, 40.0d))) AS s""").head().getDouble(0)
    assert(adc === 50.0) // tables[0][2] + tables[1][1]
    // ≡ the DataFrame builder (one tree, two spellings)
    val viaDf = spark.range(1).select(GraftFunctions.adcSum(
        typedLit(Seq(1, 0)), typedLit(Seq(Seq(10.0, 20.0), Seq(30.0, 40.0)))).as("s"))
      .head().getDouble(0)
    assert(viaDf === adc)
  }

  test("oracle SQL texts run VERBATIM through spark.sql and match the DataFrame probes") {
    // the SQL surface can express the oracle queries with NO DataFrame
    // help: the exact DuckDB oracle strings (ANSI subset) run unchanged
    // through spark.sql over GraftSql's registered views and reproduce
    // the probes' driver-hash-verified answers
    import graft.plans.GraftSql
    val sf = "/root/testdata/sf0.001"
    GraftSql.registerTables(spark, sf)
    val names = Seq("q01_pricing_summary", "q03_region_customers",
      "q05_big_spenders_semi", "q10_rollup_region_nation",
      "q11_top_orders_per_customer")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
      val cols = df.columns.sorted.map(col(_))
      df.select(cols.toIndexedSeq: _*).collect()
        .map(_.toSeq.map(String.valueOf)).toSeq
    }
    names.foreach { name =>
      val viaSql = spark.sql(OracleSql.all(name))
      val viaDf = Queries.all(name)(spark, sf)
      assert(viaSql.columns.sorted.toSeq === viaDf.columns.sorted.toSeq,
        s"$name: column mismatch")
      assert(canon(viaSql) === canon(viaDf), s"$name: SQL ≠ DataFrame probe")
    }
  }

  test("dim-check rule rejects statically mismatched vector literals at analysis") {
    import org.apache.spark.sql.graft.VectorDimCheck
    val bad = spark.range(1).select(
      VectorFunctions.cosine(
        array(lit(1.0f), lit(2.0f)),
        array(lit(1.0f), lit(2.0f), lit(3.0f))).as("c"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      VectorDimCheck(bad.queryExecution.analyzed)
    }
    assert(e.getMessage.contains("dimension mismatch"))
    // matching dims pass
    val ok = spark.range(1).select(
      VectorFunctions.cosine(array(lit(1.0f)), array(lit(2.0f))).as("c"))
    VectorDimCheck(ok.queryExecution.analyzed)
    // extension installer wires functions + check rule without error
    new graft.plans.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("optimizer rule rewrites HOF dot trees to the fused kernel, bit-identically") {
    import org.apache.spark.sql.graft.{DotProductExpr, PlanBridge, VectorHofRewrite}
    val base = Tables.embeddings(spark, sf001).limit(100)
    val hof = base.select(col("vec_id"),
      VectorFunctions.dotHof(col("embedding"), col("embedding")).as("d"))
    // the rule fires on the analyzed plan...
    val rewritten = VectorHofRewrite(hof.queryExecution.analyzed)
    val fused = rewritten.expressions.flatMap(_.collect { case e: DotProductExpr => e })
    assert(fused.nonEmpty, s"rule did not fire:\n${rewritten.treeString.take(1200)}")
    // ...and the rewritten plan executes to bit-identical results
    val want = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = PlanBridge.ofRows(spark, rewritten)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
    // near-miss shapes are left alone: non-zero seed / non-multiply zip
    val seeded = base.select(aggregate(
      zip_with(VectorFunctions.toDouble(col("embedding")),
        VectorFunctions.toDouble(col("embedding")), (x, y) => x * y),
      lit(1.0), (acc, x) => acc + x).as("d"))
    assert(VectorHofRewrite(seeded.queryExecution.analyzed)
      .expressions.flatMap(_.collect { case e: DotProductExpr => e }).isEmpty)
    val summed = base.select(aggregate(
      zip_with(VectorFunctions.toDouble(col("embedding")),
        VectorFunctions.toDouble(col("embedding")), (x, y) => x + y),
      lit(0.0), (acc, x) => acc + x).as("d"))
    assert(VectorHofRewrite(summed.queryExecution.analyzed)
      .expressions.flatMap(_.collect { case e: DotProductExpr => e }).isEmpty)
  }

  test("LSH approxTopK returns k near neighbors of the query") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") === 0).head().getSeq[Float](1)
    val out = new graft.operators.Search.LshIndex(bucketLength = 1.0, numTables = 4)
      .approxTopK(e, "vec_id", "embedding", q, k = 5)
      .collect()
    assert(out.length == 5)
    // the query vector itself is in the dataset → distance 0 neighbor first
    assert(out.map(_.getLong(0)).contains(0L))
  }

  test("fused expression stays inside whole-stage codegen") {
    val df = pairs.select(VectorFunctions.cosine(col("v1"), col("v2")).as("c"))
      .agg(count(col("c")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(600))
  }

  test("mat-vec kernel ≡ the composed array-of-dots rotation, bit-for-bit at dims 4 and 768") {
    // the OPQ rotation (Search.rotateCol) switched from d composed dot
    // expressions — whose generated projection blew janino's 64 KB limit
    // at dim 768 and silently ran interpreted — to MatVecFloatExpr; the
    // swap is only sound if every output float is BIT-identical to the
    // composed form (same double accumulation order, same final cast)
    import org.apache.spark.sql.graft.VectorColumns
    import spark.implicits._
    for (dim <- Seq(4, 768)) {
      val rnd = new scala.util.Random(dim * 7919)
      def v(): Seq[Float] = Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val rotation: IndexedSeq[Array[Float]] =
        (0 until dim).map(_ => Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      val rows = (1L to 8L).map(id => (id, v())).toDF("id", "vec")
      val composed = array(rotation.map(r =>
        VectorFunctions.dot(col("vec"), typedLit(r.toSeq)).cast("float")): _*)
      val got = rows.select(col("id"),
          VectorColumns.matVecFloat(col("vec"),
            typedLit(rotation.map(_.toSeq))).as("mv"),
          composed.as("ref"))
        .collect()
      got.foreach { r =>
        val mv = r.getSeq[Float](1)
        val ref = r.getSeq[Float](2)
        assert(mv.length == dim && ref.length == dim)
        mv.indices.foreach { i =>
          assert(java.lang.Float.floatToRawIntBits(mv(i)) ==
            java.lang.Float.floatToRawIntBits(ref(i)),
            s"dim=$dim id=${r.getLong(0)} element $i: ${mv(i)} vs ${ref(i)}")
        }
      }
    }
  }

  test("mat-vec kernel null semantics: null vector → null; row-length mismatch → null result") {
    import org.apache.spark.sql.graft.VectorColumns
    import spark.implicits._
    val rows = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None))
      .toDF("id", "vec")
    val square = typedLit(Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
    val ragged = typedLit(Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f, 5.0f)))
    val out = rows.select(col("id"),
        VectorColumns.matVecFloat(col("vec"), square).as("sq"),
        VectorColumns.matVecFloat(col("vec"), ragged).as("rg"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Float](1) == Seq(1.0f, 2.0f))
    assert(out(0).isNullAt(2), "a length-mismatched row nulls the result")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2), "null vector → null")
  }

  test("fused md5-prefix kernels ≡ the conv(substring(md5)) chain, bit-for-bit") {
    // r19 optimization round: the minhash/sampling hot paths switched from
    // the 4-expression hex round-trip to HashColumns.md5PrefixLong /
    // md5SeedPrefixLong — this pins value equality (incl. unicode, empty
    // strings, every digit width in use: 7, 10, 15) and null behavior, so
    // every md5-hashed oracle twin stays green by construction.
    import org.apache.spark.sql.graft.HashColumns
    import spark.implicits._
    val strs = Seq("", "a", "hello world", "ünïcødé ⚡ 漢字", "|", "0|x",
      "the quick brown fox jumps over the lazy dog " * 20,
      "line\nbreak\ttab") ++ (0 until 50).map(i => s"tok_$i salt")
    val df = strs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    for (d <- Seq(7, 10, 15)) {
      val bad = df.select(
          HashColumns.md5PrefixLong(col("s"), d).as("fast"),
          conv(substring(md5(col("s")), 1, d), 16, 10).cast("long").as("ref"))
        .where(col("fast") =!= col("ref") ||
          (col("fast").isNull =!= col("ref").isNull))
        .count()
      assert(bad == 0, s"md5PrefixLong digits=$d drifted from the chain")
    }
    val badSeed = df.crossJoin(Seq(0, 1, 7, 11).toDF("seed"))
      .select(
        HashColumns.md5SeedPrefixLong(col("seed"), col("s")).as("fast"),
        conv(substring(md5(concat(col("seed").cast("string"), lit("|"),
          col("s"))), 1, 15), 16, 10).cast("long").as("ref"))
      .where(col("fast") =!= col("ref") ||
        (col("fast").isNull =!= col("ref").isNull))
      .count()
    assert(badSeed == 0, "md5SeedPrefixLong drifted from the concat chain")
    // null propagation matches the chain: null in → null out
    val nulls = Seq((1, null: String)).toDF("i", "s")
      .select(HashColumns.md5PrefixLong(col("s")).as("a"),
        HashColumns.md5SeedPrefixLong(lit(3), col("s")).as("b"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
}
