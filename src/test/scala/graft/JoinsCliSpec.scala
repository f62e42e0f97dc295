package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Salted-join/aggregation equivalence, bucketed co-located joins, CLI. */
class JoinsCliSpec extends SparkSpec {

  test("saltedEquiJoin result ≡ plain inner join on a skewed key (salted regime)") {
    import spark.implicits._
    // 90% of rows share key 1 — the hot-key shape salting is for
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 1, i.toLong))
      .toDF("k", "rowid")
    val small = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k2", "name")
    val plain = big.join(small, col("k") === col("k2"))
      .select("rowid", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // forceSalt: this tiny small side would otherwise take the broadcast
    // skip path — here we pin the SALTED shape's correctness
    val saltedDf = Joins.saltedEquiJoin(big, small, "k", "k2", col("rowid"),
      numSalts = 8, forceSalt = true)
    val salted = saltedDf
      .select("rowid", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
    // the salted shape actually salts: _salt participates in the join keys
    assert(saltedDf.queryExecution.optimizedPlan.toString.contains("_salt"))
  }

  test("bloomPrunedJoin ≡ plain inner join; fp-prone sizing stays exact; plan carries the probe") {
    import spark.implicits._
    // big side from parquet: over a LocalRelation the optimizer folds the
    // bloom probe away at plan time (ConvertToLocalRelation), which hides
    // the filter this test asserts on — file-backed matches the real shape
    val dir = Files.createTempDirectory("bloomjoin").toString
    (1 to 5000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "rowid")
      .write.mode("overwrite").parquet(s"$dir/big")
    val big = spark.read.parquet(s"$dir/big")
    val small = (0L until 20L).map(k => (k * 25, s"v$k")).toDF("k2", "name")
    val plain = big.join(small, col("k") === col("k2"))
      .select("rowid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain.nonEmpty)
    val pruned = Joins.bloomPrunedJoin(big, small, "k", "k2",
      expectedItems = 100L, numBits = 1L << 16)
    assert(pruned.select("rowid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === plain)
    // the bloom probe is IN the plan, filtering the big side
    assert(pruned.queryExecution.executedPlan.toString
      .toLowerCase.contains("might_contain"))
    // deliberately undersized sketch (64 bits for 20 keys → fp-heavy):
    // false positives ride through to the join, the result stays exact
    val fpProne = Joins.bloomPrunedJoin(big, small, "k", "k2",
      expectedItems = 100L, numBits = 64L)
    assert(fpProne.select("rowid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === plain)
    // empty small side → empty inner join, schema preserved
    val empty = Joins.bloomPrunedJoin(big, small.where(lit(false)), "k", "k2")
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("k", "rowid", "k2", "name"))
    // guards
    intercept[IllegalArgumentException](
      Joins.bloomPrunedJoin(big, small, "k", "k2", expectedItems = 0L))
    intercept[IllegalArgumentException](
      Joins.bloomPrunedJoin(big, small, "k", "k2", numBits = 0L))
    // sizing above the session's runtime-bloom caps refuses LOUDLY instead
    // of letting BloomFilterAggregate clamp the sketch silently (ADVICE r10)
    val exBits = intercept[IllegalArgumentException](
      Joins.bloomPrunedJoin(big, small, "k", "k2", numBits = (1L << 26) + 1))
    assert(exBits.getMessage.contains("maxNumBits"))
    val exItems = intercept[IllegalArgumentException](
      Joins.bloomPrunedJoin(big, small, "k", "k2", expectedItems = 4000001L))
    assert(exItems.getMessage.contains("maxNumItems"))
  }

  test("saltedEquiJoin skips salting when the small side will broadcast") {
    import spark.implicits._
    val big = (1 to 2000).map(i => (i % 7, i.toLong)).toDF("k", "rowid")
    val small = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k2", "name")
    // broadcast regime (default 10MB threshold): a BroadcastHashJoin never
    // shuffles the big side, so skew cannot concentrate — salting would only
    // replicate the broadcast build numSalts×. The operator must join plain.
    val skipped = Joins.saltedEquiJoin(big, small, "k", "k2", col("rowid"), numSalts = 8)
    assert(!skipped.queryExecution.optimizedPlan.toString.contains("_salt"),
      "broadcastable small side must take the unsalted path")
    val plain = big.join(small, col("k") === col("k2"))
      .select("rowid", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = skipped.select("rowid", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == plain)
    // and with broadcast disabled, the same call salts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Joins.saltedEquiJoin(big, small, "k", "k2", col("rowid"), numSalts = 8)
      assert(salted.queryExecution.optimizedPlan.toString.contains("_salt"),
        "with broadcast off the salted shape must engage")
      val got2 = salted.select("rowid", "name")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got2 == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("saltedGroupBy ≡ direct groupBy for decomposable aggs") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val direct = df.groupBy(col("k")).agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Joins.saltedGroupBy(df, col("k"), col("v"), 8)(
        Seq(sum("v").as("ps"), count(lit(1)).as("pn")))(
        Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange (co-located join)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("wh").toString
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    try {
      a.write.bucketBy(8, "k").sortBy("k").option("path", s"$wh/ta").saveAsTable("graft_ta")
      b.write.bucketBy(8, "k").sortBy("k").option("path", s"$wh/tb").saveAsTable("graft_tb")
      // force the sort-merge path (tiny test tables would broadcast otherwise)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_ta").join(spark.table("graft_tb"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      // bucketed scans supply the hash distribution — no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
    }
  }

  test("asofJoin: latest at-or-before value per key; null when none") {
    import spark.implicits._
    val quotes = Seq( // (key, time, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 5L, 9.0))
      .toDF("sym", "t", "px")
    val trades = Seq( // (id, key, time)
      (1L, "A", 15L),  // -> 1.0
      (2L, "A", 20L),  // simultaneous -> 2.5 (max of same-ts quotes)
      (3L, "A", 99L),  // -> 2.5
      (4L, "B", 4L),   // before any quote -> null
      (5L, "C", 50L))  // no quotes for key -> null
      .toDF("trade_id", "sym", "t")
    val out = graft.operators.Joins.asofJoin(trades, quotes, "sym", "t", "px", "trade_id")
      .orderBy("trade_id")
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map(1L -> 1.0, 2L -> 2.5, 3L -> 2.5, 4L -> null, 5L -> null))
  }

  test("binnedIntervalJoin ≡ theta join on adversarial boundaries; no nested loop in the plan") {
    import spark.implicits._
    // boundaries ON bin edges, negative times, point == lo, point == hi,
    // zero-length interval, interval spanning many bins, empty interval
    val points = Seq(0L, 9L, 10L, 11L, -1L, -10L, 100L, 55L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
    val intervals = Seq(
      (100L, 0L, 10L),    // spans bins 0..1 (binSize 10); catches 0,9,10
      (101L, 10L, 10L),   // zero-length on a bin edge; catches exactly 10
      (102L, -10L, -1L),  // negative range; catches -10,-1
      (103L, 11L, 99L),   // many bins; catches 11,55
      (104L, 50L, 40L),   // empty (lo > hi); catches nothing
      (105L, -5L, 5L))    // crosses zero; catches -1,0
      .toDF("iid", "lo", "hi")
    val got = graft.operators.Joins
      .binnedIntervalJoin(points, "t", intervals, "lo", "hi", binSize = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.as[(Long, Long)].collect().flatMap { case (pid, t) =>
      intervals.as[(Long, Long, Long)].collect().collect {
        case (iid, lo, hi) if t >= lo && t <= hi => (pid, iid)
      }
    }.toSet
    assert(got === want && want.nonEmpty)
    val plan = graft.operators.Joins
      .binnedIntervalJoin(points, "t", intervals, "lo", "hi", binSize = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("binnedOverlapJoin ≡ theta overlap join, exactly-once without distinct") {
    import spark.implicits._
    // bin-edge touching, containment, identical intervals, negatives,
    // multi-bin spans — and NO distinct in the operator, so duplicate
    // emission would show up as inflated counts
    val left = Seq((1L, 0L, 10L), (2L, 15L, 15L), (3L, -20L, 35L), (4L, 7L, 9L))
      .toDF("lid", "a_lo", "a_hi")
    val right = Seq((10L, 10L, 20L), (11L, -5L, -1L), (12L, 0L, 100L),
      (13L, 36L, 40L), (14L, 15L, 15L))
      .toDF("rid", "b_lo", "b_hi")
    val got = graft.operators.Joins
      .binnedOverlapJoin(left, "a_lo", "a_hi", right, "b_lo", "b_hi", binSize = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val want = for {
      (lid, lo, hi) <- Seq((1L, 0L, 10L), (2L, 15L, 15L), (3L, -20L, 35L), (4L, 7L, 9L))
      (rid, rlo, rhi) <- Seq((10L, 10L, 20L), (11L, -5L, -1L), (12L, 0L, 100L),
        (13L, 36L, 40L), (14L, 15L, 15L))
      if lo <= rhi && rlo <= hi
    } yield (lid, rid)
    assert(got.sorted === want.sorted.toList) // list compare: duplicates would fail
    val plan = graft.operators.Joins
      .binnedOverlapJoin(left, "a_lo", "a_hi", right, "b_lo", "b_hi", binSize = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("binnedIntervalJoin fails loudly on an interval spanning too many bins") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val intervals = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      graft.operators.Joins.binnedIntervalJoin(
        points, "t", intervals, "lo", "hi", binSize = 10L,
        maxBinsPerInterval = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("spans more than")))
  }

  test("asofJoin forward + tolerance: earliest at-or-after within range") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 50L, 9.0))
      .toDF("sym", "t", "px")
    val trades = Seq(
      (1L, "A", 15L),  // next quote at 20 -> 2.5 (max of simultaneous)
      (2L, "A", 20L),  // at-or-after includes t=20 -> 2.5
      (3L, "A", 21L),  // nothing after -> null
      (4L, "B", 10L),  // next at 50, gap 40 > tol 30 -> null
      (5L, "B", 30L))  // gap 20 <= 30 -> 9.0
      .toDF("trade_id", "sym", "t")
    val out = graft.operators.Joins.asofJoin(trades, quotes, "sym", "t", "px",
        "trade_id", direction = "forward", tolerance = Some(30L))
      .orderBy("trade_id")
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map(1L -> 2.5, 2L -> 2.5, 3L -> null, 4L -> null, 5L -> 9.0))
  }

  test("asofJoin backward + tolerance: stale matches nulled") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "t", "px")
    val trades = Seq((1L, "A", 15L), (2L, "A", 60L)).toDF("trade_id", "sym", "t")
    val out = graft.operators.Joins.asofJoin(trades, quotes, "sym", "t", "px",
        "trade_id", tolerance = Some(10L))
      .orderBy("trade_id")
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map(1L -> 1.0, 2L -> null)) // 60-10=50 > 10 -> stale
  }

  test("IndexCli: parse defaults mirror the reference argparse; end-to-end run") {
    val a = IndexCli.parse(Array("--input", "/in", "--output", "/out"))
    assert(a.chunkSize == 1200 && a.overlap == 200 && a.batchSize == 32)
    assert(a.pdfPassword == "" && IndexCli.parse(Array(
      "--input", "/in", "--output", "/out", "--pdf-password", "pw")).pdfPassword == "pw")
    intercept[IllegalArgumentException](IndexCli.parse(Array("--input", "/in")))
    intercept[IllegalArgumentException](
      IndexCli.parse(Array("--input", "a", "--output", "b", "--bogus", "x")))

    val in = Files.createTempDirectory("cliin").toFile
    Files.write(new java.io.File(in, "d1.txt").toPath, ("alpha beta " * 30).getBytes)
    Files.write(new java.io.File(in, "d2.txt").toPath, ("gamma delta " * 25).getBytes)
    val out = Files.createTempDirectory("cliout").toString + "/idx"
    val n = IndexCli.run(spark, IndexCli.Args(
      input = in.getAbsolutePath, output = out,
      chunkSize = 100, overlap = 20, embeddingDim = 8,
      query = Some("alpha")))
    assert(n > 0)
    val back = spark.read.parquet(out)
    assert(back.select("filename").distinct().count() == 2)
  }

  test("IndexCli: --ocr opts scanned PDFs into the index; default drops them") {
    assert(!IndexCli.parse(Array("--input", "/in", "--output", "/out")).ocr)
    assert(IndexCli.parse(Array("--input", "/in", "--output", "/out", "--ocr")).ocr)
    val in = Files.createTempDirectory("cliocr").toFile
    Files.write(new java.io.File(in, "scan.pdf").toPath,
      graft.sources.DocFormats.MinimalPdf.writeScanned("scanned alpha beta " * 10, 40))
    Files.write(new java.io.File(in, "typed.txt").toPath, ("plain text " * 20).getBytes)
    // default: the scan extracts empty -> the empty-text guard drops it
    // (reference behavior, index_documents.py:38-47)
    val outA = Files.createTempDirectory("cliocrout").toString + "/a"
    IndexCli.run(spark, IndexCli.Args(input = in.getAbsolutePath, output = outA,
      chunkSize = 100, overlap = 20, embeddingDim = 8))
    assert(spark.read.parquet(outA).select("filename").distinct().collect()
      .map(_.getString(0)).toSet == Set("typed.txt"))
    // --ocr: the scan is read through the template-match tier and indexed
    val outB = Files.createTempDirectory("cliocrout2").toString + "/b"
    IndexCli.run(spark, IndexCli.Args(input = in.getAbsolutePath, output = outB,
      chunkSize = 100, overlap = 20, embeddingDim = 8, ocr = true))
    assert(spark.read.parquet(outB).select("filename").distinct().collect()
      .map(_.getString(0)).toSet == Set("scan.pdf", "typed.txt"))
  }

  test("IndexCli: --provider gemini routes through the REST wire contract (mock transport)") {
    // provider/model flags parse like the reference argparse
    // (index_documents.py:262: --embedding-model, default gemini-embedding-001)
    val g = IndexCli.parse(Array("--input", "/in", "--output", "/out",
      "--provider", "gemini", "--embedding-model", "my-model", "--api-key-env", "MY_KEY"))
    assert(g.provider == "gemini" && g.embeddingModel == "my-model" && g.apiKeyEnv == "MY_KEY")
    intercept[IllegalArgumentException](
      IndexCli.parse(Array("--input", "a", "--output", "b", "--provider", "nope")))
    // missing key env fails fast with the flag name in the message
    val noKey = intercept[IllegalArgumentException] {
      IndexCli.providerFactory(g, env = _ => None)
    }
    assert(noKey.getMessage.contains("MY_KEY"))

    // end-to-end with a mock transport: echo back one dim-sized vector per
    // request entry; capture endpoint + auth header to pin the wire shape
    val dim = 8
    // the transport closure is task-serialized even on local[*]; captures
    // must route through the JVM-singleton probe, not a captured buffer
    MockTransportProbe.seen.clear()
    val mockPost = MockTransportProbe.post(dim)
    val in = Files.createTempDirectory("cligem").toFile
    Files.write(new java.io.File(in, "d1.txt").toPath, ("alpha beta " * 30).getBytes)
    val out = Files.createTempDirectory("cligemout").toString + "/idx"
    val n = IndexCli.run(spark,
      IndexCli.Args(input = in.getAbsolutePath, output = out,
        chunkSize = 100, overlap = 20, embeddingDim = dim,
        provider = "gemini", embeddingModel = "my-model"),
      post = mockPost, env = Map("GEMINI_API_KEY" -> "sekrit").get)
    assert(n > 0)
    val (ep, headers) = MockTransportProbe.seen.synchronized(MockTransportProbe.seen.head)
    assert(ep.endsWith("/v1beta/models/my-model:batchEmbedContents"))
    assert(headers.get("x-goog-api-key").contains("sekrit"))
    // the mock's vectors landed in the index
    val v = spark.read.parquet(out).selectExpr("embedding[2]").head().getFloat(0)
    assert(v == 0.25f)
  }

  test("IndexCli: --jdbc-url loads chunks into a live JDBC table (embedded Derby)") {
    val in = Files.createTempDirectory("clijdbc").toFile
    Files.write(new java.io.File(in, "d1.txt").toPath, ("epsilon zeta " * 30).getBytes)
    val out = Files.createTempDirectory("clijdbcout").toString + "/idx"
    val url = "jdbc:derby:memory:graftcli;create=true"
    val n = IndexCli.run(spark, IndexCli.parse(Array(
      "--input", in.getAbsolutePath, "--output", out,
      "--chunk-size", "100", "--overlap", "20", "--embedding-dim", "8",
      "--jdbc-url", url, "--jdbc-table", "document_chunks")))
    assert(n > 0)
    val loaded = spark.read.jdbc(url, "document_chunks", new java.util.Properties())
    assert(loaded.count() == n)
    // embeddings arrive as pgvector-style '[v1,...]' literals, castable server-side
    val lit = loaded.select("embedding").head().getString(0)
    assert(lit.startsWith("[") && lit.endsWith("]") && lit.count(_ == ',') == 7)
  }

  test("appendIndex: idempotent re-run — only new docs chunked, re-runs append zero") {
    import spark.implicits._
    val path = Files.createTempDirectory("incr").toString + "/idx"
    val cfg = graft.operators.Index.IndexConfig(
      graft.model.SplitStrategy.Fixed(100, 20), 8)
    val batch1 = Seq((1L, "s", "alpha beta " * 30), (2L, "s", "gamma delta " * 30))
      .toDF("doc_id", "source", "text")
    val n1 = graft.operators.Index.appendIndex(batch1, path, cfg)
    assert(n1 > 0)
    // overlap: docs 1,2 already indexed; only 3 is new
    val batch2 = Seq((1L, "s", "alpha beta " * 30), (2L, "s", "gamma delta " * 30),
      (3L, "s", "epsilon zeta " * 30)).toDF("doc_id", "source", "text")
    val n2 = graft.operators.Index.appendIndex(batch2, path, cfg)
    assert(n2 > 0 && n2 < n1 + n2)
    val back = spark.read.parquet(path)
    assert(back.select("doc_id").distinct().count() == 3)
    assert(back.count() == n1 + n2) // no duplicated chunks
    // exact re-run: nothing new
    assert(graft.operators.Index.appendIndex(batch2, path, cfg) == 0L)
    assert(spark.read.parquet(path).count() == n1 + n2)
    // at-least-once WITHIN a batch: duplicate doc_id rows collapse to one
    val dupBatch = Seq((9L, "s", "eta theta " * 30), (9L, "s", "eta theta " * 30))
      .toDF("doc_id", "source", "text")
    val n3 = graft.operators.Index.appendIndex(dupBatch, path, cfg)
    assert(spark.read.parquet(path).where(col("doc_id") === 9).count() == n3)
  }

  test("appendIndex target classification: empty-dir recovers, foreign dir refuses") {
    import spark.implicits._
    val cfg = graft.operators.Index.IndexConfig(
      graft.model.SplitStrategy.Fixed(100, 20), 8)
    val batch = Seq((1L, "s", "alpha beta " * 30)).toDF("doc_id", "source", "text")
    // an existing but EMPTY directory (failed first write) is an empty index
    val emptyDir = Files.createTempDirectory("emptyIdx").toString
    assert(graft.operators.Index.appendIndex(batch, emptyDir, cfg) > 0)
    // leftover commit markers alone are still "empty"
    val markerDir = Files.createTempDirectory("markerIdx")
    Files.write(markerDir.resolve("_SUCCESS"), Array.emptyByteArray)
    assert(graft.operators.Index.appendIndex(batch, markerDir.toString, cfg) > 0)
    // a directory with visible NON-parquet content is NOT an index: refuse
    // loudly instead of appending into it (previous behavior treated any
    // unreadable dir as empty and duplicated data into it)
    val foreign = Files.createTempDirectory("notAnIndex")
    Files.write(foreign.resolve("data.csv"), "a,b\n1,2\n".getBytes)
    val e = intercept[IllegalArgumentException](
      graft.operators.Index.appendIndex(batch, foreign.toString, cfg))
    assert(e.getMessage.contains("not an index"))
  }

  test("writeIndexObserved: metrics ride the write job and match the output") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", ("alpha beta " * 30).trim),
      (2L, "src1", ""),                       // empty: dropped by prepare
      (3L, "src0", "!!! ??? ###"))            // tokenless: zero vector
      .toDF("doc_id", "source", "text")
    val rows = graft.operators.Index.buildIndex(docs,
      graft.operators.Index.IndexConfig(graft.model.SplitStrategy.Fixed(100, 20), 8))
    val out = Files.createTempDirectory("obsidx").toString + "/idx"
    val (nChunks, nChars, nZero) =
      graft.operators.Index.writeIndexObserved(rows, out,
        Some(java.time.Instant.parse("2026-01-01T00:00:00Z")))
    val back = spark.read.parquet(out)
    assert(nChunks == back.count())
    assert(nChars == back.select(sum(length(col("chunk_text")))).head().getLong(0))
    assert(nZero >= 1) // doc 3's chunk embeds to the zero vector
    assert(back.schema.fieldNames.contains("created_at"))
  }

  test("keySkewStats: exact counts and ppm shares, hot key first, id tiebreak") {
    import spark.implicits._
    // 60 rows on key 1, 30 on key 2, 5 each on 3 and 4
    val df = (Seq.fill(60)(1) ++ Seq.fill(30)(2) ++ Seq.fill(5)(3) ++ Seq.fill(5)(4))
      .toDF("k")
    val top = graft.operators.Joins.keySkewStats(df, col("k"), topK = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq === Seq((1, 60L, 600000L), (2, 30L, 300000L), (3, 5L, 50000L)))
    // tie between keys 3 and 4 resolves to the smaller key
    assert(top(2)._1 === 3)
  }
}

/** JVM-singleton transport mock for the Gemini CLI spec: task closures are
  * serialized even on local[*], so executor-side calls must record into a
  * static object the test can read back — a captured buffer would be a copy.
  */
object MockTransportProbe {
  val seen = scala.collection.mutable.ArrayBuffer[(String, Map[String, String])]()
  def post(dim: Int): (String, String, Map[String, String]) => String = {
    (ep, body, headers) => {
      seen.synchronized { seen += ((ep, headers)) }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val nReq = mapper.readTree(body).get("requests").size
      val resp = mapper.createObjectNode()
      val arr = resp.putArray("embeddings")
      (0 until nReq).foreach { _ =>
        val vals = arr.addObject().putArray("values")
        (0 until dim).foreach(d => vals.add(0.125f * d))
      }
      mapper.writeValueAsString(resp)
    }
  }
}
