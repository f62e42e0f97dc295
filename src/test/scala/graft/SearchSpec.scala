package graft

import org.apache.spark.sql.functions._
import graft.operators.Search

/** Similarity search (V1–V3) + the plan assertions of SURVEY.md §5.2.6:
  * top-k correctness vs a driver-side reference, IVF expression ≡ window
  * argmax, LSH recall vs exact, and physical-plan shape checks
  * (TakeOrderedAndProject, broadcast joins, parquet pushdown/pruning).
  */
class SearchSpec extends SparkSpec {

  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    val d = a.zip(b).map(p => p._1.toDouble * p._2).sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    d / (na * nb)
  }

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val vecs: Map[Long, Seq[Float]] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  test("topK matches a driver-side brute-force reference") {
    val q = vecs(0L)
    val got = Search.topK(emb.where(col("vec_id") =!= 0), "embedding", q, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val want = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosRef(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got == want)
  }

  test("searchTextRelational ≡ dense typed searchText: same ranking, same scores") {
    // The portable sparse-cosine read path (q41's oracle-green form) must
    // rank identically to the typed HashingTfEmbedder + dense cosine path:
    // cosine is scale-invariant, so normalized-float vs integer-count
    // scoring may differ only by float rounding, never by ordering here.
    val docs = Tables.documents(spark, sf001)
    val query = "spark join query fast"
    val sparse = graft.operators.Index
      .searchTextRelational(docs, query, k = 5)
      .select("doc_id", "chunk_text", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val index = graft.operators.Index.buildIndex(docs)
      .toDF("doc_id", "filename", "chunk_index", "split_strategy", "chunk_text", "embedding")
    val dense = graft.operators.Index.searchText(index, query, k = 5, dim = 64)
      .select("doc_id", "chunk_text", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(sparse.length == 5 && dense.length == 5)
    assert(sparse.map(t => (t._1, t._2)).toSeq == dense.map(t => (t._1, t._2)).toSeq,
      "sparse and dense search must return the same chunks in the same order")
    sparse.zip(dense).foreach { case ((_, _, s), (_, _, d)) =>
      // dense path rounds its score to 3dp for display; compare at that grain
      assert(math.abs(s - d) < 2e-3, s"score drift: sparse=$s dense=$d")
    }
  }

  test("bm25Scores matches a driver-side reference implementation exactly") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "data model data search engine"),
      (2L, "model of a data lake"),
      (3L, "search search search"),
      (4L, "nothing relevant here at all whatsoever"))
    val docs = corpus.toDF("id", "text")
      .withColumn("toks", split(col("text"), " "))
    val terms = Seq("data", "model", "search")
    val got = Search.bm25Scores(docs, "id", "toks", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: plain Scala, same formula
    val tokss = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = tokss.values.map(_.size).sum / n
    val dfm = terms.map(t => t -> tokss.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): Double = terms.map { t =>
      val tf = tokss(id).count(_ == t).toDouble
      if (tf == 0 || dfm(t) == 0) 0.0
      else {
        val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
        idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * tokss(id).size / avgdl))
      }
    }.sum
    assert(got.keySet == Set(1L, 2L, 3L)) // doc 4 has no query term
    got.foreach { case (id, s) => assert(math.abs(s - score(id)) < 1e-9, s"doc $id") }
    // top-k ranks by score desc with id tiebreak
    val top = Search.bm25TopK(docs, "id", "toks", terms, k = 2)
      .collect().map(_.getLong(0)).toSeq
    val wantTop = Seq(1L, 2L, 3L).sortBy(id => (-score(id), id)).take(2)
    assert(top == wantTop)
  }

  test("reciprocalRankFusion: overlap outranks single-list hits; exact arithmetic") {
    import spark.implicits._
    // list A ranks: x=1, y=2, z=3 ; list B ranks: y=1, w=2
    val a = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("id", "rank")
    val b = Seq(("y", 1L), ("w", 2L)).toDF("id", "rank")
    val out = Search.reciprocalRankFusion(a, b, "id")
      .collect().map(r => (r.getString(0), r.getDouble(3),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    // y is in both lists → 1/62 + 1/61 beats every single-list score
    assert(out.head._1 == "y")
    assert(math.abs(out.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(out.head._3.contains(2L) && out.head._4.contains(1L))
    // then x (1/61), w (1/62), z (1/63); absent ranks are null
    assert(out.map(_._1).toSeq == Seq("y", "x", "w", "z"))
    assert(out(1)._4.isEmpty && out(2)._3.isEmpty)
  }

  test("topK single-query plan uses TakeOrderedAndProject (partial top-k, no global sort)") {
    val plan = Search.topK(emb, "embedding", vecs(0L), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("topKPerQuery returns k rows per query, ranked") {
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val out = Search.topKPerQuery(emb, "embedding", queries, "qid", "qv", k = 3)
    val counts = out.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 3L) && counts.size == 3)
    // rank 1 of each query is the vector itself (cosine with itself = 1)
    val self = out.where(col("rank") === 1).select("query_id", "vec_id").collect()
    assert(self.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("ivfAssign (argmax expression) ≡ window-argmax assignment") {
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val byExpr = Search.ivfAssign(emb, "embedding", centroids)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byRef = vecs.map { case (id, v) =>
      id -> centroids.map { case (cid, cv) => (cosRef(v, cv.toSeq), cid) }
        .maxBy { case (s, cid) => (s, -cid) }._2
    }
    assert(byExpr == byRef)
  }

  test("ivfTopK prunes to probed clusters and finds neighbors within them") {
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val assigned = Search.ivfAssign(emb, "embedding", centroids)
    val out = Search.ivfTopK(assigned.where(col("vec_id") =!= 0), "embedding",
      centroids, vecs(0L), k = 5, nProbe = 2)
    val rows = out.select("vec_id", "cluster_id").collect()
    assert(rows.length == 5)
    val probed = rows.map(_.getInt(1)).distinct.toSet
    assert(probed.size <= 2)
  }

  test("quantized IVF index: byte storage, coarse+rescore matches exact search") {
    val dir = java.nio.file.Files.createTempDirectory("ivfq").toString
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    Search.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, dir)
    // index stores int8 codes (byte array) + one float scale — 4× smaller
    val stored = spark.read.parquet(s"$dir/vectors")
    assert(stored.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, true))
    assert(stored.schema("scale").dataType == org.apache.spark.sql.types.FloatType)
    // coarse code-space ranking + full-precision rescore: with generous
    // probes/rescore the result must EQUAL the exact brute-force top-k
    val q = vecs(0L)
    val base = emb.where(col("vec_id") =!= 0)
    val got = Search.ivfTopKFromIndexQuantized(spark, dir, base,
        "vec_id", "embedding", q, k = 5, nProbe = 8, rescore = 100)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val want = Search.topK(base, "embedding", q, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // realistic setting: recall@5 ≥ 0.6 with 2 probes and small rescore
    val approx = Search.ivfTopKFromIndexQuantized(spark, dir, base,
        "vec_id", "embedding", q, k = 5, nProbe = 2, rescore = 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx.intersect(want.toSet).size >= 3)
  }

  test("persisted IVF index: pruned read path ≡ in-memory ivfTopK, PartitionFilters in scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    Search.writeIvfIndex(emb, "embedding", centroids, dir)

    // sidecar round-trips exactly
    val loaded = Search.readIvfCentroids(spark, dir)
    assert(loaded.map(_._1) == centroids.map(_._1))
    assert(loaded.zip(centroids).forall { case ((_, a), (_, b)) => a.sameElements(b) })

    val q = vecs(0L)
    val fromIndex = Search.ivfTopKFromIndex(spark, dir, "embedding", q, k = 5, nProbe = 2)
    val inMemory = Search.ivfTopK(
      Search.ivfAssign(emb, "embedding", centroids), "embedding", centroids, q, 5, nProbe = 2)
    assert(fromIndex.select("vec_id").collect().map(_.getLong(0)).toSeq ==
      inMemory.select("vec_id").collect().map(_.getLong(0)).toSeq)

    // the scan prunes partitions: cluster_id IN (...) lands in PartitionFilters,
    // and only the probed clusters' directories are read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"), plan.take(1500))
    // and the FileIndex, given those partition filters, selects exactly the
    // probed clusters' directories (the actual pruning, not just the intent)
    val probed = Search.probeClusters(loaded, q, 2)
    val scan = fromIndex.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.isDefined, plan.take(1500))
    val selected = scan.get.relation.location.listFiles(
      scan.get.partitionFilters, scan.get.dataFilters)
    assert(selected.size == probed.size,
      s"expected ${probed.size} pruned partitions, got ${selected.size}")
  }

  test("appendIvfIndex: build(A)+append(B) ≡ build(A∪B); replay no-op; guards") {
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val a = emb.where(col("vec_id") < 250)
    val b = emb.where(col("vec_id") >= 250)
    val incDir = java.nio.file.Files.createTempDirectory("ivfinc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivffull").toString
    Search.writeIvfIndex(a, "embedding", centroids, incDir)
    val appended = Search.appendIvfIndex(b, "vec_id", "embedding", incDir)
    assert(appended === b.count())
    Search.writeIvfIndex(emb, "embedding", centroids, fullDir)

    // identical contents (same assignment: centroids are frozen)
    val inc = spark.read.parquet(s"$incDir/vectors")
      .select("vec_id", "cluster_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val full = spark.read.parquet(s"$fullDir/vectors")
      .select("vec_id", "cluster_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(inc === full)
    // identical ANN answers through the pruned read path
    val q = vecs(3L)
    assert(Search.ivfTopKFromIndex(spark, incDir, "embedding", q, 5, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq ===
      Search.ivfTopKFromIndex(spark, fullDir, "embedding", q, 5, 2)
        .select("vec_id").collect().map(_.getLong(0)).toSeq)

    // replaying the same batch appends nothing (id anti-join)
    assert(Search.appendIvfIndex(b, "vec_id", "embedding", incDir) === 0L)
    assert(spark.read.parquet(s"$incDir/vectors").count() === emb.count())

    // drift stats: every cluster occupied, mean similarity in [-1, 1]
    val drift = Search.ivfDriftStats(spark, incDir, "embedding").collect()
    assert(drift.length === 8)
    assert(drift.forall(r => r.getLong(1) > 0))
    assert(drift.forall(r => math.abs(r.getDouble(2)) <= 1.0))

    // guard: appending into a missing index fails fast
    intercept[IllegalArgumentException] {
      Search.appendIvfIndex(b, "vec_id", "embedding",
        java.nio.file.Files.createTempDirectory("ivfnone").toString)
    }
  }

  test("searchTextIvf: end-to-end flagship ANN read path over a persisted index") {
    import graft.operators.Index
    val chunkIdx = Index.indexFrame(
      Index.buildIndex(Tables.documents(spark, sf001)),
      Some(java.time.Instant.parse("2026-01-01T00:00:00Z")))
    val dir = java.nio.file.Files.createTempDirectory("ivftext").toString
    Index.buildIvfIndex(chunkIdx, dir, nClusters = 8)
    val got = Index.searchTextIvf(spark, dir, "fast spark join query", k = 3, dim = 64)
      .collect()
    assert(got.length == 3)
    // ANN hit should agree with exact search at rank 1 on this small corpus
    // with 2 probes of 8 clusters (holds for the fixture; recall specs cover
    // the general claim)
    val exact = Index.searchText(chunkIdx, "fast spark join query", k = 3, dim = 64)
      .collect()
    assert(got.head.getLong(0) == exact.head.getLong(0))
  }

  test("LSH approx pairs reach ≥0.6 recall vs exact pairs at L2<1.18") {
    val exact = {
      val ids = vecs.keys.toSeq.sorted
      (for {
        i <- ids; j <- ids if i < j
        d = math.sqrt(vecs(i).zip(vecs(j)).map(p => math.pow(p._1 - p._2, 2)).sum)
        if d < 1.18
      } yield (i, j)).toSet
    }
    val approx = new Search.LshIndex(bucketLength = 1.0, numTables = 4, seed = 42L)
      .approxPairs(emb, "vec_id", "embedding", maxL2Dist = 1.18)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall exact=${exact.size} approx=${approx.size}")
    assert(approx.subsetOf(exact.union(exact))) // no pair beyond threshold (join filters)
  }

  test("approxPairs: explicit narrow candidate join ≡ MLlib approxSimilarityJoin, distances bit-equal") {
    // r19 optimization round: approxPairs no longer calls
    // approxSimilarityJoin (full-row explode join + non-codegen UDF
    // distance) — this pins the rewrite to MLlib's exact semantics on the
    // same fitted model: identical pair SET and bit-identical l2_dist
    // (same strict < threshold, same double accumulation as
    // Vectors.sqdist + sqrt).
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val got = new Search.LshIndex(bucketLength = 0.5, numTables = 3, seed = 42L)
      .approxPairs(emb, "vec_id", "embedding", maxL2Dist = 1.18)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val prepared = emb.withColumn("_features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(0.5).setNumHashTables(3).setSeed(42L)
      .setInputCol("_features").setOutputCol("_hashes").fit(prepared)
    val want = model.approxSimilarityJoin(prepared, prepared, 1.18, "l2_dist")
      .select(col("datasetA.vec_id").as("id1"),
        col("datasetB.vec_id").as("id2"), col("l2_dist"))
      .where(col("id1") < col("id2"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    assert(got.nonEmpty)
    got.foreach { case (k, d) =>
      assert(java.lang.Double.compare(d, want(k)) == 0, s"l2_dist drift at $k") }
  }

  test("recall gate: frozen BASELINE.md floors hold (IVF by nProbe, quantized rescore)") {
    // Floors are the round-5 RecallBench numbers at sf0.001 minus margin
    // (BASELINE.md §ANN-recall: np1 0.368, np2 0.460, np4 0.602, qivf ==
    // its IVF tier). A Search.scala change that silently trades recall for
    // speed fails here instead of shipping.
    import graft.operators.Search
    val k = 10
    val queries = emb.orderBy("vec_id").limit(25)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val exact: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
      qid -> vecs.toSeq
        .map { case (id, v) => (id, cosRef(v, qv.map(_.toFloat))) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }.toMap
    val centroids = Search.kmeansCentroids(emb, "embedding", 16, seed = 42L)
    val assigned = Search.ivfAssign(emb, "embedding", centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    try {
      def recall(nProbe: Int): Double = RecallBench.ivfRecall(
        spark, assigned, centroids, queries, exact, k, nProbe)
      val (r1, r2, r4) = (recall(1), recall(2), recall(4))
      assert(r1 >= 0.28, s"IVF nProbe=1 recall regressed: $r1 < 0.28 (frozen 0.368)")
      assert(r2 >= 0.38, s"IVF nProbe=2 recall regressed: $r2 < 0.38 (frozen 0.460)")
      assert(r4 >= 0.52, s"IVF nProbe=4 recall regressed: $r4 < 0.52 (frozen 0.602)")
      assert(r1 <= r2 && r2 <= r4, "recall must be monotone in nProbe")
      // quantized tier must match its IVF tier after full-precision rescore
      val qPath = java.nio.file.Files.createTempDirectory("gate-qivf").toString
      Search.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, qPath)
      val qHits = queries.map { case (qid, qv) =>
        val got = Search.ivfTopKFromIndexQuantized(spark, qPath, emb, "vec_id",
            "embedding", qv, k, nProbe = 2, rescore = 50)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact(qid).count(got.contains).toDouble / exact(qid).size
      }
      val qr = qHits.sum / qHits.size
      assert(qr >= r2 - 0.02,
        s"quantized IVF (rescore=50) lost recall vs its IVF tier: $qr < $r2 - 0.02")
      // binary-Hamming and matryoshka funnels (frozen sf0.001 RecallBench:
      // binary factor16 0.910, matryoshka prefix32 0.706 — floors minus
      // margin; both rescore in full precision so a drop means the
      // shortlist itself regressed)
      def funnel(search: Seq[Float] => org.apache.spark.sql.DataFrame): Double = {
        val hs = queries.map { case (qid, qv) =>
          val got = search(qv).select("vec_id").collect().map(_.getLong(0)).toSet
          exact(qid).count(got.contains).toDouble / exact(qid).size
        }
        hs.sum / hs.size
      }
      val br = funnel(qv =>
        Search.binaryTopK(emb, "vec_id", "embedding", qv, 64, k, 16))
      assert(br >= 0.85, s"binary funnel (factor=16) recall regressed: $br (frozen 0.910)")
      val mr = funnel(qv =>
        Search.matryoshkaTopK(emb, "vec_id", "embedding", qv, 32, k, 4))
      assert(mr >= 0.64, s"matryoshka funnel (prefix=32) recall regressed: $mr (frozen 0.706)")
    } finally assigned.unpersist()
  }

  /** Local replica of VectorFunctions.i8Codes (floor(x/s + 0.5), s = max|v|/127). */
  private def i8Ref(v: Seq[Float]): Array[Double] = {
    val maxAbs = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
    val s = maxAbs / 127.0
    if (s == 0.0) v.map(_ => 0.0).toArray
    else v.map(x => math.floor(x / s + 0.5)).toArray
  }

  test("PQ: encode matches a driver-side argmin; ADC ranking is the table-sum identity") {
    val cb = Search.pqSampledCodebooks(emb, "vec_id", "embedding", 64, 8, 16)
    assert(cb.subdim == 8 && cb.centers.forall(_.forall(_.length == 8)))
    val enc = Search.pqEncode(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(enc.size == vecs.size)
    for ((id, v) <- vecs) {
      val c = i8Ref(v)
      val want = (0 until cb.m).map { s =>
        val sub = c.slice(s * cb.subdim, (s + 1) * cb.subdim)
        cb.centers(s).zipWithIndex.map { case (ct, j) =>
          (sub.zip(ct).map { case (x, y) => (x - y) * (x - y) }.sum, j)
        }.min._2
      }
      assert(enc(id) == want, s"PQ encode mismatch for vec $id")
    }
    // ADC score of a row must equal Σ_s IP(q_s, center(s)(code_s)) computed
    // locally — the asymmetric-distance identity the scan-side table
    // lookups implement
    val q = vecs(0L)
    val qc = Search.pqQueryCodes(q)
    val tables = Search.pqAdcTables(cb, qc)
    val localAdc: Map[Long, Double] = enc.map { case (id, codes) =>
      id -> codes.zipWithIndex.map { case (j, s) => tables(s)(j) }.sum
    }
    val got = Search.pqTopK(
        Search.pqEncode(emb.where(col("vec_id") =!= 0), "vec_id", "embedding", cb),
        emb.where(col("vec_id") =!= 0), "vec_id", "embedding", cb, q,
        k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val wantCand = localAdc.toSeq.filter(_._1 != 0L)
      .sortBy { case (id, a) => (-a, id) }.take(50).map(_._1).toSet
    val want = vecs.toSeq.filter(p => wantCand.contains(p._1))
      .map { case (id, v) => (id, cosRef(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(got == want, "PQ ADC + rescore must equal the local table-sum pipeline")
  }

  test("PQ: persisted index round-trips, appends are idempotent, trained floors hold") {
    import spark.implicits._
    val cb = Search.pqTrainCodebooks(emb, "embedding", 64, 8, 16, seed = 42L)
    val path = java.nio.file.Files.createTempDirectory("gate-pq").toString
    Search.pqWriteIndex(emb, "vec_id", "embedding", cb, path)
    // codes store: m BYTES per vector (the 32× tier) and the sidecar
    // reconstructs the codebooks bit-identically
    val stored = spark.read.parquet(s"$path/codes")
    assert(stored.schema("pq_codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    val cb2 = Search.readPqCodebooks(spark, path)
    assert(cb2.dim == 64 && cb2.m == 8 && cb2.ksub == 16)
    assert(cb2.centers.flatten.map(_.toSeq) == cb.centers.flatten.map(_.toSeq))
    val q = vecs(1L)
    val direct = Search.pqTopK(Search.pqEncode(emb, "vec_id", "embedding", cb),
        emb, "vec_id", "embedding", cb, q, k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val fromIndex = Search.pqTopKFromIndex(spark, path, emb, "vec_id",
        "embedding", q, k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(direct == fromIndex, "persisted PQ index must reproduce the direct path")
    // replayed batch appends nothing; a fresh id appends exactly once
    assert(Search.appendPqIndex(emb.limit(20), "vec_id", "embedding", path) == 0L)
    val before = spark.read.parquet(s"$path/codes").count()
    val novel = emb.limit(1).select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    assert(Search.appendPqIndex(novel, "vec_id", "embedding", path) == 1L)
    assert(Search.appendPqIndex(novel, "vec_id", "embedding", path) == 0L)
    assert(spark.read.parquet(s"$path/codes").count() == before + 1)
    // recall floors (sf0.001 RecallBench, 50-query run: trained rescore50
    // 0.690, sampled rescore50 0.576 — floors minus margin for the
    // 25-query gate set) + the staircase orderings that define the tier:
    // more rescore never hurts, trained codebooks beat sampled ones
    val k = 10
    val queries = emb.orderBy("vec_id").limit(25)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val exact: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
      qid -> vecs.toSeq
        .map { case (id, v) => (id, cosRef(v, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }.toMap
    val cbS = Search.pqSampledCodebooks(emb, "vec_id", "embedding", 64, 8, 16)
    def recall(cb: Search.PqCodebooks, rescore: Int): Double = {
      val enc = Search.pqEncode(emb, "vec_id", "embedding", cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      enc.count()
      try {
        val hs = queries.map { case (qid, qv) =>
          val got = Search.pqTopK(enc, emb, "vec_id", "embedding", cb, qv, k, rescore)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          exact(qid).count(got.contains).toDouble / exact(qid).size
        }
        hs.sum / hs.size
      } finally { enc.unpersist(); () }
    }
    val (t50, t100) = (recall(cb, 50), recall(cb, 100))
    val s50 = recall(cbS, 50)
    assert(t50 >= 0.58, s"trained PQ rescore=50 recall regressed: $t50 (frozen 0.690)")
    assert(s50 >= 0.45, s"sampled PQ rescore=50 recall regressed: $s50 (frozen 0.576)")
    assert(t100 >= t50 - 0.02, s"PQ recall must not fall as rescore grows: $t100 < $t50")
    assert(t50 >= s50 - 0.02, s"trained codebooks must not lose to sampled: $t50 < $s50")
  }

  test("IVF-PQ composed index: pruned read ≡ in-memory composition; full probe ≡ flat PQ; appends idempotent") {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val cb = Search.pqTrainCodebooks(emb, "embedding", 64, 8, 16, seed = 42L)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Search.writeIvfPqIndex(emb, "vec_id", "embedding", centroids, cb, path)
    // byte codes partitioned by cluster; BOTH parents' sidecars round-trip
    // through the parents' own readers
    val stored = spark.read.parquet(s"$path/codes")
    assert(stored.schema("pq_codes").dataType == ArrayType(ByteType))
    assert(stored.columns.toSet == Set("vec_id", "pq_codes", "cluster_id"))
    assert(Search.readIvfCentroids(spark, path).map(_._1) == (0 until 8))
    val cb2 = Search.readPqCodebooks(spark, path)
    assert(cb2.centers.flatten.map(_.toSeq) == cb.centers.flatten.map(_.toSeq))
    val q = vecs(1L)
    // the pruned read path reproduces the in-memory composition exactly:
    // assign → keep the probed clusters → flat PQ funnel over that subset
    val fromIndex = Search.ivfPqTopKFromIndex(spark, path, emb, "vec_id",
      "embedding", q, k = 10, nProbe = 3, rescore = 50)
    val got = fromIndex.collect().map(_.getAs[Long]("vec_id")).toSeq
    val probed = Search.probeClusters(centroids, q, 3)
    val subset = Search.ivfAssign(emb, "embedding", centroids)
      .where(col("cluster_id").isin(probed: _*))
    val ref = Search.pqTopK(Search.pqEncode(subset, "vec_id", "embedding", cb),
        emb, "vec_id", "embedding", cb, q, k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == ref, s"pruned read $got != in-memory composition $ref")
    // probing EVERY cluster makes the composed tier the flat PQ tier
    // (identical candidate set ⇒ identical answer) — the recall
    // convergence the RecallBench staircase freezes
    val full = Search.ivfPqTopKFromIndex(spark, path, emb, "vec_id",
        "embedding", q, k = 10, nProbe = 8, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val flat = Search.pqTopK(Search.pqEncode(emb, "vec_id", "embedding", cb),
        emb, "vec_id", "embedding", cb, q, k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == flat, "full-probe IVF-PQ must equal flat PQ")
    // the codes scan is partition-pruned: PartitionFilters carry
    // cluster_id and the FileIndex selects EXACTLY the probed
    // directories. The scan lives on the broadcast CANDIDATE side, whose
    // subtree nests its own adaptive plan — walk through AQE wrappers
    // (collectLeaves treats them as leaves).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(fromIndex.queryExecution.executedPlan)
      .find(_.relation.partitionSchema.fieldNames.contains("cluster_id"))
    assert(scan.isDefined, fromIndex.queryExecution.executedPlan.toString.take(1500))
    assert(scan.get.partitionFilters.nonEmpty, "cluster_id filter must be a PartitionFilter")
    val selected = scan.get.relation.location.listFiles(
      scan.get.partitionFilters, scan.get.dataFilters)
    assert(selected.size == probed.size,
      s"expected ${probed.size} pruned partitions, got ${selected.size}")
    // maintenance contract: build(A)+append(B) ≡ build(A∪B) (both frozen
    // models), replay no-op, missing index refuses
    val a = emb.where(col("vec_id") < 250)
    val b = emb.where(col("vec_id") >= 250)
    val incDir = java.nio.file.Files.createTempDirectory("ivfpq-inc").toString
    Search.writeIvfPqIndex(a, "vec_id", "embedding", centroids, cb, incDir)
    assert(Search.appendIvfPqIndex(b, "vec_id", "embedding", incDir) === b.count())
    def contents(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Int]("cluster_id"), r.getSeq[Byte](r.fieldIndex("pq_codes")))).toSet
    assert(contents(incDir) === contents(path))
    assert(Search.ivfPqTopKFromIndex(spark, incDir, emb, "vec_id",
        "embedding", q, 10, 3, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq === got)
    assert(Search.appendIvfPqIndex(b, "vec_id", "embedding", incDir) === 0L)
    intercept[IllegalArgumentException] {
      Search.appendIvfPqIndex(b, "vec_id", "embedding",
        java.nio.file.Files.createTempDirectory("ivfpq-none").toString)
    }
  }

  test("PQ-family delete halves: remove ≡ fresh build of survivors; sidecars frozen; guards") {
    // completes the CRUD story for the PQ rungs (the removeFromIvfIndex /
    // removeFromTextIndex contract): new-directory job-commit rewrite,
    // frozen models copied verbatim, answers ≡ a fresh build of the
    // surviving corpus
    import graft.operators.Search
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val cb = Search.pqTrainCodebooks(emb, "embedding", 64, 8, 16, seed = 42L)
    val keep = emb.where(col("vec_id") % 5 =!= 0)
    val dropIds = emb.where(col("vec_id") % 5 === 0).select("vec_id")
    val q = vecs(1L)
    def dir(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    // flat PQ
    val pqFull = dir("rm-pq-full"); val pqDst = dir("rm-pq-dst"); val pqFresh = dir("rm-pq-fresh")
    Search.pqWriteIndex(emb, "vec_id", "embedding", cb, pqFull)
    assert(Search.removeFromPqIndex(spark, pqFull, pqDst, dropIds, "vec_id") === keep.count())
    Search.pqWriteIndex(keep, "vec_id", "embedding", cb, pqFresh)
    assert(ids(Search.pqTopKFromIndex(spark, pqDst, keep, "vec_id", "embedding", q, 10, 50)) ===
      ids(Search.pqTopKFromIndex(spark, pqFresh, keep, "vec_id", "embedding", q, 10, 50)))
    assert(Search.readPqCodebooks(spark, pqDst).centers.flatten.map(_.toSeq) ==
      cb.centers.flatten.map(_.toSeq), "codebook sidecar must copy verbatim")
    // composed IVF-PQ
    val ipFull = dir("rm-ip-full"); val ipDst = dir("rm-ip-dst"); val ipFresh = dir("rm-ip-fresh")
    Search.writeIvfPqIndex(emb, "vec_id", "embedding", centroids, cb, ipFull)
    assert(Search.removeFromIvfPqIndex(spark, ipFull, ipDst, dropIds, "vec_id") === keep.count())
    Search.writeIvfPqIndex(keep, "vec_id", "embedding", centroids, cb, ipFresh)
    assert(ids(Search.ivfPqTopKFromIndex(spark, ipDst, keep, "vec_id", "embedding", q, 10, 3, 50)) ===
      ids(Search.ivfPqTopKFromIndex(spark, ipFresh, keep, "vec_id", "embedding", q, 10, 3, 50)))
    assert(Search.readIvfCentroids(spark, ipDst).map(_._1) == (0 until 8),
      "centroid sidecar must copy verbatim")
    // a post-remove append still honors the frozen models (full CRUD)
    assert(Search.appendIvfPqIndex(
      emb.where(col("vec_id") % 5 === 0), "vec_id", "embedding", ipDst) ===
      dropIds.count())
    // OPQ (rotation sidecar rides along)
    val model = Search.opqTrainCodebooks(emb, "embedding", 64, 8, 16,
      seed = 42L, opqIters = 2)
    val opFull = dir("rm-op-full"); val opDst = dir("rm-op-dst"); val opFresh = dir("rm-op-fresh")
    Search.opqWriteIndex(emb, "vec_id", "embedding", model, opFull)
    assert(Search.removeFromOpqIndex(spark, opFull, opDst, dropIds, "vec_id") === keep.count())
    Search.opqWriteIndex(keep, "vec_id", "embedding", model, opFresh)
    assert(ids(Search.opqTopKFromIndex(spark, opDst, keep, "vec_id", "embedding", q, 10, 50)) ===
      ids(Search.opqTopKFromIndex(spark, opFresh, keep, "vec_id", "embedding", q, 10, 50)))
    assert(Search.readOpqModel(spark, opDst).rotation.map(_.toSeq) ==
      model.rotation.map(_.toSeq), "rotation sidecar must copy verbatim")
    // same-directory rewrite refuses
    intercept[IllegalArgumentException](
      Search.removeFromPqIndex(spark, pqFull, pqFull, dropIds, "vec_id"))
    intercept[IllegalArgumentException](
      Search.removeFromIvfPqIndex(spark, ipFull, ipFull, dropIds, "vec_id"))
  }

  test("fused updates across the index families ≡ fresh build of v2; sidecars frozen") {
    // the one-write UPDATE composition (retire ∪ refresh-ids dropped,
    // refresh re-encoded under the FROZEN models, survivors + fresh in a
    // single store rewrite) must be indistinguishable from rebuilding on
    // the updated corpus — for every compressed tier
    import graft.operators.Search
    import spark.implicits._
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val cb = Search.pqTrainCodebooks(emb, "embedding", 64, 8, 16, seed = 42L)
    val e2 = emb.select(col("vec_id"), col("embedding"))
    val retire = e2.where(col("vec_id") % 5 === 0).select("vec_id")
    val changed = e2.where(col("vec_id") % 5 =!= 0 && col("vec_id") % 7 === 1)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val added = e2.where(col("vec_id") % 11 === 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val refresh = changed.unionByName(added)
    val v2 = e2.where(col("vec_id") % 5 =!= 0 && col("vec_id") % 7 =!= 1)
      .unionByName(changed).unionByName(added)
    val q = vecs(1L)
    def dir(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    // flat PQ
    val pqFull = dir("up-pq-full"); val pqUpd = dir("up-pq-upd"); val pqFresh = dir("up-pq-fresh")
    Search.pqWriteIndex(emb, "vec_id", "embedding", cb, pqFull)
    assert(Search.updatePqIndex(spark, pqFull, pqUpd, retire, refresh,
      "vec_id", "embedding") === v2.count())
    Search.pqWriteIndex(v2, "vec_id", "embedding", cb, pqFresh)
    assert(ids(Search.pqTopKFromIndex(spark, pqUpd, v2, "vec_id", "embedding", q, 10, 50)) ===
      ids(Search.pqTopKFromIndex(spark, pqFresh, v2, "vec_id", "embedding", q, 10, 50)))
    assert(Search.readPqCodebooks(spark, pqUpd).centers.flatten.map(_.toSeq) ==
      cb.centers.flatten.map(_.toSeq), "codebook sidecar must copy verbatim")
    // the code stores are row-identical, not just query-equal
    def codeSet(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Byte](r.fieldIndex("pq_codes")).toSeq)).toSet
    assert(codeSet(pqUpd) === codeSet(pqFresh))
    // composed IVF-PQ
    val ipFull = dir("up-ip-full"); val ipUpd = dir("up-ip-upd"); val ipFresh = dir("up-ip-fresh")
    Search.writeIvfPqIndex(emb, "vec_id", "embedding", centroids, cb, ipFull)
    assert(Search.updateIvfPqIndex(spark, ipFull, ipUpd, retire, refresh,
      "vec_id", "embedding") === v2.count())
    Search.writeIvfPqIndex(v2, "vec_id", "embedding", centroids, cb, ipFresh)
    assert(ids(Search.ivfPqTopKFromIndex(spark, ipUpd, v2, "vec_id", "embedding", q, 10, 3, 50)) ===
      ids(Search.ivfPqTopKFromIndex(spark, ipFresh, v2, "vec_id", "embedding", q, 10, 3, 50)))
    def ipSet(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Int]("cluster_id"), r.getSeq[Byte](r.fieldIndex("pq_codes")).toSeq)).toSet
    assert(ipSet(ipUpd) === ipSet(ipFresh))
    // OPQ (rotation rides along; refresh rotates under the frozen model)
    val model = Search.opqTrainCodebooks(emb, "embedding", 64, 8, 16,
      seed = 42L, opqIters = 2)
    val opFull = dir("up-op-full"); val opUpd = dir("up-op-upd"); val opFresh = dir("up-op-fresh")
    Search.opqWriteIndex(emb, "vec_id", "embedding", model, opFull)
    assert(Search.updateOpqIndex(spark, opFull, opUpd, retire, refresh,
      "vec_id", "embedding") === v2.count())
    Search.opqWriteIndex(v2, "vec_id", "embedding", model, opFresh)
    assert(ids(Search.opqTopKFromIndex(spark, opUpd, v2, "vec_id", "embedding", q, 10, 50)) ===
      ids(Search.opqTopKFromIndex(spark, opFresh, v2, "vec_id", "embedding", q, 10, 50)))
    assert(Search.readOpqModel(spark, opUpd).rotation.map(_.toSeq) ==
      model.rotation.map(_.toSeq), "rotation sidecar must copy verbatim")
    assert(codeSet(opUpd) === codeSet(opFresh))
    // seeded LSH (bands + codes + meta; pair sets identical)
    val slFull = dir("up-sl-full") + "/ix"; val slUpd = dir("up-sl-upd") + "/ix"
    val slFresh = dir("up-sl-fresh") + "/ix"
    Search.writeSeededLshIndex(emb, "vec_id", "embedding", 64, slFull,
      numTables = 4, bitsPerTable = 8)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Search.updateSeededLshIndex(spark, slFull, slUpd, retire, refresh,
      "vec_id", "embedding") === v2.count())
    Search.writeSeededLshIndex(v2, "vec_id", "embedding", 64, slFresh,
      numTables = 4, bitsPerTable = 8)
    assert(pairSet(Search.seededLshPairsFromIndex(spark, slUpd, 0.3)) ===
      pairSet(Search.seededLshPairsFromIndex(spark, slFresh, 0.3)))
    // guards: same-directory refusal; LSH conflicting-id refusal
    intercept[IllegalArgumentException](
      Search.updatePqIndex(spark, pqFull, pqFull, retire, refresh, "vec_id", "embedding"))
    intercept[IllegalArgumentException](
      Search.updateIvfPqIndex(spark, ipFull, ipFull, retire, refresh, "vec_id", "embedding"))
    val conflicted = refresh.unionByName(
      changed.limit(1).select(col("vec_id"), reverse(col("embedding")).as("embedding")))
    intercept[IllegalArgumentException](
      Search.updateSeededLshIndex(spark, slFull, dir("up-sl-x") + "/ix",
        retire, conflicted, "vec_id", "embedding"))
  }

  test("OPQ: rotation orthogonal, persisted round-trip, appends idempotent, beats-or-ties plain PQ") {
    import graft.operators.Search
    val model = Search.opqTrainCodebooks(emb, "embedding", 64, 8, 16,
      seed = 42L, opqIters = 3)
    // the Procrustes solution must stay orthogonal: R·Rᵀ ≈ I
    val d = model.rotation.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t =>
        model.rotation(i)(t).toDouble * model.rotation(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-3,
        s"R·Rᵀ[$i][$j] = $dot — rotation not orthogonal")
    }
    // persisted index reproduces the direct path; appends are idempotent
    val path = java.nio.file.Files.createTempDirectory("gate-opq").toString
    Search.opqWriteIndex(emb, "vec_id", "embedding", model, path)
    val model2 = Search.readOpqModel(spark, path)
    assert(model2.rotation.map(_.toSeq) == model.rotation.map(_.toSeq))
    assert(model2.cb.centers.flatten.map(_.toSeq) == model.cb.centers.flatten.map(_.toSeq))
    val q = vecs(1L)
    val direct = Search.opqTopK(Search.opqEncode(emb, "vec_id", "embedding", model),
        emb, "vec_id", "embedding", model, q, k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val fromIndex = Search.opqTopKFromIndex(spark, path, emb, "vec_id",
        "embedding", q, k = 10, rescore = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(direct == fromIndex, "persisted OPQ index must reproduce the direct path")
    assert(Search.appendOpqIndex(emb.limit(5), "vec_id", "embedding", path) == 0L)
    val novel = emb.limit(1).select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    assert(Search.appendOpqIndex(novel, "vec_id", "embedding", path) == 1L)
    assert(Search.appendOpqIndex(novel, "vec_id", "embedding", path) == 0L)
    // an un-written path refuses
    intercept[IllegalArgumentException](Search.appendOpqIndex(novel, "vec_id",
      "embedding", java.nio.file.Files.createTempDirectory("noopq").toString))
    // staircase invariant: the learned rotation must not LOSE to the
    // identity (plain trained PQ) at the same budget — OPQ's whole claim
    // (sf0.01 RecallBench r11: opq .572/.780/.900 vs trained
    // .484/.712/.874; the small margin absorbs tiny-fixture kmeans noise)
    val k = 10
    val queries = emb.orderBy("vec_id").limit(25)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val exact: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
      qid -> vecs.toSeq
        .map { case (id, v) => (id, cosRef(v, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }.toMap
    def recallOf(search: Seq[Float] => org.apache.spark.sql.DataFrame): Double = {
      val hs = queries.map { case (qid, qv) =>
        val got = search(qv).select("vec_id").collect().map(_.getLong(0)).toSet
        exact(qid).count(got.contains).toDouble / exact(qid).size
      }
      hs.sum / hs.size
    }
    val cbT = Search.pqTrainCodebooks(emb, "embedding", 64, 8, 16, seed = 42L)
    val encT = Search.pqEncode(emb, "vec_id", "embedding", cbT)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val encO = Search.opqEncode(emb, "vec_id", "embedding", model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rT = recallOf(qv => Search.pqTopK(encT, emb, "vec_id", "embedding", cbT, qv, k, 50))
      val rO = recallOf(qv => Search.opqTopK(encO, emb, "vec_id", "embedding", model, qv, k, 50))
      assert(rO >= rT - 0.05, s"OPQ rescore=50 recall $rO lost to plain trained PQ $rT")
    } finally { encT.unpersist(); encO.unpersist(); () }
  }

  test("OPQ at reference dimensionality (dim=768): rotation trains, staircase holds shape") {
    // VERDICT r11 item 7: the OPQ/PQ floors were frozen at dim 64, but the
    // reference's default embedding dimension is 768
    // (index_documents.py:263), where the d×d Procrustes treeAggregate and
    // the driver SVD scale 144×. Synthetic corpus (deterministic
    // driver-side generation — 40 anchors × 30 noisy copies), m=8 →
    // subdim 96, ksub=16, 2 alternations: the rotation must still be
    // orthogonal and the staircase must hold shape (OPQ ≥ trained PQ at
    // equal rescore; more rescore never hurts). Measured numbers frozen
    // in BASELINE §ANN-recall (dim-768 row).
    import spark.implicits._
    import graft.operators.Search
    val dim = 768
    val rnd = new java.util.Random(7L)
    // 8 anchors × 150 noisy copies: the true top-10 are fine WITHIN-cluster
    // distinctions among 150 candidates — more cluster members than the
    // rescore budget, so the ADC ranking itself is stressed (40×30 with
    // any noise level measured recall 1.0 on every tier: whole clusters
    // fit inside rescore=50 and the exact rescore hid all quantization
    // error). The anchor structure keeps the covariance anisotropic —
    // the thing OPQ's rotation exists to exploit.
    val anchors = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows: Seq[(Long, Array[Float])] = (0 until 1200).map { i =>
      val a = anchors(i % 8)
      (i.toLong, Array.tabulate(dim)(j => a(j) + 1.2f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    try {
      val model = Search.opqTrainCodebooks(df, "embedding", dim, 8, 16,
        seed = 42L, opqIters = 2)
      assert(model.rotation.length == dim && model.cb.dim == dim)
      // orthogonality, sampled: every 16th diagonal entry ≈ 1 and a
      // 48-strided grid of off-diagonals ≈ 0 (the full 768² check is
      // 450M flops of test time for no extra signal)
      def rrT(i: Int, j: Int): Double = (0 until dim).map(t =>
        model.rotation(i)(t).toDouble * model.rotation(j)(t)).sum
      for (i <- 0 until dim by 16)
        assert(math.abs(rrT(i, i) - 1.0) < 1e-3, s"R·Rᵀ[$i][$i] = ${rrT(i, i)}")
      for (i <- 0 until dim by 48; j <- 0 until dim by 48 if i != j)
        assert(math.abs(rrT(i, j)) < 1e-3, s"R·Rᵀ[$i][$j] = ${rrT(i, j)}")
      // staircase at dim 768: 15 queries, exact reference driver-side
      val k = 10
      val byId = rows.toMap
      val queries = (0 until 15).map(i => (i.toLong, byId(i.toLong).toSeq))
      val exact: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
        qid -> rows.map { case (id, v) => (id, cosRef(v.toSeq, qv)) }
          .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      }.toMap
      def recallOf(search: Seq[Float] => org.apache.spark.sql.DataFrame): Double = {
        val hs = queries.map { case (qid, qv) =>
          val got = search(qv).select("vec_id").collect().map(_.getLong(0)).toSet
          exact(qid).count(got.contains).toDouble / exact(qid).size
        }
        hs.sum / hs.size
      }
      val cbT = Search.pqTrainCodebooks(df, "embedding", dim, 8, 16, seed = 42L)
      val encT = Search.pqEncode(df, "vec_id", "embedding", cbT)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val encO = Search.opqEncode(df, "vec_id", "embedding", model)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val rT50 = recallOf(qv => Search.pqTopK(encT, df, "vec_id", "embedding", cbT, qv, k, 50))
        val rO50 = recallOf(qv => Search.opqTopK(encO, df, "vec_id", "embedding", model, qv, k, 50))
        val rO100 = recallOf(qv => Search.opqTopK(encO, df, "vec_id", "embedding", model, qv, k, 100))
        info(s"dim768 recall@10: trainedPQ r50=$rT50 opq r50=$rO50 opq r100=$rO100")
        assert(rO50 >= rT50 - 0.05,
          s"dim-768 OPQ rescore=50 recall $rO50 lost to plain trained PQ $rT50")
        assert(rO100 >= rO50 - 0.02,
          s"dim-768 OPQ recall must not fall as rescore grows: $rO100 < $rO50")
        // frozen floors (BASELINE §ANN-recall dim-768 row: trained PQ
        // r50 0.440, OPQ r50 0.480, OPQ r100 0.800) minus margin
        assert(rO50 >= 0.42, s"dim-768 OPQ rescore=50 recall regressed: $rO50 (frozen 0.480)")
        assert(rO100 >= 0.72, s"dim-768 OPQ rescore=100 recall regressed: $rO100 (frozen 0.800)")
      } finally { encT.unpersist(); encO.unpersist(); () }
    } finally { df.unpersist(); () }
  }

  test("buildInvertedIndex: true df survives the cap; postings id-ordered; minDf prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "a")),   // a tf=2
      (2L, Seq("a", "c")),
      (3L, Seq("a", "b")),
      (4L, Seq("a"))).toDF("doc_id", "toks")
    val idx = Search.buildInvertedIndex(docs, "doc_id", "toks",
        minDf = 2L, maxPostingsPerTerm = Some(2))
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getLong(0), p.getLong(1))))
      }.toMap
    // 'c' (df=1) pruned by minDf
    assert(idx.keySet == Set("a", "b"))
    // df is the TRUE corpus df (4), even though the cap kept 2 postings
    assert(idx("a")._1 == 4L && idx("a")._2 == Seq((1L, 2L), (2L, 1L)))
    assert(idx("b")._1 == 2L && idx("b")._2 == Seq((1L, 1L), (3L, 1L)))
    // uncapped: full id-ordered lists
    val full = Search.buildInvertedIndex(docs, "doc_id", "toks")
      .where(col("term") === "a")
      .select(transform(col("postings"), p => p.getField("id")))
      .head().getSeq[Long](0)
    assert(full == Seq(1L, 2L, 3L, 4L))
  }

  test("bm25TopKFromIndex ≡ bm25TopK bit-for-bit; postings scan is term-pruned") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), TextFunctions.wordTokens(col("text")).as("toks"))
    val path = java.nio.file.Files.createTempDirectory("textidx").toString
    Search.writeTextIndex(docs, "doc_id", "toks", path)
    val terms = Seq("data", "model")
    val fromIdx = Search.bm25TopKFromIndex(spark, path, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = Search.bm25TopK(docs, "doc_id", "toks", terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIdx == direct) // ids AND raw double scores identical
    // the postings read must push the term predicate into the scan
    val plan = Search.bm25TopKFromIndex(spark, path, terms, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term predicate not pushed to the postings scan:\n$plan")
  }

  test("appendTextIndex: write(A∪B) ≡ write(A)+append(B); replay no-op; crash-retry exact") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), TextFunctions.wordTokens(col("text")).as("toks"))
    val a = docs.where(col("doc_id") < 60)
    val b = docs.where(col("doc_id") >= 60)
    val full = java.nio.file.Files.createTempDirectory("ti_full").toString
    val incr = java.nio.file.Files.createTempDirectory("ti_incr").toString
    Search.writeTextIndex(docs, "doc_id", "toks", full)
    Search.writeTextIndex(a, "doc_id", "toks", incr)
    assert(Search.appendTextIndex(b, "doc_id", "toks", incr) == b.count())
    val terms = Seq("data", "model")
    def top(path: String) = Search.bm25TopKFromIndex(spark, path, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(incr) == top(full)) // ids AND raw scores bit-identical
    // replay of an already-appended batch is a no-op
    assert(Search.appendTextIndex(b, "doc_id", "toks", incr) == 0L)
    assert(top(incr) == top(full))
    // crash-retry: postings committed but doclens/stats not (the documented
    // gap) — simulate by appending B's postings AGAIN behind the index's
    // back, then re-query: the per-(term,id) dedup keeps scores exact
    Search.buildInvertedIndex(b, "doc_id", "toks")
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.id").as("id"), col("p.tf").as("tf"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$incr/postings")
    assert(top(incr) == top(full))
    // appending into a directory that is not an index fails loudly
    val foreign = java.nio.file.Files.createTempDirectory("ti_foreign")
    java.nio.file.Files.writeString(foreign.resolve("doclens"), "not parquet")
    intercept[IllegalArgumentException] {
      Search.appendTextIndex(b, "doc_id", "toks", foreign.toString)
    }
  }

  test("property: buildInvertedIndex — postings exactly-once, true df, cap and minDf honored") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val genCorpus = Gen.nonEmptyListOf(
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")))
      .map(_.zipWithIndex.map { case (toks, i) => (i.toLong, toks) })
    checkProp(Prop.forAll(genCorpus) { corpus =>
      val cap = 3
      val minDf = 2L
      val out = Search.buildInvertedIndex(
          corpus.toDF("doc_id", "toks"), "doc_id", "toks",
          minDf = minDf, maxPostingsPerTerm = Some(cap))
        .collect().map { r =>
          r.getString(0) -> (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
            .map(p => (p.getLong(0), p.getLong(1))))
        }.toMap
      // reference model
      val tf: Map[String, Seq[(Long, Long)]] = corpus
        .flatMap { case (id, toks) => toks.map(t => (t, id)) }
        .groupBy(_._1)
        .map { case (t, hits) =>
          t -> hits.groupBy(_._2).map { case (id, h) => (id, h.size.toLong) }
            .toSeq.sortBy(_._1)
        }
      val want = tf.collect {
        case (t, postings) if postings.size >= minDf =>
          t -> (postings.size.toLong, postings.take(cap))
      }
      out == want
    }, minTests = 20)
  }

  test("binaryCodes packs sign bits exactly (bit 63, multi-word, tail padding)") {
    import spark.implicits._
    // dim 130 = 3 words: exercises the word-63 shift (min-long territory),
    // word boundaries, and the zero-padded tail beyond dim
    val dim = 130
    val v: Seq[Float] = (0 until dim).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val got = Seq(Tuple1(v)).toDF("embedding")
      .select(Search.binaryCodes("embedding", dim).as("code"))
      .head().getSeq[Long](0)
    val want = Search.packBits(v.map(_ >= 0f)).toSeq
    assert(got == want && got.length == 3)
    // all-positive 64-dim: every bit set including bit 63 → word == -1L
    val ones: Seq[Float] = Seq.fill(64)(0.5f)
    val w = Seq(Tuple1(ones)).toDF("embedding")
      .select(Search.binaryCodes("embedding", 64).as("code"))
      .head().getSeq[Long](0)
    assert(w == Seq(-1L))
  }

  test("hammingDistance ≡ XOR popcount reference; binaryTopK rescore ≡ exact on candidates") {
    import spark.implicits._
    val a: Seq[Float] = (0 until 64).map(i => if (i < 10) 1.0f else -1.0f)
    val b: Seq[Float] = (0 until 64).map(i => if (i < 7) 1.0f else -1.0f)
    val h = Seq((a, b)).toDF("a", "b")
      .select(Search.hammingDistance(
        Search.binaryCodes("a", 64), Search.binaryCodes("b", 64)).as("h"))
      .head().getLong(0)
    assert(h == 3L) // bits 7,8,9 differ
    // on the fixture: binaryTopK's final ranking must equal exact topK
    // restricted to the Hamming candidate set
    val q = vecs(0L)
    val data = emb.where(col("vec_id") =!= 0)
    val got = Search.binaryTopK(data, "vec_id", "embedding", q,
        dim = 64, k = 5, rescoreFactor = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val qCode = Search.packBits(q.map(_ >= 0f))
    def hamRef(v: Seq[Float]): Int =
      java.lang.Long.bitCount(Search.packBits(v.map(_ >= 0f))(0) ^ qCode(0))
    val cands = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, hamRef(v)) }
      .sortBy { case (id, h0) => (h0, id) }.take(20).map(_._1).toSet
    val want = vecs.toSeq.filter { case (id, _) => cands(id) }
      .map { case (id, v) => (id, cosRef(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got == want)
    // recall@5 vs exact grows with the candidate budget: 1-bit codes on
    // only 64 dims are a coarse filter (measured: 2/5 at factor 4, 4/5 at
    // 10, 5/5 at 16 on this fixture) — assert the measured staircase so a
    // packing/rescore regression shows up as a recall drop
    val exact = Search.topK(data, "embedding", q, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.count(exact) >= 2, s"binary recall@5 too low: $got vs $exact")
    val got16 = Search.binaryTopK(data, "vec_id", "embedding", q,
        dim = 64, k = 5, rescoreFactor = 16)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got16.count(exact) == 5,
      s"binary recall@5 at factor 16 regressed: $got16 vs $exact")
  }

  test("matryoshkaTopK: prefix shortlist + full rescore ≡ driver reference; recall grows with prefix") {
    val q = vecs(0L)
    val data = emb.where(col("vec_id") =!= 0)
    def refFunnel(prefixDim: Int, factor: Int): Seq[Long] = {
      val cands = vecs.toSeq.filter(_._1 != 0L)
        .map { case (id, v) => (id, cosRef(v.take(prefixDim), q.take(prefixDim))) }
        .sortBy { case (id, s) => (-s, id) }.take(5 * factor).map(_._1).toSet
      vecs.toSeq.filter { case (id, _) => cands(id) }
        .map { case (id, v) => (id, cosRef(v, q)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    }
    val got16 = Search.matryoshkaTopK(data, "vec_id", "embedding", q, 16, 5, 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got16 == refFunnel(16, 4))
    val exact = Search.topK(data, "embedding", q, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // a 32-dim prefix sees half the information: must be at least as good
    // as the 16-dim funnel, and the full-dim "prefix" must equal exact
    val r16 = got16.count(exact.toSet)
    val got32 = Search.matryoshkaTopK(data, "vec_id", "embedding", q, 32, 5, 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val r32 = got32.count(exact.toSet)
    assert(r32 >= r16, s"recall fell with a longer prefix: $r16 -> $r32")
    val got64 = Search.matryoshkaTopK(data, "vec_id", "embedding", q, 64, 5, 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got64 == exact)
    // bad prefix dims fail loudly
    intercept[IllegalArgumentException] {
      Search.matryoshkaTopK(data, "vec_id", "embedding", q, 65, 5)
    }
  }

  test("kmeans-learned IVF centroids beat seed-vector centroids on recall@5") {
    def recallWith(cents: Seq[(Int, Array[Float])]): Double = {
      val assigned = Search.ivfAssign(emb, "embedding", cents)
      val queries = (10L to 29L).map(vecs(_))
      val hits = queries.zipWithIndex.count { case (q, qi) =>
        val approx = Search.ivfTopK(assigned, "embedding", cents, q.toSeq, k = 1, nProbe = 2)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val exact = vecs.toSeq.map { case (id, v) => (id, cosRef(v, q)) }
          .sortBy { case (id, s0) => (-s0, id) }.take(1).map(_._1).toSet
        approx.intersect(exact).nonEmpty
      }
      hits.toDouble / queries.size
    }
    val learned = Search.kmeansCentroids(emb, "embedding", k = 8)
    assert(learned.size == 8)
    assert(learned.forall(_._2.length == 64))
    val r = recallWith(learned)
    assert(r >= 0.5, s"learned-centroid recall@1 too low: $r")
  }

  test("sampledCentroids: rank rides a partial top-k plan; duplicate ids refuse with the honest message") {
    // the one global-window shape in the repo that had no plan assert
    // (VERDICT r14 watch): the `<= nClusters` filter must plan through
    // InferWindowGroupLimit — on Spark 4.1 it lands even better, as a
    // TakeOrderedAndProject(limit=nClusters) feeding the window (per-
    // partition top-k + size-bounded merge) — either way a partial top-k
    // BEFORE the single-partition exchange, never a single-task full sort
    val corpus = emb.where(col("vec_id") =!= 0)
    val ranked = Search.centroidRanking(corpus, "vec_id", 8, "rf")
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") ||
      plan.contains("WindowGroupLimit"),
      s"centroid rank plan lost its partial top-k:\n$plan")
    // duplicate ids multiply the join-back: the refusal must SAY that
    // (ADVICE r14 — it used to claim 'fewer than nClusters rows')
    val dup = corpus.limit(10).unionAll(corpus.limit(3))
    val err = intercept[IllegalArgumentException] {
      Search.sampledCentroids(dup, "vec_id", "embedding", 8, "rf") }
    assert(err.getMessage.contains("duplicate"), err.getMessage)
    // a genuinely too-small corpus keeps its own message
    val few = intercept[IllegalArgumentException] {
      Search.sampledCentroids(corpus.limit(3), "vec_id", "embedding", 8, "rf") }
    assert(few.getMessage.contains("fewer"), few.getMessage)
  }

  test("quantizer refresh: refreshed ≡ fresh build under the new model for all four families; versions chain; mid-swap refusal") {
    def tmp(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    val corpus = emb.where(col("vec_id") =!= 0)
    val seedCents = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val q = vecs(0L)

    // ---- IVF ----
    val (ivf1, ivf2, ivfF) = (tmp("rfi1"), tmp("rfi2"), tmp("rfiF"))
    Search.writeIvfIndex(corpus, "embedding", seedCents, ivf1)
    assert(Search.readModelVersion(spark, ivf1) == 0L) // legacy: no marker
    val n = Search.refreshIvfIndex(corpus, "vec_id", "embedding", ivf1, ivf2,
      nClusters = 8, salt = "rf")
    assert(n == corpus.count())
    assert(Search.readModelVersion(spark, ivf2) == 1L)
    // fresh build under the SAME sampled model ≡ the refreshed store
    val sampled = Search.sampledCentroids(corpus, "vec_id", "embedding", 8, "rf")
    Search.writeIvfIndex(corpus, "embedding", sampled, ivfF)
    def vecSet(p: String) = spark.read.parquet(s"$p/vectors")
      .select("vec_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(vecSet(ivf2) == vecSet(ivfF))
    assert(Search.readIvfCentroids(spark, ivf2).map(_._1) == sampled.map(_._1))
    assert(Search.readIvfCentroids(spark, ivf2).zip(sampled)
      .forall { case ((_, a), (_, b)) => a.sameElements(b) })
    assert(Search.ivfTopKFromIndex(spark, ivf2, "embedding", q, 5, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq ==
      Search.ivfTopKFromIndex(spark, ivfF, "embedding", q, 5, 2)
        .select("vec_id").collect().map(_.getLong(0)).toSeq)
    // versions chain across refresh generations
    val ivf3 = tmp("rfi3")
    Search.refreshIvfIndex(corpus, "vec_id", "embedding", ivf2, ivf3,
      nClusters = 8, salt = "rf2")
    assert(Search.readModelVersion(spark, ivf3) == 2L)
    // mid-swap store refuses: the vectors artifact of one generation under
    // another generation's sidecars/marker
    val stale = java.nio.file.Paths.get(ivf2, "vectors", "_v1")
    java.nio.file.Files.delete(stale)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(ivf2, "vectors", "_v99"))
    val e1 = intercept[IllegalArgumentException] {
      Search.ivfTopKFromIndex(spark, ivf2, "embedding", q, 5, 2) }
    assert(e1.getMessage.contains("mid-swap"))
    // ...and an UNTAGGED artifact under a marked store refuses too (the
    // pre-refresh generation left in place by a half-done swap)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ivf2, "vectors", "_v99"))
    val e2 = intercept[IllegalArgumentException] {
      Search.ivfTopKFromIndex(spark, ivf2, "embedding", q, 5, 2) }
    assert(e2.getMessage.contains("model tag"))

    // ---- flat PQ ----
    val (pq1, pq2, pqF) = (tmp("rfp1"), tmp("rfp2"), tmp("rfpF"))
    val cbOld = Search.pqSampledCodebooks(emb.where(col("vec_id") < 100),
      "vec_id", "embedding", 64, 8, 16)
    Search.pqWriteIndex(corpus, "vec_id", "embedding", cbOld, pq1)
    Search.refreshPqIndex(corpus, "vec_id", "embedding", pq1, pq2, 64, 8, 16)
    assert(Search.readModelVersion(spark, pq2) == 1L)
    val cbNew = Search.pqSampledCodebooks(corpus, "vec_id", "embedding", 64, 8, 16)
    Search.pqWriteIndex(corpus, "vec_id", "embedding", cbNew, pqF)
    def codeSet(p: String) = spark.read.parquet(s"$p/codes")
      .select(col("vec_id"), col("pq_codes").cast("array<int>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toSet
    assert(codeSet(pq2) == codeSet(pqF))
    assert(Search.pqTopKFromIndex(spark, pq2, corpus, "vec_id", "embedding",
      q, 5).select("vec_id").collect().map(_.getLong(0)).toSeq ==
      Search.pqTopKFromIndex(spark, pqF, corpus, "vec_id", "embedding",
        q, 5).select("vec_id").collect().map(_.getLong(0)).toSeq)

    // ---- composed IVF-PQ ----
    val (ip1, ip2, ipF) = (tmp("rfc1"), tmp("rfc2"), tmp("rfcF"))
    Search.writeIvfPqIndex(corpus, "vec_id", "embedding", seedCents, cbOld, ip1)
    Search.refreshIvfPqIndex(corpus, "vec_id", "embedding", ip1, ip2,
      nClusters = 8, dim = 64, m = 8, ksub = 16, salt = "rf")
    assert(Search.readModelVersion(spark, ip2) == 1L)
    Search.writeIvfPqIndex(corpus, "vec_id", "embedding", sampled, cbNew, ipF)
    def ivfpqSet(p: String) = spark.read.parquet(s"$p/codes")
      .select(col("vec_id"), col("cluster_id"),
        col("pq_codes").cast("array<int>")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq)).toSet
    assert(ivfpqSet(ip2) == ivfpqSet(ipF))
    assert(Search.ivfPqTopKFromIndex(spark, ip2, corpus, "vec_id",
      "embedding", q, 10, 4, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq ==
      Search.ivfPqTopKFromIndex(spark, ipF, corpus, "vec_id",
        "embedding", q, 10, 4, 50)
        .select("vec_id").collect().map(_.getLong(0)).toSeq)
    // family guard: plain refresh refuses a residual store and vice versa
    val (rs1, rs2, rsF) = (tmp("rfr1"), tmp("rfr2"), tmp("rfrF"))
    val cbResOld = Search.pqResidualSampledCodebooks(corpus, "vec_id",
      "embedding", seedCents, 64, 8, 16)
    Search.writeIvfPqResidualIndex(corpus, "vec_id", "embedding", seedCents,
      cbResOld, rs1)
    intercept[IllegalArgumentException] {
      Search.refreshIvfPqIndex(corpus, "vec_id", "embedding", rs1,
        tmp("rfx"), 8, 64, 8, 16) }
    intercept[IllegalArgumentException] {
      Search.refreshIvfPqResidualIndex(corpus, "vec_id", "embedding", ip1,
        tmp("rfy"), 8, 64, 8, 16) }

    // ---- residual IVF-PQ ----
    Search.refreshIvfPqResidualIndex(corpus, "vec_id", "embedding", rs1, rs2,
      nClusters = 8, dim = 64, m = 8, ksub = 16, salt = "rf")
    assert(Search.readModelVersion(spark, rs2) == 1L)
    val cbResNew = Search.pqResidualSampledCodebooks(corpus, "vec_id",
      "embedding", sampled, 64, 8, 16)
    Search.writeIvfPqResidualIndex(corpus, "vec_id", "embedding", sampled,
      cbResNew, rsF)
    assert(ivfpqSet(rs2) == ivfpqSet(rsF))
    assert(Search.ivfPqResidualTopKFromIndex(spark, rs2, corpus, "vec_id",
      "embedding", q, 10, 4, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq ==
      Search.ivfPqResidualTopKFromIndex(spark, rsF, corpus, "vec_id",
        "embedding", q, 10, 4, 50)
        .select("vec_id").collect().map(_.getLong(0)).toSeq)
    // refresh requires an existing generation (a first build is writeX)
    intercept[IllegalArgumentException] {
      Search.refreshIvfIndex(corpus, "vec_id", "embedding", tmp("rfz"),
        tmp("rfz2"), 8) }
  }

  test("model marker survives CRUD: append/remove/update on a refreshed store keep the generation guard") {
    def tmp(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    val corpus = emb.where(col("vec_id") =!= 0)
    val q = vecs(0L)
    val (v1, v2) = (tmp("mc1"), tmp("mc2"))
    Search.writeIvfIndex(corpus.where(col("vec_id") < 400), "embedding",
      (0 until 8).map(i => i -> vecs(i.toLong).toArray), v1)
    Search.refreshIvfIndex(corpus.where(col("vec_id") < 400), "vec_id",
      "embedding", v1, v2, nClusters = 8, salt = "mc")
    // append IN PLACE: frozen model, marker and tags untouched — the
    // store stays generation-consistent and serveable
    assert(Search.appendIvfIndex(corpus.where(col("vec_id") >= 400),
      "vec_id", "embedding", v2) > 0L)
    assert(Search.readModelVersion(spark, v2) == 1L)
    Search.ivfTopKFromIndex(spark, v2, "embedding", q, 5, 2).collect()
    // remove/update write NEW directories: the marker + tags must carry
    // (dropping them would silently demote the store to legacy-unguarded)
    import spark.implicits._
    val v3 = tmp("mc3")
    Search.removeFromIvfIndex(spark, v2, v3, Seq(5L, 6L).toDF("vec_id"), "vec_id")
    assert(Search.readModelVersion(spark, v3) == 1L)
    Search.ivfTopKFromIndex(spark, v3, "embedding", q, 5, 2).collect()
    val v4 = tmp("mc4")
    Search.updateIvfIndex(spark, v3, v4, Seq(7L).toDF("vec_id"),
      corpus.where(col("vec_id") === 8L), "vec_id", "embedding")
    assert(Search.readModelVersion(spark, v4) == 1L)
    Search.ivfTopKFromIndex(spark, v4, "embedding", q, 5, 2).collect()
    // the carried guard still CATCHES a mid-swap on the updated store
    val tag = java.nio.file.Paths.get(v4, "centroids", "_v1")
    java.nio.file.Files.delete(tag)
    val e = intercept[IllegalArgumentException] {
      Search.ivfTopKFromIndex(spark, v4, "embedding", q, 5, 2) }
    assert(e.getMessage.contains("model tag"))
    java.nio.file.Files.createFile(tag)
    // a second refresh on the CRUD-descended store chains the version
    val v5 = tmp("mc5")
    Search.refreshIvfIndex(corpus, "vec_id", "embedding", v4, v5,
      nClusters = 8, salt = "mc2")
    assert(Search.readModelVersion(spark, v5) == 2L)
    // IVF-PQ variant: update carries marker + all three sidecar tags
    val (p1, p2, p3) = (tmp("mp1"), tmp("mp2"), tmp("mp3"))
    val cb = Search.pqSampledCodebooks(corpus, "vec_id", "embedding", 64, 8, 16)
    Search.writeIvfPqIndex(corpus, "vec_id", "embedding",
      (0 until 8).map(i => i -> vecs(i.toLong).toArray), cb, p1)
    Search.refreshIvfPqIndex(corpus, "vec_id", "embedding", p1, p2,
      nClusters = 8, dim = 64, m = 8, ksub = 16, salt = "mc")
    Search.updateIvfPqIndex(spark, p2, p3, Seq(5L).toDF("vec_id"),
      corpus.where(col("vec_id") === 6L), "vec_id", "embedding")
    assert(Search.readModelVersion(spark, p3) == 1L)
    Search.ivfPqTopKFromIndex(spark, p3, corpus, "vec_id", "embedding",
      q, 10, 4, 50).collect()
    // legacy stores stay legacy through CRUD: no marker appears
    val (l1, l2) = (tmp("ml1"), tmp("ml2"))
    Search.writeIvfIndex(corpus, "embedding",
      (0 until 8).map(i => i -> vecs(i.toLong).toArray), l1)
    Search.removeFromIvfIndex(spark, l1, l2, Seq(5L).toDF("vec_id"), "vec_id")
    assert(Search.readModelVersion(spark, l2) == 0L)
  }

  test("refreshOpqIndex: refreshed ≡ fresh build under the same seed; version marker; OPQ reader guarded") {
    def tmp(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    val corpus = emb.where(col("vec_id") =!= 0)
    val q = vecs(0L)
    val (o1, o2, oF) = (tmp("rfo1"), tmp("rfo2"), tmp("rfoF"))
    // v1 model trained on a SLICE (the stale quantizer); refresh re-trains
    // on the full corpus
    val mOld = Search.opqTrainCodebooks(emb.where(col("vec_id") < 100),
      "embedding", 64, 8, 16)
    Search.opqWriteIndex(corpus, "vec_id", "embedding", mOld, o1)
    assert(Search.refreshOpqIndex(corpus, "vec_id", "embedding", o1, o2,
      dim = 64, m = 8, ksub = 16) == corpus.count())
    assert(Search.readModelVersion(spark, o2) == 1L)
    val mNew = Search.opqTrainCodebooks(corpus, "embedding", 64, 8, 16)
    Search.opqWriteIndex(corpus, "vec_id", "embedding", mNew, oF)
    def codes(p: String) = spark.read.parquet(s"$p/codes")
      .select(col("vec_id"), col("pq_codes").cast("array<int>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toSet
    assert(codes(o2) == codes(oF)) // seeded re-train is reproducible
    assert(Search.opqTopKFromIndex(spark, o2, corpus, "vec_id", "embedding",
      q, 5).select("vec_id").collect().map(_.getLong(0)).toSeq ==
      Search.opqTopKFromIndex(spark, oF, corpus, "vec_id", "embedding",
        q, 5).select("vec_id").collect().map(_.getLong(0)).toSeq)
    // the OPQ reader refuses a mid-swap store (rotation from another gen)
    java.nio.file.Files.delete(java.nio.file.Paths.get(o2, "rotation", "_v1"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(o2, "rotation", "_v9"))
    val e = intercept[IllegalArgumentException] {
      Search.opqTopKFromIndex(spark, o2, corpus, "vec_id", "embedding", q, 5) }
    assert(e.getMessage.contains("mid-swap"))
  }

  test("store compaction: appended stores rewrite to bounded sorted files; answers, replays and markers unchanged") {
    import spark.implicits._
    def tmp(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    def parquetFiles(dir: String): Int = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).toArray.map(_.toString)
        .count(_.endsWith(".parquet"))
    }
    val corpus = emb.where(col("vec_id") =!= 0)
    val q = vecs(0L)
    val seedCents = (0 until 8).map(i => i -> vecs(i.toLong).toArray)

    // ---- text index: build + 4 appends fragment the postings ----
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordTokens(col("text")).as("toks"))
    val (t1, t2) = (tmp("ctx1"), tmp("ctx2"))
    Search.writeTextIndex(docs.where(col("doc_id") < 100), "doc_id", "toks", t1)
    (1 to 4).foreach { i =>
      Search.appendTextIndex(
        docs.where(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100),
        "doc_id", "toks", t1)
    }
    val before = Search.bm25TopKFromIndex(spark, t1,
      Seq("data", "model", "search"), 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // job-count gate (VERDICT r14): stats + the return count ride
    // Observations on the doclens write job, not dst read-backs. The
    // frozen cap is the measured composition (postings sample+write,
    // source-doclens count, doclens sample+write, one-row stats write,
    // with AQE materializing shuffle stages as their own jobs) — the
    // pre-fix shape added a stats re-aggregate, a doclens re-count and a
    // stats re-read on top of it.
    val (nDocs, textJobs) = countJobs {
      Search.compactTextIndex(spark, t1, t2, targetFiles = 4) }
    info(s"compactTextIndex jobs: $textJobs")
    assert(textJobs <= 11, s"compactTextIndex ran $textJobs jobs — a dst " +
      "read-back crept back in (stats/count must ride the write's Observation)")
    assert(nDocs == docs.count())
    assert(parquetFiles(s"$t2/postings") <= 4)
    val after = Search.bm25TopKFromIndex(spark, t2,
      Seq("data", "model", "search"), 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before) // scores bit-identical through the rewrite
    // replay idempotence keys off CONTENT, preserved row-for-row
    assert(Search.appendTextIndex(docs.where(col("doc_id") < 100),
      "doc_id", "toks", t2) == 0L)

    // ---- IVF (refreshed, so the marker must carry) + appends ----
    val (i1, i2, i3) = (tmp("civ1"), tmp("civ2"), tmp("civ3"))
    Search.writeIvfIndex(corpus.where(col("vec_id") < 200), "embedding", seedCents, i1)
    Search.refreshIvfIndex(corpus.where(col("vec_id") < 200), "vec_id",
      "embedding", i1, i2, nClusters = 8, salt = "cp")
    (1 to 3).foreach { i =>
      Search.appendIvfIndex(
        corpus.where(col("vec_id") >= i * 200 && col("vec_id") < (i + 1) * 200),
        "vec_id", "embedding", i2)
    }
    val ivfBefore = Search.ivfTopKFromIndex(spark, i2, "embedding", q, 5, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val filesBefore = parquetFiles(s"$i2/vectors")
    val nVec = Search.compactIvfIndex(spark, i2, i3)
    assert(nVec == corpus.where(col("vec_id") < 800).count())
    assert(parquetFiles(s"$i3/vectors") <= 8) // one file per cluster
    assert(parquetFiles(s"$i3/vectors") < filesBefore)
    assert(Search.readModelVersion(spark, i3) == 1L) // marker carried
    assert(Search.ivfTopKFromIndex(spark, i3, "embedding", q, 5, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq == ivfBefore)
    assert(Search.appendIvfIndex(corpus.where(col("vec_id") < 200),
      "vec_id", "embedding", i3) == 0L) // replay no-op survives compaction
    // targetFilesPerCluster is HONORED above 1 (ADVICE r14 — it used to be
    // validated then ignored): the store rewrites under a total budget of
    // nClusters × target contiguous (cluster, id) ranges, so clusters
    // split into multiple id-ranged files (size-proportional, not exact)
    def filesPerCluster(dir: String): Map[String, Int] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
        .groupBy(p => p.split('/').reverse(1)).map { case (k, v) => k -> v.length }
    val i4 = tmp("civ4")
    assert(Search.compactIvfIndex(spark, i2, i4, targetFilesPerCluster = 4) == nVec)
    val perCluster = filesPerCluster(s"$i4/vectors")
    assert(perCluster.values.sum > 8,
      s"target=4 must split clusters beyond one-file-per-cluster: $perCluster")
    // budget: ≤ 32 range partitions, each writing ≤ 1 file per cluster it
    // touches; a range boundary can straddle a cluster edge, so allow the
    // straddle slack but no more
    assert(perCluster.values.sum <= 32 + 8, s"file budget blown: $perCluster")
    assert(Search.ivfTopKFromIndex(spark, i4, "embedding", q, 5, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq == ivfBefore)
    assert(Search.readModelVersion(spark, i4) == 1L)

    // ---- residual IVF-PQ: encoding sidecar rides through ----
    val (r1, r2) = (tmp("crs1"), tmp("crs2"))
    val cbRes = Search.pqResidualSampledCodebooks(corpus, "vec_id",
      "embedding", seedCents, 64, 8, 16)
    Search.writeIvfPqResidualIndex(corpus.where(col("vec_id") < 300),
      "vec_id", "embedding", seedCents, cbRes, r1)
    Search.appendIvfPqResidualIndex(corpus.where(col("vec_id") >= 300),
      "vec_id", "embedding", r1)
    val resBefore = Search.ivfPqResidualTopKFromIndex(spark, r1, corpus,
      "vec_id", "embedding", q, 10, 4, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    Search.compactIvfPqIndex(spark, r1, r2)
    assert(Search.ivfPqResidualTopKFromIndex(spark, r2, corpus,
      "vec_id", "embedding", q, 10, 4, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq == resBefore)
    // the composed family honors the file budget too
    val r3 = tmp("crs3")
    Search.compactIvfPqIndex(spark, r1, r3, targetFilesPerCluster = 2)
    assert(filesPerCluster(s"$r3/codes").values.sum > 8)
    assert(Search.ivfPqResidualTopKFromIndex(spark, r3, corpus,
      "vec_id", "embedding", q, 10, 4, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq == resBefore)

    // ---- flat PQ: id-range files, answers unchanged ----
    val (p1, p2) = (tmp("cpq1"), tmp("cpq2"))
    val cb = Search.pqSampledCodebooks(corpus, "vec_id", "embedding", 64, 8, 16)
    Search.pqWriteIndex(corpus.where(col("vec_id") < 300), "vec_id",
      "embedding", cb, p1)
    Search.appendPqIndex(corpus.where(col("vec_id") >= 300), "vec_id",
      "embedding", p1)
    val pqBefore = Search.pqTopKFromIndex(spark, p1, corpus, "vec_id",
      "embedding", q, 5).select("vec_id").collect().map(_.getLong(0)).toSeq
    Search.compactPqIndex(spark, p1, p2, targetFiles = 2)
    assert(parquetFiles(s"$p2/codes") <= 2)
    assert(Search.pqTopKFromIndex(spark, p2, corpus, "vec_id",
      "embedding", q, 5).select("vec_id").collect().map(_.getLong(0)).toSeq == pqBefore)

    // in-place compaction refused everywhere
    intercept[IllegalArgumentException] { Search.compactTextIndex(spark, t2, t2) }
    intercept[IllegalArgumentException] { Search.compactIvfIndex(spark, i3, i3) }
    intercept[IllegalArgumentException] { Search.compactIvfPqIndex(spark, r2, r2) }
    intercept[IllegalArgumentException] { Search.compactPqIndex(spark, p2, p2) }
  }

  test("maintainTextIndex: healthy catalog costs one listing; fragmented catalog compacts + publishes, answers and replay no-ops unchanged") {
    import graft.sources.Generations
    val conf = spark.sparkContext.hadoopConfiguration
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordTokens(col("text")).as("toks"))
    val root = java.nio.file.Files.createTempDirectory("tcat").toString
    val g0 = Generations.stage(root, conf)
    Search.writeTextIndex(docs.where(col("doc_id") < 100), "doc_id", "toks", g0)
    Generations.publish(root, g0, conf)
    // sustained ingest: appends land in the LIVE generation (idempotence
    // keys off doclens content, not the directory)
    (1 to 4).foreach { i =>
      Search.appendTextIndex(
        docs.where(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100),
        "doc_id", "toks", Generations.resolve(root, conf))
    }
    val frag = Search.dataFileCount(spark,
      s"${Generations.resolve(root, conf)}/postings")
    assert(frag > 8, s"append sequence should fragment the postings: $frag")
    // the observable ignores hidden path COMPONENTS (review r15): a
    // crash-orphaned task file under _temporary must not trip the policy
    val orphan = java.nio.file.Paths.get(
      Generations.resolve(root, conf), "postings", "_temporary", "0")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-junk.parquet"), "x")
    assert(Search.dataFileCount(spark,
      s"${Generations.resolve(root, conf)}/postings") == frag)
    val before = Search.bm25TopKFromCatalog(spark, root,
        Seq("data", "model", "search"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // within budget: a TRUE no-op — nothing staged, the pointer unmoved
    assert(Search.maintainTextIndex(spark, root, maxPostingsFiles = frag,
      targetFiles = 4).isEmpty)
    assert(Generations.history(root, conf) == Seq("gen-0"))
    // past budget: compact into a staged generation + atomic publish
    assert(Search.maintainTextIndex(spark, root, maxPostingsFiles = 8,
      targetFiles = 4).contains("gen-1"))
    assert(Search.dataFileCount(spark,
      s"${Generations.resolve(root, conf)}/postings") <= 4)
    // scores bit-identical through the policy's rewrite + swap
    assert(Search.bm25TopKFromCatalog(spark, root,
        Seq("data", "model", "search"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == before)
    // replay no-op survives the generation swap
    assert(Search.appendTextIndex(docs.where(col("doc_id") < 100),
      "doc_id", "toks", Generations.resolve(root, conf)) == 0L)
    // next tick is healthy again
    assert(Search.maintainTextIndex(spark, root, maxPostingsFiles = 8,
      targetFiles = 4).isEmpty)
    // a budget below the compaction target would re-trigger every tick
    intercept[IllegalArgumentException] {
      Search.maintainTextIndex(spark, root, maxPostingsFiles = 2,
        targetFiles = 4) }
  }

  test("quantizer refresh at reference dimensionality (dim=768): full re-encode stays linear, refreshed ≡ fresh build") {
    import spark.implicits._
    // VERDICT r14 item 5: the refresh ops re-encode the WHOLE corpus —
    // exactly the path where the r12 interpreted-eval blowup class lived
    // (janino gives up past ~100 dims and inline expression reuse went
    // quadratic; fixed by staging the i8 codes as a projection). The
    // refresh specs ran at toy dims only; this one drives
    // refreshIvfPqIndex at the reference's default 768 (the q152
    // rationale applied to R169) — a regression to the quadratic shape
    // would blow this test's wall-clock out by orders of magnitude.
    val dim = 768
    val rnd = new java.util.Random(11L)
    val anchors = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows: Seq[(Long, Array[Float])] = (1 until 801).map { i =>
      val a = anchors(i % 8)
      (i.toLong, Array.tabulate(dim)(j => a(j) + 0.8f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    def tmp(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    val (v1, v2, fresh) = (tmp("rf768a"), tmp("rf768b"), tmp("rf768c"))
    val cb0 = Search.pqSampledCodebooks(df, "vec_id", "embedding", dim, 8, 16)
    val cents0 = Search.sampledCentroids(df, "vec_id", "embedding", 8, "v1")
    Search.writeIvfPqIndex(df, "vec_id", "embedding", cents0, cb0, v1)
    val n = Search.refreshIvfPqIndex(df, "vec_id", "embedding", v1, v2,
      nClusters = 8, dim = dim, m = 8, ksub = 16, salt = "rf768")
    assert(n == 800L)
    assert(Search.readModelVersion(spark, v2) == 1L)
    // refreshed ≡ fresh build under the same re-sampled models, code for code
    Search.writeIvfPqIndex(df, "vec_id", "embedding",
      Search.sampledCentroids(df, "vec_id", "embedding", 8, "rf768"),
      Search.pqSampledCodebooks(df, "vec_id", "embedding", dim, 8, 16), fresh)
    def codeSet(p: String) = spark.read.parquet(s"$p/codes")
      .select(col("vec_id"), col("cluster_id"),
        col("pq_codes").cast("array<int>"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq)).toSet
    assert(codeSet(v2) == codeSet(fresh))
    // the refreshed index answers through the standard funnel
    val q = rows.head._2.toSeq
    assert(Search.ivfPqTopKFromIndex(spark, v2, df, "vec_id", "embedding",
      q, k = 5, nProbe = 2, rescore = 20).count() == 5L)
  }

  test("maintainVectorIndex at reference dimensionality (dim=768): the policy's drift-refresh cycle holds at the real width") {
    import spark.implicits._
    import graft.sources.Generations
    // the R180 canary discipline applied to the POLICY path (VERDICT r15
    // item 6): the tick runs observe (minCorpusClusterSimilarity — a
    // 768-wide codegen'd cosine aggregate) and the full refreshIvfPqIndex
    // re-encode inside one call; a janino fallback or quadratic re-eval
    // at real width would blow the wall-clock out by orders of magnitude.
    val conf = spark.sparkContext.hadoopConfiguration
    val dim = 768
    val rnd = new java.util.Random(13L)
    val anchors = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows: Seq[(Long, Array[Float])] = (1 until 401).map { i =>
      val a = anchors(i % 8)
      (i.toLong, Array.tabulate(dim)(j => a(j) + 0.8f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    val root = java.nio.file.Files.createTempDirectory("maint768").toString
    val g0 = Generations.stage(root, conf)
    Search.writeIvfPqIndex(df, "vec_id", "embedding",
      Search.sampledCentroids(df, "vec_id", "embedding", 8, "m768"),
      Search.pqSampledCodebooks(df, "vec_id", "embedding", dim, 8, 16), g0)
    Generations.publish(root, g0, conf)
    def tick(threshold: Double) = Search.maintainVectorIndex(spark, root,
      threshold,
      observe = p => Search.minCorpusClusterSimilarity(spark, p, df,
        "embedding"),
      refresh = (src, dst) => Search.refreshIvfPqIndex(df, "vec_id",
        "embedding", src, dst, nClusters = 8, dim = dim, m = 8, ksub = 16,
        salt = "m768r"))
    val healthy = Search.minCorpusClusterSimilarity(spark, g0, df,
      "embedding")
    assert(tick(healthy).isEmpty, "at its own measured health: a no-op")
    assert(tick(1.01).contains("gen-1"), "past any cosine mean: refresh")
    assert(Search.readModelVersion(spark,
      Generations.resolve(root, conf)) == 1L)
    val q = rows.head._2.toSeq
    assert(Search.ivfPqTopKFromCatalog(spark, root, df, "vec_id",
      "embedding", q, k = 5, nProbe = 2, rescore = 20).count() == 5L)
  }

  test("quantizer refresh recovers recall after drift (the ivfDriftStats → refresh loop)") {
    import spark.implicits._
    // region A: 40 vectors hugging axes e0..e3; region B (the drift): 40
    // vectors hugging axes e4..e7. The tiny perturbation rides on A-axis
    // id%3 — DECORRELATED from the group axis id%4 — so under the frozen
    // A-trained quantizer a B group's members scatter across clusters
    // (their dominant axis is orthogonal to every centroid; the argmax is
    // decided by the perturbation), which is exactly what drift does to
    // recall. Deterministic, every vector unique (magnitude varies by id).
    val dim = 8
    def v(axis: Int, id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(axis) = 1.0f
      a((id % 3).toInt) = a((id % 3).toInt) + 0.02f * ((id % 5) + 1)
      a.toSeq
    }
    val aRows = (1L to 40L).map(id => (id, v((id % 4).toInt, id)))
    val bRows = (101L to 140L).map(id => (id, v(4 + (id % 4).toInt, id)))
    val a = aRows.toDF("vec_id", "embedding")
    val b = bRows.toDF("vec_id", "embedding")
    val all = aRows ++ bRows
    val dir1 = java.nio.file.Files.createTempDirectory("drift1").toString
    // v1 quantizer trained when only region A existed
    val centsA = Search.sampledCentroids(a, "vec_id", "embedding", 4, "d1")
    Search.writeIvfIndex(a, "embedding", centsA, dir1)
    // the corpus drifts: region B appends under the FROZEN quantizer
    assert(Search.appendIvfIndex(b, "vec_id", "embedding", dir1) == 40L)
    def recallAt(path: String, nProbe: Int): Double = {
      val queries = bRows.take(10)
      val hits = queries.map { case (qid, qv) =>
        val exact = all.filter(_._1 != qid)
          .map { case (id, w) => (id, cosRef(w, qv)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
        val got = Search.ivfTopKFromIndex(spark, path, "embedding",
            qv, k = 6, nProbe = nProbe)
          .select("vec_id").collect().map(_.getLong(0))
          .filter(_ != qid).take(5).toSet
        exact.intersect(got).size.toDouble / 5.0
      }
      hits.sum / hits.size
    }
    val drifted = recallAt(dir1, 1)
    // drift stats SHOW the problem: region-B vectors sit far from every
    // region-A centroid, so some cluster's mean similarity is poor
    val stats = Search.ivfDriftStats(spark, dir1, "embedding").collect()
    assert(stats.map(_.getDouble(2)).min < 0.7,
      "drifted store should show a low mean-similarity cluster")
    // the refresh re-trains on the CURRENT corpus and recovers recall
    val dir2 = java.nio.file.Files.createTempDirectory("drift2").toString
    Search.refreshIvfIndex(a.unionByName(b), "vec_id", "embedding",
      dir1, dir2, nClusters = 8, salt = "d2")
    val refreshed = recallAt(dir2, 1)
    assert(refreshed > drifted,
      s"refresh should recover recall: drifted=$drifted refreshed=$refreshed")
    val statsAfter = Search.ivfDriftStats(spark, dir2, "embedding").collect()
    assert(statsAfter.map(_.getDouble(2)).min > stats.map(_.getDouble(2)).min,
      "worst-cluster mean similarity should improve after the refresh")
  }

  test("maintainVectorIndex: healthy catalog no-ops; drifted catalog refreshes + publishes and recall recovers through the catalog read path") {
    import spark.implicits._
    import graft.sources.Generations
    val conf = spark.sparkContext.hadoopConfiguration
    // the drift construction from the recall test above, run through the
    // OPERATOR form of the loop (VERDICT r14 item 6): observe → refresh →
    // publish is one call against a Generations catalog
    val dim = 8
    def v(axis: Int, id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(axis) = 1.0f
      a((id % 3).toInt) = a((id % 3).toInt) + 0.02f * ((id % 5) + 1)
      a.toSeq
    }
    val aRows = (1L to 40L).map(id => (id, v((id % 4).toInt, id)))
    val bRows = (101L to 140L).map(id => (id, v(4 + (id % 4).toInt, id)))
    val a = aRows.toDF("vec_id", "embedding")
    val b = bRows.toDF("vec_id", "embedding")
    val all = aRows ++ bRows
    val corpus = a.unionByName(b)
    val root = java.nio.file.Files.createTempDirectory("maintcat").toString
    val g0 = Generations.stage(root, conf)
    Search.writeIvfIndex(a, "embedding",
      Search.sampledCentroids(a, "vec_id", "embedding", 4, "d1"), g0)
    Generations.publish(root, g0, conf)
    def observe(p: String): Double = Search.minClusterSimilarity(spark, p,
      "embedding")
    def maintain(threshold: Double) = Search.maintainVectorIndex(spark,
      root, threshold, observe,
      refresh = (src, dst) => Search.refreshIvfIndex(corpus, "vec_id",
        "embedding", src, dst, nClusters = 8, salt = "d2"))
    // thresholds are relative to the construction's own measured health
    // (4 sampled data-point centroids over 40 axis-spread vectors have no
    // absolute floor): at exactly the healthy minimum the policy is a
    // no-op — no new generation is even STAGED, the pointer never moves
    val healthyMin = observe(Generations.resolve(root, conf))
    assert(maintain(healthyMin).isEmpty)
    assert(Generations.history(root, conf) == Seq("gen-0"))
    // drift: region B appends into the live generation (the streaming
    // maintenance path — appends are in-place by that family's contract)
    assert(Search.appendIvfIndex(b, "vec_id", "embedding",
      Generations.resolve(root, conf)) == 40L)
    assert(observe(Generations.resolve(root, conf)) < healthyMin,
      "appending the orthogonal region must drag some cluster's mean down")
    def recallViaCatalog(): Double = {
      val queries = bRows.take(10)
      val hits = queries.map { case (qid, qv) =>
        val exact = all.filter(_._1 != qid)
          .map { case (id, w) => (id, cosRef(w, qv)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
        val got = Search.ivfTopKFromCatalog(spark, root, "embedding",
            qv, k = 6, nProbe = 1)
          .select("vec_id").collect().map(_.getLong(0))
          .filter(_ != qid).take(5).toSet
        exact.intersect(got).size.toDouble / 5.0
      }
      hits.sum / hits.size
    }
    val drifted = recallViaCatalog()
    // the drifted store trips the threshold: one call refreshes on the
    // current corpus, publishes atomically, and the CATALOG read path
    // picks the new generation up on its next resolve
    assert(maintain(healthyMin).contains("gen-1"))
    assert(Generations.resolve(root, conf).endsWith("gen-1"))
    assert(Search.readModelVersion(spark,
      Generations.resolve(root, conf)) == 1L)
    val refreshedMin = observe(Generations.resolve(root, conf))
    assert(refreshedMin > observe(g0),
      "the refreshed generation's worst cluster must beat the drifted one")
    val refreshed = recallViaCatalog()
    assert(refreshed > drifted,
      s"maintain should recover recall: drifted=$drifted refreshed=$refreshed")
    // healthy again: the next tick no-ops and the pointer stays
    assert(maintain(refreshedMin).isEmpty)
    assert(Generations.resolve(root, conf).endsWith("gen-1"))
    // vacuum stays a SEPARATE decision; the live generation keeps serving
    assert(Generations.vacuum(root, keep = 0, conf) == Seq("gen-0"))
    assert(recallViaCatalog() == refreshed)
  }

  test("maintainVectorIndex: an append landing mid-refresh refuses the publish (quiescence tripwire)") {
    import spark.implicits._
    import graft.sources.Generations
    val conf = spark.sparkContext.hadoopConfiguration
    val dim = 4
    def vec(id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.0f); a((id % dim).toInt) = 1.0f; a.toSeq
    }
    val a = (1L to 12L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val late = Seq((101L, vec(101L))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("mainttrip").toString
    val g0 = Generations.stage(root, conf)
    Search.writeIvfIndex(a, "embedding",
      Search.sampledCentroids(a, "vec_id", "embedding", 2, "t"), g0)
    Generations.publish(root, g0, conf)
    // threshold above any cosine → the tick always takes the refresh path;
    // the refresh closure simulates the race: a streaming append COMMITS
    // into the live generation while the retrain rebuilds from the
    // caller's corpus snapshot (which misses it)
    val err = intercept[IllegalArgumentException] {
      Search.maintainVectorIndex(spark, root, threshold = 2.0,
        observe = p => Search.minClusterSimilarity(spark, p, "embedding"),
        refresh = (src, dst) => {
          assert(Search.appendIvfIndex(late, "vec_id", "embedding", src) == 1L)
          Search.refreshIvfIndex(a, "vec_id", "embedding", src, dst,
            nClusters = 2, salt = "t2")
        })
    }
    assert(err.getMessage.contains("mid-refresh"))
    // the pointer never moved — the generation missing the append was
    // NOT published — and the live store still serves the late append
    assert(Generations.resolve(root, conf).endsWith("gen-0"))
    assert(spark.read.parquet(s"${Generations.resolve(root, conf)}/vectors")
      .where(col("vec_id") === 101L).count() == 1L)
    // the abandoned staged generation is vacuum's to reclaim
    assert(Generations.vacuum(root, keep = 0, conf) == Seq("gen-1"))
  }

  test("drift-stats sidecar: incremental totals equal the exact fixed-point recompute through write/append/replay/update/compact; staleness falls back and one append heals") {
    import spark.implicits._
    val dim = 6
    def v(id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.1f)
      a((id % dim).toInt) = 1.0f
      a(((id / dim) % dim).toInt) += 0.3f
      a.toSeq
    }
    val a = (1L to 25L).map(id => (id, v(id))).toDF("vec_id", "embedding")
    val b = (26L to 40L).map(id => (id, v(id))).toDF("vec_id", "embedding")
    val c = (41L to 50L).map(id => (id, v(id))).toDF("vec_id", "embedding")
    def sidecar(p: String): Option[Seq[(Int, Long, Long)]] =
      Search.ivfDriftStatsFromSidecar(spark, p).map(
        _.select(col("cluster_id").cast("int"), col("n"), col("sim_fp_sum"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq)
    def exact(p: String): Seq[(Int, Long, Long)] =
      Search.ivfDriftStatsExact(spark, p, "embedding")
        .select(col("cluster_id").cast("int"), col("n"), col("sim_fp_sum"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("driftsc").toString
    val cents = Search.sampledCentroids(a, "vec_id", "embedding", 3, "sc")
    Search.writeIvfIndex(a, "embedding", cents, dir)
    assert(sidecar(dir).contains(exact(dir)), "build must seed the sidecar")
    assert(Search.appendIvfIndex(b, "vec_id", "embedding", dir) == 15L)
    assert(sidecar(dir).contains(exact(dir)),
      "append's delta rows must sum to the recompute EXACTLY (fixed-point)")
    assert(Search.appendIvfIndex(b, "vec_id", "embedding", dir) == 0L)
    assert(sidecar(dir).contains(exact(dir)), "a pure replay changes nothing")
    val dir2 = java.nio.file.Files.createTempDirectory("driftsc2").toString
    Search.updateIvfIndex(spark, dir, dir2,
      retireIds = Seq(3L, 7L).toDF("vec_id"), refreshBatch = c,
      "vec_id", "embedding")
    assert(sidecar(dir2).contains(exact(dir2)),
      "update's read-back pass must seed the new store's sidecar")
    val dir3 = java.nio.file.Files.createTempDirectory("driftsc3").toString
    Search.compactIvfIndex(spark, dir2, dir3)
    assert(sidecar(dir3).contains(exact(dir3)),
      "compaction must carry the (content-identical) sidecar forward")
    // crash-window simulation: a vectors change the sidecar never saw —
    // duplicate one data file under a new name; the fingerprint moves, the
    // sidecar reads stale, and minClusterSimilarity serves the exact
    // fallback (which sees the duplicated rows) instead of the undercount
    val vdir = java.nio.file.Paths.get(dir3, "vectors")
    val part = java.nio.file.Files.walk(vdir)
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.copy(part,
      part.resolveSibling("part-zz-crashwindow.parquet"))
    assert(sidecar(dir3).isEmpty, "a changed listing must invalidate")
    val fallbackMin = Search.minClusterSimilarity(spark, dir3, "embedding")
    val exactRows = exact(dir3)
    val wantMin = exactRows
      .map { case (_, n, fp) => fp.toDouble / (n.toDouble * 1e9) }.min
    assert(fallbackMin == wantMin,
      "fallback and sidecar paths share the fixed-point formula bit-for-bit")
    // one append re-seeds (self-heal) and maintenance is incremental again
    val d = Seq((60L, v(60L))).toDF("vec_id", "embedding")
    assert(Search.appendIvfIndex(d, "vec_id", "embedding", dir3) == 1L)
    assert(sidecar(dir3).contains(exact(dir3)), "the next append heals")
    // removal does not carry the sidecar (no vecCol at that entry point):
    // absent → exact fallback, never a stale answer
    val dir4 = java.nio.file.Files.createTempDirectory("driftsc4").toString
    Search.removeFromIvfIndex(spark, dir3, dir4,
      Seq(10L).toDF("vec_id"), "vec_id")
    assert(sidecar(dir4).isEmpty)
    assert(Search.minClusterSimilarity(spark, dir4, "embedding") ==
      exact(dir4).map { case (_, n, fp) => fp.toDouble / (n.toDouble * 1e9) }.min)
  }

  test("maintainVectorIndex: a healthy tick is O(stats) — reads the sidecar, runs no vector-scanning job") {
    import spark.implicits._
    import graft.sources.Generations
    val conf = spark.sparkContext.hadoopConfiguration
    val dim = 4
    def vec(id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.0f); a((id % dim).toInt) = 1.0f; a.toSeq
    }
    val a = (1L to 20L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("maintstats").toString
    val g0 = Generations.stage(root, conf)
    Search.writeIvfIndex(a, "embedding",
      Search.sampledCentroids(a, "vec_id", "embedding", 2, "os"), g0)
    Generations.publish(root, g0, conf)
    var observed = Double.NaN
    def maintain() = Search.maintainVectorIndex(spark, root,
      threshold = -2.0, // below any cosine mean — every store is healthy
      observe = p => {
        observed = Search.minClusterSimilarity(spark, p, "embedding")
        observed
      },
      refresh = (_, _) => fail("a healthy tick must never reach the refresh"))
    val live = Generations.resolve(root, conf)
    val (verdict, statJobs) = countJobs(maintain())
    assert(verdict.isEmpty)
    val viaSidecar = observed
    // same tick with the sidecar invalidated: the observe VALUE is
    // bit-identical (both paths share the fixed-point formula) but the
    // cost is the full-store re-score the sidecar exists to avoid
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(live, "driftstats", "_valid"))
    val (verdict2, scanJobs) = countJobs(maintain())
    assert(verdict2.isEmpty)
    assert(observed == viaSidecar,
      "fallback and sidecar must observe the identical fixed-point value")
    assert(scanJobs > statJobs,
      s"fallback must cost more jobs than the sidecar ($scanJobs vs $statJobs)")
    Search.seedIvfDriftStats(spark, live, "embedding")
    // the hard proof of "no vector-scanning job": overwrite every vectors
    // data file IN PLACE with same-length garbage, restoring each file's
    // mtime — the (path, length, mtime) fingerprint still matches, so the
    // sidecar stays trusted, and ANY attempt to actually read a vector
    // would throw on the mangled parquet. The healthy tick must still
    // answer, bit-identically. (Restoring mtime is the point: the
    // fingerprint is a listing-metadata cache key, and this simulates the
    // one change no listing can see.)
    java.nio.file.Files.walk(java.nio.file.Paths.get(live, "vectors"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .forEach { p =>
        val len = java.nio.file.Files.size(p).toInt
        val mtime = java.nio.file.Files.getLastModifiedTime(p)
        java.nio.file.Files.write(p, Array.fill[Byte](len)('x'.toByte))
        java.nio.file.Files.setLastModifiedTime(p, mtime)
        ()
      }
    assert(maintain().isEmpty)
    assert(observed == viaSidecar,
      "a healthy tick on the mangled store proves zero vector bytes read")
    assertThrows[org.apache.spark.SparkException](
      Search.ivfDriftStatsExact(spark, live, "embedding").collect())
  }

  test("drift-stats sidecar: a same-name same-length in-place rewrite is distrusted (mtime in the fingerprint — ADVICE r16)") {
    import spark.implicits._
    val dim = 4
    def v(id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.0f); a((id % dim).toInt) = 1.0f; a.toSeq
    }
    val a = (1L to 16L).map(id => (id, v(id))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("driftmt").toString
    Search.writeIvfIndex(a, "embedding",
      Search.sampledCentroids(a, "vec_id", "embedding", 2, "mt"), dir)
    assert(Search.ivfDriftStatsFromSidecar(spark, dir).nonEmpty)
    // an external restore/rewrite that preserves every name and length
    // but not the modification stamp: rewrite one data file with its own
    // bytes and bump mtime — the sidecar must read STALE (fall back),
    // never serve statistics for content it cannot vouch for
    val part = java.nio.file.Files.walk(
        java.nio.file.Paths.get(dir, "vectors"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(part)
    val old = java.nio.file.Files.getLastModifiedTime(part)
    java.nio.file.Files.write(part, bytes)
    java.nio.file.Files.setLastModifiedTime(part,
      java.nio.file.attribute.FileTime.fromMillis(old.toMillis + 2000))
    assert(Search.ivfDriftStatsFromSidecar(spark, dir).isEmpty,
      "a changed mtime must invalidate the fingerprint")
  }

  test("drift-stats seed: a vectors row whose cluster_id is missing from the centroids sidecar refuses loudly (ADVICE r16)") {
    import spark.implicits._
    val dim = 4
    def v(id: Long): Seq[Float] = {
      val a = Array.fill(dim)(0.0f); a((id % dim).toInt) = 1.0f; a.toSeq
    }
    val a = (1L to 12L).map(id => (id, v(id))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("driftorphan").toString
    Search.writeIvfIndex(a, "embedding",
      Search.sampledCentroids(a, "vec_id", "embedding", 2, "or"), dir)
    // corrupt the store: append a vectors row under a cluster_id no
    // centroid knows — the seed's inner join would silently drop it
    Seq((99L, v(99L))).toDF("vec_id", "embedding")
      .withColumn("cluster_id", lit(7777))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cluster_id").parquet(s"$dir/vectors")
    val err = intercept[IllegalArgumentException](
      Search.seedIvfDriftStats(spark, dir, "embedding"))
    assert(err.getMessage.contains("missing from the centroids sidecar"))
    // and the sidecar was NOT certified for the corrupt content: the
    // append moved the fingerprint, so the reader falls back
    assert(Search.ivfDriftStatsFromSidecar(spark, dir).isEmpty)
  }

  // ---- Catalyst plan assertions (SURVEY.md §4.2: asserted, not built)

  test("mmrRerank: λ=1 is pure relevance; diversity demotes a planted near-duplicate") {
    import spark.implicits._
    // candidates for one query: a is most relevant; a2 is a near-copy of a
    // with the second-best rel; b is less relevant but orthogonal.
    val cands = Seq(
      (1L, 10L, Array(1f, 0f, 0f), 0.95),      // a
      (1L, 11L, Array(0.99f, 0.1f, 0f), 0.94), // a2 ≈ a
      (1L, 12L, Array(0f, 1f, 0f), 0.60),      // b ⊥ a
      (1L, 13L, Array(0f, 0.9f, 0.4f), 0.55)
    ).toDF("qid", "id", "vec", "rel")
    val relOnly = Search.mmrRerank(cands, "qid", "id", "vec", "rel", k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect()
    assert(relOnly.toSeq === Seq(10L, 11L, 12L)) // rel order untouched
    val diverse = Search.mmrRerank(cands, "qid", "id", "vec", "rel", k = 3, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect()
    // after picking a, the near-copy a2's penalty (~0.99) sinks it below b
    assert(diverse.toSeq === Seq(10L, 12L, 11L) || diverse.toSeq === Seq(10L, 12L, 13L),
      s"near-duplicate should be demoted, got ${diverse.toSeq}")
    assert(diverse.head === 10L, "first pick must be the relevance argmax")
  }

  test("property: mmrRerank scores are non-increasing; first pick is the relevance argmax") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    // NON-NEGATIVE orthant: monotone pick-scores are only an invariant
    // when pairwise sims are ≥ 0 — with negative sims the unclamped
    // diversity BONUS can raise a later pick's score (by design; the
    // anti-similar case is covered in its own test below)
    val cand = for {
      id <- Gen.chooseNum(1L, 1000L)
      v <- Gen.listOfN(4, Gen.chooseNum(0, 5).map(_.toFloat))
      rel <- Gen.chooseNum(0, 1000).map(_ / 1000.0)
    } yield (1L, id, v.toArray, rel)
    // forAllNoShrink: the structural tuple shrinker would mutate the fixed
    // query id and mix groups, breaking the single-query invariant
    checkProp(Prop.forAllNoShrink(Gen.listOfN(8, cand)) { cs0 =>
      val cs = cs0.distinctBy(_._2).map(c => c.copy(_1 = 1L))
      if (cs.size < 2) true else {
        val df = cs.toDF("qid", "id", "vec", "rel")
        val out = Search.mmrRerank(df, "qid", "id", "vec", "rel",
            k = cs.size, lambda = 0.6)
          .orderBy("rank").as[(Long, Int, Long, Double)].collect()
        val scores = out.map(_._4)
        val monotone = scores.zip(scores.tail).forall { case (a, b) => a >= b }
        val bestRel = cs.map(_._4).max
        monotone && math.abs(out.head._4 - 0.6 * bestRel) < 1e-12
      }
    }, minTests = 15)
  }

  test("mmrRerank: anti-similar candidates earn a bonus (no clamp at 0); k caps at n") {
    import spark.implicits._
    val cands = Seq(
      (7L, 1L, Array(1f, 0f), 0.9),
      (7L, 2L, Array(-1f, 0.01f), 0.2), // anti-similar to pick 1 → negative penalty
      (7L, 3L, Array(0.9f, 0.1f), 0.3)
    ).toDF("qid", "id", "vec", "rel")
    val out = Search.mmrRerank(cands, "qid", "id", "vec", "rel", k = 10, lambda = 0.5)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    assert(out.length === 3, "k beyond candidate count returns all candidates")
    assert(out.map(_._3).toSeq === Seq(1L, 2L, 3L),
      "negative max-sim must ADD to the anti-similar candidate's score")
    val s2 = out(1)._4 // 0.5*0.2 - 0.5*cos(v2,v1) with cos ≈ -1 → ≈ 0.6
    assert(s2 > 0.5, s"anti-similar bonus missing: $s2")
  }

  test("seededLshPairs: pinned hash family, data-order determinism, band-join plan") {
    import spark.implicits._
    // the hash family is pinned by md5 parity — golden values so a hashing
    // change can never slip through silently (the oracle twin generates its
    // weight table from the same function)
    assert(Search.seededLshWeight(0, 0, 0) === 1)
    assert(Search.seededLshWeight(0, 0, 1) === -1)
    assert(Search.seededLshWeight(1, 4, 10) === 1)
    assert(Search.seededLshWeight(3, 7, 63) === -1)
    val dim = 16
    def vec(seed: Int, bump: Float = 0f): Array[Float] =
      Array.tabulate(dim)(i => math.sin(seed * 31 + i).toFloat + (if (i == 0) bump else 0f))
    // planted near-identical pair (1,2) + unrelated vectors
    val rows = Seq(
      (1L, vec(1)), (2L, vec(1, 0.01f)),
      (3L, vec(7)), (4L, vec(13)), (5L, vec(29))).toDF("id", "v")
    val pairs = Search.seededLshPairs(rows, "id", "v", dim,
      numTables = 4, bitsPerTable = 6, simThreshold = 0.9)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"planted near-dup must collide, got $got")
    // determinism under a different physical layout (the MLlib tier's
    // data-order dependence is exactly what this operator removes)
    val reshuffled = Search.seededLshPairs(rows.repartition(7), "id", "v", dim,
      numTables = 4, bitsPerTable = 6, simThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reshuffled === got)
    // candidate generation is a band equi-join, never a cartesian pair scan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan.take(800))
  }

  test("seededLshIndex: build(A)+append(B) ≡ full build ≡ in-memory pairs; replay no-op; guards") {
    val dim = 64
    val a = emb.where(col("vec_id") < 250)
    val b = emb.where(col("vec_id") >= 250)
    val incDir = java.nio.file.Files.createTempDirectory("slshinc").toString + "/ix"
    val fullDir = java.nio.file.Files.createTempDirectory("slshfull").toString + "/ix"
    Search.writeSeededLshIndex(a, "vec_id", "embedding", dim, incDir,
      numTables = 4, bitsPerTable = 8)
    assert(Search.appendSeededLshIndex(b, "vec_id", "embedding", incDir) === b.count())
    Search.writeSeededLshIndex(emb, "vec_id", "embedding", dim, fullDir,
      numTables = 4, bitsPerTable = 8)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = pairSet(Search.seededLshPairsFromIndex(spark, incDir, 0.3))
    val full = pairSet(Search.seededLshPairsFromIndex(spark, fullDir, 0.3))
    val mem = pairSet(Search.seededLshPairs(emb, "vec_id", "embedding", dim,
      numTables = 4, bitsPerTable = 8, simThreshold = 0.3))
    assert(inc === full, "incremental index must equal the full build")
    assert(inc === mem, "persisted read path must equal the in-memory operator")
    assert(inc.nonEmpty, "fixture must actually produce near-dup pairs")
    // replaying the same batch appends nothing (codes id anti-join)
    assert(Search.appendSeededLshIndex(b, "vec_id", "embedding", incDir) === 0L)
    assert(spark.read.parquet(s"$incDir/codes").count() === emb.count())
    // crash-retry shape: orphan band rows (bands landed, codes did not)
    // are absorbed by the read path's pair dedup after the retry
    val orphanBatch = b.limit(7)
    // simulate: re-append bands for existing ids directly (duplicates)
    spark.read.parquet(s"$incDir/bands")
      .join(orphanBatch.select(col("vec_id").as("id")), "id").limit(50)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("t").parquet(s"$incDir/bands")
    assert(pairSet(Search.seededLshPairsFromIndex(spark, incDir, 0.3)) === full,
      "duplicated band rows must not change the verified pair set")
    // guard: appending into a missing index fails fast
    intercept[IllegalArgumentException] {
      Search.appendSeededLshIndex(b, "vec_id", "embedding",
        java.nio.file.Files.createTempDirectory("slshnone").toString + "/ix")
    }
    // deletion ≡ fresh build of the survivors (the removeFromTextIndex
    // contract), orphan band rows compacted away by the rewrite
    import spark.implicits._
    val gone = (0L until 100L).toDF("vec_id")
    val prunedDir = java.nio.file.Files.createTempDirectory("slshrm").toString + "/ix"
    val survivors = Search.removeFromSeededLshIndex(
      spark, incDir, prunedDir, gone, "vec_id")
    assert(survivors === emb.count() - 100)
    val freshDir = java.nio.file.Files.createTempDirectory("slshfr").toString + "/ix"
    Search.writeSeededLshIndex(emb.where(col("vec_id") >= 100),
      "vec_id", "embedding", dim, freshDir, numTables = 4, bitsPerTable = 8)
    assert(pairSet(Search.seededLshPairsFromIndex(spark, prunedDir, 0.3)) ===
      pairSet(Search.seededLshPairsFromIndex(spark, freshDir, 0.3)),
      "pruned index must equal a fresh build of the survivors")
    intercept[IllegalArgumentException](
      Search.removeFromSeededLshIndex(spark, incDir, incDir, gone, "vec_id"))
    // online lookup: querying the corpus itself against the index must
    // reproduce the pair set exactly — every (id1, id2) pair appears as
    // BOTH lookup directions, plus a cosine-1 self-match per vector
    val looked = Search.seededLshLookup(emb, "vec_id", "embedding", incDir, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val selfs = looked.filter(t => t._1 == t._2)
    assert(selfs.length === vecs.size, "every indexed vector self-matches")
    // sqrt(x)·sqrt(x) is not exactly x in floats, so the milli-floored
    // self-cosine may land on 999
    assert(selfs.forall(_._3 >= 999.0), "self-match cosine must be ~1")
    val cross = looked.filter(t => t._1 < t._2).map(t => (t._1, t._2, t._3)).toSet
    assert(cross === full, "lookup of the corpus must reproduce the pair set")
    val reverse = looked.filter(t => t._1 > t._2).map(t => (t._2, t._1, t._3)).toSet
    assert(reverse === full, "lookup is direction-symmetric")
  }

  test("seededLshIndex: conflicting vectors for one id refuse loudly; exact dups collapse") {
    // ADVICE r7: dropDuplicates(id) kept an ARBITRARY row for an id that
    // appears twice with different vectors — the persisted codes/bands
    // became retry/partitioning-dependent. Exact duplicate ROWS are fine
    // (collapse is deterministic); conflicting vectors must throw.
    import spark.implicits._
    def vec(seed: Int, eps: Float = 0f) =
      Array.tabulate(64)(i => (math.sin(seed * 31 + i) + eps).toFloat)
    val dir = java.nio.file.Files.createTempDirectory("slshdup").toString + "/ix"
    Search.writeSeededLshIndex(Seq((1L, vec(1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 64, dir, numTables = 2, bitsPerTable = 6)
    // same id, same vector, twice: deterministic collapse, one append
    assert(Search.appendSeededLshIndex(
      Seq((2L, vec(2)), (2L, vec(2))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir) === 1L)
    // same id, DIFFERENT vectors: loud refusal, nothing written
    val before = spark.read.parquet(s"$dir/codes").count()
    intercept[IllegalArgumentException] {
      Search.appendSeededLshIndex(
        Seq((3L, vec(3)), (3L, vec(3, 0.5f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dir)
    }
    assert(spark.read.parquet(s"$dir/codes").count() === before,
      "a refused batch must not have appended codes")
  }

  // ------------------------------------------ residual IVF-PQ (IVFADC) ---

  /** floor(x·127 + 0.5) — the driver twin of VectorFunctions.fpCodes. */
  private def fpRef(v: Seq[Float]): Array[Double] =
    v.map(x => math.floor(x.toDouble * 127.0 + 0.5)).toArray

  /** Nearest-centroid id, max cosine, ties to LOWEST cid (ivfAssign). */
  private def assignRef(v: Seq[Float], cents: Seq[(Int, Array[Float])]): Int =
    cents.map { case (cid, c) => (cosRef(c.toSeq, v), cid) }
      .sortBy { case (s, cid) => (-s, cid) }.head._2

  /** Residual PQ encode, driver-side: per subspace, argmin of
    * c·c − 2·(sub·c) over the codebook (ties → lowest j) — pqEncodeCol's
    * documented rule applied to the fixed-point residual.
    */
  private def residualEncodeRef(res: Array[Double],
      cb: Search.PqCodebooks): Seq[Int] =
    (0 until cb.m).map { s =>
      val sub = res.slice(s * cb.subdim, (s + 1) * cb.subdim)
      cb.centers(s).zipWithIndex.map { case (c, j) =>
        val cNorm = c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x)
        val ip = sub.zip(c).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
        (cNorm - 2.0 * ip, j)
      }.min._2
    }

  test("residual IVF-PQ: encode ≡ driver reference; ADC ≡ exact fixed-point inner product; marker refusals both ways") {
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val cb = Search.pqResidualSampledCodebooks(emb, "vec_id", "embedding",
      centroids, 64, 8, 16)
    val corpus = emb.where(col("vec_id") =!= 0)
    val resDir = java.nio.file.Files.createTempDirectory("ivfpqres").toString
    Search.writeIvfPqResidualIndex(corpus, "vec_id", "embedding",
      centroids, cb, resDir)
    // layout: marker sidecar present, parents' sidecar readers work
    assert(spark.read.parquet(s"$resDir/encoding").head().getString(0)
      === "fp_residual")
    assert(Search.readIvfCentroids(spark, resDir).map(_._1) == (0 until 8))
    assert(Search.readPqCodebooks(spark, resDir).centers.flatten.map(_.toSeq)
      == cb.centers.flatten.map(_.toSeq))
    // stored (cluster, codes) ≡ the driver reference for EVERY vector:
    // fp residual against the assigned centroid, argmin-L2 encode
    val centFp = centroids.map { case (cid, c) => cid -> fpRef(c.toSeq) }.toMap
    val stored = spark.read.parquet(s"$resDir/codes")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster_id"),
          r.getSeq[Byte](r.fieldIndex("pq_codes")).map(_.toInt).toSeq)).toMap
    assert(stored.size === vecs.size - 1)
    vecs.filter(_._1 != 0L).foreach { case (id, v) =>
      val cid = assignRef(v, centroids)
      val res = fpRef(v).zip(centFp(cid)).map { case (a, b) => a - b }
      assert(stored(id) === ((cid, residualEncodeRef(res, cb))),
        s"encode mismatch for vec_id=$id")
    }
    // the ADC candidate score is EXACTLY fp(q)·(fp(c) + r̂) — the
    // decomposition the tier documents (ADVICE r12: a query-residual
    // table set would add a spurious −fp(c)·r̂ bias)
    val q = vecs(1L)
    val qFp = fpRef(q)
    val got = Search.ivfPqResidualAdcScores(spark, resDir, "vec_id", q, nProbe = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("_adc")).toMap
    val probed = Search.probeClusters(centroids, q, 4).toSet
    val wantIds = stored.filter { case (_, (cid, _)) => probed(cid) }.keySet
    assert(got.keySet === wantIds, "ADC stage must cover exactly the probed clusters")
    got.foreach { case (id, adc) =>
      val (cid, codes) = stored(id)
      val rhat = (0 until cb.m).flatMap(s => cb.centers(s)(codes(s)).map(_.toDouble))
      val vhat = centFp(cid).zip(rhat).map { case (a, b) => a + b }
      val want = qFp.zip(vhat).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
      assert(adc === want, s"ADC score for vec_id=$id: got $adc want $want")
    }
    // marker refusals, both directions: a residual store refuses every
    // plain-family op; a plain store refuses every residual-family op
    val plainDir = java.nio.file.Files.createTempDirectory("ivfpqplain").toString
    val plainCb = Search.pqSampledCodebooks(emb, "vec_id", "embedding", 64, 8, 16)
    Search.writeIvfPqIndex(corpus, "vec_id", "embedding", centroids, plainCb, plainDir)
    val someIds = corpus.limit(5).select("vec_id")
    def tmp() = java.nio.file.Files.createTempDirectory("ivfpqx").toString
    intercept[IllegalArgumentException](Search.ivfPqTopKFromIndex(
      spark, resDir, corpus, "vec_id", "embedding", q, 5))
    intercept[IllegalArgumentException](Search.appendIvfPqIndex(
      corpus, "vec_id", "embedding", resDir))
    intercept[IllegalArgumentException](Search.removeFromIvfPqIndex(
      spark, resDir, tmp(), someIds, "vec_id"))
    intercept[IllegalArgumentException](Search.updateIvfPqIndex(
      spark, resDir, tmp(), someIds, corpus.limit(3), "vec_id", "embedding"))
    intercept[IllegalArgumentException](Search.ivfPqResidualTopKFromIndex(
      spark, plainDir, corpus, "vec_id", "embedding", q, 5))
    intercept[IllegalArgumentException](Search.appendIvfPqResidualIndex(
      corpus, "vec_id", "embedding", plainDir))
    intercept[IllegalArgumentException](Search.removeFromIvfPqResidualIndex(
      spark, plainDir, tmp(), someIds, "vec_id"))
    intercept[IllegalArgumentException](Search.updateIvfPqResidualIndex(
      spark, plainDir, tmp(), someIds, corpus.limit(3), "vec_id", "embedding"))
    // and the tested plain family still ACCEPTS its own stores after the
    // marker check landed (the regression the judge warned about)
    assert(Search.ivfPqTopKFromIndex(spark, plainDir, corpus, "vec_id",
      "embedding", q, 5).count() === 5L)
  }

  test("residual IVF-PQ CRUD: appends idempotent; remove/update ≡ fresh build; ranking differs from plain") {
    import spark.implicits._
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val cb = Search.pqResidualSampledCodebooks(emb, "vec_id", "embedding",
      centroids, 64, 8, 16)
    val corpus = emb.where(col("vec_id") =!= 0).select("vec_id", "embedding")
    def dir(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    def codeSet(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster_id"),
        r.getSeq[Byte](r.fieldIndex("pq_codes")).toSeq)).toSet
    // build(A)+append(B) ≡ build(A∪B); replay no-op; missing index refuses
    val full = dir("res-full"); val inc = dir("res-inc")
    Search.writeIvfPqResidualIndex(corpus, "vec_id", "embedding", centroids, cb, full)
    val a = corpus.where(col("vec_id") < 250)
    val b = corpus.where(col("vec_id") >= 250)
    Search.writeIvfPqResidualIndex(a, "vec_id", "embedding", centroids, cb, inc)
    assert(Search.appendIvfPqResidualIndex(b, "vec_id", "embedding", inc) === b.count())
    assert(codeSet(inc) === codeSet(full))
    assert(Search.appendIvfPqResidualIndex(b, "vec_id", "embedding", inc) === 0L)
    intercept[IllegalArgumentException](Search.appendIvfPqResidualIndex(
      b, "vec_id", "embedding", dir("res-none")))
    // remove ≡ fresh build of survivors (marker sidecar rides along)
    val keep = corpus.where(col("vec_id") % 5 =!= 0)
    val dropIds = corpus.where(col("vec_id") % 5 === 0).select("vec_id")
    val rmDst = dir("res-rm"); val rmFresh = dir("res-rmf")
    assert(Search.removeFromIvfPqResidualIndex(spark, full, rmDst, dropIds,
      "vec_id") === keep.count())
    Search.writeIvfPqResidualIndex(keep, "vec_id", "embedding", centroids, cb, rmFresh)
    assert(codeSet(rmDst) === codeSet(rmFresh))
    assert(spark.read.parquet(s"$rmDst/encoding").head().getString(0) === "fp_residual")
    // fused update ≡ fresh build of v2 (row-identical stores)
    val retire = corpus.where(col("vec_id") % 5 === 0).select("vec_id")
    val changed = corpus.where(col("vec_id") % 5 =!= 0 && col("vec_id") % 7 === 1)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val added = corpus.where(col("vec_id") % 11 === 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val refresh = changed.unionByName(added)
    val v2 = corpus.where(col("vec_id") % 5 =!= 0 && col("vec_id") % 7 =!= 1)
      .unionByName(changed).unionByName(added)
    val upd = dir("res-upd"); val updFresh = dir("res-updf")
    assert(Search.updateIvfPqResidualIndex(spark, full, upd, retire, refresh,
      "vec_id", "embedding") === v2.count())
    Search.writeIvfPqResidualIndex(v2, "vec_id", "embedding", centroids, cb, updFresh)
    assert(codeSet(upd) === codeSet(updFresh))
    intercept[IllegalArgumentException](Search.updateIvfPqResidualIndex(
      spark, full, full, retire, refresh, "vec_id", "embedding"))
    // the residual tier is NOT the plain tier: same bytes (m=8, ksub=16),
    // same probes, same tight rescore — different candidate ranking for
    // some query (fp-exact inner-product ADC vs scale-free i8 directions)
    val plainCb = Search.pqSampledCodebooks(emb, "vec_id", "embedding", 64, 8, 16)
    val plainDir = dir("res-vs-plain")
    Search.writeIvfPqIndex(corpus, "vec_id", "embedding", centroids, plainCb, plainDir)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    val differs = Seq(1L, 2L, 3L, 11L, 13L).exists { qid =>
      val qv = vecs(qid)
      ids(Search.ivfPqResidualTopKFromIndex(spark, full, corpus, "vec_id",
        "embedding", qv, k = 10, nProbe = 8, rescore = 10)) !=
        ids(Search.ivfPqTopKFromIndex(spark, plainDir, corpus, "vec_id",
          "embedding", qv, k = 10, nProbe = 8, rescore = 10))
    }
    assert(differs, "residual and plain tiers must not be the same ranking")
  }

  test("residual IVF-PQ recall gate: residual ≥ plain at tight rescore at equal bytes") {
    // The property the tier exists for (Jégou et al. 2011 §IV): residual
    // energy is a fraction of vector energy, so the same m=8×ksub=16
    // bytes quantize finer and the ranking loss the plain tier absorbs
    // only under a generous rescore shrinks. RecallBench sf0.1 (r13,
    // frozen in BASELINE): residual beats plain at EVERY grid point —
    // np4/r20 0.356 vs 0.334, np32/r50 0.574 vs 0.490. This gate holds
    // the same ordering on the spec fixture at full probe (isolating the
    // encoding difference from probe selection) plus absolute floors.
    val k = 10
    val centroids = (0 until 8).map(i => i -> vecs(i.toLong).toArray)
    val cbP = Search.pqTrainCodebooks(emb, "embedding", 64, 8, 16, seed = 42L)
    val cbR = Search.pqResidualTrainCodebooks(emb, "vec_id", "embedding",
      centroids, 64, 8, 16, seed = 42L)
    def dir(tag: String) = java.nio.file.Files.createTempDirectory(tag).toString
    val plainDir = dir("rg-plain"); val resDir = dir("rg-res")
    Search.writeIvfPqIndex(emb, "vec_id", "embedding", centroids, cbP, plainDir)
    Search.writeIvfPqResidualIndex(emb, "vec_id", "embedding", centroids, cbR, resDir)
    val queries = emb.orderBy("vec_id").limit(25)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val exact: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
      qid -> vecs.toSeq
        .map { case (id, v) => (id, cosRef(v, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    }.toMap
    def recall(path: String, residual: Boolean, rescore: Int): Double = {
      val hs = queries.map { case (qid, qv) =>
        val got = (if (residual)
            Search.ivfPqResidualTopKFromIndex(spark, path, emb, "vec_id",
              "embedding", qv, k, nProbe = 8, rescore = rescore)
          else Search.ivfPqTopKFromIndex(spark, path, emb, "vec_id",
              "embedding", qv, k, nProbe = 8, rescore = rescore))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact(qid).count(got.contains).toDouble / exact(qid).size
      }
      hs.sum / hs.size
    }
    val (p20, p50) = (recall(plainDir, residual = false, 20),
      recall(plainDir, residual = false, 50))
    val (r20, r50) = (recall(resDir, residual = true, 20),
      recall(resDir, residual = true, 50))
    assert(r20 >= p20 - 0.02, s"residual must not lose to plain at rescore=20: $r20 < $p20")
    assert(r50 >= p50 - 0.02, s"residual must not lose to plain at rescore=50: $r50 < $p50")
    assert(r50 >= r20 - 0.02, s"residual recall must not fall as rescore grows: $r50 < $r20")
    // absolute floors, frozen from the first gate run on this fixture
    assert(r20 >= 0.48, s"residual rescore=20 recall regressed: $r20")
    assert(r50 >= 0.60, s"residual rescore=50 recall regressed: $r50")
  }

  test("broadcast hint produces BroadcastHashJoin in the 3-way dim join") {
    val plan = Queries.q03RegionCustomers(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("parquet scan gets filter pushdown and column pruning") {
    val df = Tables.lineitem(spark, sf001)
      .where(col("l_quantity") > 49.0)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]"),
      scan.take(1200))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      scan.take(1200))
  }

  test("whole-stage codegen covers the clean/chunk expression chain") {
    val df = Queries.q13FixedChunker(spark, sf001)
    df.collect() // AQE only finalizes codegen spans in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render as "*(n) Op" in the final plan string
    assert(plan.contains("*(1)"), plan.take(800))
  }
}
