package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup

/** TEMPORARY round-19 optimization profiling main — NOT part of the
  * driver contract; times sub-stages of the heavy probes in isolation so
  * the optimization targets are picked from numbers, not guesses
  * (guide §1). Deleted before the round freezes.
  */
object OptProfile {
  def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }

  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 97)").collect()

    val what = args.headOption.getOrElse("all")
    val reps = sys.env.getOrElse("PROF_REPS", "2").toInt

    def rep(label: String)(f: => Unit): Unit =
      (1 to reps).foreach { i =>
        spark.sharedState.cacheManager.clearCache(); System.gc()
        t(s"$label#$i")(f)
      }

    // ---- q43 legs ----
    if (what == "all" || what == "q43") {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      rep("q43.exact-leg") {
        val exact = emb.as("a")
          .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
          .where(VectorFunctions.l2Distance(
            col("a.embedding"), col("b.embedding")) <= 1.18)
          .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
        println("exact=" + exact.count())
      }
      rep("q43.lsh-leg") {
        val lsh = new graft.operators.Search.LshIndex(
          bucketLength = 0.5, numTables = 3, seed = 42L)
          .approxPairs(emb, "vec_id", "embedding", maxL2Dist = 1.18)
        println("lsh=" + lsh.count())
      }
      rep("q43.full")(noop(Queries.q43LshAnn(spark, dir)))
    }

    def docsWithNearDups(s: SparkSession, d: String) = {
      val base = s.read.parquet(s"$d/documents.parquet")
        .where(col("doc_id") < 60).select(col("doc_id"), col("text"))
      base.unionByName(base.select((col("doc_id") + 100000).as("doc_id"),
        substring(col("text"), 1, 300).as("text")))
    }

    // ---- q48 stages ----
    if (what == "all" || what == "q48") {
      val docs = docsWithNearDups(spark, dir)
        .withColumn("toks", TextFunctions.wordTokens(col("text")))
      rep("q48.minhash-pairs") {
        val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "toks",
          shingleN = 3, numHashes = 12, numBands = 4, threshold = 0.4)
        println("pairs=" + pairs.count())
      }
      rep("q48.full")(noop(Queries.q48NeardupClusters(spark, dir)))
    }

    // ---- minhash sub-stages ----
    if (what == "all" || what == "minhash") {
      val docs = docsWithNearDups(spark, dir)
        .withColumn("toks", TextFunctions.wordTokens(col("text")))
      rep("minhash.shingle-only") {
        val sh = docs.select(col("doc_id"),
          TextFunctions.shingles(col("toks"), 3).as("sh0"))
          .where(size(col("sh0")) > 0)
        noop(sh.select(col("doc_id"), size(col("sh0")).as("n")))
      }
      rep("minhash.sig+shl") {
        val sh = docs.select(col("doc_id"),
          TextFunctions.shingles(col("toks"), 3).as("sh0"))
          .where(size(col("sh0")) > 0)
          .select(col("doc_id"),
            Dedup.minhashSignature(col("sh0"), 12).as("sig"),
            transform(col("sh0"), s =>
              conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("shl"))
        noop(sh.select(col("doc_id"), size(col("sig")).as("a"), size(col("shl")).as("b")))
      }
    }

    // ---- resolveClusters alone ----
    if (what == "all" || what == "resolve") {
      val docs = docsWithNearDups(spark, dir)
        .withColumn("toks", TextFunctions.wordTokens(col("text")))
      val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "toks",
        shingleN = 3, numHashes = 12, numBands = 4, threshold = 0.4)
      println("pairs=" + pairs.count())
      rep("resolveClusters")(noop(Dedup.resolveClusters(pairs)))
    }

    // ---- weights fold sequence (q157 core) ----
    if (what == "q157" || what == "all") {
      rep("q157.full")(noop(Queries.q157StreamingSoftDedupWeights(spark, dir)))
    }
    if (what == "q160") {
      rep("q160.full")(noop(Queries.q160CurationPipeline(spark, dir)))
    }

    // ---- q160 stage timings (replicates the probe body) ----
    if (what == "q160stages") {
      import graft.operators.{CheckpointStrategy, LmScore, Ranks, Sampling}
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      (1 to reps).foreach { r =>
        spark.sharedState.cacheManager.clearCache(); System.gc()
        val base = docs0.select(col("doc_id"), col("lang"),
          regexp_replace(col("text"), " (table|row) ", "\n").as("text"))
        val digitWords = typedLit(Map(
          "0" -> "the", "1" -> "row", "2" -> "key", "3" -> "data", "4" -> "join",
          "5" -> "sort", "6" -> "fast", "7" -> "line", "8" -> "hash",
          "9" -> "group"))
        def plantCopy(off: Int) = {
          val idStr = (col("doc_id") + off).cast("string")
          val mk = concat((1 to 6).map(k =>
            concat(element_at(digitWords, substring(idStr, k, 1)), lit(" "))): _*)
          docs0.where(col("doc_id") < 60)
            .select((col("doc_id") + off).as("doc_id"), col("lang"),
              concat(mk, regexp_replace(
                regexp_replace(col("text"), " (table|row) ", "\n"),
                lit("\n"), concat(lit("\n"), mk))).as("text"))
        }
        val planted = plantCopy(100000).unionByName(plantCopy(200000))
        var corpus: org.apache.spark.sql.DataFrame = null
        t(s"q160.s1-gopher#$r") {
          corpus = CheckpointStrategy.materialize(
            base.unionByName(planted)
              .withColumn("toks", TextFunctions.wordTokens(col("text")))
              .withColumn("gopher_pass",
                graft.functions.TextAnalysis.gopherRulesPass(col("text"), col("toks")))
              .drop("toks"),
            CheckpointStrategy.Local)
        }
        var scored: org.apache.spark.sql.DataFrame = null
        t(s"q160.s2-lm-train+score#$r") {
          val model = LmScore.trainTrigramModel(
            corpus.where(col("doc_id") >= 100 && col("doc_id") < 100000), col("text"))
          scored = CheckpointStrategy.materialize(
            LmScore.scoreDocs(corpus.where(col("gopher_pass")), "doc_id",
                col("text"), model)
              .select(col("id").as("doc_id"), col("avg_logp")),
            CheckpointStrategy.Local)
        }
        var lmKept: org.apache.spark.sql.DataFrame = null
        t(s"q160.s2b-rank#$r") {
          val total = scored.agg(count(lit(1)).as("_m"))
          lmKept = CheckpointStrategy.materialize(
            Ranks.globalRank(scored,
                Seq(col("avg_logp").desc, col("doc_id").asc), "rnk")
              .crossJoin(broadcast(total))
              .where(col("rnk") * 2 <= col("_m") + 1)
              .select(col("doc_id")),
            CheckpointStrategy.Local)
        }
        var rebuilt: org.apache.spark.sql.DataFrame = null
        t(s"q160.s3-linededup#$r") {
          rebuilt = CheckpointStrategy.materialize(
            Dedup.dedupLinesAcrossCorpus(
                corpus.join(lmKept, Seq("doc_id"), "left_semi")
                  .select(col("doc_id"), col("text")), "doc_id", "text")
              .where(col("n_kept") > 0)
              .select(col("doc_id"), col("text")),
            CheckpointStrategy.Local)
        }
        val s3 = rebuilt
          .join(corpus.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .withColumn("toks", TextFunctions.wordTokens(col("text")))
          .withColumn("n_tok", size(col("toks")).cast("long"))
        var weights: org.apache.spark.sql.DataFrame = null
        t(s"q160.s4-weights#$r") {
          val pairs = Dedup.minhashNearDupPairs(s3, "doc_id", "toks",
            shingleN = 3, numHashes = 12, numBands = 4, threshold = 0.3)
          weights = Dedup.softDedupWeights(
            s3.select(col("doc_id")), "doc_id", pairs)
          weights.write.format("noop").mode("overwrite").save()
        }
        t(s"q160.s5-contam#$r") {
          val bench = base.where(col("doc_id") < 5)
            .select(TextFunctions.wordTokens(col("text")).as("toks"))
          val contam = Dedup.contaminationScores(
              s3.select(col("doc_id"), col("toks")), "doc_id", "toks",
              bench, "toks", n = 8)
          contam.write.format("noop").mode("overwrite").save()
        }
      }
    }

    // ---- q162 catalog lifecycle, step by step ----
    if (what == "q162") {
      import graft.operators.Search
      import graft.sources.Generations
      import spark.implicits._
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"), col("label"))
      val corpus = emb.where(col("vec_id") =!= 0)
      val hconf = spark.sparkContext.hadoopConfiguration
      (1 to reps).foreach { r =>
        spark.sharedState.cacheManager.clearCache(); System.gc()
        val root = java.nio.file.Files.createTempDirectory(s"prof162_$r").toString
        val g0 = Generations.stage(root, hconf)
        var cb: Search.PqCodebooks = null
        t(s"q162.codebooks#$r") {
          cb = Search.pqSampledCodebooks(emb, "vec_id", "embedding",
            dim = 64, m = 8, ksub = 16)
        }
        var cents: Seq[(Int, Array[Float])] = null
        t(s"q162.cents-collect#$r") {
          cents = emb.where(col("vec_id") < 8)
            .select(col("vec_id").cast("int"), col("embedding"))
            .collect().map(x => (x.getInt(0), x.getSeq[Float](1).toArray)).toSeq
        }
        t(s"q162.writeIvfPq-odd#$r") {
          Search.writeIvfPqIndex(corpus.where(col("vec_id") % 2 === 1),
            "vec_id", "embedding", cents, cb, g0)
        }
        Generations.publish(root, g0, hconf)
        val g1 = Generations.stage(root, hconf)
        t(s"q162.update-even#$r") {
          Search.updateIvfPqIndex(spark, Generations.resolve(root, hconf), g1,
            retireIds = Seq.empty[Long].toDF("vec_id"),
            refreshBatch = corpus.where(col("vec_id") % 2 === 0),
            "vec_id", "embedding")
        }
        Generations.publish(root, g1, hconf)
        val g2 = Generations.stage(root, hconf)
        t(s"q162.compact#$r") {
          Search.compactIvfPqIndex(spark, Generations.resolve(root, hconf), g2)
        }
        Generations.publish(root, g2, hconf)
        val g3 = Generations.stage(root, hconf)
        t(s"q162.refresh#$r") {
          Search.refreshIvfPqIndex(corpus, "vec_id", "embedding",
            Generations.resolve(root, hconf), g3, nClusters = 8, dim = 64,
            m = 8, ksub = 16, salt = "rf")
        }
        Generations.publish(root, g3, hconf)
        t(s"q162.vacuum#$r")(Generations.vacuum(root, keep = 0, hconf))
        val query = emb.where(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0)
        t(s"q162.query#$r") {
          noop(Search.ivfPqTopKFromCatalog(spark, root, corpus, "vec_id",
            "embedding", query, k = 10, nProbe = 4, rescore = 50))
        }
      }
    }
    spark.stop()
  }
}
