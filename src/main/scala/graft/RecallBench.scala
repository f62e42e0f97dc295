package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Search

/** ANN quality bench: recall@k of every approximate search tier vs exact
  * cosine top-k, on `SPARK_GRAFT_SF_DIR`'s embeddings table. Prints ONE
  * JSON line; the committed numbers live in BASELINE.md §ANN-recall and
  * SearchSpec's recall-gate test holds the floors — a speedup that silently
  * trades recall fails the gate instead of shipping.
  *
  * Tiers measured (same parameters as the committed numbers):
  *   - IVF (kmeans centroids, partition-pruned scan) by nProbe
  *   - quantized IVF (int8 codes + full-precision rescore) by rescore depth
  *   - MLlib random-projection LSH pair recall vs exact L2 pairs
  *
  * Config via env: SPARK_GRAFT_RECALL_K (10), _NQUERIES (50), _NCLUSTERS
  * (32). Deterministic: seeded kmeans/LSH, fixed query set (lowest vec_ids).
  */
object RecallBench {

  def ivfRecall(spark: SparkSession, assigned: DataFrame,
      centroids: Seq[(Int, Array[Float])], queries: Seq[(Long, Seq[Float])],
      exact: Map[Long, Seq[Long]], k: Int, nProbe: Int): Double = {
    val hits = queries.map { case (qid, qv) =>
      val got = Search.ivfTopK(assigned, "embedding", centroids, qv, k, nProbe)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact(qid).count(got.contains).toDouble / exact(qid).size
    }
    hits.sum / hits.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "10").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_RECALL_NQUERIES", "50").toInt
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_RECALL_NCLUSTERS", "32").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries: Seq[(Long, Seq[Float])] = emb
      .orderBy("vec_id").limit(nQueries)
      .as[(Long, Array[Float])].collect().map { case (id, v) => (id, v.toSeq) }.toSeq

    // exact cosine top-k per query in ONE job (ties broken by vec_id)
    val qdf = queries.map { case (id, v) => (id, v) }.toDF("query_id", "qv")
    val exact: Map[Long, Seq[Long]] = Search
      .topKPerQuery(emb, "embedding", qdf, "query_id", "qv", k, "cosine",
        tiebreak = Seq("vec_id"))
      .select("query_id", "vec_id", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
      }

    val centroids = Search.kmeansCentroids(emb, "embedding", nClusters, seed = 42L)
    val assigned = Search.ivfAssign(emb, "embedding", centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()

    val ivf = Seq(1, 2, 4).map { np =>
      np -> ivfRecall(spark, assigned, centroids, queries, exact, k, np)
    }

    // quantized IVF: persisted index + int8 coarse rank + exact rescore
    val qPath = java.nio.file.Files.createTempDirectory("recall-qivf").toString
    Search.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, qPath)
    val qivf = Seq((2, 20), (2, 50)).map { case (np, rescore) =>
      val hits = queries.map { case (qid, qv) =>
        val got = Search.ivfTopKFromIndexQuantized(spark, qPath, emb, "vec_id",
            "embedding", qv, k, np, rescore)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact(qid).count(got.contains).toDouble / exact(qid).size
      }
      (np, rescore) -> (hits.sum / hits.size)
    }

    // binary (sign-bit Hamming) and matryoshka (prefix-dim) funnels, by
    // rescore budget / prefix length — the q92/q93 tiers
    val dim = queries.head._2.length
    def funnelRecall(search: Seq[Float] => DataFrame): Double = {
      val hits = queries.map { case (qid, qv) =>
        val got = search(qv).select("vec_id").collect().map(_.getLong(0)).toSet
        exact(qid).count(got.contains).toDouble / exact(qid).size
      }
      hits.sum / hits.size
    }
    val binary = Seq(4, 16).map { factor =>
      factor -> funnelRecall(qv =>
        Search.binaryTopK(emb, "vec_id", "embedding", qv, dim, k, factor))
    }
    val matryoshka = Seq(16, 32).map { prefix =>
      prefix -> funnelRecall(qv =>
        Search.matryoshkaTopK(emb, "vec_id", "embedding", qv, prefix, k, 4))
    }

    // PQ/ADC (m=8 subspaces × ksub=16): the sampled (deterministic, q130)
    // and trained (seeded-kmeans) codebook builders, by rescore depth —
    // the staircase shows what codebook quality and rescore budget buy
    val opqModel = Search.opqTrainCodebooks(emb, "embedding", dim, 8, 16,
      seed = 42L)
    val pqTiers: Seq[(String,
        () => (org.apache.spark.sql.DataFrame,
               (org.apache.spark.sql.DataFrame, Seq[Float], Int) => org.apache.spark.sql.DataFrame))] = Seq(
      "sampled" -> (() => {
        val cb = Search.pqSampledCodebooks(emb, "vec_id", "embedding", dim, 8, 16)
        (Search.pqEncode(emb, "vec_id", "embedding", cb),
          (enc, qv, rescore) => Search.pqTopK(enc, emb, "vec_id", "embedding", cb, qv, k, rescore))
      }),
      "trained" -> (() => {
        val cb = Search.pqTrainCodebooks(emb, "embedding", dim, 8, 16, seed = 42L)
        (Search.pqEncode(emb, "vec_id", "embedding", cb),
          (enc, qv, rescore) => Search.pqTopK(enc, emb, "vec_id", "embedding", cb, qv, k, rescore))
      }),
      // OPQ (r11): learned orthogonal pre-rotation, codebooks trained in
      // the rotated space, exact rescore still on original vectors
      "opq" -> (() => {
        (Search.opqEncode(emb, "vec_id", "embedding", opqModel),
          (enc, qv, rescore) => Search.opqTopK(enc, emb, "vec_id", "embedding", opqModel, qv, k, rescore))
      }))
    val pq = pqTiers.flatMap { case (tag, build) =>
      val (encRaw, search) = build()
      val enc = encRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      enc.count()
      val rs = Seq(20, 50, 100).map { rescore =>
        (tag, rescore) -> funnelRecall(qv => search(enc, qv, rescore))
      }
      enc.unpersist()
      rs
    }

    // composed IVF-PQ (r12): coarse partition-pruned probe + ADC scan of
    // the probed clusters only + exact rescore — the IVFADC serving
    // architecture (q148's tier with the recall-grade trained models:
    // kmeans centroids + seeded-kmeans codebooks). Compared against flat
    // trained PQ at the SAME rescore budget: within the probed subset the
    // ADC ranking faces fewer competitors, so recall holds or improves
    // wherever nProbe covers the true neighbors' clusters.
    val ivfPqPath = java.nio.file.Files.createTempDirectory("recall-ivfpq").toString
    val cbT = Search.pqTrainCodebooks(emb, "embedding", dim, 8, 16, seed = 42L)
    Search.writeIvfPqIndex(emb, "vec_id", "embedding", centroids, cbT, ivfPqPath)
    val ivfpqGrid = Seq((2, 50), (4, 20), (4, 50), (4, 100), (8, 50),
      (16, 50), (nClusters, 50))
    val ivfpq = ivfpqGrid.map { case (np, rescore) =>
      (np, rescore) -> funnelRecall(qv =>
        Search.ivfPqTopKFromIndex(spark, ivfPqPath, emb, "vec_id",
          "embedding", qv, k, np, rescore))
    }

    // RESIDUAL IVF-PQ (r13): the original IVFADC encoding — PQ codes of
    // the fixed-point residual v − c(v) under the SAME coarse centroids
    // and the SAME m=8×ksub=16 byte budget, codebooks kmeans-trained in
    // the residual space (the quality tier; q151 pins the sampled tier to
    // the DuckDB oracle). Residual energy is a fraction of vector energy
    // (Jégou et al. 2011 §IV), so the same ksub cells quantize finer —
    // the staircase should hold-or-beat plain IVF-PQ at TIGHT rescore,
    // the property SearchSpec's recall gate freezes.
    val resPath = java.nio.file.Files.createTempDirectory("recall-ivfpqres").toString
    val cbR = Search.pqResidualTrainCodebooks(emb, "vec_id", "embedding",
      centroids, dim, 8, 16, seed = 42L)
    Search.writeIvfPqResidualIndex(emb, "vec_id", "embedding", centroids,
      cbR, resPath)
    val ivfpqres = ivfpqGrid.map { case (np, rescore) =>
      (np, rescore) -> funnelRecall(qv =>
        Search.ivfPqResidualTopKFromIndex(spark, resPath, emb, "vec_id",
          "embedding", qv, k, np, rescore))
    }

    // LSH pair recall vs exact L2 pairs at the q43 threshold
    val maxL2 = 1.18
    val exactPairs = emb.as("a").crossJoin(emb.as("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .withColumn("d", graft.functions.VectorFunctions.l2Distance(
        col("a.embedding"), col("b.embedding")))
      .where(col("d") <= maxL2)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = new Search.LshIndex(bucketLength = 0.5, numTables = 3, seed = 42L)
      .approxPairs(emb, "vec_id", "embedding", maxL2)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall =
      if (exactPairs.isEmpty) 1.0
      else exactPairs.count(lshPairs.contains).toDouble / exactPairs.size

    def f(d: Double) = f"$d%.4f"
    val ivfJson = ivf.map { case (np, r) => s""""np$np":${f(r)}""" }.mkString(",")
    val qivfJson = qivf.map { case ((np, rs), r) => s""""np${np}_rescore$rs":${f(r)}""" }.mkString(",")
    val binJson = binary.map { case (fa, r) => s""""factor$fa":${f(r)}""" }.mkString(",")
    val matJson = matryoshka.map { case (p, r) => s""""prefix$p":${f(r)}""" }.mkString(",")
    val pqJson = pq.map { case ((tag, rs), r) => s""""${tag}_rescore$rs":${f(r)}""" }.mkString(",")
    val ivfpqJson = ivfpq.map { case ((np, rs), r) => s""""np${np}_rescore$rs":${f(r)}""" }.mkString(",")
    val ivfpqresJson = ivfpqres.map { case ((np, rs), r) => s""""np${np}_rescore$rs":${f(r)}""" }.mkString(",")
    println(s"""{"metric":"ann_recall","k":$k,"n_queries":${queries.size},""" +
      s""""n_clusters":$nClusters,"ivf":{$ivfJson},"qivf":{$qivfJson},""" +
      s""""binary":{$binJson},"matryoshka":{$matJson},"pq":{$pqJson},""" +
      s""""ivfpq":{$ivfpqJson},"ivfpqres":{$ivfpqresJson},""" +
      s""""lsh_pair_recall":${f(lshRecall)},"n_exact_pairs":${exactPairs.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
