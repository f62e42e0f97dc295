package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Search, Snapshots}

/** The incremental-pipeline composition: snapshot deltas (Snapshots) drive
  * remove+append maintenance of the persisted indexes, and the result must
  * be indistinguishable from rebuilding on the new corpus — scores
  * bit-identical for BM25, identical ANN answers for IVF. This is the
  * 100 TB steady-state contract: a new crawl costs O(change), never
  * O(corpus), and queries cannot tell the difference.
  */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private lazy val v1 = corpus(
    (1L, "spark shuffles data across the cluster"),
    (2L, "parquet stores columns with statistics"),
    (3L, "this navigation line will be deleted"),
    (4L, "joins broadcast the small side"),
    (5L, "an old draft about vector search"))
  private lazy val v2 = corpus(
    (1L, "spark shuffles data across the cluster"),      // unchanged
    (2L, "parquet stores columns with statistics"),      // unchanged
    (4L, "joins broadcast the small side"),              // unchanged
    (5L, "a rewritten page about vector search and ivf"),// changed
    (6L, "a brand new document about bm25 ranking"))     // added; 3 removed

  private def toks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextFunctions.wordTokens(col("text")).as("toks"))

  test("text index: snapshot-driven remove+append ≡ fresh build, scores bit-identical") {
    val idx1 = Files.createTempDirectory("inc1").toString
    val idx2 = Files.createTempDirectory("inc2").toString
    val fresh = Files.createTempDirectory("incf").toString
    Search.writeTextIndex(toks(v1), "doc_id", "toks", idx1)

    val fp = Snapshots.fingerprint(col("text"))
    val delta = Snapshots.snapshotDelta(v1, v2, "doc_id", fp)
    val retire = delta.where(col("status").isin(Snapshots.Removed, Snapshots.Changed))
      .select("doc_id")
    val refresh = Snapshots.changedRows(v1, v2, "doc_id", fp)

    val survivors = Search.removeFromTextIndex(spark, idx1, idx2, retire, "doc_id")
    assert(survivors === 3L) // 1, 2, 4
    val appended = Search.appendTextIndex(toks(refresh), "doc_id", "toks", idx2)(spark)
    assert(appended === 2L) // 5 (changed), 6 (added)

    Search.writeTextIndex(toks(v2), "doc_id", "toks", fresh)
    for (terms <- Seq(Seq("spark", "vector"), Seq("bm25"), Seq("search", "ranking"))) {
      val a = Search.bm25TopKFromIndex(spark, idx2, terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = Search.bm25TopKFromIndex(spark, fresh, terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a === b, s"terms $terms: incremental $a vs fresh $b")
    }
    // the removed doc is unfindable, the changed doc scores on its NEW text
    assert(Search.bm25TopKFromIndex(spark, idx2, Seq("navigation"), 5).isEmpty)
    assert(Search.bm25TopKFromIndex(spark, idx2, Seq("ivf"), 5)
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("ivf index: remove+append with a changed vector ≡ fresh build of v2") {
    val emb = Tables.embeddings(spark, sf001).where(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
    val seed = emb.where(col("vec_id") < 8).collect()
      .map(r => r.getLong(0).toInt -> r.getAs[Seq[Float]]("embedding").toArray).toMap
    val centroids = (0 until 8).map(i => i -> seed(i))
    val v1 = emb.where(col("vec_id") < 50)
    // v2: drop ids 10-19, "change" id 5 (replace with id 55's vector), add 50-59
    val changed5 = emb.where(col("vec_id") === 55)
      .select(lit(5L).as("vec_id"), col("embedding"))
    val v2 = emb.where(col("vec_id") < 50 && !(col("vec_id") >= 10 && col("vec_id") < 20)
        && col("vec_id") =!= 5)
      .unionByName(changed5)
      .unionByName(emb.where(col("vec_id") >= 50))

    val idx1 = Files.createTempDirectory("ivi1").toString
    val idx2 = Files.createTempDirectory("ivi2").toString
    val freshD = Files.createTempDirectory("ivif").toString
    Search.writeIvfIndex(v1, "embedding", centroids, idx1)
    val retire = (10L until 20L).toDF("vec_id").unionByName(Seq(5L).toDF("vec_id"))
    val survivors = Search.removeFromIvfIndex(spark, idx1, idx2, retire, "vec_id")
    assert(survivors === v1.count() - 11)
    val appended = Search.appendIvfIndex(
      changed5.unionByName(emb.where(col("vec_id") >= 50)), "vec_id", "embedding", idx2)
    assert(appended === 11L)

    Search.writeIvfIndex(v2, "embedding", centroids, freshD)
    val q = emb.where(col("vec_id") === 55).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    // ids 5 and 55 carry IDENTICAL vectors (5 was "changed" to 55's), so
    // exact-score ties make the order between them legitimately unstable —
    // membership is the meaningful equality here
    val a = Search.ivfTopKFromIndex(spark, idx2, "embedding", q, 8, nProbe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val b = Search.ivfTopKFromIndex(spark, freshD, "embedding", q, 8, nProbe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.contains(5L) && a.contains(55L), "the changed and source vectors both rank top")
    val inc = spark.read.parquet(s"$idx2/vectors")
      .select("vec_id", "cluster_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val frs = spark.read.parquet(s"$freshD/vectors")
      .select("vec_id", "cluster_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(inc === frs)
  }

  test("fused updateTextIndex ≡ fresh build; refresh ids need no explicit retire") {
    val idx1 = Files.createTempDirectory("fus1").toString
    val upd = Files.createTempDirectory("fusu").toString
    val fresh = Files.createTempDirectory("fusf").toString
    Search.writeTextIndex(toks(v1), "doc_id", "toks", idx1)

    val fp = Snapshots.fingerprint(col("text"))
    val delta = Snapshots.snapshotDelta(v1, v2, "doc_id", fp)
    // retire carries ONLY the Removed ids: the fused op drops the refresh
    // batch's own ids itself, so Changed docs never need listing twice
    val retire = delta.where(col("status") === Snapshots.Removed).select("doc_id")
    val refresh = Snapshots.changedRows(v1, v2, "doc_id", fp)
    val n = Search.updateTextIndex(spark, idx1, upd,
      retire, "doc_id", toks(refresh), "doc_id", "toks")
    assert(n === 5L) // 1, 2, 4 survive; 5 refreshed; 6 added

    Search.writeTextIndex(toks(v2), "doc_id", "toks", fresh)
    for (terms <- Seq(Seq("spark", "vector"), Seq("bm25"), Seq("search", "ranking"))) {
      val a = Search.bm25TopKFromIndex(spark, upd, terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = Search.bm25TopKFromIndex(spark, fresh, terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a === b, s"terms $terms: fused $a vs fresh $b")
    }
    assert(Search.bm25TopKFromIndex(spark, upd, Seq("navigation"), 5).isEmpty)
    assert(Search.bm25TopKFromIndex(spark, upd, Seq("ivf"), 5)
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
    // the stats sidecar matches the fresh build exactly (exact longs)
    assert(spark.read.parquet(s"$upd/stats").collect().toSeq ===
      spark.read.parquet(s"$fresh/stats").collect().toSeq)
  }

  test("fused updateIvfIndex ≡ fresh build of v2, one write") {
    val emb = Tables.embeddings(spark, sf001).where(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
    val seed = emb.where(col("vec_id") < 8).collect()
      .map(r => r.getLong(0).toInt -> r.getAs[Seq[Float]]("embedding").toArray).toMap
    val centroids = (0 until 8).map(i => i -> seed(i))
    val v1 = emb.where(col("vec_id") < 50)
    val changed5 = emb.where(col("vec_id") === 55)
      .select(lit(5L).as("vec_id"), col("embedding"))
    val v2 = emb.where(col("vec_id") < 50 && !(col("vec_id") >= 10 && col("vec_id") < 20)
        && col("vec_id") =!= 5)
      .unionByName(changed5)
      .unionByName(emb.where(col("vec_id") >= 50))

    val idx1 = Files.createTempDirectory("fvi1").toString
    val upd = Files.createTempDirectory("fviu").toString
    val freshD = Files.createTempDirectory("fvif").toString
    Search.writeIvfIndex(v1, "embedding", centroids, idx1)
    // retire lists ONLY the pure removals; id 5 is dropped by its
    // presence in the refresh batch
    val retire = (10L until 20L).toDF("vec_id")
    val refresh = changed5.unionByName(emb.where(col("vec_id") >= 50))
    val n = Search.updateIvfIndex(spark, idx1, upd, retire, refresh,
      "vec_id", "embedding")
    assert(n === v2.count())

    Search.writeIvfIndex(v2, "embedding", centroids, freshD)
    val inc = spark.read.parquet(s"$upd/vectors")
      .select("vec_id", "cluster_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val frs = spark.read.parquet(s"$freshD/vectors")
      .select("vec_id", "cluster_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(inc === frs)
    // frozen quantizer: the centroid sidecar copies verbatim
    val cu = spark.read.parquet(s"$upd/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq)).toSet
    val cf = spark.read.parquet(s"$idx1/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq)).toSet
    assert(cu === cf)
  }
}
