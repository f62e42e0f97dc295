package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFeatures
import graft.streaming.Streams

/** MLlib tf-idf pipeline + the file-stream wiring over the real fixture
  * (exercises the ns-timestamp workaround on the readStream path too).
  */
class TextFeaturesStreamSpec extends SparkSpec {

  test("tf-idf pipeline: learned vocab, sparse vectors, idf downweights ubiquity") {
    val docs = Tables.documents(spark, sf001).limit(200)
    val (model, out) = TextFeatures.fitTransform(docs,
      TextFeatures.TfIdfConfig(vocabSize = 64, minDocFreq = 2))
    val row = out.select("tfidf").head()
    val vec = row.getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(vec.size == 64 || vec.size > 0)
    assert(out.count() == 200)
    // vocabulary learned from data
    val cv = model.stages.collect {
      case m: org.apache.spark.ml.feature.CountVectorizerModel => m
    }.head
    assert(cv.vocabulary.nonEmpty)
    assert(cv.vocabulary.forall(_.nonEmpty))
  }

  test("file-stream tumbling counts run over the real events fixture") {
    // file streams tail a DIRECTORY; stage the single-file fixture into one
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Streams.streamTumblingToMemory(spark, dir.toString, "filestream_test")
    try {
      q.processAllAvailable()
      // append-mode with watermark: only windows sealed by the watermark are
      // emitted; the final (max-ts) windows stay open — compare against the
      // batch result restricted to sealed windows.
      val streamed = spark.table("filestream_test")
      val batch = Streams.tumblingCounts(Tables.events(spark, sf001))
      val maxTs = Tables.events(spark, sf001).agg(max(col("ts"))).head().getTimestamp(0)
      val sealedBefore = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
      val expected = batch
        .where(col("window_start") + expr("INTERVAL 1 HOUR") <= lit(sealedBefore))
      assert(streamed.count() == expected.count())
      assert(streamed.count() > 0)
    } finally q.stop()
  }
}
