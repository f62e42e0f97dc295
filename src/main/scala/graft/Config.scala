package graft

import org.apache.spark.sql.SparkSession
import graft.model.SplitStrategy

/** Typed pipeline configuration (SURVEY.md §2.1 S4).
  *
  * The reference configures via `.env` + argparse
  * (`/root/reference/index_documents.py:254-264`); Spark-native, config
  * rides the session conf under the `spark.graft.*` namespace so it reaches
  * executors and cluster submit scripts uniformly. Defaults mirror the
  * reference's argparse defaults (chunk 1200/200, batch 32, dim 768 there —
  * dim 64 here, sized to the offline fixtures).
  */
final case class GraftConfig(
    strategy: String = "fixed",      // fixed | sentence | paragraph (:258)
    chunkSize: Int = 1200,           // --chunk-size default (:259)
    overlap: Int = 200,              // --overlap default (:260)
    batchSize: Int = 32,             // --batch-size default (:261)
    embeddingDim: Int = 64) {        // --embedding-dim (768 in ref, :263)
  require(chunkSize > 0, "chunk_size must be positive")
  require(overlap >= 0 && overlap < chunkSize,
    "overlap must be >= 0 and smaller than chunk_size")
  require(batchSize > 0, "batch_size must be positive")
  require(embeddingDim > 0, "embedding_dim must be positive")

  def splitStrategy: SplitStrategy = SplitStrategy.fromName(strategy, chunkSize, overlap)
}

object GraftConfig {
  /** Read `spark.graft.*` from the session conf, falling back to defaults. */
  def fromSession(spark: SparkSession): GraftConfig = {
    val c = spark.conf
    def get(key: String, dflt: String): String = c.get(s"spark.graft.$key", dflt)
    val d = GraftConfig()
    GraftConfig(
      strategy = get("strategy", d.strategy),
      chunkSize = get("chunkSize", d.chunkSize.toString).toInt,
      overlap = get("overlap", d.overlap.toString).toInt,
      batchSize = get("batchSize", d.batchSize.toString).toInt,
      embeddingDim = get("embeddingDim", d.embeddingDim.toString).toInt)
  }
}
