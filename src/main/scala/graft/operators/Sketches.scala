package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted cardinality sketches (EXT incremental-analytics surface):
  * "distinct users per domain per day" over a 100 TB history is cheap on
  * the day a batch arrives and PROHIBITIVE to recompute across history —
  * unless each batch persists a mergeable sketch. DataSketches HLL
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, built
  * into Spark 4) sketches are a few KB per group, merge associatively,
  * and estimate within ~2% — so any time-range cardinality collapses to
  * a scan of (groups × batches) sketch rows, never the raw history.
  *
  * Shape: per-batch sketch build is one groupBy over the batch (bounded
  * key + binary sketch out); range queries union per-group sketches —
  * partial-aggregatable, so the merge combines map-side. Appends are
  * idempotent per (group, batch) via the same job-commit parquet append
  * discipline as the index stores.
  */
object Sketches {

  /** Build per-(group, batch) HLL sketches of `valueCol` and append them
    * to the store. Replaying the same `batchId` is a no-op (anti-join on
    * the batch id — the store stays exactly-once per batch).
    *
    * @return number of group rows appended (0 on replay)
    */
  def appendDistinctSketches(df: DataFrame, groupCol: String, valueCol: String,
      batchId: String, storeDir: String): Long = {
    val spark = df.sparkSession
    import graft.sources.PathState
    val state = PathState.classify(storeDir, spark.sparkContext.hadoopConfiguration)
    require(state != PathState.Foreign,
      s"sketch store '$storeDir' holds non-parquet content — refusing to append")
    if (state == PathState.Data) {
      val seen = spark.read.parquet(storeDir)
        .where(col("batch_id") === batchId).limit(1).count()
      if (seen > 0) return 0L
    }
    val sk = df.groupBy(col(groupCol).as("group_key"))
      .agg(expr(s"hll_sketch_agg($valueCol)").as("sketch"))
      .withColumn("batch_id", lit(batchId))
    val out = sk.persist()
    try {
      val n = out.count()
      out.write.mode(SaveMode.Append).parquet(storeDir)
      n
    } finally { out.unpersist(); () }
  }

  /** Distinct-count estimates per group across a set of batches (all
    * batches when `batchIds` is empty): one scan of the sketch rows, one
    * partial-aggregatable union per group. The raw history is never read.
    */
  def estimateDistinct(spark: SparkSession, storeDir: String,
      batchIds: Seq[String] = Nil): DataFrame = {
    val base = spark.read.parquet(storeDir)
    val scoped =
      if (batchIds.isEmpty) base else base.where(col("batch_id").isin(batchIds: _*))
    scoped.groupBy(col("group_key"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").cast("long")
        .as("n_distinct_est"))
      .orderBy(col("group_key"))
  }
}
