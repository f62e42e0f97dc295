package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable sketches (EXT incremental-analytics surface):
  * "distinct users per domain per day" or "p95 doc length per source per
  * day" over a 100 TB history is cheap on the day a batch arrives and
  * PROHIBITIVE to recompute across history — unless each batch persists a
  * mergeable sketch. Two families share the store discipline: DataSketches
  * HLL for cardinality (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`, built into Spark 4) and DataSketches KLL for
  * quantiles (no SQL surface — a two-phase map-side fold below). Sketches
  * are a few KB per group, merge associatively, and carry provable error
  * bounds — so any time-range cardinality/quantile collapses to a scan of
  * (groups × batches) sketch rows, never the raw history.
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

  // ---- mergeable QUANTILE sketches (KLL) — the HLL store's sibling -----
  //
  // "p95 document length per source per day" over history has the same
  // shape as the distinct-count problem: exact recomputation rescans
  // everything, but DataSketches KLL (on the Spark classpath) sketches
  // merge associatively with a provable rank-error bound (~1.65% at
  // k=200), so per-batch sketch rows make any time-range quantile a scan
  // of (groups × batches) KB-sized blobs. No SQL surface exists for KLL
  // in Spark, so the build is a two-phase map-side fold: per-partition
  // HashMap of sketches (one pass, no shuffle of values), then one
  // bounded (group → ≤ P blobs) merge — the same partial-then-final
  // discipline an Aggregator would compile to, without kryo-ing sketch
  // internals through a UDAF buffer.

  private def mergeSketchBlobs(parts: Iterator[Array[Byte]], k: Int)
      : org.apache.datasketches.kll.KllDoublesSketch = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val acc = KllDoublesSketch.newHeapInstance(k)
    parts.foreach(b => acc.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    acc
  }

  /** Build per-(group, batch) KLL doubles sketches of `valueCol` and
    * append them to the store; replaying a `batchId` is a no-op (the
    * [[appendDistinctSketches]] exactly-once discipline).
    *
    * @return number of group rows appended (0 on replay)
    */
  def appendQuantileSketches(df: DataFrame, groupCol: String, valueCol: String,
      batchId: String, storeDir: String, k: Int = 200): Long = {
    import org.apache.datasketches.kll.KllDoublesSketch
    val spark = df.sparkSession
    import spark.implicits._
    import graft.sources.PathState
    val state = PathState.classify(storeDir, spark.sparkContext.hadoopConfiguration)
    require(state != PathState.Foreign,
      s"sketch store '$storeDir' holds non-parquet content — refusing to append")
    if (state == PathState.Data) {
      val seen = spark.read.parquet(storeDir)
        .where(col("batch_id") === batchId).limit(1).count()
      if (seen > 0) return 0L
    }
    val sk = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { case (g, v) =>
          m.getOrElseUpdate(g, KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        m.iterator.map { case (g, s) => (g, s.toByteArray) }
      }
      .toDF("group_key", "part")
      .groupBy(col("group_key"))
      .agg(collect_list(col("part")).as("parts")) // ≤ one blob per partition
      .as[(String, Seq[Array[Byte]])]
      .map { case (g, parts) => (g, mergeSketchBlobs(parts.iterator, k).toByteArray) }
      .toDF("group_key", "sketch")
      .withColumn("batch_id", lit(batchId))
    val out = sk.persist()
    try {
      val n = out.count()
      out.write.mode(SaveMode.Append).parquet(storeDir)
      n
    } finally { out.unpersist(); () }
  }

  /** Quantile estimates per group at the requested `ranks` across a set
    * of batches (all when empty): one scan of sketch rows, one bounded
    * merge per group — the raw history is never read.
    *
    * @return (group_key, rank, quantile_est), ordered
    */
  def estimateQuantiles(spark: SparkSession, storeDir: String,
      ranks: Seq[Double], batchIds: Seq[String] = Nil, k: Int = 200): DataFrame = {
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    import spark.implicits._
    require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
      "ranks must be in [0,1]")
    val base = spark.read.parquet(storeDir)
    val scoped =
      if (batchIds.isEmpty) base else base.where(col("batch_id").isin(batchIds: _*))
    scoped.select(col("group_key").cast("string"), col("sketch"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val acc = mergeSketchBlobs(it.map(_._2), k)
        (g, ranks.map(r => acc.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)))
      }
      .flatMap { case (g, qs) => ranks.zip(qs).map { case (r, q) => (g, r, q) } }
      .toDF("group_key", "rank", "quantile_est")
      .orderBy(col("group_key"), col("rank"))
  }
}
