package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking (W1 at 100 TB). `Window.orderBy` with no
  * `partitionBy` funnels every row through ONE task — fine on a bounded
  * probe, a scale-killer on real data. The distributed formulation: range-
  * repartition on the order key, rank WITHIN each range partition, and add
  * per-partition offsets (a cumulative sum over P partition counts —
  * metadata-scale, independent of row count).
  */
object Ranks {

  /** Exact 1-based global rank by `orderCols` — which must form a UNIQUE
    * key (ties would make rank nondeterministic; range partitioning keeps
    * equal keys in one partition, but a deterministic contract needs a
    * tiebreaker column, same as any ORDER BY discipline).
    *
    * Plan shape: ONE range exchange, consumed by both the per-partition
    * ranking window and the P-row count aggregate; the offset cumsum is a
    * window over those P rows (bounded by the partition count, not the
    * data), broadcast-joined back. Everything lives in ONE lazy plan so the
    * range exchange is a single reused shuffle stage — `spark_partition_id`
    * assignments are consistent by construction. (A collect-offsets-then-
    * rejoin formulation runs TWO jobs, and repartitionByRange re-SAMPLES its
    * boundaries per job: the two jobs can disagree on partition membership,
    * which silently corrupts ranks. Found the hard way on q38.)
    *
    * @return input columns + `rankCol` (LONG, 1-based global rank)
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column], rankCol: String,
      partitions: Int = 0): DataFrame = {
    // Correctness REQUIRES the two consumers below to share one physical
    // range exchange (ReusedExchangeExec): with reuse off, each consumer
    // re-samples range boundaries under a different seed and the _pid
    // assignments silently diverge. Fail loudly instead (RanksSpec also
    // pins the reuse in the executed plan, catching optimizer regressions).
    require(
      df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "globalRank requires spark.sql.exchange.reuse=true (shared range exchange); " +
        "with reuse disabled, persist the input and use a per-partition rank instead")
    val p = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
    val local = ranged.withColumn("_lrn",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(orderCols: _*)))
    // offsets: rows before each partition = cumsum of partition counts.
    // The partition-less window here is over ≤ p rows (metadata, not data).
    val offsets = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(
          Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(rankCol, col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Exact `ntile(n)` over a global order, no single-partition window over
    * the data. Bucket arithmetic replicates the SQL-standard tile rule from
    * the global rank: with q = N div n, rem = N mod n, the first `rem`
    * buckets hold q+1 rows. Matches Spark/DuckDB `ntile` bit-for-bit
    * (spec-tested). Costs one extra count() job for N (partitioning-
    * independent, so cross-job stability is not a concern there).
    */
  def ntileExact(df: DataFrame, n: Int, orderCols: Seq[Column],
      tileCol: String = "ntile", partitions: Int = 0): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val total = df.count()
    val ranked = globalRank(df, orderCols, "_grank", partitions)
    val q = total / n
    val rem = total % n
    // integer `div`, not `/` (double division truncates above 2^53)
    val bucket =
      if (q == 0L) col("_grank") // fewer rows than buckets: rank IS the bucket
      else expr(
        s"""CASE WHEN _grank <= ${(q + 1) * rem}
           |THEN (_grank - 1) div ${q + 1} + 1
           |ELSE $rem + (_grank - 1 - ${(q + 1) * rem}) div $q + 1 END""".stripMargin)
    ranked.withColumn(tileCol, bucket.cast("int")).drop("_grank")
  }
}
