package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling & budgeting for training-data pipelines (EXT).
  * `df.sample()` draws from a per-partition RNG — resample on every retry,
  * repartition, or re-run. Reproducible pipelines need content-addressed
  * selection: a row is in the sample iff a hash of its KEY clears a
  * threshold, independent of partitioning, engine, or time. The md5-60bit
  * hash here is the repo's portable one (Spark conv / DuckDB 0x-cast), so
  * sampling decisions replay exactly in the oracle (q61).
  */
object Sampling {

  private val HashSpace: Double = math.pow(2.0, 60)

  /** The 60-bit sampling hash of a key (salt prefixed; vary the salt to
    * draw independent samples of the same data).
    */
  def sampleHash(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Deterministic `fraction`-sample: rows whose hash falls below
    * fraction·2^60. Partition-independent, retry-stable, engine-portable —
    * the reproducible subset/holdout primitive. Narrow (a filter — no
    * shuffle); pushes down to the scan as far as md5 evaluation allows.
    */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.where(sampleHash(key, salt) < (fraction * HashSpace).toLong)
  }

  /** Exact two-way split on the same hash: (selected, complement). Together
    * they partition the input — the train/val split that never leaks a row
    * into both sides and never changes between runs.
    */
  def splitByHash(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): (DataFrame, DataFrame) = {
    val threshold = (fraction * HashSpace).toLong
    (df.where(sampleHash(key, salt) < threshold),
     df.where(sampleHash(key, salt) >= threshold))
  }

  /** Stratified deterministic sampling — per-group fractions (the data-
    * mixing weights of a training corpus: "50% of src0, 10% of src1, 25%
    * of everything else"). Thresholds are computed driver-side as exact
    * longs and inlined as literals: comparing the hash against a LONG
    * avoids double→long cast semantics differing between engines (Spark
    * truncates, DuckDB rounds). Same partition/retry/engine stability as
    * [[sampleByHash]].
    */
  def stratifiedSampleByHash(df: DataFrame, key: Column, group: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val dflt: Column = lit((defaultFraction * HashSpace).toLong)
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(dflt) {
      case (acc, (g, f)) => when(group === g, lit((f * HashSpace).toLong)).otherwise(acc)
    }
    df.where(sampleHash(key, salt) < threshold)
  }

  /** Token-budget cap per group (e.g. per source/domain): keep rows, in
    * deterministic `orderCols` order, while the running token total within
    * `groupCol` stays ≤ `budget`. The running sum is a PARTITIONED window —
    * one shuffle on the group key, each task bounded by its group, no
    * global funnel. The classic data-mixing primitive ("at most N tokens
    * per domain").
    */
  def tokenBudgetFilter(df: DataFrame, groupCol: Column, tokenCountCol: Column,
      orderCols: Seq[Column], budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_run_tokens", sum(tokenCountCol).over(w))
      .where(col("_run_tokens") <= budget)
      .drop("_run_tokens")
  }
}
