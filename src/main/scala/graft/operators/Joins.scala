package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for scale pathologies (SURVEY.md §4.4 / builder mandate:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles skewed SORT-MERGE joins automatically (keep
  * `spark.sql.adaptive.enabled=true`); explicit salting remains the tool
  * when a single hot key overwhelms even split partitions, or when the
  * aggregation AFTER the join is the skewed stage.
  */
object Joins {

  /** Inner equi-join with salted keys: the big (skewed) side derives a
    * deterministic salt in [0, numSalts) from `saltSource` (any column with
    * per-row variety — an id, not the join key); the small side is
    * replicated numSalts× so every (key, salt) bucket finds its match.
    * Result set is identical to `big.join(small, bigKey === smallKey)`
    * (inner; equality spec-tested) but the shuffle spreads each hot key over
    * numSalts partitions.
    *
    * Cost: small side × numSalts — keep numSalts modest (8–32) and the
    * small side genuinely small.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltSource: Column, numSalts: Int = 16): DataFrame = {
    require(numSalts > 0)
    val salted = big.withColumn("_salt", pmod(hash(saltSource), lit(numSalts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") && col(bigKey) === col(smallKey))
      .drop("_salt")
  }

  /** Salted aggregation: two-phase groupBy for a skewed grouping key —
    * partial aggregate on (key, salt), then final on key. `partialAggs`
    * must be decomposable (sum/count/min/max); the caller re-aggregates the
    * partial columns in `finalAggs`.
    */
  def saltedGroupBy(df: DataFrame, key: Column, saltSource: Column, numSalts: Int)(
      partialAggs: Seq[Column])(finalAggs: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSource), lit(numSalts)))
      .groupBy(key, col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(key)
      .agg(finalAggs.head, finalAggs.tail: _*)
}
