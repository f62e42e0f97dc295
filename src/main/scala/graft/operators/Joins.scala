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
    // resolve each key against its own frame: with same-named keys on both
    // sides (the common true-equi-join case) bare col(...) is ambiguous
    salted.join(replicated,
        salted("_salt") === replicated("_salt") && salted(bigKey) === replicated(smallKey))
      .drop("_salt")
  }

  /** As-of join (J7): for each left row, the value of the LATEST right row
    * with the same key and `rightTime <= leftTime`. Spark has no native
    * ASOF JOIN; the scalable formulation is union + one window pass —
    * shuffle is one exchange on the key (vs a range-join's quadratic
    * fallback). Ties at equal time resolve to the right row ("at or
    * before" includes simultaneous rows).
    *
    * @param left      probe side; must contain `keyCol` and `timeCol`
    * @param right     reference side; must contain `keyCol`, `timeCol`, `valueCol`
    * @param leftId    a unique left-row id column name (deterministic window order)
    * @return left rows + `asof_<valueCol>` (null when no prior right row)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, valueCol: String, leftId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lCols = left.columns
    val l = left.select(
      col(keyCol), col(timeCol), lit(1).as("_is_probe"),
      lit(null).cast(right.schema(valueCol).dataType).as("_asof_v"),
      struct(lCols.map(col): _*).as("_row"))
    val r = right.select(
      col(keyCol), col(timeCol), lit(0).as("_is_probe"),
      col(valueCol).as("_asof_v"),
      lit(null).cast(l.schema("_row").dataType).as("_row"))
    // order: time, then reference-before-probe at equal time ("at or before"
    // includes simultaneous rows), then value (deterministic winner among
    // same-timestamp reference rows: the max), then probe id
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_is_probe"), col("_asof_v"), col(s"_row.$leftId"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_asof_v"), ignoreNulls = true).over(w))
      .where(col("_is_probe") === 1)
      .select(lCols.map(c => col(s"_row.$c").as(c)) :+ col("_asof").as(s"asof_$valueCol"): _*)
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
