package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling (EXT ops surface): the ANALYZE-style statistics a
  * data engineer runs before trusting a 100 TB table — null counts,
  * exact distincts, min/max per column, in one job. The reference has no
  * profiling surface at all; a pipeline inheriting arbitrary crawl
  * parquet needs one.
  *
  * Shape: ONE aggregation pass. Multiple exact `count(distinct)`s in one
  * agg plan as a single Expand (rows × profiled columns) — the standard
  * engine mechanism; cost scales with the column count you ask for, so
  * profile the columns you care about, and swap exact distincts for
  * `approx_count_distinct` upstream when ±2% is fine (the probe pins the
  * exact form). Output is long-format (one row per column) so downstream
  * checks are relational, not schema-dependent.
  */
object Profiling {

  /** Profile `cols` of `df`: (col_name, n_rows, n_null, n_distinct,
    * min_s, max_s) — min/max stringified so heterogeneous column types
    * stack into one frame.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_s"), col(s"${c}__mx").as("max_s"))
    }
    row.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
