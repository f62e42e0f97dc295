package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps probe name → (session, sfDir) → result DataFrame;
  * `oracleSql` holds the DuckDB twin for every oracle-checkable probe
  * (identical column names/types/order discipline — see Queries.scala).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's raison d'être end-to-end: index build (clean → chunk →
    * embed) + semantic text search, top-5.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q41SearchText(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for typed/approximate ops (q40+) —
    * driver records a weaker rows-only check for those.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
