package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (SURVEY.md §2.1 S5).
  *
  * Primary sink is parquet with job-commit semantics — all-or-nothing and
  * task-retry-idempotent, a deliberate upgrade over the reference's
  * per-batch transactions (`/root/reference/index_documents.py:248-249`,
  * which leave partial, duplicating state on re-run; SURVEY.md §3.1).
  *
  * The JDBC sink exists for pgvector parity (the reference's storage): it
  * writes the chunk table via Spark's jdbc writer; the `embedding` array
  * column must be cast server-side to the `vector` type (pgvector accepts
  * the '[x,y,...]' text form). No database exists in the offline test
  * environment, so this path is contract-documented and exercised only up
  * to the writer configuration (not a live round-trip).
  */
object Sinks {

  /** Parquet index sink: partitioned by low-cardinality `split_strategy`
    * (partition pruning per strategy); `embedding` stays a `list<float>`
    * column so text-only scans prune it (SURVEY.md §4.4).
    */
  def writeParquetIndex(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy("split_strategy").parquet(path)

  /** pgvector-parity JDBC sink. The embedding array is serialized to the
    * pgvector text literal '[v1,v2,...]' so a `::vector` cast (or a typed
    * target column) ingests it server-side — mirroring the table of
    * index_documents.py:213-224 / README.md:83-91.
    */
  def writeJdbcChunks(df: DataFrame, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties()): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("embedding",
        concat(lit("["), concat_ws(",", col("embedding")), lit("]")))
      .write.mode(SaveMode.Append)
      .option("batchsize", 1000) // executemany granularity (ref used 32)
      .jdbc(url, table, properties)
  }
}
