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

  /** Spark-native BUCKETED layout sink: rows hash into `buckets` files by
    * `key` (optionally sorted within each bucket), registered as a table
    * whose files live at `path`. Two tables bucketed on the same key with
    * the same count join EXCHANGE-FREE — the planner sees the matching
    * output partitioning and elides both shuffles (and with `sortKeys` the
    * sort too). At 100 TB this is THE tool for repeatedly-joined pairs
    * (chunks ↔ embeddings, docs ↔ scores): pay the layout shuffle once at
    * write time instead of on every join. Plan-asserted in SinksSpec
    * (SortMergeJoin with zero exchanges beneath).
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int, sortKeys: Seq[String] = Nil): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").option("path", path)
      .bucketBy(buckets, key)
    // head/tail, not a :: pattern — any Seq (Vector included) must work
    val b = if (sortKeys.isEmpty) w else w.sortBy(sortKeys.head, sortKeys.tail: _*)
    b.saveAsTable(table)
  }

  /** The DDL the reference's `ensure_schema` produces (index_documents.py:
    * 202-224 / README.md:83-91), as executable statements: the pgvector
    * extension, then `document_chunks` with SQLAlchemy's type mapping —
    * Integer+autoincrement ⇒ SERIAL PRIMARY KEY, Text NOT NULL, pgvector
    * `Vector(dim)` ⇒ VECTOR(dim), DateTime(timezone=True) ⇒ TIMESTAMPTZ.
    * Run these over plain JDBC before [[writeJdbcChunks]]; offline they are
    * contract-tested as strings (no Postgres in this environment).
    */
  def ensureSchemaDdl(vectorDim: Int): Seq[String] = Seq(
    "CREATE EXTENSION IF NOT EXISTS vector;",
    s"""CREATE TABLE IF NOT EXISTS document_chunks (
       |  id SERIAL PRIMARY KEY,
       |  chunk_text TEXT NOT NULL,
       |  embedding VECTOR($vectorDim) NOT NULL,
       |  filename TEXT NOT NULL,
       |  split_strategy TEXT NOT NULL,
       |  created_at TIMESTAMPTZ NOT NULL
       |);""".stripMargin)

  /** pgvector input literal for one vector: '[v1,v2,...]' — the text form
    * pgvector's input function accepts (same shape psycopg sends). Plain
    * float rendering, no spaces.
    */
  def vectorLiteral(v: Array[Float]): String =
    v.mkString("[", ",", "]")

  /** The Column expression [[writeJdbcChunks]] uses to serialize the
    * embedding array — must produce exactly [[vectorLiteral]]'s text
    * (equivalence is contract-tested).
    */
  def vectorLiteralCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat(lit("["), concat_ws(",", c), lit("]"))
  }

  /** pgvector-parity JDBC sink. The embedding array is serialized to the
    * pgvector text literal '[v1,v2,...]' so a `::vector` cast (or a typed
    * target column) ingests it server-side — mirroring the table of
    * index_documents.py:213-224 / README.md:83-91.
    */
  def writeJdbcChunks(df: DataFrame, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties()): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("embedding", vectorLiteralCol(col("embedding")))
      .write.mode(SaveMode.Append)
      .option("batchsize", 1000) // executemany granularity (ref used 32)
      .jdbc(url, table, properties)
  }
}
