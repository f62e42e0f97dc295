package graft

import org.apache.spark.sql.functions._

/** SQL-ONLY end-to-end flows (VERDICT r13 item 7): R161 proved the five
  * oracle texts run verbatim through `spark.sql`; this spec raises the
  * SQL surface to a PIPELINE entry point — the flagship index build +
  * semantic search (q41) and the persisted-index BM25 read path (q97)
  * expressed PURELY as SQL text over [[graft.plans.GraftSql]]'s
  * registered views, row-equal to the DataFrame flagships. Every stage
  * of the engine a SQL-string user needs — clean → chunk → hashed-TF
  * embed → cosine top-k, and tokenize → postings/doclens/stats → BM25 —
  * is spelled in SQL and proven to produce the engine's exact answers.
  */
class SqlPipelineSpec extends SparkSpec {

  test("SQL-only flagship: clean → chunk → embed → cosine top-5 ≡ q41 row-for-row") {
    graft.plans.GraftSql.registerTables(spark, sf001)
    // query-side constants — driver-side scalars in BOTH forms (the
    // DataFrame flagship inlines them as literals too)
    val dim = 64
    val qCounts = graft.operators.Embeddings.tokensOf("spark join query fast")
      .groupBy(t => graft.operators.Embeddings.md5Bucket(t, dim))
      .view.mapValues(_.size.toLong).toMap
    val qNorm = math.sqrt(qCounts.values.map(c => c.toDouble * c).sum)
    val qMapSql = qCounts.toSeq.sortBy(_._1)
      .map { case (b, c) => s"$b, CAST($c AS BIGINT)" }.mkString("map(", ", ", ")")
    val viaSql = spark.sql(
      s"""WITH cleaned AS (
         |  SELECT doc_id,
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(text, ' ', ' '),
         |          '[ \\t]+', ' '),
         |        '\\n{3,}', '\\n\\n'),
         |      '^\\\\s+|\\\\s+$$', '') AS text
         |  FROM documents),
         |chunks AS (
         |  SELECT doc_id, win_pos,
         |    regexp_replace(substring(text, win_pos * 1000 + 1, 1200),
         |      '^\\\\s+|\\\\s+$$', '') AS chunk_text
         |  FROM cleaned
         |  LATERAL VIEW posexplode(sequence(0,
         |    CAST(floor(greatest(length(text) - 200 - 1, 0) / 1000) AS INT)))
         |    w AS win_pos, _w
         |  WHERE length(text) > 0),
         |nonempty AS (SELECT * FROM chunks WHERE length(chunk_text) > 0),
         |counts AS (
         |  SELECT doc_id, win_pos,
         |    CAST(CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) % $dim AS INT) AS b,
         |    count(*) AS cnt
         |  FROM nonempty
         |  LATERAL VIEW explode(
         |    filter(split(lower(chunk_text), '[^\\\\p{L}\\\\p{N}]+'),
         |           t -> length(t) > 0)) x AS tok
         |  GROUP BY doc_id, win_pos, b),
         |scored AS (
         |  SELECT doc_id, win_pos,
         |    CAST(sum(cnt * coalesce(element_at($qMapSql, b), 0L)) AS DOUBLE) /
         |      (sqrt(CAST(sum(cnt * cnt) AS DOUBLE)) * CAST('$qNorm' AS DOUBLE)) AS score
         |  FROM counts GROUP BY doc_id, win_pos),
         |winners AS (
         |  SELECT doc_id, win_pos, score FROM scored
         |  ORDER BY score DESC, doc_id, win_pos LIMIT 5)
         |SELECT w.doc_id, w.win_pos,
         |  substring(md5(c.chunk_text), 1, 16) AS chunk_fp,
         |  CAST(floor(w.score * 1000000) AS BIGINT) AS score_u
         |FROM winners w JOIN nonempty c USING (doc_id, win_pos)
         |ORDER BY score_u DESC, doc_id, win_pos""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    val viaDf = Queries.all("q41_search_text")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(viaSql == viaDf, s"sql=$viaSql\n df=$viaDf")
  }

  test("SQL-only BM25: tokenize → postings/doclens/stats views → ranked top-10 ≡ q97 row-for-row") {
    graft.plans.GraftSql.registerTables(spark, sf001)
    // the index build half: the three text-index artifacts as SQL views
    // (the on-disk layout's exact shapes — writeTextIndex's postings,
    // doclens and stats)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_tk AS
        |SELECT doc_id AS id,
        |  filter(split(lower(text), '[^\\p{L}\\p{N}]+'), t -> length(t) > 0) AS toks
        |FROM documents""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_postings AS
        |SELECT id, tok AS term, count(*) AS tf
        |FROM sql_tk LATERAL VIEW explode(toks) x AS tok
        |GROUP BY id, tok""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_doclens AS
        |SELECT id, CAST(size(toks) AS BIGINT) AS dl FROM sql_tk""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_stats AS
        |SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM sql_doclens""".stripMargin)
    // the read half: bm25TopKFromIndex's formula verbatim (Robertson idf,
    // k1=1.2 b=0.75, per-doc DECIMAL(24,12) sum, ties to the lower id)
    val viaSql = spark.sql(
      """WITH hits AS (
        |  SELECT term,
        |    CAST(count(*) OVER (PARTITION BY term) AS DOUBLE) AS df,
        |    id, CAST(tf AS DOUBLE) AS tf
        |  FROM sql_postings WHERE term IN ('data', 'model', 'search')),
        |scored AS (
        |  SELECT d.id,
        |    CAST(sum(CAST(
        |      ln(1.0 + (s.n_docs - h.df + 0.5) / (h.df + 0.5))
        |        * (h.tf * 2.2)
        |        / (h.tf + 1.2 * (0.25 + 0.75 * d.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
        |      AS DECIMAL(24,12))) AS DOUBLE) AS score
        |  FROM sql_doclens d JOIN hits h USING (id) CROSS JOIN sql_stats s
        |  GROUP BY d.id)
        |SELECT id AS doc_id, floor(score * 1000) / 1.0D AS score_m
        |FROM scored ORDER BY score DESC, id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaDf = Queries.all("q97_bm25_from_index")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql == viaDf, s"sql=$viaSql\n df=$viaDf")
  }
}
