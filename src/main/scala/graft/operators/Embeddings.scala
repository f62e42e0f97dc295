package graft.operators

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Embedding operators (SURVEY.md §2.4; `/root/reference/index_documents.py:142-194`).
  *
  * Two execution forms:
  *
  *   - '''typed''' ([[EmbeddingProvider]] + [[embedDataset]]): external-service
  *     semantics — per-partition micro-batches of `batchSize` texts (the
  *     reference's batch-of-32, index_documents.py:291-292), the same four
  *     response validations (:165-185), and retry with exponential backoff
  *     capped at 16 s (:158,190-192). Retries live INSIDE the partition
  *     function, not as Spark task retries (SURVEY.md §3.2).
  *   - '''relational''' ([[tfEmbedding]]): a deterministic hashed
  *     term-frequency embedding as a pure Column expression — portable to
  *     DuckDB (md5-based bucketing), whole-stage-codegen'd, used by the
  *     oracle probes and as the offline default for the index pipeline.
  */
object Embeddings {

  /** The reference's embedding contract: a batch of texts in one request →
    * one vector per text, all of dimension `dim` (index_documents.py:144,160-185).
    */
  trait EmbeddingProvider extends Serializable {
    def dim: Int
    /** One "request": embed up to batchSize texts. May throw (retried by [[withRetry]]). */
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Validation + retry wrapper replicating index_documents.py:142-194:
    *   - retry ≤ maxRetries attempts, sleeping min(2^attempt, 16) s after
    *     EVERY failed attempt — 1,2,4,8,16 s from attempt 0, including one
    *     final sleep before the terminal rethrow (:189-192 sleeps inside the
    *     except block on the last loop iteration too);
    *   - response must be non-null, count == len(texts), every vector
    *     non-null and of exactly `dim` elements.
    */
  final class ValidatingRetryProvider(
      underlying: EmbeddingProvider,
      maxRetries: Int = 5,
      sleeper: Long => Unit = ms => Thread.sleep(ms))
      extends EmbeddingProvider {
    def dim: Int = underlying.dim
    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      var attempt = 0
      var last: Throwable = null
      while (attempt < maxRetries) {
        try {
          val out = underlying.embed(texts)
          require(out != null, "Embedding response contained no embeddings")
          require(out.length == texts.length,
            s"Embedding count mismatch: expected ${texts.length}, got ${out.length}")
          out.zipWithIndex.foreach { case (v, i) =>
            require(v != null, s"Embedding response item $i contained no values")
            require(v.length == dim,
              s"Unexpected embedding dimension ${v.length} (expected $dim)")
          }
          return out
        } catch {
          case e: Throwable =>
            last = e
            sleeper(math.min(1L << attempt, 16L) * 1000L)
            attempt += 1
        }
      }
      throw new RuntimeException(
        s"Embedding failed after $maxRetries attempts: ${last.getMessage}", last)
    }
  }

  /** Deterministic offline embedder: hashed term-frequency + L2 normalize.
    * Token bucket = low 60 bits of md5(token) mod dim — stable across JVMs
    * and platforms (no Object.hashCode, SURVEY.md §7.4 risk 5), and exactly
    * reproducible in DuckDB SQL (see [[tfEmbedding]] — the two forms are
    * equivalence-tested).
    */
  final class HashingTfEmbedder(val dim: Int) extends EmbeddingProvider {
    // one digest instance per embedder (≅ per partition via embedDataset) —
    // MessageDigest.getInstance per token dominated the index-build profile
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        val counts = new Array[Float](dim)
        tokensOf(t).foreach { tok => counts((md5Long60(md, tok) % dim).toInt) += 1f }
        val norm = math.sqrt(counts.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
        if (norm == 0f) counts else counts.map(_ / norm)
      }
  }

  /** Lowercased letter/digit-run tokens — must match TextFunctions.wordTokens. */
  private[graft] def tokensOf(t: String): Seq[String] =
    t.toLowerCase.split("[^\\p{L}\\p{N}]+").iterator.filter(_.nonEmpty).toSeq

  /** First 15 hex chars of md5 as a non-negative long (= 60 bits: digest
    * bytes 0..6 and the high nibble of byte 7) — computed straight from the
    * digest bytes, no hex-string round-trip. Portable: equals Spark
    * `conv(substring(md5(x),1,15),16,10)` and DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`.
    */
  private def md5Long60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Low 60 bits of md5 hex, mod dim — portable (Spark conv / DuckDB 0x-cast). */
  private[graft] def md5Bucket(s: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (md5Long60(md, s) % dim).toInt
  }

  /** Typed execution: per-partition micro-batching — the distributed
    * replacement for the reference's sequential batch loop
    * (index_documents.py:290-306). Narrow dependency, no shuffle; one
    * provider instance per partition (vs the reference's client-per-call,
    * an inefficiency we deliberately do not inherit — SURVEY.md §4.1).
    */
  def embedDataset(
      chunks: Dataset[Chunk],
      mkProvider: () => EmbeddingProvider,
      batchSize: Int = 32,
      maxRetries: Int = 5)(implicit spark: SparkSession): Dataset[ChunkRow] = {
    import spark.implicits._
    chunks.mapPartitions { it =>
      val provider = new ValidatingRetryProvider(mkProvider(), maxRetries)
      it.grouped(batchSize).flatMap { batch =>
        val vecs = provider.embed(batch.map(_.chunkText))
        batch.lazyZip(vecs).map { (c, v) =>
          ChunkRow(c.docId, c.filename, c.chunkIndex, c.splitStrategy, c.chunkText, v)
        }
      }
    }
  }

  // ----------------------------------------------------------- relational ---

  /** md5-bucket of a string column: low 60 bits of the md5 hex, mod dim.
    * DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT % dim`.
    */
  def md5BucketCol(c: Column, dim: Int): Column =
    (org.apache.spark.sql.graft.HashColumns.md5PrefixLong(c) % dim).cast("int")

  /** Relational hashed-TF embedding as ONE Column: equivalent to
    * [[HashingTfEmbedder]] (tested), expressible in DuckDB for the oracle.
    *
    * WARNING — per-row cost is O(dim × tokens × refs): the bucket subtree is
    * re-evaluated per dim inside the counting lambda, and Catalyst's
    * CollapseProject inlines the whole tree into every downstream reference
    * (withColumn does NOT materialize). Fine for small dim / short text /
    * unit tests; on real data use [[tfEmbeddingSparse]] (measured ~60×
    * faster on the q58 pipeline at sf0.01).
    */
  def tfEmbedding(tokens: Column, dim: Int): Column = {
    val buckets = transform(tokens, t => md5BucketCol(t, dim))
    val counts = transform(
      sequence(lit(0), lit(dim - 1)),
      d => size(filter(buckets, b => b === d)).cast("double"))
    val nrm = sqrt(aggregate(counts, lit(0.0), (a, x) => a + x * x))
    when(nrm === 0.0, counts).otherwise(transform(counts, x => x / nrm))
  }

  /** Sparse relational hashed-TF — the 100 TB form: explode tokens →
    * md5-bucket → hash-aggregate counts → L2-norm join. One md5 per token
    * (no HOF subtree re-evaluation), shuffles only on the narrow
    * (idCols, dim) keys, map-side partial aggregation applies. Emits one row
    * per NON-ZERO coordinate: idCols ++ (`dim` INT, `v` DOUBLE with
    * v = count/norm). Zero-token rows vanish (the dense form's zero vector).
    */
  def tfEmbeddingSparse(df: org.apache.spark.sql.DataFrame, idCols: Seq[String],
      tokensCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    val ids = idCols.map(col)
    val counts = df
      .select(ids :+ explode(col(tokensCol)).as("_tok"): _*)
      .groupBy(ids :+ md5BucketCol(col("_tok"), dim).as("dim"): _*)
      .agg(count(lit(1)).cast("double").as("_cnt"))
    val norms = counts.groupBy(ids: _*)
      // counts are integer-valued doubles: the c² sum is exact in double
      // regardless of aggregation order (bit-stable vs DuckDB)
      .agg(sqrt(sum(col("_cnt") * col("_cnt"))).as("_nrm"))
    counts.join(norms, idCols)
      .select(ids ++ Seq(col("dim"), (col("_cnt") / col("_nrm")).as("v")): _*)
  }
}
