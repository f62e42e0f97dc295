package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.Embeddings
import graft.operators.Embeddings.{EmbeddingProvider, HashingTfEmbedder, ValidatingRetryProvider}

/** Embedding operator contract (SURVEY.md §2.4; index_documents.py:142-194):
  * determinism (G4), the four response validations, retry/backoff accounting,
  * and typed ≡ relational equivalence of the hashed-TF embedder.
  */
class EmbeddingsSpec extends SparkSpec {

  test("hashed-TF embedder is deterministic across instances (G4)") {
    val a = new HashingTfEmbedder(32).embed(Seq("spark join query", "fast scan"))
    val b = new HashingTfEmbedder(32).embed(Seq("spark join query", "fast scan"))
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.forall(_.length == 32))
  }

  test("hashed-TF embedder L2-normalizes non-empty texts; empty text → zero vector") {
    val Seq(v, z) = new HashingTfEmbedder(16).embed(Seq("a b c a", ""))
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(z.forall(_ == 0f))
  }

  private class FlakyProvider(failFirst: Int, inner: EmbeddingProvider) extends EmbeddingProvider {
    var calls = 0
    def dim: Int = inner.dim
    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      calls += 1
      if (calls <= failFirst) throw new RuntimeException(s"boom $calls")
      inner.embed(texts)
    }
  }

  test("retry wrapper: succeeds after transient failures, backoff = min(2^k,16)s") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new FlakyProvider(2, new HashingTfEmbedder(8))
    val p = new ValidatingRetryProvider(flaky, maxRetries = 5, sleeper = sleeps += _)
    val out = p.embed(Seq("hello world"))
    assert(out.length == 1 && out.head.length == 8)
    assert(flaky.calls == 3)
    // reference schedule: sleep min(2^attempt,16)s from attempt 0 → 1s, 2s
    assert(sleeps.toSeq == Seq(1000L, 2000L))
  }

  test("retry wrapper: exhausts retries, sleeps after EVERY failure, rethrows last error") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new FlakyProvider(99, new HashingTfEmbedder(8))
    val p = new ValidatingRetryProvider(flaky, maxRetries = 6, sleeper = sleeps += _)
    val e = intercept[RuntimeException](p.embed(Seq("x")))
    assert(e.getMessage.contains("after 6 attempts"))
    assert(flaky.calls == 6)
    // includes the final sleep before rethrow (index_documents.py:189-192),
    // and the 16s cap from attempt 4 on
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L, 8000L, 16000L, 16000L))
  }

  test("validation: count mismatch and dim mismatch are rejected") {
    val wrongCount = new EmbeddingProvider {
      def dim = 4
      def embed(texts: Seq[String]) = Seq(Array.fill(4)(1f)) // always 1 result
    }
    val e1 = intercept[RuntimeException](
      new ValidatingRetryProvider(wrongCount, 1, _ => ()).embed(Seq("a", "b")))
    assert(e1.getMessage.contains("count mismatch"))

    val wrongDim = new EmbeddingProvider {
      def dim = 4
      def embed(texts: Seq[String]) = texts.map(_ => Array.fill(3)(1f))
    }
    val e2 = intercept[RuntimeException](
      new ValidatingRetryProvider(wrongDim, 1, _ => ()).embed(Seq("a")))
    assert(e2.getMessage.contains("dimension"))
  }

  test("embedDataset: per-partition micro-batches preserve row alignment") {
    import spark.implicits._
    val chunks = (0 until 100).map(i =>
      Chunk(i.toLong, s"f$i", 0, "fixed", s"text number $i words")).toDS().repartition(3)
    val rows = Embeddings.embedDataset(chunks, () => new HashingTfEmbedder(16), batchSize = 7)
      .collect()
    assert(rows.length == 100)
    val direct = new HashingTfEmbedder(16)
    rows.foreach { r =>
      assert(r.embedding.toSeq == direct.embed(Seq(r.chunkText)).head.toSeq,
        s"vector mismatch for doc ${r.docId}")
    }
  }

  test("typed embedder ≡ relational tfEmbedding column") {
    import spark.implicits._
    val texts = Seq("spark join query", "a a a b", "", "Zahl 42 und mehr!")
    val df = texts.toDF("text")
      .withColumn("toks", graft.functions.TextFunctions.wordTokens(col("text")))
      .withColumn("emb", Embeddings.tfEmbedding(col("toks"), 16))
    val rel = df.select("emb").as[Seq[Double]].collect()
    val typed = new HashingTfEmbedder(16).embed(texts)
    rel.zip(typed).foreach { case (r, t) =>
      r.zip(t).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }

  test("tfEmbeddingSparse ≡ dense tfEmbedding non-zero coordinates") {
    import spark.implicits._
    val texts = Seq((1L, "spark join query join"), (2L, "a a a b"), (3L, ""), (4L, "!!!"))
    val df = texts.toDF("id", "text")
      .withColumn("toks", graft.functions.TextFunctions.wordTokens(col("text")))
    val dense = df.select(col("id"),
        posexplode(Embeddings.tfEmbedding(col("toks"), 16)).as(Seq("dim", "v")))
      .where(col("v") =!= 0.0)
      .as[(Long, Int, Double)].collect().sorted.toSeq
    val sparse = Embeddings.tfEmbeddingSparse(df, Seq("id"), "toks", 16)
      .as[(Long, Int, Double)].collect().sorted.toSeq
    assert(sparse == dense) // bit-identical, incl. zero-token rows vanishing
    assert(!sparse.exists(_._1 >= 3L))
  }

  test("md5 bucketing is the documented portable function") {
    // matches ('0x'||substr(md5('hello'),1,15))::BIGINT % dim = 419982666956583591 % 16
    assert(Embeddings.md5Bucket("hello", 16) == (419982666956583591L % 16).toInt)
  }
}
