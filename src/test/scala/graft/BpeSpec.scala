package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE: hand-derived merge sequence on a closed-form corpus, reference
  * greedy-encode semantics, shuffle-free apply plan. (No DuckDB oracle —
  * training is an iterative driver-argmax loop, documented spec-only.)
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWord: empty ranks = characters with EOW; greedy lowest-rank to fixpoint") {
    assert(Bpe.encodeWord("abc", Map.empty) === Vector("a", "b", "c</w>"))
    assert(Bpe.encodeWord("", Map.empty) === Vector.empty)
    // non-overlapping left-to-right: 'aaa' under (a,a) → (aa, a</w>)
    assert(Bpe.encodeWord("aaa", Map(("a", "a") -> 0)) === Vector("aa", "a</w>"))
    // rank order decides: (b,c</w>) before (a,b)
    val r = Map(("b", "c</w>") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("abc", r) === Vector("a", "bc</w>"))
  }

  test("train: deterministic merge sequence on a closed-form corpus") {
    val corpus = Seq.fill(3)("aaab").toDF("text")
    val merges = Bpe.train(corpus, col("text"), numMerges = 3)
    // aaab = a a a b</w>: (a,a)×2 wins; then tie (aa,a)=1 vs (a,b</w>)=1
    // → lexicographically smaller pair (a,b</w>); then (aa,ab</w>)
    assert(merges === Seq(("a", "a"), ("a", "b</w>"), ("aa", "ab</w>")))
    // a vocabulary can exhaust before numMerges — train stops, no error
    assert(Bpe.train(Seq("ab").toDF("text"), col("text"), 10).size <= 2)
  }

  test("train: batched merges are sequence-identical to the 1-per-round reference") {
    // messy overlapping corpus — exercises the overlap stop, the tie
    // fallback, and multi-round batching
    val corpus = Seq(
      "banana bandana ananas banana anna nabab",
      "banana bandana banana dada abba",
      "low lower lowest low low slow slower",
      "banana anna dada abba lowest").toDF("text")
    val sequential = Bpe.train(corpus, col("text"), numMerges = 20, batchSize = 1)
    val batched = Bpe.train(corpus, col("text"), numMerges = 20, batchSize = 8)
    assert(batched === sequential)
    val wide = Bpe.train(corpus, col("text"), numMerges = 20, batchSize = 64)
    assert(wide === sequential)
  }

  test("train: disjoint-heavy fixture batches >=10x fewer driver round-trips") {
    // 3 waves of 18 two-char words over [a-z0-9], each wave a perfect
    // matching (pairwise symbol-disjoint), strictly decreasing frequencies
    // — the shape where the ranked pair table admits wide sound batches
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    val wave1 = (0 until 18).map(i => s"${chars(2 * i)}${chars(2 * i + 1)}")
    val wave2 = (0 until 18).map(i => s"${chars(2 * i + 1)}${chars(2 * i)}")
    val wave3 = (0 until 18).map(i => s"${chars(2 * i)}${chars((2 * i + 3) % 36)}")
    val words = wave1 ++ wave2 ++ wave3
    val rows = words.zipWithIndex.map { case (w, i) => (w + " ") * (1000 - i) }
    val corpus = rows.toDF("text")
    val (batched, rounds) = Bpe.trainWithStats(corpus, col("text"),
      numMerges = 54, batchSize = 64)
    val (sequential, seqRounds) = Bpe.trainWithStats(corpus, col("text"),
      numMerges = 54, batchSize = 1)
    assert(batched === sequential)
    assert(batched.length === 54)
    assert(rounds * 10 <= seqRounds,
      s"expected >=10x fewer round-trips, got $rounds vs $seqRounds")
  }

  test("property: encodeWord token concatenation always reconstructs the word") {
    import org.scalacheck.{Gen, Prop}
    val word = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val merges = Gen.listOf(Gen.zip(
      Gen.alphaLowerStr.map(_.take(2)).suchThat(_.nonEmpty),
      Gen.alphaLowerStr.map(_.take(2)).suchThat(_.nonEmpty)))
    checkProp(Prop.forAll(word, merges) { (w, ms) =>
      val ranks = ms.zipWithIndex.toMap
      val toks = Bpe.encodeWord(w, ranks)
      toks.mkString.stripSuffix(Bpe.Eow) == w && toks.last.endsWith(Bpe.Eow)
    }, minTests = 50)
  }

  test("encode: trained merges compress the training corpus; apply is shuffle-free") {
    val docs = Seq((1L, "aaab aaab aab"), (2L, "aaab")).toDF("id", "text")
    val merges = Bpe.train(docs, col("text"), numMerges = 3)
    val enc = Bpe.encode(docs, "id", col("text"), merges)
    val rows = enc.collect().map(r =>
      r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(rows(2L)._1 === Seq("aaab</w>"))
    assert(rows(1L)._1 === Seq("aaab</w>", "aaab</w>", "aa", "b</w>"))
    assert(rows(1L)._2 === 4)
    // chars-only count for doc 1 is 11; BPE must strictly compress
    assert(rows(1L)._2 < 11)
    // apply path: broadcast ranks, per-partition loop — no exchange at all
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
    // budget column variant
    val counts = Bpe.tokenCounts(docs, "id", col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts === Map(1L -> 4, 2L -> 1))
  }
}
