package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding (EXT): REAL subword tokenization for token-budget
  * accounting — the whitespace/regex counters in [[TextFunctions]] are
  * budget approximations; BPE is what training pipelines actually bill
  * by (Sennrich et al. 2016, the GPT-2 tokenizer family).
  *
  * Two halves, each in its honest scale shape:
  *
  *   - [[train]]: learn merge rules from a reference corpus. Each
  *     iteration is one relational pair-count (explode adjacent symbol
  *     pairs weighted by word frequency, partial-aggregatable sum) and
  *     one driver argmax (a single row). State (distinct word → symbols)
  *     is localCheckpoint'ed per iteration — an ITERATIVE Spark job's
  *     lineage must be cut or the plan tree grows with k. Train on a
  *     sample at 100 TB (vocabulary converges long before the corpus is
  *     exhausted — document sampling upstream).
  *   - [[encode]] / [[tokenCounts]]: apply frozen merges. The merge table
  *     is small (|vocab| entries) and BROADCAST; encoding is a
  *     per-partition Scala loop (greedy lowest-rank merge to fixpoint,
  *     the reference algorithm) — per-row iterative state, the documented
  *     mapPartitions justification. No shuffle at all.
  *
  * Word pre-tokenization is [[TextFunctions.wordTokens]] (lower-cased
  * letter/digit runs) with an end-of-word sentinel `</w>` appended to the
  * final character, so merges distinguish "low" the word from "low" the
  * prefix — the standard formulation.
  */
object Bpe {

  /** End-of-word marker fused onto a word's final character. */
  val Eow = "</w>"

  /** A word as its initial symbol sequence: chars, last one + [[Eow]]. */
  def initialSymbols(word: String): Vector[String] = {
    if (word.isEmpty) Vector.empty
    else {
      val cs = word.map(_.toString).toVector
      cs.init :+ (cs.last + Eow)
    }
  }

  /** Greedy BPE encode of one word under `ranks` (merge pair → rank,
    * lower = earlier-learned = higher priority): repeatedly merge ALL
    * occurrences (left-to-right, non-overlapping) of the present pair
    * with the lowest rank, until no mergeable pair remains. The reference
    * algorithm, exactly.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = initialSymbols(word)
    var done = syms.length < 2
    while (!done) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
            out += (syms(j) + syms(j + 1)); j += 2 // non-overlapping, L-to-R
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  /** Learn `numMerges` merge rules from a reference corpus (see the
    * object scaladoc for the per-iteration shape). Deterministic: the
    * argmax breaks count ties on the lexicographically smaller pair.
    *
    * @return merges in learned order — index IS the rank
    */
  def train(reference: DataFrame, textCol: Column, numMerges: Int): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = reference.sparkSession
    import spark.implicits._
    var state = reference
      .select(explode(TextFunctions.wordTokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (initialSymbols(w), f) }
      .toDF("syms", "freq")
      .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val top = state
        .select(explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"), col("freq"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a: String = top(0).getString(0)
        val b: String = top(0).getString(1)
        merges += ((a, b))
        val prev = state
        state = state
          .as[(Seq[String], Long)]
          .map { case (syms, f) => (mergeOnce(syms.toVector, a, b), f) }
          .toDF("syms", "freq")
          .localCheckpoint()
        prev.unpersist()
        k += 1
      }
    }
    merges.result()
  }

  private def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode every document under frozen `merges`: (id, tokens, n_tokens).
    * Ranks broadcast once; per-partition loop, no shuffle.
    */
  def encode(df: DataFrame, idCol: String, textCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap: Map[(String, String), Int])
    df.select(col(idCol).cast("long").as("id"),
        TextFunctions.wordTokens(textCol).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val toks = ws.iterator.flatMap(w => encodeWord(w, ranks.value)).toSeq
        (id, toks, toks.length)
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Just the per-doc BPE token counts — the budget-accounting column. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: Column,
      merges: Seq[(String, String)]): DataFrame =
    encode(df, idCol, textCol, merges).drop("tokens")
}
