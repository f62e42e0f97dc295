package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring (EXT): the CCNet-style
  * pipeline ranks documents by their likelihood under a reference-corpus
  * LM and drops the worst tail — the statistical complement to the
  * rule-based Gopher/C4 filters ([[graft.functions.TextAnalysis]]).
  *
  * This is the smallest honest version of that idea: a CHARACTER-TRIGRAM
  * model P(c₃ | c₁c₂) = count(c₁c₂c₃) / count(c₁c₂·), trained relationally
  * over a reference corpus, scoring each document by its mean trigram
  * log-probability. Everything is exact-count arithmetic + one ln per
  * distinct trigram, so the whole thing is DuckDB-oracle-checkable (q77).
  *
  * Scale shape: training = one explode + two keyed aggregations (trigram
  * vocabulary is bounded — |charset|³ — regardless of corpus size);
  * scoring = explode + ONE shuffle join on the trigram key + per-doc
  * decimal-summed aggregation. The model frame is small enough to
  * broadcast for most charsets.
  */
object LmScore {

  /** Character trigrams, case-folded (code-point positions, same semantics
    * as DuckDB substr). Texts shorter than 3 chars → empty.
    *
    * The fold is applied to each 3-char SLICE, not the whole text: Catalyst
    * re-evaluates HOF lambda subtrees per element (the repo's q58 lesson),
    * so `lower(text)` inside the lambda would cost O(len²) per document —
    * `lower(substr)` is O(1) per element and the oracle lowers the same
    * slices, so the definition stays engine-identical.
    */
  def charTrigrams(text: Column): Column =
    when(length(text) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - 2),
        i => lower(text.substr(i, lit(3)))))

  /** Unseen-trigram log-probability floor: an exact double literal (NOT a
    * computed ln) so Spark and the oracle agree bit-for-bit. ≈ ln(1e-10).
    */
  val UnseenLogProb: Double = -23.025850929940457

  /** Train the trigram model over a reference corpus:
    * (tri, n_tri, n_ctx, logp) with logp = ln(n_tri / n_ctx), context =
    * the trigram's first two chars.
    */
  def trainTrigramModel(reference: DataFrame, textCol: Column): DataFrame = {
    val tris = reference
      .select(explode(charTrigrams(textCol)).as("tri"))
      .groupBy(col("tri"))
      .agg(count(lit(1)).as("n_tri"))
    tris
      .withColumn("n_ctx",
        sum(col("n_tri")).over(Window.partitionBy(substring(col("tri"), 1, 2))))
      .withColumn("logp", log(col("n_tri").cast("double") / col("n_ctx")))
      .select(col("tri"), col("n_tri"), col("n_ctx"), col("logp"))
  }

  /** Score documents under a trained model: mean trigram log-probability
    * (unseen trigrams take [[UnseenLogProb]]). Per-doc summation goes
    * through DECIMAL(24,12) — combine-order independent, so scores are
    * run-stable and floor-3dp oracle-checkable.
    *
    * @return (id, n_tri, avg_logp) — docs with <3 chars are absent
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: Column,
      model: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(charTrigrams(textCol)).as("tri"))
      // the model is bounded by |charset|³ rows regardless of corpus size —
      // broadcast it so the exploded corpus trigrams never shuffle
      .join(broadcast(model.select(col("tri"), col("logp"))), Seq("tri"), "left_outer")
      .withColumn("_lp", coalesce(col("logp"), lit(UnseenLogProb)))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tri"),
        (sum(col("_lp").cast("decimal(24,12)")).cast("double") /
          count(lit(1))).as("avg_logp"))
}
