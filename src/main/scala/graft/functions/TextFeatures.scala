package graft.functions

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{CountVectorizerModel, IDF, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib text-feature pipeline (SURVEY.md §2.9 V5: "Tokenizer,
  * StopWordsRemover, CountVectorizer"): tokenize → remove stopwords →
  * bounded-vocabulary term counts → IDF weighting. The distributed classical
  * baseline next to the hashed-TF embedder (vocab is learned with one pass,
  * counts are a second narrow pass; both scale linearly).
  *
  * Vocabulary PINNING (VERDICT r5 item 8): `CountVectorizer`'s own learned
  * vocabulary orders terms by corpus count with ARBITRARY tie-breaks (a
  * partition-order artifact), which made the q47 probe rows-only. The
  * vocabulary here is instead selected explicitly — top `vocabSize` terms
  * by (document frequency DESC, term ASC), df ≥ minDocFreq — a total order,
  * so the fitted model is engine- and run-deterministic and the probe is
  * DuckDB-replayable. The selection criterion (doc-frequency, not corpus
  * count) is this library's documented semantics.
  */
object TextFeatures {

  final case class TfIdfConfig(
      textCol: String = "text",
      outputCol: String = "tfidf",
      vocabSize: Int = 1 << 12,
      minDocFreq: Int = 2)

  /** Fit the pipeline on `df` and return (model, transformed df). The
    * transformed frame carries `outputCol` as an MLlib sparse vector —
    * convert with `org.apache.spark.ml.functions.vector_to_array` when a
    * plain `array<double>` column is needed.
    */
  def fitTransform(df: DataFrame, cfg: TfIdfConfig = TfIdfConfig())
      : (org.apache.spark.ml.PipelineModel, DataFrame) = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(cfg.textCol).setOutputCol("_tokens")
      .setPattern("[^\\p{L}\\p{N}]+").setToLowercase(true)
    val remover = new StopWordsRemover()
      .setInputCol("_tokens").setOutputCol("_filtered")
    // deterministic vocabulary (see object scaladoc): one relational df
    // pass, explicit total-order sort, driver collect bounded by vocabSize
    // (the vocabulary is broadcast into the model regardless)
    val filtered = remover.transform(tokenizer.transform(df))
    val vocab = filtered
      .select(explode(array_distinct(col("_filtered"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") >= cfg.minDocFreq)
      .orderBy(col("df").desc, col("term").asc)
      .limit(cfg.vocabSize)
      .collect().map(_.getString(0))
    require(vocab.nonEmpty,
      s"tf-idf vocabulary is empty: no term reaches minDocFreq=${cfg.minDocFreq}")
    val pipeline = new Pipeline().setStages(Array(
      tokenizer,
      remover,
      new CountVectorizerModel(vocab)
        .setInputCol("_filtered").setOutputCol("_tf"),
      new IDF().setInputCol("_tf").setOutputCol(cfg.outputCol)))
    val model = pipeline.fit(df)
    (model, model.transform(df).drop("_tokens", "_filtered", "_tf"))
  }
}
