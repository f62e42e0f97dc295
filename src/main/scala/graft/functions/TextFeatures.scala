package graft.functions

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{CountVectorizer, IDF, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame

/** MLlib text-feature pipeline (SURVEY.md §2.9 V5: "Tokenizer,
  * StopWordsRemover, CountVectorizer"): tokenize → remove stopwords →
  * bounded-vocabulary term counts → IDF weighting. The distributed classical
  * baseline next to the hashed-TF embedder (vocab is learned with one pass,
  * counts are a second narrow pass; both scale linearly).
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
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer()
        .setInputCol(cfg.textCol).setOutputCol("_tokens")
        .setPattern("[^\\p{L}\\p{N}]+").setToLowercase(true),
      new StopWordsRemover()
        .setInputCol("_tokens").setOutputCol("_filtered"),
      new CountVectorizer()
        .setInputCol("_filtered").setOutputCol("_tf")
        .setVocabSize(cfg.vocabSize).setMinDF(cfg.minDocFreq),
      new IDF().setInputCol("_tf").setOutputCol(cfg.outputCol)))
    val model = pipeline.fit(df)
    (model, model.transform(df).drop("_tokens", "_filtered", "_tf"))
  }
}
