package graft.text

import org.apache.spark.ml.{Pipeline => MlPipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StringIndexer, StringIndexerModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastText-style supervised text classifier for corpus curation — the
  * "model-based quality filter" stage of modern pretraining pipelines
  * (CCNet's fastText language-ID and the LLaMA-line "quality classifier"
  * filters; Joulin et al. 2017, "Bag of Tricks for Efficient Text
  * Classification"): hashed bag-of-words features + a linear softmax.
  * Expressed Spark-first as an MLlib pipeline — RegexTokenizer →
  * HashingTF (murmur3 hashing trick, `dim` buckets) → IDF → multinomial
  * LogisticRegression — so training is the stock distributed L-BFGS
  * treeAggregate and scoring is one broadcast-coefficients map pass.
  *
  * Scale shape: `fit` shuffles nothing but the label index (tiny) —
  * feature extraction is narrow; each L-BFGS iteration is one
  * treeAggregate over gradient partials (same shape as
  * [[graft.forecast.Lstm]]); `predict`/`confusion` never shuffle the
  * text, only the (label, prediction) pair counts.
  */
object QualityClassifier {

  final case class Model(pipeline: PipelineModel) {
    /** Label vocabulary in index order (from the fitted StringIndexer). */
    def labels: Array[String] =
      pipeline.stages.collectFirst { case m: StringIndexerModel =>
        m.labelsArray.head
      }.get
  }

  /** Fit the classifier on `labelCol` (a string class per row). */
  def train(
      df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 12, maxIter: Int = 50, regParam: Double = 1e-4): Model = {
    val stages = new MlPipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__toks")
        .setPattern("\\s+").setToLowercase(true),
      new HashingTF().setInputCol("__toks").setOutputCol("__tf")
        .setNumFeatures(dim),
      new IDF().setInputCol("__tf").setOutputCol("__feat"),
      new StringIndexer().setInputCol(labelCol).setOutputCol("__label")
        .setStringOrderType("alphabetAsc"),
      new LogisticRegression().setFeaturesCol("__feat").setLabelCol("__label")
        .setMaxIter(maxIter).setRegParam(regParam).setFamily("multinomial")))
    Model(stages.fit(graft.Tables.spread(df)))
  }

  /** Append `predicted_label` and `confidence` (softmax max) per row. */
  def predict(model: Model, df: DataFrame, textCol: String): DataFrame = {
    val labels = model.labels
    val out = model.pipeline.transform(df)
    val name = udf((i: Double) => labels(i.toInt))
    out
      .withColumn("predicted_label", name(col("prediction")))
      .withColumn("confidence",
        round(array_max(vector_to_array(col("probability"))), 6))
      .drop("__toks", "__tf", "__feat", "__label",
        "rawPrediction", "probability", "prediction")
  }

  /** Confusion-matrix counts: (`labelCol`, `predicted_label`, `n`). */
  def confusion(
      model: Model, df: DataFrame, textCol: String,
      labelCol: String): DataFrame =
    predict(model, df, textCol)
      .groupBy(col(labelCol), col("predicted_label"))
      .agg(count(lit(1)).as("n"))

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
