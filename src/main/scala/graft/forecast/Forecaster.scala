package graft.forecast

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference T3: `TimeSeriesPredictor` train/evaluate/predict
  * (`fdi_flow/forecasting/time_series_model.py:168-275`). The reference
  * fits a keras LSTM or Conv1D+LSTM (selected by `model_type`) on
  * supervised windows; deep-learning layers are out of scope for a
  * Spark-native engine (SURVEY §2.7), so the substitution is one MLlib
  * tree-ensemble regressor per forecast horizon over the same
  * `x0..x{ts-1} → y1..y{os}` window features — identical data contract
  * (same `_create_dataset` windows, same global min-max normalization,
  * same multi-step output vector), distributed fit/predict,
  * deterministic under a fixed seed. `modelType` mirrors the reference's
  * two-architecture choice: `"rf"` (RandomForest — all trees in one
  * pass, the fast default for many small models) or `"gbt"` (boosted —
  * sequential tree jobs, usually better accuracy per tree).
  *
  * Scale: MLlib's distributed histogram trees; predict is per-row
  * model.transform — no shuffle beyond the feature windows themselves.
  * Each horizon step is an independent model (direct multi-step
  * strategy, not recursive), trained over one cached slim projection
  * (features + labels only — caching the full input frame would drag
  * every carried column through every boosting iteration).
  */
class TimeSeriesForecaster(
    val timeSteps: Int = 50,
    val outputStep: Int = 1,
    val modelType: String = "gbt",
    val maxIter: Int = 20,
    val maxDepth: Int = 5,
    val seed: Long = 7L) {

  require(modelType == "gbt" || modelType == "rf",
    s"unknown modelType $modelType (expected 'gbt' or 'rf')")

  private var models: Seq[Transformer] = Nil
  private val featCols = (0 until timeSteps).map(i => s"x$i")

  private def assemble(df: DataFrame): DataFrame =
    new VectorAssembler()
      .setInputCols(featCols.toArray)
      .setOutputCol("__features")
      .transform(df)

  /** Fit one regressor per horizon on `x0..x{ts-1}` / `y1..y{os}` columns
    * (as produced by [[Forecast.lagFeatures]]).
    */
  def fit(train: DataFrame): this.type = {
    // small-frame fit hygiene (same rationale as FaultDetector.fit): each
    // boosting iteration / horizon model launches a stage over this frame,
    // so a tiny frame on many partitions pays per-iteration scheduling
    // overhead; big frames keep their partitioning. One scan total: the
    // count materializes the cache, and the small-case coalesce is a
    // narrow read of the cached partitions.
    val base = assemble(train)
      .select(col("__features") +: (1 to outputStep).map(j => col(s"y$j")): _*)
      .cache()
    val nRows = base.count()
    val slim = if (nRows <= graft.ml.FaultDetector.SmallFitRows) base.coalesce(4) else base
    try {
      models = (1 to outputStep).map { j =>
        val reg = modelType match {
          case "gbt" =>
            new GBTRegressor()
              .setFeaturesCol("__features").setLabelCol(s"y$j")
              .setPredictionCol(s"pred_y$j")
              .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
          case "rf" =>
            new RandomForestRegressor()
              .setFeaturesCol("__features").setLabelCol(s"y$j")
              .setPredictionCol(s"pred_y$j")
              .setNumTrees(maxIter).setMaxDepth(maxDepth).setSeed(seed)
        }
        reg.fit(slim)
      }
    } finally base.unpersist() // the cache lives on base, not the coalesce view
    this
  }

  /** The fitted per-horizon regressors (index 0 ↔ y1) — bounded driver
    * state the TreeSql replay oracle exports as SQL literals.
    */
  def fittedModels: Seq[Transformer] = models

  /** Adds `pred_y1..pred_y{os}` columns. */
  def predict(df: DataFrame): DataFrame = {
    require(models.nonEmpty, "fit() before predict()")
    val feats = assemble(df)
    models.foldLeft(feats)((acc, m) => m.transform(acc)).drop("__features")
  }

  /** Per-horizon RMSE on held-out windows — the reference's
    * `evaluate_model` MSE metric surface (`time_series_model.py:239-262`),
    * reported per output step.
    */
  def evaluate(test: DataFrame): DataFrame = {
    val preds = predict(test)
    val exprs = (1 to outputStep).map(j =>
      sqrt(avg(pow(col(s"pred_y$j") - col(s"y$j"), 2))).as(s"rmse_y$j"))
    preds.agg(exprs.head, exprs.tail: _*)
  }
}
