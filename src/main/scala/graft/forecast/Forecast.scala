package graft.forecast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-window feature builder for forecasting (reference T1,
  * `fdi_flow/forecasting/time_series_model.py:67-86`):
  * `X[i] = data[i : i+timeSteps]`, `Y[i] = data[i+timeSteps :
  * i+timeSteps+outputStep]` — i.e. each emitted row carries `timeSteps`
  * trailing lags (including the current value) and `outputStep` leads,
  * keeping only complete windows (count `n − ts − os + 1` per series).
  *
  * Lag/lead window functions — single shuffle, codegen'd, no arrays
  * materialized; at 100 TB this is the canonical way to mint training
  * rows for a forecaster.
  */
object Forecast {

  def lagFeatures(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      timeSteps: Int,
      outputStep: Int): DataFrame = {
    require(timeSteps > 0 && outputStep > 0)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val v = col(valueCol).cast("double")
    // x_0 .. x_{ts-1}: the window ending at the current row
    val lags = (0 until timeSteps).map(j =>
      lag(v, timeSteps - 1 - j).over(w).as(s"x$j"))
    val leads = (1 to outputStep).map(j => lead(v, j).over(w).as(s"y$j"))
    val out = df.select((df.columns.map(col) ++ lags ++ leads): _*)
    // complete windows only
    out.filter(col("x0").isNotNull && col(s"y$outputStep").isNotNull)
  }
}
