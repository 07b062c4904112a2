package graft.forecast

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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

  /** Reference T2 preprocessing (`fdi_flow/forecasting/time_series_model.py:
    * 89-166`): take every `step`-th sample of each series (`[::200]`), then
    * min-max normalize to [0,1] using the GLOBAL min/max computed over ALL
    * series together (train *and* test — the reference deliberately fits the
    * scaler on the union, `:120-128`).
    *
    * Spark shape: one window pass for per-series row numbers (downsample
    * predicate), one scalar global agg (2 doubles → broadcast by Catalyst as
    * a cross-joined single-row literal), one projection. No per-series
    * collect; the global min/max is the only driver-sized value.
    */
  def downsampleMinMax(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      step: Int,
      outCol: String = "norm_value"): DataFrame = {
    require(step > 0)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val sampled = df
      .withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % step === 0)
    val stats = sampled.agg(
      min(col(valueCol).cast("double")).as("__gmin"),
      max(col(valueCol).cast("double")).as("__gmax"))
    val norm = sampled.crossJoin(broadcast(stats))
    val denom = col("__gmax") - col("__gmin")
    norm
      .withColumn(outCol,
        when(denom === 0d, lit(0d))
          .otherwise((col(valueCol).cast("double") - col("__gmin")) / denom))
      .drop("__rn")
  }

  /** CSV file loader matching the reference's `pd.read_csv(f)["y"]` input
    * surface (`time_series_model.py:106-118`): each file is one series with
    * a `y` column; row order is file order.
    *
    * Spark CSV split-reads don't preserve order in the DataFrame API, so the
    * per-file positional index is minted with RDD `zipWithIndex` (partition
    * order follows file offsets — deterministic for a given file). One file
    * per call; callers union with a `series` tag.
    */
  def indexedCsv(spark: SparkSession, path: String, yCol: String = "y"): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "false").csv(path)
    val yIdx = raw.columns.indexOf(yCol)
    require(yIdx >= 0, s"column $yCol not in $path (${raw.columns.mkString(",")})")
    val rows = raw.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i, Option(r.getString(yIdx)).map(_.toDouble).orNull)
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("row_idx", LongType, nullable = false),
      StructField("y", DoubleType, nullable = true))))
  }

  /** Reference `load_and_preprocess_data(train_filenames, test_filename)`
    * end-to-end (`time_series_model.py:89-166`): load each CSV's `y`, take
    * `[::step]`, min-max normalize on the union's global min/max, and emit
    * supervised windows via [[lagFeatures]]. Returns (train, test) feature
    * frames with columns `x0..x{ts-1}, y1..y{os}`.
    */
  def loadAndPreprocessData(
      spark: SparkSession,
      trainFiles: Seq[String],
      testFile: String,
      timeSteps: Int = 50,
      outputStep: Int = 1,
      step: Int = 200): DataFrame = {
    val tagged = (trainFiles.zipWithIndex.map { case (f, i) =>
      indexedCsv(spark, f).withColumn("series", lit(s"train$i"))
    } :+ indexedCsv(spark, testFile).withColumn("series", lit("test")))
      .reduce(_ unionByName _)
    val norm = downsampleMinMax(tagged, Seq("series"), Seq("row_idx"), "y", step)
    lagFeatures(norm, Seq("series"), Seq("row_idx"), "norm_value", timeSteps, outputStep)
  }
}
