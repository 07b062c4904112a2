package graft

import org.apache.spark.sql.functions._

import graft.forecast.{Forecast, TimeSeriesForecaster}

/** T2 preprocessing semantics (`fdi_flow/forecasting/time_series_model.py:
  * 89-166`) and the T3 GBT-per-horizon forecaster substitution.
  */
class ForecastSpec extends SparkSpec {

  test("T2 downsample takes every step-th element per series ([::step])") {
    val df = seriesDf("a" -> (0 until 20).map(_.toDouble))
    val out = Forecast.downsampleMinMax(df, Seq("series_id"), Seq("t"), "value", step = 5)
    // numpy a[::5] on 0..19 → indices 0,5,10,15
    val got = outSeries(out, "a", "value")
    assertSeqAlmost(got, Seq(0.0, 5.0, 10.0, 15.0))
  }

  test("T2 min-max is GLOBAL across series, matching the reference union fit") {
    // train series spans [0,10], test spans [5,25] → global [0,25]
    val df = seriesDf("train0" -> Seq(0.0, 10.0), "test" -> Seq(5.0, 25.0))
    val out = Forecast.downsampleMinMax(df, Seq("series_id"), Seq("t"), "value", step = 1)
    assertSeqAlmost(outSeries(out, "train0", "norm_value"), Seq(0.0, 0.4))
    assertSeqAlmost(outSeries(out, "test", "norm_value"), Seq(0.2, 1.0))
  }

  test("T2 constant series normalizes to 0 (zero-range guard)") {
    val df = seriesDf("a" -> Seq(3.0, 3.0, 3.0))
    val out = Forecast.downsampleMinMax(df, Seq("series_id"), Seq("t"), "value", step = 1)
    assertSeqAlmost(outSeries(out, "a", "norm_value"), Seq(0.0, 0.0, 0.0))
  }

  test("T2 CSV loader reads y in file order and downsamples") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(tmp, "train.csv")
    val pw = new java.io.PrintWriter(f)
    pw.println("x,y")
    (0 until 10).foreach(i => pw.println(s"$i,${i * 2.0}"))
    pw.close()
    val df = Forecast.indexedCsv(spark, f.getAbsolutePath)
    val got = df.orderBy(col("row_idx")).select(col("y")).collect().map(_.getDouble(0))
    assertSeqAlmost(got.toSeq, (0 until 10).map(_ * 2.0))
    f.delete(); tmp.delete()
  }

  test("T3 forecaster beats the persistence baseline on a learnable series") {
    // noiseless sine: x_{t+1} is a smooth function of the lag window
    val n = 400
    val vals = (0 until n).map(i => math.sin(i * 0.2))
    val df = seriesDf("s" -> vals)
    val feats = Forecast.lagFeatures(df, Seq("series_id"), Seq("t"), "value",
      timeSteps = 8, outputStep = 1)
    val train = feats.filter(col("t") < 300)
    val test = feats.filter(col("t") >= 300)
    val fc = new TimeSeriesForecaster(timeSteps = 8, outputStep = 1,
      maxIter = 20, maxDepth = 5, seed = 7L)
    fc.fit(train)
    val rmse = fc.evaluate(test).head().getDouble(0)
    // persistence baseline: predict y1 = last lag (x7)
    val base = test.agg(sqrt(avg(pow(col("x7") - col("y1"), 2)))).head().getDouble(0)
    assert(rmse < base, s"GBT rmse $rmse should beat persistence $base")
    assert(rmse < 0.1, s"GBT rmse $rmse too high for a noiseless sine")
  }

  test("T3 rf modelType also beats persistence (fast path used by t3 query)") {
    val n = 400
    val vals = (0 until n).map(i => math.sin(i * 0.2))
    val feats = Forecast.lagFeatures(seriesDf("s" -> vals), Seq("series_id"),
      Seq("t"), "value", timeSteps = 8, outputStep = 1)
    val train = feats.filter(col("t") < 300)
    val test = feats.filter(col("t") >= 300)
    val fc = new TimeSeriesForecaster(timeSteps = 8, outputStep = 1,
      modelType = "rf", maxIter = 20, maxDepth = 5, seed = 7L)
    fc.fit(train)
    val rmse = fc.evaluate(test).head().getDouble(0)
    val base = test.agg(sqrt(avg(pow(col("x7") - col("y1"), 2)))).head().getDouble(0)
    assert(rmse < base, s"RF rmse $rmse should beat persistence $base")
  }

  test("T3 multi-horizon predict adds one prediction column per step") {
    val vals = (0 until 120).map(i => math.sin(i * 0.3))
    val feats = Forecast.lagFeatures(seriesDf("s" -> vals), Seq("series_id"),
      Seq("t"), "value", timeSteps = 5, outputStep = 3)
    val fc = new TimeSeriesForecaster(timeSteps = 5, outputStep = 3,
      maxIter = 5, maxDepth = 3, seed = 7L)
    fc.fit(feats)
    val out = fc.predict(feats)
    assert(Seq("pred_y1", "pred_y2", "pred_y3").forall(out.columns.contains))
    assert(out.count() == feats.count())
  }
}
