package graft

import org.apache.spark.sql.functions._

import graft.forecast.{DeepForecaster, DeepNet, Forecast, TimeSeriesForecaster}
import graft.functions.HashRandom

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

  /** Central-difference gradient check of the hand-written BPTT: for a
    * sample of parameters, (L(p+ε) − L(p−ε)) / 2ε must match the analytic
    * gradient — the standard proof that every backprop equation is right.
    */
  private def gradCheck(cfg: DeepNet.Cfg): Unit = {
    val x = Array.tabulate(cfg.rawT)(t => math.sin(t * 0.7) + 0.1 * t)
    val y = Array.tabulate(cfg.os)(j => 0.3 * j - 0.2)
    val p = DeepNet.init(cfg, seed = 11L)
    // perturb the init so no gate sits exactly at its symmetric point
    for (i <- p.indices) p(i) += 0.05 * HashRandom.gaussian(99L, 0L, i.toLong)
    val grad = new Array[Double](cfg.size)
    DeepNet.forwardBackward(x, y, p, cfg, null, grad)
    val eps = 1e-6
    // probe every region of the layout: W, U, b (all four gate blocks),
    // Wd, bd, and (convlstm) Wc, bc
    val probes = Seq(cfg.offW, cfg.offW + cfg.d, cfg.offU, cfg.offU + cfg.h,
      cfg.offB, cfg.offB + cfg.h, cfg.offB + 2 * cfg.h, cfg.offB + 3 * cfg.h,
      cfg.offWd, cfg.offBd) ++
      (if (cfg.conv) Seq(cfg.offWc, cfg.offWc + 1, cfg.offBc) else Nil)
    def lossAt(pp: Array[Double]): Double = {
      val pred = DeepNet.predict(x, pp, cfg)
      pred.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum / cfg.os
    }
    probes.foreach { idx =>
      val saved = p(idx)
      p(idx) = saved + eps; val lp = lossAt(p)
      p(idx) = saved - eps; val lm = lossAt(p)
      p(idx) = saved
      val num = (lp - lm) / (2 * eps)
      val rel = math.abs(num - grad(idx)) /
        math.max(1e-8, math.max(math.abs(num), math.abs(grad(idx))))
      assert(rel < 1e-5 || math.abs(num - grad(idx)) < 1e-9,
        s"grad mismatch at $idx: analytic ${grad(idx)} vs numeric $num (rel $rel)")
    }
  }

  test("T3-deep LSTM backprop passes the numerical gradient check") {
    gradCheck(DeepNet.Cfg(rawT = 6, h = 4, os = 2,
      conv = false, filters = 0, k = 0, pool = 0))
  }

  test("T3-deep Conv1D+MaxPool+LSTM backprop passes the numerical gradient check") {
    gradCheck(DeepNet.Cfg(rawT = 9, h = 3, os = 2,
      conv = true, filters = 3, k = 3, pool = 2))
  }

  test("T3-deep LSTM learns a sine and beats persistence; seeded runs identical") {
    val n = 300
    val vals = (0 until n).map(i => math.sin(i * 0.2))
    val feats = Forecast.lagFeatures(seriesDf("s" -> vals), Seq("series_id"),
      Seq("t"), "value", timeSteps = 8, outputStep = 1).cache()
    val train = feats.filter(col("t") < 220)
    val test = feats.filter(col("t") >= 220)
    def run(): (Double, Seq[Double]) = {
      val fc = new DeepForecaster(timeSteps = 8, outputStep = 1,
        modelType = "lstm", hidden = 12, dropout = 0.0,
        epochs = 120, learningRate = 0.02, seed = 7L)
      fc.fit(train)
      val preds = fc.predict(test).orderBy(col("t"))
        .select(col("pred_y1")).collect().map(_.getDouble(0)).toSeq
      (fc.evaluate(test).head().getDouble(0), preds)
    }
    val (rmse, preds1) = run()
    val base = test.agg(sqrt(avg(pow(col("x7") - col("y1"), 2)))).head().getDouble(0)
    assert(rmse < base, s"LSTM rmse $rmse should beat persistence $base")
    assert(rmse < 0.15, s"LSTM rmse $rmse too high for a noiseless sine")
    val (_, preds2) = run()
    assert(preds1 == preds2, "same seed must reproduce bit-identical training")
  }

  test("T3-deep convlstm trains end-to-end and improves on its own init") {
    val n = 260
    val vals = (0 until n).map(i => math.sin(i * 0.25) + 0.3 * math.sin(i * 0.05))
    val feats = Forecast.lagFeatures(seriesDf("s" -> vals), Seq("series_id"),
      Seq("t"), "value", timeSteps = 12, outputStep = 2).cache()
    val train = feats.filter(col("t") < 200)
    val test = feats.filter(col("t") >= 200)
    val fc = new DeepForecaster(timeSteps = 12, outputStep = 2,
      modelType = "convlstm", hidden = 8, filters = 4, dropout = 0.1,
      epochs = 60, learningRate = 0.02, seed = 7L)
    fc.fit(train)
    assert(fc.lossHistory.length == 60)
    assert(fc.lossHistory.last < fc.lossHistory.head * 0.5,
      s"training must reduce loss: ${fc.lossHistory.head} -> ${fc.lossHistory.last}")
    val out = fc.predict(test)
    assert(Seq("pred_y1", "pred_y2").forall(out.columns.contains))
    assert(out.count() == test.count())
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
