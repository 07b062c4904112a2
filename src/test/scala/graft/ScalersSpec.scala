package graft

import graft.operators.Scalers

/** Golden values from the reference (`fdi_flow/preprocessing/scalers.py`). */
class ScalersSpec extends SparkSpec {

  val z = Seq(1.0, 2.0, 3.0, 4.0)

  test("S1 standard scaler uses POPULATION std") {
    val df = Scalers.standard(seriesDf("a" -> z), Seq("series_id"), "value", "out")
    assertSeqAlmost(outSeries(df, "a", "out"),
      Seq(-1.3416407864998738, -0.4472135954999579, 0.4472135954999579, 1.3416407864998738), 1e-12)
  }

  test("S1 constant series centered but not divided") {
    val df = Scalers.standard(seriesDf("a" -> Seq(5.0, 5.0, 5.0)), Seq("series_id"), "value", "out")
    assertSeqAlmost(outSeries(df, "a", "out"), Seq(0.0, 0.0, 0.0))
  }

  test("S2 minmax to [0,1]") {
    val df = Scalers.minMax(seriesDf("a" -> z), Seq("series_id"), "value", "out")
    assertSeqAlmost(outSeries(df, "a", "out"),
      Seq(0.0, 0.3333333333333333, 0.6666666666666666, 1.0), 1e-12)
  }

  test("S2 constant series maps to range midpoint") {
    val df = Scalers.minMax(seriesDf("a" -> Seq(3.0, 3.0)), Seq("series_id"), "value", "out",
      lo = -1.0, hi = 2.0)
    assertSeqAlmost(outSeries(df, "a", "out"), Seq(0.5, 0.5))
  }

  test("S3 robust scaler (median/IQR, linear-interp percentiles)") {
    val df = Scalers.robust(seriesDf("a" -> Seq(1.0, 2.0, 3.0, 4.0, 100.0)),
      Seq("series_id"), "value", "out")
    assertSeqAlmost(outSeries(df, "a", "out"), Seq(-1.0, -0.5, 0.0, 0.5, 48.5), 1e-12)
  }

  test("scalers handle multiple series independently") {
    val df = Scalers.minMax(seriesDf("a" -> z, "b" -> Seq(0.0, 10.0)),
      Seq("series_id"), "value", "out")
    assertSeqAlmost(outSeries(df, "b", "out"), Seq(0.0, 1.0))
  }
}
