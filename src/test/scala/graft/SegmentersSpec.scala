package graft

import org.apache.spark.sql.functions._
import graft.operators.Segmenters

/** Golden values from the reference (`fdi_flow/preprocessing/segmenters.py`,
  * pandas Series path — the 1-D ndarray path crashes on a missing
  * `_segment_1d`).
  */
class SegmentersSpec extends SparkSpec {

  val ramp = (0 until 10).map(_.toDouble)

  private def windows(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.orderBy(col("window_id"), col("offset"))
      .select(col("window_id"), col("value"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).toSeq }

  test("G1 w=4 step=1 dropLast yields 7 windows") {
    val df = Segmenters.segment(seriesDf("a" -> ramp), Seq("series_id"), Seq("t"), 4, 1)
    val w = windows(df)
    assert(w.size == 7)
    assert(w(0L) == Seq(0.0, 1.0, 2.0, 3.0))
    assert(w(6L) == Seq(6.0, 7.0, 8.0, 9.0))
  }

  test("G1 w=4 step=3 dropLast=false appends (duplicate) tail window") {
    val df = Segmenters.segment(seriesDf("a" -> ramp), Seq("series_id"), Seq("t"),
      4, 3, dropLast = false)
    val w = windows(df)
    assert(w.size == 4)
    assert(w(0L) == Seq(0.0, 1.0, 2.0, 3.0))
    assert(w(1L) == Seq(3.0, 4.0, 5.0, 6.0))
    assert(w(2L) == Seq(6.0, 7.0, 8.0, 9.0))
    assert(w(3L) == Seq(6.0, 7.0, 8.0, 9.0)) // reference duplicates the tail
  }

  test("G1 w=4 step=2 dropLast=false matches reference") {
    val df = Segmenters.segment(seriesDf("a" -> ramp), Seq("series_id"), Seq("t"),
      4, 2, dropLast = false)
    val w = windows(df)
    assert(w.size == 5)
    assert(w(1L) == Seq(2.0, 3.0, 4.0, 5.0))
    assert(w(4L) == Seq(6.0, 7.0, 8.0, 9.0))
  }

  test("G1 w=4 step=3 dropLast=true has no tail") {
    val df = Segmenters.segment(seriesDf("a" -> ramp), Seq("series_id"), Seq("t"), 4, 3)
    assert(windows(df).size == 3)
  }

  test("G1 series shorter than window yields no windows (documented deviation)") {
    val df = Segmenters.segment(seriesDf("a" -> Seq(1.0, 2.0)), Seq("series_id"), Seq("t"), 4)
    assert(df.count() == 0)
  }

  test("G2 linear resample 10 -> 5") {
    val df = Segmenters.resample(seriesDf("a" -> ramp), Seq("series_id"), Seq("t"), "value", 5)
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    assertSeqAlmost(got, Seq(0.0, 2.25, 4.5, 6.75, 9.0), 1e-12)
  }

  test("G2 nearest resample ties break DOWNWARD (scipy semantics)") {
    val df = Segmenters.resample(seriesDf("a" -> ramp), Seq("series_id"), Seq("t"), "value", 5,
      method = "nearest")
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    // pos = 0, 2.25, 4.5, 6.75, 9 -> nearest (tie at 4.5 goes DOWN) = 0, 2, 4, 7, 9
    assertSeqAlmost(got, Seq(0.0, 2.0, 4.0, 7.0, 9.0))
  }

  test("G2 cubic resample reproduces a cubic polynomial exactly (not-a-knot)") {
    // f(t) = t^3 sampled at 7 points; NAK spline through cubic samples == f
    val ys = (0 until 7).map(i => math.pow(i, 3))
    val df = Segmenters.resample(seriesDf("a" -> ys), Seq("series_id"), Seq("t"), "value", 13,
      method = "cubic")
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    val exp = (0 until 13).map(j => math.pow(j * 6.0 / 12.0, 3)).toSeq
    assertSeqAlmost(got, exp, 1e-8)
  }

  test("G3 degree-1 upsample is linear interpolation") {
    val df = Segmenters.splineUpsample(seriesDf("a" -> Seq(0.0, 1.0, 4.0, 9.0, 16.0)),
      Seq("series_id"), Seq("t"), "value", 9, degree = 1)
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    assertSeqAlmost(got, Seq(0.0, 0.5, 1.0, 2.5, 4.0, 6.5, 9.0, 12.5, 16.0), 1e-12)
  }

  test("G3 degree-2 upsample reproduces a quadratic polynomial exactly") {
    // f(t) = 3t² − 2t + 1 sampled at 6 points on [0,1]; the interpolating
    // quadratic B-spline contains all degree-≤2 polynomials for any knot
    // vector, so the upsample must reproduce f on the target grid exactly
    def f(x: Double) = 3 * x * x - 2 * x + 1
    val ys = (0 until 6).map(i => f(i / 5.0))
    val df = Segmenters.splineUpsample(seriesDf("a" -> ys),
      Seq("series_id"), Seq("t"), "value", 11, degree = 2)
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    val exp = (0 until 11).map(j => f(j / 10.0)).toSeq
    assertSeqAlmost(got, exp, 1e-10)
  }

  test("G3 degree-2 upsample interpolates the data points (non-polynomial)") {
    // n=5 on grid i/4; target grid j/8 hits every data point at even j —
    // the k=2 interpolating spline must pass through the data exactly
    val ys = Seq(1.0, -2.0, 0.5, 4.0, 3.0)
    val df = Segmenters.splineUpsample(seriesDf("a" -> ys),
      Seq("series_id"), Seq("t"), "value", 9, degree = 2)
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    (0 until 5).foreach { i =>
      assert(math.abs(got(2 * i) - ys(i)) < 1e-10,
        s"data point $i: got ${got(2 * i)}, want ${ys(i)}")
    }
    // and differs from both the linear and the cubic interpolant between
    // knots (it is genuinely the quadratic spline, not a substitute)
    val lin = Segmenters.splineUpsample(seriesDf("a" -> ys),
      Seq("series_id"), Seq("t"), "value", 9, degree = 1)
      .orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    val cub = Segmenters.splineUpsample(seriesDf("a" -> ys),
      Seq("series_id"), Seq("t"), "value", 9, degree = 3)
      .orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0)).toSeq
    assert((0 until 9).exists(j => math.abs(got(j) - lin(j)) > 1e-6))
    assert((0 until 9).exists(j => math.abs(got(j) - cub(j)) > 1e-6))
  }

  test("G3 smoothing spline honors the FITPACK residual bound") {
    import graft.functions.Spline
    // noisy samples of a smooth curve
    val n = 25
    val xs = Array.tabulate(n)(i => i.toDouble / (n - 1))
    val noise = Array.tabulate(n)(i => 0.2 * math.sin(i * 12.9898) * math.cos(i * 7.233))
    val ys = Array.tabulate(n)(i => math.sin(2 * math.Pi * xs(i)) + noise(i))
    val s = 0.05
    val fitted = Spline.smoothing(xs, ys, s, xs)
    val resid = xs.indices.map(i => math.pow(fitted(i) - ys(i), 2)).sum
    // defining property: residual meets the bound and is genuinely used
    // (not interpolating: resid > 0; not over-smoothing: resid ≈ S)
    assert(resid <= s * 1.0001, s"residual $resid exceeds bound $s")
    assert(resid > 0.9 * s, s"residual $resid far below bound $s — over-interpolating")
    // roughness is strictly below the interpolant's
    def roughness(vals: Array[Double]): Double = {
      val fine = Array.tabulate(400)(j => j / 399.0)
      val v = vals
      val y2 = Spline.smoothing(xs, v, 0.0000001, fine)
      (1 until 399).map { j =>
        val d2 = y2(j + 1) - 2 * y2(j) + y2(j - 1)
        d2 * d2
      }.sum
    }
    assert(roughness(fitted) < roughness(ys))
  }

  test("G3 smoothing spline with huge S returns the least-squares line") {
    import graft.functions.Spline
    val xs = Array(0.0, 0.25, 0.5, 0.75, 1.0)
    val ys = Array(0.1, 0.9, 2.1, 2.9, 4.1) // ≈ line y = 4x
    val out = Spline.smoothing(xs, ys, 1e6, Array(0.0, 0.5, 1.0))
    // least-squares line through the data evaluated at the grid
    val mx = xs.sum / 5; val my = ys.sum / 5
    val slope = xs.indices.map(i => (xs(i) - mx) * (ys(i) - my)).sum /
      xs.indices.map(i => (xs(i) - mx) * (xs(i) - mx)).sum
    val exp = Array(0.0, 0.5, 1.0).map(x => my + slope * (x - mx))
    assertSeqAlmost(out.toSeq, exp.toSeq, 1e-9)
  }

  test("G3 smoothing upsample operator end to end") {
    val ys = Seq(0.0, 1.2, 0.9, 2.1, 1.8, 3.2, 2.9, 4.1)
    val df = Segmenters.splineUpsample(seriesDf("a" -> ys),
      Seq("series_id"), Seq("t"), "value", 15, degree = 3, smoothing = 0.5)
    val got = df.orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0))
    assert(got.length == 15)
    assert(got.forall(v => !v.isNaN && !v.isInfinite))
    // smoothing > 0 must differ from the interpolating cubic
    val interp = Segmenters.splineUpsample(seriesDf("a" -> ys),
      Seq("series_id"), Seq("t"), "value", 15, degree = 3)
      .orderBy(col("idx")).select(col("value")).collect().map(_.getDouble(0))
    assert(got.indices.exists(j => math.abs(got(j) - interp(j)) > 1e-4))
  }

  test("G4 failure encoder: mode of non-zero when ratio >= threshold") {
    val f = Seq(0.0, 2.0, 0.0, 2.0, 0.0, 3.0, 2.0, 0.0, 0.0, 0.0)
    val df = Segmenters.failureEncode(seriesDf("a" -> f), Seq("series_id"), Seq("t"), "value", 10.0)
    assert(df.collect().head.getAs[Double]("failure_code") == 2.0)
    val df2 = Segmenters.failureEncode(seriesDf("a" -> f), Seq("series_id"), Seq("t"), "value", 50.0)
    assert(df2.collect().head.getAs[Double]("failure_code") == 0.0)
  }

  test("G4 failure encoder: count ties break by first encounter") {
    val f = Seq(0.0, 3.0, 0.0, 2.0, 0.0, 2.0, 3.0, 0.0, 0.0, 0.0)
    val df = Segmenters.failureEncode(seriesDf("a" -> f), Seq("series_id"), Seq("t"), "value", 10.0)
    assert(df.collect().head.getAs[Double]("failure_code") == 3.0)
  }

  test("G4 all-zero series encodes 0") {
    val df = Segmenters.failureEncode(seriesDf("a" -> Seq(0.0, 0.0)), Seq("series_id"), Seq("t"), "value")
    assert(df.collect().head.getAs[Double]("failure_code") == 0.0)
  }
}
