package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.FFT

/** Per-series filters over long-format frames
  * (`keyCols` identify a series, `orderCols` give time order, `valueCol`
  * holds the sample). Reference: `fdi_flow/preprocessing/filters.py`.
  *
  * Window-expressible filters (moving average/median) stay in pure
  * Catalyst window SQL — whole-stage-codegen'd, one shuffle on the series
  * key. True recurrences (EWMA, Holt, scalar Kalman) use the
  * [[Recurrence]] secondary-sort scan kernel. The FFT bandpass is the one
  * whole-series kernel (frequency domain needs the full series).
  */
object Filters {

  private def w(keyCols: Seq[String], orderCols: Seq[String]) =
    Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)

  /** EWMA: `s[0]=x[0]; s[i]=α·x[i]+(1−α)·s[i−1]`
    * (reference `filters.py:69-74`).
    */
  def exponentialSmoothing(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha < 1, "Alpha must be between 0 and 1")
    Recurrence.scan[Double](df, keyCols, orderCols, valueCol, outCol)(
      v => (v, v))(
      (s, v) => { val s2 = alpha * v + (1 - alpha) * s; (s2, s2) })
  }

  /** Holt double exponential smoothing; returns `level + trend` (NOT the
    * level) per reference `filters.py:106-119`. `trend[0] = x[1] − x[0]`
    * needs one-step lookahead, supplied via a `lead()` column; a 1-row
    * series is returned unchanged (reference `:108-109`).
    */
  def doubleExponentialSmoothing(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      alpha: Double = 0.3,
      beta: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "Alpha and beta must be between 0 and 1")
    val nextCol = "__holt_next"
    val withNext = df.withColumn(
      nextCol, lead(col(valueCol).cast(DoubleType), 1).over(w(keyCols, orderCols)))
    val vIdx = withNext.schema.fieldIndex(valueCol)
    val nIdx = withNext.schema.fieldIndex(nextCol)
    // state = (level, trend); emit level + trend
    // NULL samples propagate as NaN (numpy parity) instead of NPE-ing.
    def num(r: org.apache.spark.sql.Row, i: Int): Double = {
      val n = r.getAs[Number](i)
      if (n == null) Double.NaN else n.doubleValue()
    }
    Recurrence.rowScan[(Double, Double)](withNext, keyCols, orderCols,
      Seq(org.apache.spark.sql.types.StructField(outCol, DoubleType, nullable = false))) { r =>
      val x0 = num(r, vIdx)
      if (r.isNullAt(nIdx)) ((x0, 0d), Seq(x0)) // n < 2: unchanged
      else {
        val trend0 = r.getDouble(nIdx) - x0
        ((x0, trend0), Seq(x0 + trend0))
      }
    } { (s, r) =>
      val (level, trend) = s
      val x = num(r, vIdx)
      val level2 = alpha * x + (1 - alpha) * (level + trend)
      val trend2 = beta * (level2 - level) + (1 - beta) * trend
      ((level2, trend2), Seq(level2 + trend2))
    }.drop(nextCol)
  }

  /** Moving average, valid mode (`pad_with_zeros=False`): the output only
    * exists where a full trailing window fits, so rows with fewer than
    * `windowSize−1` predecessors are DROPPED — output is `w−1` rows shorter
    * per series, mirroring `np.convolve(..., 'valid')` at reference
    * `filters.py:159-160`. A series shorter than the window is returned
    * unchanged with the raw value (reference `:152-153`).
    */
  def movingAverageValid(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      windowSize: Int = 3): DataFrame = {
    require(windowSize > 0, "Window size must be positive")
    val win = w(keyCols, orderCols)
    val v = col(valueCol).cast(DoubleType)
    df.withColumn("__rn", row_number().over(win))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .withColumn(outCol,
        avg(v).over(win.rowsBetween(-(windowSize - 1), 0)))
      .filter(col("__n") < windowSize || col("__rn") >= windowSize)
      .withColumn(outCol,
        when(col("__n") < windowSize, v).otherwise(col(outCol)))
      .drop("__rn", "__n")
  }

  /** Moving average, padded mode (`pad_with_zeros=True` — despite the name
    * the reference pads by REPLICATING the edge values, `np.pad(...,
    * mode='edge')` at `filters.py:162-174`): centered window with
    * `padLeft = (w−1)/2` (and one extra on the right for even `w`), where
    * out-of-range positions take the first/last value of the series.
    *
    * Expressed edge-exactly in pure window SQL: truncated centered sum plus
    * `missing · edgeValue` correction — no pad rows materialized.
    */
  def movingAveragePadded(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      windowSize: Int = 3): DataFrame = {
    require(windowSize > 0, "Window size must be positive")
    val padL = (windowSize - 1) / 2
    val padR = windowSize - 1 - padL // = padL, or padL+1 for even w
    val win = w(keyCols, orderCols)
    val full = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val v = col(valueCol).cast(DoubleType)
    val res = df
      .withColumn("__rn", row_number().over(win))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .withColumn("__sum", sum(v).over(win.rowsBetween(-padL, padR)))
      .withColumn("__first", first(v).over(full))
      .withColumn("__last", last(v).over(full))
    val missL = greatest(lit(0), lit(padL) - (col("__rn") - 1)).cast(DoubleType)
    val missR = greatest(lit(0), col("__rn") + padR - col("__n")).cast(DoubleType)
    res
      .withColumn(outCol,
        when(col("__n") < windowSize, v) // series shorter than window: unchanged
          .otherwise((col("__sum") + missL * col("__first") + missR * col("__last"))
            / windowSize))
      .drop("__rn", "__n", "__sum", "__first", "__last")
  }

  /** Median filter: centered running median over a series padded by
    * `w/2` on BOTH sides with the edge value (`pad_with_zeros=false`) or
    * zeros (`true`) — reference `filters.py:219-230`. Implemented by
    * materializing the `w/2` pad rows per series (tiny: 2·(w/2) rows per
    * series) and taking an exact manual median over the then-always-full
    * centered frame; numpy parity includes averaging the two middle
    * elements for even `w`.
    */
  def medianFilter(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      windowSize: Int = 3,
      padWithZeros: Boolean = false): DataFrame = {
    require(windowSize > 0, "Window size must be positive")
    val pad = windowSize / 2
    val win = w(keyCols, orderCols)
    val v = col(valueCol).cast(DoubleType)
    val base = df
      .withColumn("__rn", row_number().over(win))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .withColumn("__v", v)
    if (pad == 0) {
      // w == 1: median of a single sample is the sample
      return base.withColumn(outCol, col("__v")).drop("__rn", "__n", "__v")
    }
    val keep = base.columns.map(col) // includes helpers; dropped at the end
    val padVal = (edge: Column) => if (padWithZeros) lit(0d) else edge
    val leftPads = base.filter(col("__rn") === 1)
      .withColumn("__j", explode(sequence(lit(1), lit(pad))))
      .withColumn("__prn", lit(1) - col("__j"))
      .withColumn("__v", padVal(col("__v")))
      .withColumn("__pad", lit(1))
      .drop("__j")
    val rightPads = base.filter(col("__rn") === col("__n"))
      .withColumn("__j", explode(sequence(lit(1), lit(pad))))
      .withColumn("__prn", col("__n") + col("__j"))
      .withColumn("__v", padVal(col("__v")))
      .withColumn("__pad", lit(1))
      .drop("__j")
    val real = base.withColumn("__prn", col("__rn")).withColumn("__pad", lit(0))
    val padded = real.unionByName(leftPads).unionByName(rightPads)
    val pwin = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__prn"))
      .rowsBetween(-pad, windowSize - 1 - pad)
    val sortedWin = sort_array(collect_list(col("__v")).over(pwin))
    val m = windowSize / 2
    val medianExpr =
      if (windowSize % 2 == 1) element_at(sortedWin, m + 1)
      else (element_at(sortedWin, m) + element_at(sortedWin, m + 1)) / 2d
    padded
      .withColumn(outCol, medianExpr)
      .filter(col("__pad") === 0)
      .drop("__rn", "__n", "__v", "__prn", "__pad")
  }

  /** Scalar 1-D Kalman filter (constant-state model) — reference
    * `filters.py:332-356`: `x̂[0] = x0 (or x[0]); p += q;
    * K = p/(p+r); x += K(z−x); p = (1−K)p`. First output is the initial
    * state, NOT updated with the first measurement.
    */
  def kalmanScalar(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      q: Double = 1.0,
      r: Double = 1.0,
      x0: Option[Double] = None,
      p0: Double = 1.0): DataFrame = {
    // state = (x, p)
    Recurrence.scan[(Double, Double)](df, keyCols, orderCols, valueCol, outCol)(
      v => { val x = x0.getOrElse(v); ((x, p0), x) })(
      (s, z) => {
        val (x, p) = s
        val pPred = p + q
        val k = pPred / (pPred + r)
        val x2 = x + k * (z - x)
        val p2 = (1 - k) * pPred
        ((x2, p2), x2)
      })
  }

  /** FFT bandpass: zero every frequency bin with `|freq| < low` or
    * `|freq| > high`, inverse-transform, keep the real part — reference
    * `filters.py:275-285`. Needs the whole series in the frequency domain,
    * so each series is collected to an array (one row per series), passed
    * through an in-house iterative FFT ([[graft.functions.FFT]] —
    * Cooley–Tukey for power-of-two lengths, Bluestein otherwise, matching
    * `np.fft` results), and exploded back to long format.
    *
    * Output schema: keyCols ++ (orderCols head order index) ++ valueCol,
    * outCol — non-key columns are not preserved (frequency-domain ops are
    * whole-series rewrites).
    *
    * Scale bound: unlike the streaming recurrence kernels, this op
    * materializes ONE FULL SERIES per row (inherent to the frequency
    * domain — every output sample depends on every input sample). Memory
    * per task is O(series length); a 10M-sample double series is ~80 MB
    * of array plus FFT workspace, which bounds the practical series
    * length to tens of millions of samples per series regardless of
    * cluster size. Series COUNT scales freely. The same bound applies to
    * the spline/resampling whole-series ops in [[Segmenters]].
    */
  def bandpass(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      lowCutoff: Double,
      highCutoff: Double,
      sampleRate: Double): DataFrame = {
    require(lowCutoff < highCutoff, "Low cutoff must be less than high cutoff")
    require(sampleRate > 0, "Sample rate must be positive")
    val bp = udf { (xs: Seq[Double]) =>
      FFT.bandpass(xs.toArray, lowCutoff, highCutoff, sampleRate).toSeq
    }
    val sorted = struct(orderCols.map(col) :+ col(valueCol).cast(DoubleType).as("v"): _*)
    val grouped = df
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(sorted)).as("__rows"))
      .withColumn("__vals", transform(col("__rows"), r => r.getField("v")))
      .withColumn("__filt", bp(col("__vals")))
    grouped
      .select(keyCols.map(col) :+
        posexplode(arrays_zip(col("__rows"), col("__filt"))).as(Seq("__pos", "__z")): _*)
      .select(keyCols.map(col) ++
        orderCols.map(oc => col("__z.__rows").getField(oc).as(oc)) ++
        Seq(col("__z.__rows.v").as(valueCol), col("__z.__filt").as(outCol)): _*)
  }
}
