package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Spline

/** Segmentation / resampling / label-encoding over long-format series.
  * Reference: `fdi_flow/preprocessing/segmenters.py`.
  */
object Segmenters {

  private def w(keyCols: Seq[String], orderCols: Seq[String]) =
    Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)

  /** Sliding-window segmentation (reference `segmenters.py:36-70`): windows
    * `[k·step, k·step + w)` (0-based) while they fit; when `dropLast=false`
    * and the condition `n − lastStart − step > 0` holds, ONE extra
    * (overlapping) tail window of the last `w` samples is appended
    * (`:51-53`). A series shorter than `w` yields no windows (the reference
    * crashes on an unbound loop variable there — documented deviation,
    * SURVEY §7.5).
    *
    * Output: input columns + `windowCol` (0-based window id) +
    * `offsetCol` (0-based position within the window). Implemented as
    * row_number + per-row `explode(sequence(...))` of the window ids the
    * row belongs to — one shuffle, no self-join, scales linearly in
    * rows × (w/step) output amplification.
    */
  def segment(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      windowSize: Int,
      step: Int = 1,
      dropLast: Boolean = true,
      windowCol: String = "window_id",
      offsetCol: String = "offset"): DataFrame = {
    require(windowSize > 0, "Window size must be positive")
    require(step > 0, "Step must be positive")
    val win = w(keyCols, orderCols)
    val base = df
      .withColumn("__rn", row_number().over(win) - 1) // 0-based
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("__n") >= windowSize)
    // regular windows: k in [ceil((rn−w+1)/step), floor(rn/step)] ∩ [0, K−1]
    // with K = floor((n−w)/step) + 1
    val bigK = floor((col("__n") - windowSize) / step) + 1
    val kLo = greatest(lit(0L), ceil((col("__rn") - windowSize + 1).cast(DoubleType) / step))
    val kHi = least(bigK - 1, floor(col("__rn") / step))
    val regular = base
      .withColumn(windowCol, explode_outer(
        when(kLo <= kHi, sequence(kLo.cast("long"), kHi.cast("long")))))
      .filter(col(windowCol).isNotNull)
      .withColumn(offsetCol, col("__rn") - col(windowCol) * step)
    if (dropLast) {
      regular.drop("__rn", "__n")
    } else {
      // tail window (id K) iff n − (K−1)·step − step > 0; covers rn ∈ [n−w, n)
      val tail = base
        .filter((col("__n") - bigK * step) > 0 && col("__rn") >= col("__n") - windowSize)
        .withColumn(windowCol, bigK)
        .withColumn(offsetCol, col("__rn") - (col("__n") - windowSize))
      regular.unionByName(tail).drop("__rn", "__n")
    }
  }

  /** Resample each series to exactly `targetSize` points on a normalized
    * [0,1] grid (reference `segmenters.py:144-154`): original point `i`
    * sits at `i/(n−1)`, new point `j` at `j/(T−1)`; values come from
    * linear / nearest / cubic interpolation (`scipy.interp1d` semantics:
    * nearest breaks ties DOWNWARD; cubic is the not-a-knot spline).
    *
    * `linear`/`nearest` run as pure SQL — a bracketing equi-join of the
    * generated grid against `row_number`-indexed samples (no UDF, fully
    * codegen). `cubic` delegates to [[resampleCubic]].
    *
    * Output: keyCols + `idx` (0-based new grid index) + `valueCol`.
    */
  def resample(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      targetSize: Int,
      method: String = "linear"): DataFrame = {
    require(targetSize > 0, "Target size must be positive")
    method match {
      case "cubic" => resampleCubic(df, keyCols, orderCols, valueCol, targetSize)
      case "linear" | "nearest" =>
        val win = w(keyCols, orderCols)
        val indexed = df
          .select(keyCols.map(col) :+ col(valueCol).cast(DoubleType).as("__v") :+
            row_number().over(win).as("__rn"): _*)
        val counts = indexed.groupBy(keyCols.map(col): _*)
          .agg(max("__rn").as("__n"))
        // grid: one row per (series, j); pos in ORIGINAL sample units
        val grid = counts
          .withColumn("idx", explode(sequence(lit(0), lit(targetSize - 1))))
          .withColumn("__pos",
            when(lit(targetSize) === 1, lit(0d))
              .otherwise(col("idx") * (col("__n") - 1).cast(DoubleType) / (targetSize - 1)))
        if (method == "nearest") {
          // scipy: boundary at k+0.5, ties take the LOWER index
          val nearRn = greatest(lit(0d), ceil(col("__pos") - 0.5d)).cast("long") + 1
          grid.withColumn("__rn", least(nearRn, col("__n")))
            .join(indexed, keyCols :+ "__rn")
            .select(keyCols.map(col) :+ col("idx") :+ col("__v").as(valueCol): _*)
        } else {
          val k = least(floor(col("__pos")).cast("long"), col("__n") - 2) // bracket start, 0-based
          val g2 = grid
            .withColumn("__k", greatest(lit(0L), k))
            .withColumn("__frac", col("__pos") - col("__k"))
          val a = indexed.select((keyCols.map(col) :+ (col("__rn") - 1).as("__k") :+ col("__v").as("__a")): _*)
          val b = indexed.select((keyCols.map(col) :+ (col("__rn") - 2).as("__k") :+ col("__v").as("__b")): _*)
          g2.join(a, keyCols :+ "__k")
            .join(b, keyCols :+ "__k", "left") // __b is null when n == 1
            .withColumn(valueCol,
              when(col("__b").isNull, col("__a"))
                .otherwise(col("__a") + (col("__b") - col("__a")) * col("__frac")))
            .select(keyCols.map(col) :+ col("idx") :+ col(valueCol): _*)
        }
      case other => throw new IllegalArgumentException(
        s"Method must be 'linear', 'nearest' or 'cubic', got $other")
    }
  }

  /** Cubic-spline resampling: collect each series (one row per series),
    * evaluate the not-a-knot spline on the new grid, explode back.
    */
  def resampleCubic(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      targetSize: Int): DataFrame =
    splineEval(df, keyCols, orderCols, valueCol, targetSize, degree = 3)

  /** Spline upsampler (reference `segmenters.py:215-225`): fit a spline
    * of `degree` on the [0,1] grid and evaluate on the `targetSize` grid.
    * Degree 1 = linear (`splrep k=1`); degree 2 = true interpolating
    * quadratic B-spline with midpoint interior knots (`splrep(k=2, s=0)`);
    * degree 3 = not-a-knot cubic (`splrep(k=3, s=0)`). `smoothing > 0`
    * fits the cubic smoothing spline under the FITPACK residual bound
    * `Σ resid² ≤ smoothing` (Reinsch; [[graft.functions.Spline.smoothing]])
    * — degree must be 3 in that case, matching the reference default.
    */
  def splineUpsample(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      targetSize: Int,
      degree: Int = 3,
      smoothing: Double = 0.0): DataFrame = {
    require(Set(1, 2, 3).contains(degree), "Spline degree must be 1, 2 or 3")
    require(smoothing == 0.0 || degree == 3,
      "smoothing > 0 is supported for the cubic (degree=3) spline")
    splineEval(df, keyCols, orderCols, valueCol, targetSize, degree, smoothing)
  }

  private def splineEval(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      targetSize: Int,
      degree: Int,
      smoothing: Double = 0.0): DataFrame = {
    val ev = udf { (ys: Seq[Double]) =>
      val n = ys.length
      if (n == 0) Seq.empty[Double]
      else if (n == 1) Seq.fill(targetSize)(ys.head)
      else {
        val xs = Array.tabulate(n)(i => i.toDouble / (n - 1))
        val at = Array.tabulate(targetSize)(j =>
          if (targetSize == 1) 0d else j.toDouble / (targetSize - 1))
        val out =
          if (smoothing > 0) Spline.smoothing(xs, ys.toArray, smoothing, at)
          else if (degree == 1) Spline.linear(xs, ys.toArray, at)
          else if (degree == 2) Spline.quadratic(xs, ys.toArray, at)
          else Spline.cubic(xs, ys.toArray, at)
        out.toSeq
      }
    }
    val sorted = struct(orderCols.map(col) :+ col(valueCol).cast(DoubleType).as("v"): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(sorted)).as("__rows"))
      .withColumn("__vals", transform(col("__rows"), r => r.getField("v")))
      .select(keyCols.map(col) :+ posexplode(ev(col("__vals"))).as(Seq("idx", valueCol)): _*)
  }

  /** FailureEncoder (reference `segmenters.py:278-287`): per series, let
    * `nz` = non-zero values; if `100·|nz|/n ≥ threshold`, emit the MODE of
    * `nz` with ties broken by FIRST ENCOUNTER in series order
    * (`Counter.most_common` preserves insertion order); otherwise 0
    * (also 0 for an all-zero series).
    *
    * Output: keyCols + `failure_code` (double, one row per series).
    * Two hash aggregates + a per-series top-1 — no window over raw rows.
    */
  def failureEncode(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      failureThreshold: Double = 10.0,
      outCol: String = "failure_code"): DataFrame = {
    require(failureThreshold >= 0 && failureThreshold <= 100,
      "failure_threshold must be between 0 and 100")
    val win = w(keyCols, orderCols)
    val v = col(valueCol).cast(DoubleType)
    val indexed = df.select(keyCols.map(col) :+ v.as("__v") :+
      row_number().over(win).as("__rn"): _*)
    val totals = indexed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__total"),
        count(when(col("__v") =!= 0d, 1)).as("__nz"))
    // per distinct non-zero value: count + first occurrence position
    val valueCounts = indexed.filter(col("__v") =!= 0d)
      .groupBy((keyCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__cnt"), min("__rn").as("__firstRn"))
    val ranked = valueCounts.withColumn("__rk",
      row_number().over(Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("__cnt").desc, col("__firstRn").asc)))
    val modes = ranked.filter(col("__rk") === 1)
      .select(keyCols.map(col) :+ col("__v").as("__mode"): _*)
    totals.join(modes, keyCols, "left")
      .withColumn(outCol,
        when(col("__nz") === 0, lit(0d))
          .when(lit(100d) * col("__nz") / col("__total") >= failureThreshold, col("__mode"))
          .otherwise(lit(0d)))
      .select(keyCols.map(col) :+ col(outCol): _*)
  }
}
