package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-series scalers over long-format frames.
  *
  * Reference semantics: `fdi_flow/preprocessing/scalers.py` — every scaler
  * normalizes each 1-D series independently; here a "series" is the set of
  * rows sharing `groupCols`, and the scaled value lands in `outCol`.
  *
  * Scale design: group-level statistics are computed with a hash aggregate
  * (map-side partial + final — one shuffle of one row per group) and joined
  * back on the group keys. The aggregated side is tiny relative to the fact
  * table, so AQE plans a broadcast join; no window sort over the full
  * partition is needed. This keeps the operator a two-stage plan that scales
  * linearly in rows regardless of series length.
  */
object Scalers {

  /** Join per-group stats back onto the fact rows with NULL-SAFE key
    * equality (`<=>`): a plain inner join would silently drop rows whose
    * group key is NULL, whereas the reference (and SQL `PARTITION BY`)
    * treats NULL as its own series.
    */
  private def joinStats(df: DataFrame, stats: DataFrame, groupCols: Seq[String]): DataFrame = {
    val renamed = groupCols.foldLeft(stats)((s, c) => s.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(renamed, cond).drop(groupCols.map(c => s"__g_$c"): _*)
  }

  /** Z-score per series: `(x − mean) / std` with **population** std
    * (ddof=0), matching `np.std` at reference `scalers.py:42-77`. A series
    * with zero std is centered but not divided (guard at `scalers.py:74-76`).
    *
    * NOTE: Spark's default `stddev` is the *sample* std — `stddev_pop` is
    * required for parity (MLlib's StandardScaler uses sample std and must
    * not be substituted).
    */
  def standard(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String,
      withMean: Boolean = true,
      withStd: Boolean = true): DataFrame = {
    val stats = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        avg(col(valueCol)).as("__mean"),
        stddev_pop(col(valueCol)).as("__std"))
    val joined = joinStats(df, stats, groupCols)
    val centered = if (withMean) col(valueCol) - col("__mean") else col(valueCol)
    val scaled =
      if (withStd) when(col("__std") > 0d, centered / col("__std")).otherwise(centered)
      else centered
    joined.withColumn(outCol, scaled).drop("__mean", "__std")
  }

  /** Min-max per series to `[lo, hi]`; a constant series maps every value
    * to the midpoint `(lo+hi)/2` (reference `scalers.py:80-116`, constant
    * case at `:112-113`).
    */
  def minMax(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String,
      lo: Double = 0d,
      hi: Double = 1d): DataFrame = {
    val stats = df
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
    val joined = joinStats(df, stats, groupCols)
    val scaled = when(col("__max") === col("__min"), lit((lo + hi) / 2d))
      .otherwise((col(valueCol) - col("__min")) / (col("__max") - col("__min")) * (hi - lo) + lo)
    joined.withColumn(outCol, scaled).drop("__min", "__max")
  }

  /** Robust scaler per series: subtract the median, divide by the IQR
    * (p75 − p25, linear-interpolated percentiles) when IQR > 0
    * (reference `scalers.py:119-158`; percentile call at `:154`).
    *
    * Spark's exact `percentile` uses the same linear interpolation as
    * `np.percentile` — `percentile_approx` would NOT hash-match.
    */
  def robust(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String,
      withCentering: Boolean = true,
      withScaling: Boolean = true): DataFrame = {
    val stats = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        expr(s"percentile($valueCol, 0.5)").as("__med"),
        expr(s"percentile($valueCol, 0.25)").as("__p25"),
        expr(s"percentile($valueCol, 0.75)").as("__p75"))
    val joined = joinStats(df, stats, groupCols)
    val centered = if (withCentering) col(valueCol) - col("__med") else col(valueCol)
    val iqr = col("__p75") - col("__p25")
    val scaled =
      if (withScaling) when(iqr > 0d, centered / iqr).otherwise(centered)
      else centered
    joined.withColumn(outCol, scaled).drop("__med", "__p25", "__p75")
  }
}
