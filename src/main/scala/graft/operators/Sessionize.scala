package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over `events` (north-star extras, SURVEY §2.8):
  * gap-based sessionization and tumbling-window aggregates. Pure window /
  * hash-agg SQL — one shuffle each, streaming-equivalent semantics
  * (`session_window` / `window()` in the streaming mode).
  */
object Sessionize {

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same key exceeds `gap` (in the units of
    * `tsCol` — epoch-nanos for `events.ts`). Appends `session_id`
    * (0-based per key, in time order).
    */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      orderCols: Seq[String],
      gap: Long,
      outCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn(outCol,
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__new")
  }

  /** Per-session rollup: event count + duration (max−min of `tsCol`). */
  def sessionStats(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      orderCols: Seq[String],
      gap: Long): DataFrame =
    sessionize(df, keyCols, tsCol, orderCols, gap)
      .groupBy((keyCols.map(col) :+ col("session_id")): _*)
      .agg(
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))

  /** Tumbling-window aggregate on an epoch-nanos long: truncate to
    * `widthNanos` buckets, emit bucket start (epoch seconds) per key.
    */
  def tumblingAgg(
      df: DataFrame,
      keyCols: Seq[String],
      tsNanosCol: String,
      valueCol: String,
      widthNanos: Long): DataFrame = {
    // integer `div`, NOT floor(double /): epoch-nanos (~1.7e18) exceed the
    // 2^53 double mantissa, so double division can land in the wrong bucket
    val bucket = (expr(s"$tsNanosCol div ${widthNanos}L") * (widthNanos / 1000000000L))
      .cast("long").as("bucket_start_s")
    df.groupBy((keyCols.map(col) :+ bucket): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"),
        avg(col(valueCol)).as("avg_value"))
  }
}
