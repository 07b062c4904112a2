package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The SURVEY §7.2 end-to-end slice: z-score the `events.value` series
    * per `event_type` (S1, population std), flag |z| > 3, and report the
    * per-series fault rate plus the FailureEncoder (G4) mode of the
    * flagged codes — read → scaler → threshold → encoder → aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val z = operators.Scalers.standard(
      Tables.events(spark, dir), Seq("event_type"), "value", "z")
    val coded = z.withColumn("fault_code",
      when(abs(col("z")) > 3d, ceil(abs(col("z")))).otherwise(lit(0d)))
    val codes = operators.Segmenters.failureEncode(
      coded, Seq("event_type"), Seq("ts", "event_id"), "fault_code",
      failureThreshold = 0.1)
    val stats = coded.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_events"),
      sum(when(col("fault_code") =!= 0d, 1L).otherwise(0L)).as("n_flagged"),
      round(avg(when(col("fault_code") =!= 0d, 1d).otherwise(0d)), 6).as("fault_rate"))
    stats.join(codes, Seq("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
