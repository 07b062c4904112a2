package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables live as single parquet files under a scale-factor dir
  * (`/root/testdata/sf0.01/…`). Schema is inferred from parquet footers —
  * this mirrors the reference's dynamic/implicit schema model
  * (reference `fdi_flow/preprocessing/filters.py:27-28` restores pandas
  * columns verbatim; here the parquet footer is the schema registry).
  */
object Tables {
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. With this legacy conf it reads as LongType
    * epoch-nanos — which both orders identically to DuckDB's
    * `timestamp_ns` view of the same column (no µs-truncation tie-break
    * hazards) and stays comparable via DuckDB `epoch_ns(ts)`. Set on every
    * load so the driver's own session gets it too.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
