package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * THE 100 TB join technique the DataFrame API alone can't express: when
  * two fact tables are repeatedly joined on the same key, pre-hashing both
  * into the same number of buckets on that key (`bucketBy` + `sortBy` at
  * write time) lets every later sort-merge join read matching buckets
  * pair-wise — zero Exchange on either side, so the join's shuffle cost is
  * paid ONCE at layout time and amortized over every subsequent query.
  * On a 1000-executor cluster this turns the nightly fact-fact join from
  * the dominant shuffle into a local merge per bucket.
  *
  * Spark specifics encoded here:
  *   - bucket metadata lives in the session catalog (`saveAsTable`), not
  *     the parquet files — plain `spark.read.parquet` of the same files
  *     would NOT skip the shuffle;
  *   - both sides must agree on bucket count and key for the exchange to
  *     be elided (`spark.sql.sources.bucketing.enabled`, on by default);
  *   - `sortBy` additionally pre-sorts each bucket file so the merge side
  *     needs at most a cheap per-partition sort (no spill-prone global
  *     sort), and never an exchange.
  */
object Bucketed {

  /** Database holding the bucketed layouts, rooted at the fast scratch
    * dir — `spark.sql.warehouse.dir` is a static conf the driver-gate
    * sessions don't set, so without this the managed tables would land in
    * `./spark-warehouse` inside the repo checkout.
    */
  val Db = "graft_bucketed"

  private def ensureDb(spark: SparkSession): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db LOCATION '${graft.Scratch.sub("warehouse")}'")

  /** Write `df` as a catalog-managed bucketed+sorted parquet table
    * (qualified into [[Db]]), replacing any previous layout of the same
    * name. Returns the qualified table name.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): String = {
    require(nBuckets > 0)
    val spark = df.sparkSession
    ensureDb(spark)
    val qualified = s"$Db.$table"
    spark.sql(s"DROP TABLE IF EXISTS $qualified")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(qualified)
    qualified
  }

  /** Inner-join two bucketed tables on their shared bucket key via
    * sort-merge (`merge` hint pins SMJ even when one side would fit a
    * broadcast — the point is the layout, not this SF). With both layouts
    * bucketed identically the planned join has NO ShuffleExchange on
    * either input; [[exchangeCount]] is the spec's proof.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable)
    l.join(r, key)
  }

  /** Number of ShuffleExchange nodes in the executed plan — 0 under the
    * join when both inputs are co-bucketed (the aggregate above it may
    * still add one; count on the JOIN df, not a downstream agg).
    */
  def exchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeLike => s }.size
  }
}
