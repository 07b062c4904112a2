package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Named query registry binding every implemented operator to the driver
  * tables (TESTDATA.md), with a DuckDB-equivalent oracle SQL wherever the
  * semantics are ANSI-expressible (driver contract, SURVEY §5/§7).
  *
  * Convention: computed doubles are rounded to 6 decimals ON BOTH SIDES so
  * cross-engine float summation-order differences (last-ulp) cannot break
  * the driver's hash compare; column names are aliased identically on both
  * sides (the compare sorts columns by name).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ── S1: per-series z-score, population std (scalers.py:42-77) ──
    QueryDef(
      "s1_standard_scaler",
      (s, dir) => {
        Scalers.standard(ev(s, dir), Seq("event_type"), "value", "__z")
          .select(col("event_id"), col("event_type"),
            round(col("__z"), 6).as("z_value"))
      },
      Some("""
        SELECT event_id, event_type,
          round(CASE WHEN stddev_pop(value) OVER w > 0
            THEN (value - avg(value) OVER w) / stddev_pop(value) OVER w
            ELSE value - avg(value) OVER w END, 6) AS z_value
        FROM events WINDOW w AS (PARTITION BY event_type)
      """.stripMargin.trim)),

    // ── S2: per-series min-max to [0,1]; constant series → midpoint ──
    QueryDef(
      "s2_minmax_scaler",
      (s, dir) => {
        Scalers.minMax(ev(s, dir), Seq("event_type"), "value", "__mm")
          .select(col("event_id"), col("event_type"),
            round(col("__mm"), 6).as("mm_value"))
      },
      Some("""
        SELECT event_id, event_type,
          round(CASE WHEN max(value) OVER w = min(value) OVER w THEN 0.5
            ELSE (value - min(value) OVER w)
                 / (max(value) OVER w - min(value) OVER w) END, 6) AS mm_value
        FROM events WINDOW w AS (PARTITION BY event_type)
      """.stripMargin.trim)),

    // ── S3: robust scaler (median / IQR, linear-interp percentiles) ──
    QueryDef(
      "s3_robust_scaler",
      (s, dir) => {
        Scalers.robust(ev(s, dir), Seq("event_type"), "value", "__r")
          .select(col("event_id"), col("event_type"),
            round(col("__r"), 6).as("r_value"))
      },
      Some("""
        SELECT event_id, event_type,
          round(CASE WHEN (quantile_cont(value, 0.75) OVER w
                           - quantile_cont(value, 0.25) OVER w) > 0
            THEN (value - quantile_cont(value, 0.5) OVER w)
                 / (quantile_cont(value, 0.75) OVER w
                    - quantile_cont(value, 0.25) OVER w)
            ELSE value - quantile_cont(value, 0.5) OVER w END, 6) AS r_value
        FROM events WINDOW w AS (PARTITION BY event_type)
      """.stripMargin.trim)),

    // ── TPC-H-style pricing summary (joins/aggs sanity + bench headliner) ──
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity), 2) AS sum_qty,
          round(sum(l_extendedprice), 2) AS sum_base_price,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          round(avg(l_discount), 6) AS avg_disc,
          count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
      """.stripMargin.trim))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
