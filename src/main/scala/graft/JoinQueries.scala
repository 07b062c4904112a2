package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Time-series join queries (as-of + interval), the two join shapes the
  * reference gets from `pd.merge_asof` / boolean-mask slicing and a naive
  * Spark translation plans as a cartesian. Both replay exactly in DuckDB
  * (windowed LOCF / inequality join), so both carry full oracles.
  */
object JoinQueries {

  /** 7 days in epoch-nanos (`events.ts` unit per [[Tables.events]]). */
  private val TolNs = 604800000000000L

  /** 1 day in epoch-nanos. */
  private val DayNs = 86400000000000L

  val defs: Seq[QueryDef] = Seq(

    // ── X48: backward as-of join — every error event picks the latest
    //    click by the same user at-or-before it, within a 7-day
    //    tolerance. Merge+LOCF: one shuffle on user_id, no pair
    //    materialization (operators/Joins.scala header). Exact matches
    //    count; same-timestamp clicks resolve to the max event_id ──
    QueryDef(
      "x48_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        Joins.asofJoin(errors, clicks, Seq("user_id"), "ts", "ts",
            payload = Seq("value"), rightOrder = "event_id",
            tolerance = Some(TolNs))
          .select(col("event_id"), col("user_id"),
            round(coalesce(col("asof_value"), lit(-1.0)), 6).as("click_value"),
            coalesce(col("asof_staleness"), lit(-1L)).as("staleness_ns"))
      },
      Some(s"""
        WITH tagged AS (
          SELECT user_id, epoch_ns(ts) AS t, event_id, 1 AS is_l,
                 CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS BIGINT) AS rt,
                 CAST(NULL AS BIGINT) AS rord
          FROM events WHERE event_type = 'error'
          UNION ALL
          SELECT user_id, epoch_ns(ts) AS t, event_id, 0 AS is_l,
                 value AS rv, epoch_ns(ts) AS rt, event_id AS rord
          FROM events WHERE event_type = 'click'
        ), locf AS (
          SELECT user_id, t, event_id, is_l,
            last_value(rv IGNORE NULLS) OVER w AS lv,
            last_value(rt IGNORE NULLS) OVER w AS lt
          FROM tagged
          WINDOW w AS (PARTITION BY user_id
            ORDER BY t, is_l, COALESCE(rord, 9223372036854775807)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id,
          round(CASE WHEN lt IS NOT NULL AND t - lt <= $TolNs
                THEN lv ELSE -1.0 END, 6) AS click_value,
          CASE WHEN lt IS NOT NULL AND t - lt <= $TolNs
                THEN t - lt ELSE -1 END AS staleness_ns
        FROM locf WHERE is_l = 1
      """.stripMargin.trim)),

    // ── X49: bounded interval join — per error event, how many clicks
    //    (and their value sum) the same user produced in the preceding
    //    day. Bucketed band join: each error probes 2 day-buckets, never
    //    the user's whole click history ──
    QueryDef(
      "x49_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        val pairs = Joins.rangeJoin(errors, clicks, Seq("user_id"),
          "ts", "ts", width = DayNs, payload = Seq("value"))
        val counts = pairs.groupBy(col("event_id"), col("user_id"))
          .agg(count(lit(1)).as("__n"), sum(col("r_value")).as("__sv"))
        errors.join(counts, Seq("event_id", "user_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("__n"), lit(0L)).as("n_recent_clicks"),
            round(coalesce(col("__sv"), lit(0.0)), 6).as("sum_click_value"))
      },
      Some(s"""
        WITH e AS (
          SELECT event_id, user_id, epoch_ns(ts) AS t
          FROM events WHERE event_type = 'error'
        ), c AS (
          SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE event_type = 'click'
        )
        SELECT e.event_id, e.user_id,
          CAST(count(c.t) AS BIGINT) AS n_recent_clicks,
          round(COALESCE(sum(c.value), 0.0), 6) AS sum_click_value
        FROM e LEFT JOIN c ON c.user_id = e.user_id
          AND c.t > e.t - $DayNs AND c.t <= e.t
        GROUP BY e.event_id, e.user_id
      """.stripMargin.trim)))
}
