package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.observers.Observers
import graft.observers.Observers._

/** Observer queries (O1–O3) over the `events` series, each FULLY
  * oracle-checked: the scalar instances of the matrix kernels use the
  * fixed-order [[graft.functions.Mat]] arithmetic, so DuckDB replays the
  * exact float sequence with `list_reduce` (the f6 pattern) — including
  * the Gauss–Jordan `1/S` inversion and the designed Ackermann/sliding
  * gains (embedded as literals, computed once at construction).
  */
object ObsQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)

  private def lastPerSeries(df: org.apache.spark.sql.DataFrame, outCol: String,
                            alias: String) =
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rk") === 1)
      .select(col("event_type"),
        round(element_at(col(outCol), 1), 6).as(alias))

  val defs: Seq[QueryDef] = Seq(

    // ── O1: matrix Kalman (1-state constant model) per event series ──
    QueryDef(
      "o1_matrix_kalman",
      (s, dir) => {
        val kf = MatrixKalman(
          f = Array(Array(1.0)), b = Array(Array(0.0)), h = Array(Array(1.0)),
          q = Array(Array(0.5)), r = Array(Array(2.0)))
        lastPerSeries(
          Observers.kalman(ev(s, dir), Seq("event_type"), Seq("ts", "event_id"),
            Seq("value"), Nil, kf, Array(0.0), Array(Array(1.0))),
          "x_hat", "kalman_last")
      },
      // exact replay: acc = [x, p] from [0, 1]; predict p+Q, update with
      // K = p·(1/S) (the Gauss–Jordan 1×1 path), matching Mat op order
      Some("""
        WITH s AS (
          SELECT event_type, list(value ORDER BY ts, event_id) AS vs
          FROM events GROUP BY event_type
        )
        SELECT event_type,
          round(list_reduce(
            list_prepend([CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)],
              list_transform(vs, v -> [CAST(v AS DOUBLE), CAST(0.0 AS DOUBLE)])),
            (a, e) ->
              [a[1] + ((a[2] + 0.5) * (1.0/((a[2] + 0.5) + 2.0))) * (e[1] - a[1]),
               (1.0 - ((a[2] + 0.5) * (1.0/((a[2] + 0.5) + 2.0)))) * (a[2] + 0.5)]
          )[1], 6) AS kalman_last
        FROM s
      """.stripMargin.trim)),

    // ── O2: Luenberger observer (scalar plant, Ackermann-designed L) ──
    // a=-0.5, b=1, c=1, pole −2 ⇒ L = 1.5; u = 0; dt = 0.01
    QueryDef(
      "o2_luenberger",
      (s, dir) => {
        val obs = LuenbergerObserver(
          a = Array(Array(-0.5)), b = Array(Array(1.0)), c = Array(Array(1.0)),
          dt = 0.01, desiredPoles = Some(Seq(-2.0)))
        lastPerSeries(
          Observers.luenberger(ev(s, dir), Seq("event_type"), Seq("ts", "event_id"),
            Seq("value"), Nil, obs, Array(0.0)),
          "x_hat", "luen_last")
      },
      // x̂ ← x̂ + ((a·x̂ + 0) − L(x̂ − y))·dt, op order mirroring Mat
      Some("""
        WITH s AS (
          SELECT event_type, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
          FROM events GROUP BY event_type
        )
        SELECT event_type,
          round(list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE), vs),
            (acc, y) -> acc + (((-0.5)*acc + 0.0) - 1.5*(acc - y))*0.01
          ), 6) AS luen_last
        FROM s
      """.stripMargin.trim)),

    // ── O3: sliding-mode observer (scalar plant) ──
    // a=-1, b=1, c=1, pole −3 ⇒ L=2; K = ‖C‖·‖A−LC‖·e_max + η
    //   = 1·3·1.5 + 1 = 5.5; ε=0.1, dt=0.01, u=0
    QueryDef(
      "o3_sliding_mode",
      (s, dir) => {
        val obs = SlidingModeObserver(
          a = Array(Array(-1.0)), b = Array(Array(1.0)), c = Array(Array(1.0)),
          desiredPoles = Some(Seq(-3.0)))
        require(obs.gain(0)(0) == 2.0 && obs.kGain(0) == 5.5,
          s"designed gains drifted: L=${obs.gain(0)(0)} K=${obs.kGain(0)}")
        lastPerSeries(
          Observers.slidingMode(ev(s, dir), Seq("event_type"), Seq("ts", "event_id"),
            Seq("value"), Nil, obs, Array(0.0), dt = 0.01),
          "x_hat", "smo_last")
      },
      // x̂ ← x̂ + (((a·x̂ + 0) + L·s) + K·tanh(s/ε))·dt, s = y − x̂.
      // DuckDB 1.0 has no tanh ⇒ (e^{2x}−1)/(e^{2x}+1) with ±1 saturation
      // beyond |x|>20 (exp would overflow); the ≤1-ulp difference vs
      // Math.tanh vanishes under ×K×dt and round(6).
      Some("""
        WITH s AS (
          SELECT event_type, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
          FROM events GROUP BY event_type
        )
        SELECT event_type,
          round(list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE), vs),
            (acc, y) -> acc +
              ((((-1.0)*acc + 0.0) + 2.0*(y - acc)) + 5.5*(
                CASE WHEN (y - acc)/0.1 > 20.0 THEN 1.0
                     WHEN (y - acc)/0.1 < -20.0 THEN -1.0
                     ELSE (exp(2.0*((y - acc)/0.1)) - 1.0)/(exp(2.0*((y - acc)/0.1)) + 1.0)
                END))*0.01
          ), 6) AS smo_last
        FROM s
      """.stripMargin.trim))
  )
}
