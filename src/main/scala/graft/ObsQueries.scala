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

  /** Gains stashed by the o4 run for its thunk oracle (the fitted-state
    * device): the Sylvester-designed multi-output observer gains for the
    * two test plants, pinned as literals so DuckDB can recompute the
    * closed-loop characteristic polynomial INDEPENDENTLY from (A, C, L).
    */
  @volatile private var o4Gains: Option[(Array[Array[Double]], Array[Array[Double]])] = None

  /** Ascending characteristic-polynomial coefficients `c0..c_{n-1}` of a
    * monic-λⁿ 2×2 or 3×3 matrix, in the fixed operation order the o4
    * oracle SQL mirrors term by term (trace/principal-minors/determinant
    * expansion — Leverrier's shape at these sizes).
    */
  private def charCoeffs(m: Array[Array[Double]]): Seq[Double] = m.length match {
    case 2 => Seq(
      m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0),
      -(m(0)(0) + m(1)(1)))
    case 3 =>
      val det =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
          m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
          m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      val minors =
        (m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)) +
          (m(0)(0) * m(2)(2) - m(0)(2) * m(2)(0)) +
          (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1))
      Seq(-det, minors, -(m(0)(0) + m(1)(1) + m(2)(2)))
    case n => throw new IllegalArgumentException(s"charCoeffs supports n<=3, got $n")
  }

  // the two o4 plants, shared by the query and its oracle generator
  private val O4A1 = Array(
    Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0), Array(-6.0, -11.0, -6.0))
  private val O4C1 = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
  private val O4Poles1 = Seq(-4.0, -5.0, -7.0)
  private val O4A2 = Array(Array(0.0, 1.0), Array(-2.0, -0.5))
  private val O4C2 = Array(Array(1.0, 0.0), Array(0.0, 1.0))
  private val O4Alpha = -3.0 // plant-2 poles: α ± βi
  private val O4Beta = 2.0

  /** o4 thunk oracle: recompute, in DuckDB and entirely from literals,
    * the closed-loop matrix `M = A − L·C` (L = the PINNED run gain) and
    * its characteristic coefficients via the same trace/minors/det
    * expansion, next to the desired coefficients expanded from the pole
    * literals — Vieta for the real triple, `(λ²−2αλ+α²+β²)` for the
    * conjugate pair. A wrong pin, a wrong closed-loop matrix, or a
    * placement miss all hash red.
    */
  private def o4OracleSql(l1: Array[Array[Double]], l2: Array[Array[Double]]): String = {
    def lit(x: Double) = java.lang.Double.toString(x)
    def mExpr(a: Array[Array[Double]], c: Array[Array[Double]],
        l: Array[Array[Double]], i: Int, j: Int): String = {
      val sub = c.indices.map(k => s"(${lit(l(i)(k))})*(${lit(c(k)(j))})")
        .mkString(" + ")
      s"(${lit(a(i)(j))}) - ($sub)"
    }
    def mCte(tag: String, a: Array[Array[Double]], c: Array[Array[Double]],
        l: Array[Array[Double]]): String = {
      val n = a.length
      val cols = (for { i <- 0 until n; j <- 0 until n }
        yield s"(${mExpr(a, c, l, i, j)}) AS m$i$j").mkString(",\n            ")
      s"$tag AS (SELECT\n            $cols)"
    }
    val Seq(p1, p2, p3) = O4Poles1
    s"""
        WITH ${mCte("m1", O4A1, O4C1, l1)},
        ${mCte("m2", O4A2, O4C2, l2)}
        SELECT CAST(1 AS BIGINT) AS plant, CAST(0 AS BIGINT) AS idx,
          round(-(m00*(m11*m22 - m12*m21) - m01*(m10*m22 - m12*m20)
            + m02*(m10*m21 - m11*m20)), 6) AS coef_closed,
          round(-((${lit(p1)})*(${lit(p2)})*(${lit(p3)})), 6) AS coef_desired
        FROM m1
        UNION ALL
        SELECT CAST(1 AS BIGINT), CAST(1 AS BIGINT),
          round((m00*m11 - m01*m10) + (m00*m22 - m02*m20)
            + (m11*m22 - m12*m21), 6),
          round((${lit(p1)})*(${lit(p2)}) + (${lit(p1)})*(${lit(p3)})
            + (${lit(p2)})*(${lit(p3)}), 6)
        FROM m1
        UNION ALL
        SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT),
          round(-(m00 + m11 + m22), 6),
          round(-((${lit(p1)}) + (${lit(p2)}) + (${lit(p3)})), 6)
        FROM m1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT),
          round(m00*m11 - m01*m10, 6),
          round((${lit(O4Alpha)})*(${lit(O4Alpha)})
            + (${lit(O4Beta)})*(${lit(O4Beta)}), 6)
        FROM m2
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT),
          round(-(m00 + m11), 6),
          round(-(2.0*(${lit(O4Alpha)})), 6)
        FROM m2
    """.stripMargin.trim
  }

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
      """.stripMargin.trim)),

    // ── O4: MULTI-OUTPUT pole placement (Gains.sylvesterObserver) —
    //    the reference's `place_poles` surface for p > 1
    //    (`luenberger.py:73-75`), closing the one gain-design deviation:
    //    the Sylvester-equation full-rank design (Bhattacharyya & de
    //    Souza 1982) on two plants — a 3-state/2-output with real poles
    //    and a 2-state/2-output with a CONJUGATE PAIR (the 2×2
    //    real-block solve path). The run proves full column rank
    //    (det(LᵀL) > 0 — the unity-rank dyadic fallback would fail
    //    this) and in-engine placement (closed-loop char coefficients ==
    //    desired), then emits both coefficient vectors. FULL oracle via
    //    the fitted-state thunk: L pinned as literals; DuckDB rebuilds
    //    A − LC and its characteristic polynomial independently ──
    QueryDef(
      "o4_place_poles_mimo",
      (s, _) => {
        import breeze.math.Complex
        import graft.functions.Mat
        val l1 = Gains.sylvesterObserver(
          O4A1, O4C1, O4Poles1.map(Complex(_, 0))).getOrElse(
          throw new IllegalStateException(
            "sylvesterObserver must solve the real-pole o4 plant"))
        val l2 = Gains.sylvesterObserver(
          O4A2, O4C2,
          Seq(Complex(O4Alpha, O4Beta), Complex(O4Alpha, -O4Beta))).getOrElse(
          throw new IllegalStateException(
            "sylvesterObserver must solve the conjugate-pair o4 plant"))
        // full-rank proof: every output participates (rank 2), which the
        // dyadic unity-rank design cannot produce
        def gram2(l: Array[Array[Double]]): Double = {
          val lt = Mat.transpose(l)
          val g = Mat.matMul(lt, l)
          g(0)(0) * g(1)(1) - g(0)(1) * g(1)(0)
        }
        require(gram2(l1) > 1e-9 && gram2(l2) > 1e-9,
          "sylvester gain degenerated to rank 1")
        o4Gains = Some((l1, l2))
        def closed(a: Array[Array[Double]], c: Array[Array[Double]],
            l: Array[Array[Double]]): Array[Array[Double]] = {
          val lc = Mat.matMul(l, c)
          Array.tabulate(a.length, a.length)((i, j) => a(i)(j) - lc(i)(j))
        }
        val got1 = charCoeffs(closed(O4A1, O4C1, l1))
        val got2 = charCoeffs(closed(O4A2, O4C2, l2))
        val Seq(p1, p2, p3) = O4Poles1
        val want1 = Seq(-(p1 * p2 * p3), p1 * p2 + p1 * p3 + p2 * p3,
          -(p1 + p2 + p3))
        val want2 = Seq(O4Alpha * O4Alpha + O4Beta * O4Beta, -(2.0 * O4Alpha))
        // engine-side placement proof, independent of the oracle
        (got1.zip(want1) ++ got2.zip(want2)).foreach { case (g, w) =>
          require(math.abs(g - w) < 1e-6, s"placement missed: $g vs $w")
        }
        import s.implicits._
        (got1.zip(want1).zipWithIndex.map { case ((g, w), i) =>
          (1L, i.toLong, g, w)
        } ++ got2.zip(want2).zipWithIndex.map { case ((g, w), i) =>
          (2L, i.toLong, g, w)
        }).toDF("plant", "idx", "coef_closed", "coef_desired")
          .select(col("plant"), col("idx"),
            round(col("coef_closed"), 6).as("coef_closed"),
            round(col("coef_desired"), 6).as("coef_desired"))
      },
      () => o4Gains.map { case (l1, l2) => o4OracleSql(l1, l2) })
  )
}
