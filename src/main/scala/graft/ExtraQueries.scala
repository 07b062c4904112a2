package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.forecast.{DeepForecaster, Forecast, TimeSeriesForecaster}
import graft.operators.{Filters, Segmenters}
import graft.text.TextOps

/** Registry entries for operators that were implemented (and unit-tested)
  * in round 1 but not yet driver-checked: F5 bandpass, F3 valid-mode,
  * G2-nearest, G3 spline upsample, BPE-ish token counting.
  */
object ExtraQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ── F5: FFT bandpass, DC-projection oracle ──
    // Passband [0, 1e-9] keeps ONLY the DC bin, so the filtered series
    // must equal the series mean at EVERY sample — an end-to-end
    // invariant DuckDB can check without an FFT: dc_mean = avg(value)
    // and max deviation from it rounds to exactly 0. Any FFT/IFFT bug
    // (scaling, bin mapping, Bluestein chirp) breaks it.
    QueryDef(
      "f5_bandpass_dc",
      (s, dir) => {
        val bp = Filters.bandpass(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", "__bp",
          lowCutoff = 0.0, highCutoff = 1e-9, sampleRate = 1.0)
        val w = Window.partitionBy(col("event_type"))
        bp.withColumn("__mean", avg(col("value")).over(w))
          .groupBy(col("event_type"))
          .agg(
            round(avg(col("__bp")), 6).as("dc_mean"),
            round(max(abs(col("__bp") - col("__mean"))), 6).as("max_dev"))
      },
      Some("""
        SELECT event_type, round(avg(value), 6) AS dc_mean,
          CAST(0.0 AS DOUBLE) AS max_dev
        FROM events GROUP BY event_type
      """.stripMargin.trim)),

    // ── F3 valid mode: output w−1 rows shorter per series ──
    QueryDef(
      "f3_moving_average_valid",
      (s, dir) => {
        Filters.movingAverageValid(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", "__ma", windowSize = 7)
          .select(col("event_id"), col("event_type"),
            round(col("__ma"), 6).as("ma_value"))
      },
      Some("""
        WITH b AS (
          SELECT event_id, event_type, value,
            row_number() OVER w AS rn, count(*) OVER (PARTITION BY event_type) AS n,
            avg(value) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma
          FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        )
        SELECT event_id, event_type,
          round(CASE WHEN n < 7 THEN value ELSE ma END, 6) AS ma_value
        FROM b WHERE n < 7 OR rn >= 7
      """.stripMargin.trim)),

    // ── G2 nearest-neighbor resampling (scipy tie-break DOWNWARD) ──
    QueryDef(
      "g2_resample_nearest",
      (s, dir) => {
        Segmenters.resample(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", targetSize = 100, method = "nearest")
          .select(col("event_type"), col("idx"),
            round(col("value"), 6).as("value"))
      },
      Some("""
        WITH o AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ), grid AS (
          SELECT event_type, n, unnest(generate_series(0, 99)) AS idx
          FROM (SELECT DISTINCT event_type, n FROM o)
        ), g AS (
          SELECT event_type, idx,
            least(greatest(CAST(0 AS DOUBLE), ceil(idx*(n-1)/99.0 - 0.5))::BIGINT + 1, n) AS rn
          FROM grid
        )
        SELECT g.event_type, g.idx, round(o.value, 6) AS value
        FROM g JOIN o ON g.event_type = o.event_type AND g.rn = o.rn
      """.stripMargin.trim)),

    // ── G2 cubic resampling (not-a-knot spline through the grid points;
    //    tridiagonal solve → rows-only, unit-tested vs analytic cubics) ──
    QueryDef(
      "g2_resample_cubic",
      (s, dir) => {
        Segmenters.resample(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", targetSize = 100, method = "cubic")
          .select(col("event_type"), col("idx"),
            round(col("value"), 6).as("value"))
      },
      None),

    // ── G3: interpolating spline upsample (not-a-knot cubic); the
    //    tridiagonal solve is not reasonably ANSI-expressible → rows-only
    //    (unit-tested against analytic polynomials in SegmentersSpec) ──
    QueryDef(
      "g3_spline_upsample",
      (s, dir) => {
        Segmenters.splineUpsample(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", targetSize = 500, degree = 3)
          .select(col("event_type"), col("idx"), round(col("value"), 6).as("value"))
      },
      None),

    // ── X8: BPE-ish token counting per source ──
    QueryDef(
      "x8_bpeish_tokens",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.groupBy(col("source"))
          .agg(sum(TextOps.bpeishTokenCount(col("text"))).as("total_tokens"),
            count(lit(1)).as("n_docs"))
      },
      Some("""
        SELECT source,
          CAST(sum(list_aggregate(
            list_transform(string_split_regex(trim(text), '\s+'),
              w -> CAST(ceil(length(w)/4.0) AS BIGINT)), 'sum')) AS BIGINT) AS total_tokens,
          count(*) AS n_docs
        FROM documents GROUP BY source
      """.stripMargin.trim)),

    // ── T2: reference forecast preprocessing — [::200] downsample per
    //    series + min-max normalization on the GLOBAL min/max over all
    //    series together (time_series_model.py:108-134) ──
    QueryDef(
      "t2_downsample_minmax",
      (s, dir) => {
        Forecast.downsampleMinMax(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", step = 200)
          .select(col("event_id"), col("event_type"),
            round(col("norm_value"), 6).as("norm_value"))
      },
      Some("""
        WITH s AS (
          SELECT event_id, event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
          FROM events
        ), d AS (
          SELECT * FROM s WHERE (rn-1) % 200 = 0
        ), g AS (SELECT min(value) AS mn, max(value) AS mx FROM d)
        SELECT event_id, event_type,
          round(CASE WHEN mx = mn THEN 0.0
                     ELSE (value - mn) / (mx - mn) END, 6) AS norm_value
        FROM d, g
      """.stripMargin.trim)),

    // ── T3: forecast train/eval — GBT-per-horizon over T1/T2 windows
    //    (the documented MLlib substitution for the reference's keras
    //    LSTM, time_series_model.py:168-275). Train on four series, hold
    //    out one, report per-horizon RMSE + window counts; the fitted
    //    model is not SQL-expressible → rows-only check; RMSE quality
    //    asserted vs a persistence baseline in ForecastSpec ──
    QueryDef(
      "t3_forecast_eval",
      (s, dir) => {
        val norm = Forecast.downsampleMinMax(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", step = 10)
        // step/window sized so even sf0.001 (200 rows/series) yields
        // complete windows: 20 samples/series ≥ timeSteps+outputStep
        val feats = Forecast.lagFeatures(norm, Seq("event_type"),
          Seq("ts", "event_id"), "norm_value", timeSteps = 8, outputStep = 2)
        val train = feats.filter(col("event_type") =!= "purchase")
        val test = feats.filter(col("event_type") === "purchase")
        // rf: all trees fit in one pass — GBT's sequential per-tree jobs
        // are scheduler-bound on a frame this small
        val fc = new TimeSeriesForecaster(
          timeSteps = 8, outputStep = 2, modelType = "rf",
          maxIter = 20, maxDepth = 5, seed = 7L)
        fc.fit(train)
        fc.evaluate(test)
          .select(round(col("rmse_y1"), 6).as("rmse_y1"),
            round(col("rmse_y2"), 6).as("rmse_y2"))
          .crossJoin(test.agg(count(lit(1)).as("n_test_windows")))
      },
      None),

    // ── T4: DEEP forecast train/eval — the reference's actual LSTM
    //    architecture (time_series_model.py:175-178: LSTM → Dropout →
    //    Dense(out_steps), MSE+Adam), hand-built and trained data-parallel
    //    (broadcast params, treeAggregate gradients, driver Adam). Small
    //    hidden/epochs here to bound bench time; the fitted weights are
    //    not SQL-expressible → rows-only. BPTT correctness is proved by
    //    the numerical gradient checks in ForecastSpec; forecast quality
    //    by the beats-persistence assert there. ──
    QueryDef(
      "t4_deep_forecast",
      (s, dir) => {
        val norm = Forecast.downsampleMinMax(ev(s, dir), Seq("event_type"),
          Seq("ts", "event_id"), "value", step = 10)
        val feats = Forecast.lagFeatures(norm, Seq("event_type"),
          Seq("ts", "event_id"), "norm_value", timeSteps = 8, outputStep = 2)
        val train = feats.filter(col("event_type") =!= "purchase")
        val test = feats.filter(col("event_type") === "purchase")
        val fc = new DeepForecaster(timeSteps = 8, outputStep = 2,
          modelType = "lstm", hidden = 8, dropout = 0.1,
          epochs = 40, learningRate = 0.02, seed = 7L)
        fc.fit(train)
        fc.evaluate(test)
          .select(round(col("rmse_y1"), 6).as("rmse_y1"),
            round(col("rmse_y2"), 6).as("rmse_y2"))
          .crossJoin(test.agg(count(lit(1)).as("n_test_windows")))
      },
      None),

    // ── X11: semi-structured props column — JSON extraction surface
    //    (SURVEY §1.4: events.props → get_json_object) ──
    QueryDef(
      "x11_props_json",
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        ev(s, dir).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(k).as("sum_k"),
            round(avg(k), 6).as("avg_k"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        FROM events GROUP BY event_type
      """.stripMargin.trim))
  )
}
