package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.anomalies.Anomalies
import graft.history.Trends
import graft.pipeline.{Curation, Dedup, LinkGraph, Multimodal, Pii, Sampling, Similarity, TextAnalysis}
import graft.profiler.{IncrementalProfile, Profiler}
import graft.sources.Catalog
import graft.types.ValidationRule
import graft.validations.{DefaultValidations, Runner}

/** A-series anomaly detection slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesAnomaly {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
    Q("a01_zscore_global",
      (s, d) => Anomalies.zscore(dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER (PARTITION BY event_type) AS m,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM st WHERE n >= 2)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high' WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a14_seasonal_zscore",
      // day-of-week adjusted z-score (beyond-reference): each point
      // scored against its OWN weekday's mean/σ within the series, so
      // a weekly cycle stops tripping the global detector every
      // weekend; one window job partitioned by (series, dow)
      (s, d) => Anomalies.seasonalZscore(dailySeries(s, d),
          Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          SUM(value) OVER w AS s, SUM(value * value) OVER w AS s2,
          COUNT(value) OVER w AS n
          FROM series
          WINDOW w AS (PARTITION BY event_type, dayofweek(day))),
        loo AS (SELECT event_type, day, value, n,
          (s - value) / (n - 1) AS m,
          SQRT(GREATEST((s2 - value * value) / (n - 1)
            - ((s - value) / (n - 1)) * ((s - value) / (n - 1)),
            CAST(0 AS DOUBLE))) AS sd
          FROM st WHERE n >= 3),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM loo)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high' WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a15_cusum",
      // CUSUM changepoint detector (beyond-reference): cumulative
      // drift catches sustained level shifts per-point detectors miss.
      // The clamped recursion S⁺ₜ = max(0, S⁺ₜ₋₁ + dev) is rewritten as
      // prefix-sum minus running-min — two stacked window passes, no
      // UDF, exactly replayable as SQL
      (s, d) => Anomalies.cusum(dailySeries(s, d),
          Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("cusum_up"), 6).as("cusum_up"),
          round(col("cusum_down"), 6).as("cusum_down"),
          round(col("score"), 6).as("score"),
          col("is_anomaly"), col("direction"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER (PARTITION BY event_type) AS m,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        p AS (SELECT event_type, day, value, sd,
          SUM(value - m - 0.5 * sd) OVER w AS p_up,
          SUM(m - value - 0.5 * sd) OVER w AS p_dn
          FROM st WHERE n >= 2 AND sd > 0
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        sc AS (SELECT event_type, day, value,
          (p_up - LEAST(CAST(0 AS DOUBLE), MIN(p_up) OVER w)) / sd AS s_up,
          (p_dn - LEAST(CAST(0 AS DOUBLE), MIN(p_dn) OVER w)) / sd AS s_dn
          FROM p WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type, day, value,
          ROUND(s_up, 6) AS cusum_up, ROUND(s_dn, 6) AS cusum_down,
          ROUND(GREATEST(s_up, s_dn), 6) AS score,
          GREATEST(s_up, s_dn) > 4.0 AS is_anomaly,
          CASE WHEN GREATEST(s_up, s_dn) <= 4.0 THEN 'none'
            WHEN s_up >= s_dn THEN 'up' ELSE 'down' END AS direction
        FROM sc ORDER BY event_type, day""")),

    Q("a16_holt_forecast",
      // Holt's linear-trend smoothing per series (beyond-reference):
      // the forecast that sets expected ranges for trending metrics.
      // The coupled (level, trend) recurrence folds over the sorted
      // series with the `aggregate` higher-order function — codegen'd,
      // no UDF; series parallelize across the cluster, each fold is
      // the inherently-sequential recurrence. The oracle replays it as
      // a recursive CTE: identical IEEE double ops in identical order,
      // so level/trend/forecasts agree to the bit before rounding.
      (s, d) => graft.anomalies.Forecast.holtLinear(dailySeries(s, d),
          Seq("event_type"), "day", "value")
        .select(col("event_type"), col("n_points"),
          round(col("level"), 6).as("level"),
          round(col("trend"), 6).as("trend"),
          round(col("forecast_1"), 6).as("forecast_1"),
          round(col("forecast_2"), 6).as("forecast_2"),
          round(col("forecast_3"), 6).as("forecast_3"))
        .orderBy("event_type"),
      Some(s"""WITH RECURSIVE series AS ($duckDailySeries),
        o AS (SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
          FROM series),
        n AS (SELECT event_type, MAX(t) AS n FROM o GROUP BY 1
          HAVING MAX(t) >= 2),
        init AS (
          SELECT o1.event_type, 2 AS t,
            CAST(0.5 AS DOUBLE) * o2.value
              + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value))
              AS l,
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o2.value
                + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value)))
              - o1.value)
              + CAST(0.7 AS DOUBLE) * (o2.value - o1.value) AS b
          FROM o o1 JOIN o o2 ON o1.event_type = o2.event_type
            AND o1.t = 1 AND o2.t = 2),
        holt AS (
          SELECT * FROM init
          UNION ALL
          SELECT h.event_type, h.t + 1,
            CAST(0.5 AS DOUBLE) * o.value
              + CAST(0.5 AS DOUBLE) * (h.l + h.b),
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o.value
                + CAST(0.5 AS DOUBLE) * (h.l + h.b)) - h.l)
              + CAST(0.7 AS DOUBLE) * h.b
          FROM holt h JOIN o ON o.event_type = h.event_type
            AND o.t = h.t + 1)
        SELECT h.event_type, CAST(n.n AS INT) AS n_points,
          ROUND(h.l, 6) AS level, ROUND(h.b, 6) AS trend,
          ROUND(h.l + CAST(1 AS DOUBLE) * h.b, 6) AS forecast_1,
          ROUND(h.l + CAST(2 AS DOUBLE) * h.b, 6) AS forecast_2,
          ROUND(h.l + CAST(3 AS DOUBLE) * h.b, 6) AS forecast_3
        FROM holt h JOIN n ON n.event_type = h.event_type AND h.t = n.n
        ORDER BY h.event_type""")),

    Q("a21_forecast_backtest",
      // forecast backtest (the go-live gate for a16's expected
      // ranges): fit Holt on days before Jan 24, score the 7-day
      // held-out tail k-steps-ahead, and compare MAE against the
      // naive last-value baseline — a forecaster that can't beat
      // persistence shouldn't set alert ranges. Micro-unit error
      // quantization before integer per-series sums makes the verdict
      // engine-exact; the oracle replays the Holt recursion (a16's
      // recursive CTE) over the truncated series plus the whole
      // backtest arithmetic.
      (s, d) => graft.anomalies.Forecast.holtBacktest(
          dailySeries(s, d), Seq("event_type"), "day", "value",
          cutoff = lit(java.sql.Date.valueOf("2024-01-24")))
        .orderBy("event_type"),
      Some(s"""WITH RECURSIVE allseries AS ($duckDailySeries),
        series AS (SELECT * FROM allseries
          WHERE day < DATE '2024-01-24'),
        o AS (SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
          FROM series),
        n AS (SELECT event_type, MAX(t) AS n FROM o GROUP BY 1
          HAVING MAX(t) >= 2),
        init AS (
          SELECT o1.event_type, 2 AS t,
            CAST(0.5 AS DOUBLE) * o2.value
              + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value))
              AS l,
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o2.value
                + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value)))
              - o1.value)
              + CAST(0.7 AS DOUBLE) * (o2.value - o1.value) AS b
          FROM o o1 JOIN o o2 ON o1.event_type = o2.event_type
            AND o1.t = 1 AND o2.t = 2),
        holt AS (
          SELECT * FROM init
          UNION ALL
          SELECT h.event_type, h.t + 1,
            CAST(0.5 AS DOUBLE) * o.value
              + CAST(0.5 AS DOUBLE) * (h.l + h.b),
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o.value
                + CAST(0.5 AS DOUBLE) * (h.l + h.b)) - h.l)
              + CAST(0.7 AS DOUBLE) * h.b
          FROM holt h JOIN o ON o.event_type = h.event_type
            AND o.t = h.t + 1),
        fit AS (SELECT h.event_type, h.l AS level, h.b AS trend
          FROM holt h JOIN n ON n.event_type = h.event_type
            AND h.t = n.n),
        lastfit AS (SELECT event_type, MAX(day) AS last_day
          FROM series GROUP BY 1),
        naive AS (SELECT s.event_type, s.value AS nv
          FROM series s JOIN lastfit lf
            ON s.event_type = lf.event_type AND s.day = lf.last_day),
        hold AS (SELECT * FROM allseries
          WHERE day >= DATE '2024-01-24'),
        j AS (SELECT h.event_type,
            CAST(ROUND(ABS(h.value - (f.level +
              CAST(date_diff('day', lf.last_day, h.day) AS DOUBLE)
                * f.trend)) * 1e6, 0) AS BIGINT) AS eh,
            CAST(ROUND(ABS(h.value - nv.nv) * 1e6, 0) AS BIGINT) AS en
          FROM hold h
          JOIN fit f ON f.event_type = h.event_type
          JOIN lastfit lf ON lf.event_type = h.event_type
          JOIN naive nv ON nv.event_type = h.event_type)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_holdout,
          ROUND(CAST(SUM(eh) AS DOUBLE) / COUNT(*) / 1e6, 6)
            AS mae_holt,
          ROUND(CAST(SUM(en) AS DOUBLE) / COUNT(*) / 1e6, 6)
            AS mae_naive,
          SUM(eh) < SUM(en) AS holt_beats_naive
        FROM j GROUP BY event_type ORDER BY event_type""")),

    Q("a17_changepoint",
      // changepoint localization (binary segmentation, one level):
      // a15's CUSUM says "something drifted", this says WHERE the level
      // broke — the split minimizing two-segment SSE. Pure ordered
      // prefix-sum windows (SSE(a..b) = Σy² − (Σy)²/len), so the whole
      // derivation replays as SQL window functions over identical
      // doubles; ties break to the earliest split.
      (s, d) => graft.anomalies.Changepoint.binarySegmentation(
          dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("n_points"),
          col("change_at").cast("string").as("change_day"),
          round(col("mean_before"), 6).as("mean_before"),
          round(col("mean_after"), 6).as("mean_after"),
          round(col("sse_reduction"), 6).as("sse_reduction"))
        .orderBy("event_type"),
      Some(s"""WITH series AS ($duckDailySeries),
        base AS (SELECT event_type, day, value,
          ROW_NUMBER() OVER w AS r,
          SUM(value) OVER w AS s1,
          SUM(value * value) OVER w AS s2,
          COUNT(*) OVER p AS n,
          SUM(value) OVER p AS t1,
          SUM(value * value) OVER p AS t2
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          p AS (PARTITION BY event_type)),
        scored AS (
          SELECT event_type, day, n,
            (s1 - value) AS ls1, (s2 - value * value) AS ls2,
            (t1 - (s1 - value)) AS rs1, (t2 - (s2 - value * value)) AS rs2,
            CAST(r - 1 AS DOUBLE) AS ln, CAST(n - r + 1 AS DOUBLE) AS rn,
            t1, t2
          FROM base WHERE n >= 2 AND r >= 2),
        cost AS (
          SELECT event_type, day, n, ls1, rs1, ln, rn, t1, t2,
            (ls2 - ls1 * ls1 / ln) + (rs2 - rs1 * rs1 / rn) AS c
          FROM scored),
        best AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY c ASC, day ASC) AS rk
          FROM cost)
        SELECT event_type, CAST(n AS BIGINT) AS n_points,
          CAST(day AS VARCHAR) AS change_day,
          ROUND(ls1 / ln, 6) AS mean_before,
          ROUND(rs1 / rn, 6) AS mean_after,
          ROUND((t2 - t1 * t1 / n) - c, 6) AS sse_reduction
        FROM best WHERE rk = 1 ORDER BY event_type""")),

    Q("a18_anomaly_contributors",
      // root-cause attribution: for each ≥2σ daily-volume day, the
      // top-3 users whose share of that day deviates most from their
      // share of every other day. The σ test is the z-score rewritten
      // as an INTEGER cross-multiplied comparison (no float at the
      // decision boundary) and the share delta quantizes to ppm from
      // exact counts — the whole derivation replays in SQL.
      (s, d) => graft.anomalies.Attribution.anomalyContributors(
          eventsTable(s, d))
        .orderBy("series", "day", "rank"),
      Some("""WITH d AS (
          SELECT event_type AS series, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        st AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sm,
            CAST(SUM(x * x) AS BIGINT) AS s2
          FROM d GROUP BY 1),
        fl AS (
          SELECT d.series, d.day, d.x AS day_total, st.sm AS all_total
          FROM d JOIN st USING (series)
          WHERE st.n >= 2 AND (n * x - sm) * (n * x - sm)
            >= 4 * (n * s2 - sm * sm)),
        co AS (
          SELECT event_type AS series, CAST(ts AS DATE) AS day,
            user_id AS contributor, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2, 3),
        ca AS (SELECT series, contributor,
            CAST(SUM(c) AS BIGINT) AS c_all
          FROM co GROUP BY 1, 2),
        sc AS (
          SELECT co.series, co.day, co.contributor, co.c,
            fl.day_total,
            CAST(ROUND(1e6 * CAST(co.c * (fl.all_total - fl.day_total)
                - (ca.c_all - co.c) * fl.day_total AS DOUBLE)
              / CAST(fl.day_total * (fl.all_total - fl.day_total)
                AS DOUBLE), 0) AS BIGINT) AS delta_ppm
          FROM co
          JOIN fl ON fl.series = co.series AND fl.day = co.day
          JOIN ca ON ca.series = co.series
            AND ca.contributor = co.contributor
          WHERE fl.all_total - fl.day_total > 0),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY series, day
            ORDER BY delta_ppm DESC, contributor ASC) AS r
          FROM sc)
        SELECT series, day, contributor, c AS day_count, day_total,
          delta_ppm, CAST(r AS INT) AS rank
        FROM rk WHERE r <= 3 ORDER BY series, day, rank""")),

    Q("a19_slo_burn_rate",
      // SLO error-budget burn with multiwindow alerting (the SRE
      // workbook pattern): hourly error ratio over the 1 h and
      // trailing-6 h windows, each over the 25% budget (SLO 75%); a
      // page fires only when BOTH windows burn ≥ 1.2×. Burn rates
      // quantize to ppm from integer counts and the page decision is
      // an integer cross-multiplication — no float at the boundary.
      // One hourly rollup is the only data-bound stage; the trailing
      // window runs over the calendar-bounded hourly series.
      (s, d) => graft.anomalies.Slo.burnRate(eventsTable(s, d))
        .orderBy("hour"),
      Some(sloOracleSql)),

    Q("a20_leading_edge_alerts",
      // alert-fatigue control over detector output: page on the
      // LEADING EDGE of an anomaly run (previous point clean) and
      // re-page every 3rd point while the run persists — a detector
      // that pages every anomalous day of a week-long incident trains
      // people to ignore it, one that pages once lets it go silent.
      // Low threshold (sensitivity 2 → 1.5σ) so the fixture has real
      // runs. One per-series ordered window over the a01 detector.
      (s, d) => Anomalies.leadingEdgeAlerts(
          Anomalies.zscore(dailySeries(s, d), Seq("event_type"), "day",
            "value", sensitivity = 2.0),
          Seq("event_type"), "day", reAlertEvery = 3)
        .select(col("event_type"), col("day"), col("is_anomaly"),
          col("run_length"), col("alert"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER (PARTITION BY event_type) AS m,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        scored AS (SELECT event_type, day,
          (CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END)
            > 1.5 AS is_anomaly
          FROM st WHERE n >= 2),
        starts AS (SELECT event_type, day, is_anomaly,
          CASE WHEN is_anomaly AND NOT COALESCE(
              LAG(is_anomaly) OVER (PARTITION BY event_type
                ORDER BY day), FALSE)
            THEN 1 ELSE 0 END AS is_start
          FROM scored),
        runs AS (SELECT event_type, day, is_anomaly,
          SUM(is_start) OVER (PARTITION BY event_type
            ORDER BY day ROWS UNBOUNDED PRECEDING) AS run_id
          FROM starts),
        pos AS (SELECT event_type, day, is_anomaly,
          CASE WHEN is_anomaly THEN CAST(ROW_NUMBER() OVER (
              PARTITION BY event_type, run_id ORDER BY day) AS BIGINT)
            ELSE 0 END AS run_length
          FROM runs)
        SELECT event_type, day, is_anomaly, run_length,
          (is_anomaly AND (run_length - 1) % 3 = 0) AS alert
        FROM pos ORDER BY event_type, day""")),

    Q("a02_zscore_rolling",
      (s, d) => Anomalies.zscore(dailySeries(s, d), Seq("event_type"), "day",
        "value", sensitivity = 1.0, window = Some(7))
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER w AS m, STDDEV_POP(value) OVER w AS sd,
          COUNT(value) OVER w AS cnt
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM st WHERE cnt = 7)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high' WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a03_iqr_global",
      (s, d) => Anomalies.iqr(dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          quantile_cont(value, 0.25) OVER (PARTITION BY event_type) AS q1,
          quantile_cont(value, 0.75) OVER (PARTITION BY event_type) AS q3,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        b AS (SELECT event_type, day, value, q3 - q1 AS iqr,
          q1 - (q3 - q1) * 1.5 AS lower_b, q3 + (q3 - q1) * 1.5 AS upper_b
          FROM st WHERE n >= 4),
        scored AS (SELECT event_type, day, value,
          CASE WHEN value < lower_b THEN
            CASE WHEN iqr > 0 THEN ABS((lower_b - value) / iqr) ELSE CAST('inf' AS DOUBLE) END
          WHEN value > upper_b THEN
            CASE WHEN iqr > 0 THEN ABS((value - upper_b) / iqr) ELSE CAST('inf' AS DOUBLE) END
          ELSE 0.0 END AS raw_score,
          value < lower_b OR value > upper_b AS is_anomaly
          FROM b)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          is_anomaly, CAST(1.5 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 3.0 THEN 'high' WHEN raw_score > 1.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a04_iqr_rolling",
      (s, d) => Anomalies.iqr(dailySeries(s, d), Seq("event_type"), "day",
        "value", sensitivity = 1.0, window = Some(7))
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          quantile_cont(value, 0.25) OVER w AS q1,
          quantile_cont(value, 0.75) OVER w AS q3,
          COUNT(value) OVER w AS cnt,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        b AS (SELECT event_type, day, value, q3 - q1 AS iqr,
          q1 - (q3 - q1) * 1.5 AS lower_b, q3 + (q3 - q1) * 1.5 AS upper_b
          FROM st WHERE n >= 4 AND cnt = 7),
        scored AS (SELECT event_type, day, value,
          CASE WHEN value < lower_b THEN
            CASE WHEN iqr > 0 THEN ABS((lower_b - value) / iqr) ELSE CAST('inf' AS DOUBLE) END
          WHEN value > upper_b THEN
            CASE WHEN iqr > 0 THEN ABS((value - upper_b) / iqr) ELSE CAST('inf' AS DOUBLE) END
          ELSE 0.0 END AS raw_score,
          value < lower_b OR value > upper_b AS is_anomaly
          FROM b)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          is_anomaly, CAST(1.5 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 3.0 THEN 'high' WHEN raw_score > 1.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a05_moving_average",
      (s, d) => Anomalies.movingAverage(dailySeries(s, d), Seq("event_type"),
        "day", "value", sensitivity = 1.0, window = 7, stdWindow = Some(5))
        .select(col("event_type"), col("day"), col("value"),
          round(col("moving_avg"), 6).as("moving_avg"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        ma0 AS (SELECT event_type, day, value,
          AVG(value) OVER w AS mavg, COUNT(value) OVER w AS cnt
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        ma AS (SELECT * FROM ma0 WHERE cnt = 7),
        st AS (SELECT event_type, day, value, mavg,
          COUNT(mavg) OVER (PARTITION BY event_type) AS L,
          STDDEV_POP(mavg) OVER (PARTITION BY event_type) AS std_global,
          COUNT(mavg) OVER wf AS fwd_cnt,
          CASE WHEN COUNT(mavg) OVER wf = 5
            THEN STDDEV_POP(mavg) OVER wf END AS fwd_std
          FROM ma
          WINDOW wf AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
        st2 AS (SELECT event_type, day, value, mavg, L, std_global,
          LAST_VALUE(fwd_std IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS std_rolling
          FROM st),
        scored AS (SELECT event_type, day, value, mavg,
          CASE WHEN L < 5 THEN std_global ELSE std_rolling END AS sd
          FROM st2),
        fin AS (SELECT event_type, day, value, mavg,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - mavg) / sd) END AS raw_score,
          sd FROM scored)
        SELECT event_type, day, value, ROUND(mavg, 6) AS moving_avg,
          ROUND(raw_score, 6) AS score,
          sd <> 0 AND raw_score > 2.0 AS is_anomaly,
          CAST(2.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 4.0 THEN 'high' WHEN raw_score > 2.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM fin ORDER BY event_type, day""")),

    // A7 batch half (config store + scan-everything-configured): persist
    // two configs with DIFFERENT methods, feed the metrics store a
    // spiked daily series, run the no-args batch scan — configs route
    // their own series through their own detector and the union comes
    // back in one job. Day 15 is deterministically boosted 10× so both
    // detectors fire (detect() emits anomalies only).
    Q("a09_config_scan",
      (s, d) => {
        val engine = new graft.api.GraftEngine(s, d, freshState(s, "a09"))
        // only the two configured series are stored: the metrics store
        // partitions by (connection, table, date), so every extra series
        // is 30 more one-row partition writes for data the scan ignores
        val pts = eventsTable(s, d)
          .filter(col("event_type").isin("click", "error"))
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("metric_value"))
          .select(lit("default").as("connection_id"),
            col("event_type").as("table_name"),
            lit(null).cast("string").as("column_name"),
            lit("daily_events").as("metric_name"),
            when(col("day") === lit(java.sql.Date.valueOf("2024-01-15")),
              col("metric_value") * 10).otherwise(col("metric_value"))
              .as("metric_value"),
            col("day").cast("timestamp").as("ts"))
        engine.metrics.append(pts)
        val ts1 = java.sql.Timestamp.valueOf("2024-01-31 00:00:00")
        engine.anomalyConfigs.createConfig(graft.types.AnomalyConfig(
          "daily_events", "click", detectionMethod = "zscore"), ts1)
        engine.anomalyConfigs.createConfig(graft.types.AnomalyConfig(
          "daily_events", "error", detectionMethod = "iqr"), ts1)
        engine.runAnomalyScanAll(ts1, historyDays = 31)
          .select(col("table_name"), col("metric_name"), col("method"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("metric_value"), round(col("score"), 6).as("score"),
            col("is_anomaly"), col("threshold"), col("severity"))
          .orderBy("method", "table_name", "day")
      },
      Some("""WITH series0 AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS DOUBLE) AS value
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT event_type, day,
            CASE WHEN day = DATE '2024-01-15' THEN value * 10 ELSE value END
              AS value
          FROM series0 WHERE event_type IN ('click', 'error')),
        z AS (
          SELECT event_type, day, value,
            AVG(value) OVER (PARTITION BY event_type) AS m,
            STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
            COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series WHERE event_type = 'click'),
        zs AS (
          SELECT event_type, day, value,
            CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM z WHERE n >= 2),
        zfin AS (
          SELECT event_type AS table_name, 'daily_events' AS metric_name,
            'zscore' AS method, strftime(day, '%Y-%m-%d') AS day,
            value AS metric_value, ROUND(raw_score, 6) AS score,
            TRUE AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
            CASE WHEN raw_score > 5.0 THEN 'high'
              WHEN raw_score > 3.5 THEN 'medium' ELSE 'low' END AS severity
          FROM zs WHERE raw_score > 3.0),
        i AS (
          SELECT event_type, day, value,
            quantile_cont(value, 0.25) OVER (PARTITION BY event_type) AS q1,
            quantile_cont(value, 0.75) OVER (PARTITION BY event_type) AS q3,
            COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series WHERE event_type = 'error'),
        ib AS (
          SELECT event_type, day, value, q3 - q1 AS iqr,
            q1 - (q3 - q1) * 1.5 AS lower_b, q3 + (q3 - q1) * 1.5 AS upper_b
          FROM i WHERE n >= 4),
        iscored AS (
          SELECT event_type, day, value,
            CASE WHEN value < lower_b THEN
              CASE WHEN iqr > 0 THEN ABS((lower_b - value) / iqr)
                ELSE CAST('inf' AS DOUBLE) END
            WHEN value > upper_b THEN
              CASE WHEN iqr > 0 THEN ABS((value - upper_b) / iqr)
                ELSE CAST('inf' AS DOUBLE) END
            ELSE 0.0 END AS raw_score,
            value < lower_b OR value > upper_b AS is_anomaly
          FROM ib),
        ifin AS (
          SELECT event_type AS table_name, 'daily_events' AS metric_name,
            'iqr' AS method, strftime(day, '%Y-%m-%d') AS day,
            value AS metric_value, ROUND(raw_score, 6) AS score,
            is_anomaly, CAST(1.5 AS DOUBLE) AS threshold,
            CASE WHEN raw_score > 3.0 THEN 'high'
              WHEN raw_score > 1.5 THEN 'medium' ELSE 'low' END AS severity
          FROM iscored WHERE is_anomaly)
        SELECT * FROM (SELECT * FROM zfin UNION ALL SELECT * FROM ifin)
        ORDER BY method, table_name, day""")),

    // A-lifecycle (core/anomalies/api.py:275-332,356-506,569-639): a
    // triaged store — two spiked scans persisted at different run days,
    // then three bulk status updates so all four statuses appear — read
    // back as the triage list (a12), the summary row (a13) and the
    // densified daily dashboard trend (t11, registered here to share
    // the fixture builder).
    Q("a12_anomaly_status",
      (s, d) => triagedAnomalyStore(s, d, "a12")
        .list(anomaliesOnly = true)
        .select(col("anomaly_id"), col("table_name"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("metric_value"), col("severity"), col("status"),
          col("resolution_note"),
          date_format(col("resolved_at"), "yyyy-MM-dd HH:mm:ss")
            .as("resolved_at"),
          col("resolved_by"))
        .orderBy("table_name", "day"),
      Some(s"""$duckTriagedAnomalies
        SELECT md5(concat_ws('|', table_name, '', 'daily_events',
            CAST(CAST(day AS TIMESTAMP) AS VARCHAR), 'zscore',
            CAST(run_at AS VARCHAR))) AS anomaly_id,
          table_name, strftime(day, '%Y-%m-%d') AS day, metric_value,
          severity, status, resolution_note, resolved_at, resolved_by
        FROM tri ORDER BY table_name, day""")),

    Q("a13_anomaly_summary",
      (s, d) => triagedAnomalyStore(s, d, "a13")
        .summary(java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), days = 30),
      Some(s"""$duckTriagedAnomalies
        SELECT CAST(COUNT(*) AS BIGINT) AS total_anomalies,
          CAST(COUNT(*) FILTER (severity = 'high') AS BIGINT) AS high_severity,
          CAST(COUNT(*) FILTER (severity = 'medium') AS BIGINT) AS medium_severity,
          CAST(COUNT(*) FILTER (severity = 'low') AS BIGINT) AS low_severity,
          CAST(COUNT(*) FILTER (status = 'open') AS BIGINT) AS open,
          CAST(COUNT(*) FILTER (status = 'acknowledged') AS BIGINT) AS acknowledged,
          CAST(COUNT(*) FILTER (status = 'resolved') AS BIGINT) AS resolved,
          CAST(COUNT(*) FILTER (status = 'expected') AS BIGINT) AS expected,
          CAST(COUNT(*) FILTER (CAST(run_at AS DATE) = DATE '2024-01-31')
            AS BIGINT) AS detected_today
        FROM tri""")),

    Q("t11_anomaly_dashboard",
      (s, d) => triagedAnomalyStore(s, d, "t11")
        .trends(java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), days = 30),
      Some(s"""$duckTriagedAnomalies,
        spine AS (SELECT UNNEST(generate_series(DATE '2024-01-01',
          DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day),
        daily AS (SELECT CAST(run_at AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS total,
          CAST(COUNT(*) FILTER (severity = 'high') AS BIGINT) AS high,
          CAST(COUNT(*) FILTER (severity = 'medium') AS BIGINT) AS medium,
          CAST(COUNT(*) FILTER (severity = 'low') AS BIGINT) AS low
          FROM tri GROUP BY 1)
        SELECT strftime(spine.day, '%Y-%m-%d') AS date,
          COALESCE(total, 0) AS total, COALESCE(high, 0) AS high,
          COALESCE(medium, 0) AS medium, COALESCE(low, 0) AS low
        FROM spine LEFT JOIN daily ON spine.day = daily.day
        ORDER BY date""")))
}
