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

/** T-series trends/analytics slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesTrend {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
    // T1: profile-history round trip — three persisted runs, read back
    // newest-first with the limit honored (supabase_manager.py:218-266).
    // row_count for region is 5 at every SF, so the pinned oracle holds
    // across the verify (sf0.01) and bench (sf0.1) dirs.
    Q("t12_scd2_build",
      // type-2 slowly-changing-dimension merge: bootstrap the dimension
      // from customer, apply a DECLARED snapshot mutation (%7 balance
      // change, %13 delete, %17 insert-clone at key+1e6), merge. ONE
      // key-partitioned full-outer join between the open slice and the
      // snapshot; closed history passes through untouched — the shape
      // that keeps a 100 TB dimension incremental. The oracle re-states
      // the same full-outer case analysis with IS DISTINCT FROM.
      (s, d) => {
        import graft.operators.Scd
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val dim = Scd.scd2Init(cust, "2025-01-01 00:00:00")
        val snapshot = cust.filter(col("c_custkey") % 13 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
              .otherwise(col("c_acctbal")))
          .unionByName(cust.filter(col("c_custkey") % 17 === 0)
            .select((col("c_custkey") + 1000000L).as("c_custkey"),
              lit(0.0).as("c_acctbal"), lit("NEW").as("c_mktsegment")))
        Scd.scd2Merge(dim, snapshot, Seq("c_custkey"),
            Seq("c_acctbal", "c_mktsegment"), "2026-01-01 00:00:00")
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH dim AS (
          SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        snap AS (
          SELECT c_custkey,
            CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
              ELSE c_acctbal END AS c_acctbal,
            c_mktsegment
          FROM customer WHERE c_custkey % 13 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, CAST(0 AS DOUBLE), 'NEW'
          FROM customer WHERE c_custkey % 17 = 0),
        j AS (
          SELECT d.c_custkey AS dk, d.c_acctbal AS da,
            d.c_mktsegment AS dm, s.c_custkey AS sk,
            s.c_acctbal AS sa, s.c_mktsegment AS sm
          FROM dim d FULL OUTER JOIN snap s ON d.c_custkey = s.c_custkey),
        merged AS (
          SELECT dk AS c_custkey, da AS c_acctbal, dm AS c_mktsegment,
            '2025-01-01 00:00:00' AS valid_from,
            '2026-01-01 00:00:00' AS valid_to, FALSE AS is_current
          FROM j WHERE dk IS NOT NULL AND (sk IS NULL
            OR da IS DISTINCT FROM sa OR dm IS DISTINCT FROM sm)
          UNION ALL
          SELECT dk, da, dm, '2025-01-01 00:00:00',
            '9999-12-31 00:00:00', TRUE
          FROM j WHERE dk IS NOT NULL AND sk IS NOT NULL
            AND da IS NOT DISTINCT FROM sa AND dm IS NOT DISTINCT FROM sm
          UNION ALL
          SELECT sk, sa, sm, '2026-01-01 00:00:00',
            '9999-12-31 00:00:00', TRUE
          FROM j WHERE sk IS NOT NULL AND (dk IS NULL
            OR da IS DISTINCT FROM sa OR dm IS DISTINCT FROM sm))
        SELECT * FROM merged ORDER BY c_custkey, valid_from""")),

    Q("t01_profile_history",
      (s, d) => {
        val store = new graft.history.ProfileStore(s,
          freshState(s, "t01") + "/profiles")
        val cat = Catalog(s, d)
        val p = Profiler.profile(t(s, d, "region"), "region",
          Some(cat.tableMeta("region")))
        Seq("2026-01-01", "2026-01-02", "2026-01-03").foreach(day =>
          store.append(p, java.sql.Timestamp.valueOf(s"$day 00:00:00")))
        store.history("region", limit = 2)
          .select(col("table_name"),
            col("metric_value").as("row_count"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("run_ts"))
          .orderBy(col("run_ts").desc)
      },
      Some("""SELECT * FROM (VALUES
          ('region', CAST(5.0 AS DOUBLE), '2026-01-03 00:00:00'),
          ('region', CAST(5.0 AS DOUBLE), '2026-01-02 00:00:00'))
        AS t(table_name, row_count, run_ts)
        ORDER BY run_ts DESC""")),

    Q("t02_metric_trends",
      (s, d) => {
        val series = eventsTable(s, d)
          .groupBy(col("event_type").as("column_name"),
            to_date(col("ts")).as("ts"))
          .agg(sum(col("value").cast("decimal(28,6)")).cast("double")
            .as("metric_value"))
          .withColumn("metric_name", lit("daily_value_sum"))
        Trends.metricTrends(series)
          .select(col("column"), col("metric"),
            round(col("current_value"), 6).as("current_value"),
            round(col("min_value"), 6).as("min_value"),
            round(col("max_value"), 6).as("max_value"),
            round(col("absolute_change"), 6).as("absolute_change"),
            round(col("percent_change"), 6).as("percent_change"))
          .orderBy("column")
      },
      Some("""WITH series AS (
          SELECT event_type AS clmn, CAST(ts AS DATE) AS day,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2)
        SELECT clmn AS "column", 'daily_value_sum' AS metric,
          ROUND(arg_max(v, day), 6) AS current_value,
          ROUND(MIN(v), 6) AS min_value,
          ROUND(MAX(v), 6) AS max_value,
          ROUND(arg_max(v, day) - arg_min(v, day), 6) AS absolute_change,
          ROUND(CASE WHEN arg_min(v, day) <> 0
            THEN (arg_max(v, day) - arg_min(v, day)) / arg_min(v, day) * 100.0 END, 6)
            AS percent_change
        FROM series GROUP BY clmn ORDER BY "column"""")),

    Q("t03_validation_daily_trends",
      (s, d) => {
        val results = eventsTable(s, d).select(
          col("event_type").as("rule_id"),
          when(col("value") > 400, lit(null).cast("boolean"))
            .otherwise(col("value") > 100).as("is_valid"),
          col("ts").as("run_at"))
        Trends.validationDailyTrends(results, totalRules = 5,
          "2024-01-01", "2024-01-30")
      },
      Some("""WITH results AS (
          SELECT event_type AS rule_id,
            CASE WHEN value > 400 THEN NULL ELSE value > 100 END AS is_valid,
            ts AS run_at FROM events),
        latest AS (
          SELECT rule_id, CAST(run_at AS DATE) AS day, is_valid,
            ROW_NUMBER() OVER (PARTITION BY rule_id, CAST(run_at AS DATE)
              ORDER BY run_at DESC) AS rn
          FROM results),
        daily AS (
          SELECT day, COUNT(*) AS total_validations,
            COUNT(CASE WHEN is_valid = TRUE THEN 1 END) AS passed,
            COUNT(CASE WHEN is_valid = FALSE THEN 1 END) AS failed,
            COUNT(CASE WHEN is_valid IS NULL THEN 1 END) AS errored
          FROM latest WHERE rn = 1 GROUP BY day),
        cal AS (SELECT UNNEST(generate_series(DATE '2024-01-01',
          DATE '2024-01-30', INTERVAL 1 DAY))::DATE AS day)
        SELECT cal.day,
          CAST(COALESCE(total_validations, 0) AS BIGINT) AS total_validations,
          CAST(COALESCE(passed, 0) AS BIGINT) AS passed,
          CAST(COALESCE(failed, 0) AS BIGINT) AS failed,
          CAST(COALESCE(errored, 0) AS BIGINT) AS errored,
          ROUND(CASE WHEN COALESCE(passed, 0) + COALESCE(failed, 0) > 0
            THEN CAST(passed AS DOUBLE) / (passed + failed) * 100.0
            ELSE 0.0 END, 2) AS health_score,
          CAST(5 - COALESCE(total_validations, 0) AS BIGINT) AS not_run
        FROM cal LEFT JOIN daily ON cal.day = daily.day
        ORDER BY cal.day""")),

    Q("t04_current_health_score",
      (s, d) => {
        val results = eventsTable(s, d).select(
          col("event_type").as("rule_id"),
          when(col("value") > 400, lit(null).cast("boolean"))
            .otherwise(col("value") > 100).as("is_valid"),
          col("ts").as("run_at"))
        Trends.currentHealthScore(results)
      },
      Some("""WITH results AS (
          SELECT event_type AS rule_id,
            CASE WHEN value > 400 THEN NULL ELSE value > 100 END AS is_valid,
            ts AS run_at FROM events),
        latest AS (
          SELECT rule_id, is_valid,
            ROW_NUMBER() OVER (PARTITION BY rule_id ORDER BY run_at DESC) AS rn
          FROM results)
        SELECT
          CAST(COUNT(CASE WHEN is_valid = TRUE THEN 1 END) AS BIGINT) AS passed,
          CAST(COUNT(CASE WHEN is_valid = FALSE THEN 1 END) AS BIGINT) AS failed,
          ROUND(CASE WHEN COUNT(CASE WHEN is_valid IS NOT NULL THEN 1 END) > 0
            THEN CAST(COUNT(CASE WHEN is_valid = TRUE THEN 1 END) AS DOUBLE)
              / COUNT(CASE WHEN is_valid IS NOT NULL THEN 1 END) * 100.0
            ELSE 0.0 END, 2) AS health_score
        FROM latest WHERE rn = 1""")),

    Q("t05_change_frequency",
      (s, d) => {
        val checks = eventsTable(s, d).select(
          lit("table").as("object_type"),
          col("event_type").as("object_name"),
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        Trends.changeFrequency(checks)
          .select(col("object_type"), col("object_name"), col("total_checks"),
            col("changes_detected"), round(col("change_ratio"), 6).as("change_ratio"),
            col("frequency"),
            round(col("avg_hours_between_changes"), 6).as("avg_hours_between_changes"),
            date_format(col("most_recent_change"), "yyyy-MM-dd HH:mm:ss")
              .as("most_recent_change"))
          .orderBy("object_name")
      },
      Some("""WITH checks AS (
          SELECT 'table' AS object_type, event_type AS object_name,
            ts AS check_timestamp, value > 250 AS change_detected
          FROM events),
        changed AS (
          SELECT object_name, check_timestamp,
            (epoch(check_timestamp) - epoch(LAG(check_timestamp, 1)
              OVER (PARTITION BY object_name ORDER BY check_timestamp))) / 3600.0
              AS hours
          FROM checks WHERE change_detected),
        agg_changed AS (
          SELECT object_name, AVG(hours) AS avg_hours,
            MAX(check_timestamp) AS most_recent
          FROM changed GROUP BY object_name),
        base AS (
          SELECT object_type, object_name,
            CAST(COUNT(*) AS BIGINT) AS total_checks,
            CAST(COUNT(CASE WHEN change_detected THEN 1 END) AS BIGINT)
              AS changes_detected
          FROM checks GROUP BY object_type, object_name)
        SELECT b.object_type, b.object_name, b.total_checks, b.changes_detected,
          ROUND(CAST(b.changes_detected AS DOUBLE) / b.total_checks, 6) AS change_ratio,
          CASE WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.5 THEN 'high'
            WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.1 THEN 'medium'
            ELSE 'low' END AS frequency,
          ROUND(CASE WHEN b.changes_detected >= 2 THEN a.avg_hours END, 6)
            AS avg_hours_between_changes,
          strftime(a.most_recent, '%Y-%m-%d %H:%M:%S') AS most_recent_change
        FROM base b LEFT JOIN agg_changed a ON b.object_name = a.object_name
        ORDER BY b.object_name""")),

    Q("t06_refresh_suggestion",
      // T6: per-object refresh-interval suggestion — the t05 frequency
      // frame mapped through the REAL Trends.suggestRefreshInterval
      // (as a UDF over the pure function, so the shipped arithmetic is
      // what's checked). avg_hours is 6dp-rounded BEFORE the suggestion
      // on both engines: t05 proves the rounded values hash-match, so
      // the floor()s inside the suggestion see identical inputs.
      (s, d) => {
        val checks = eventsTable(s, d).select(
          lit("table").as("object_type"),
          col("event_type").as("object_name"),
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        val suggest = udf { (freq: String, avg: java.lang.Double, n: Long) =>
          Trends.suggestRefreshInterval(
            freq, Option(avg).map(_.doubleValue), n)
        }
        Trends.changeFrequency(checks)
          .select(col("object_name"), col("frequency"),
            col("total_checks"),
            suggest(col("frequency"),
              round(col("avg_hours_between_changes"), 6),
              col("total_checks")).as("suggested_interval_hours"))
          .orderBy("object_name")
      },
      Some("""WITH checks AS (
          SELECT event_type AS object_name,
            ts AS check_timestamp, value > 250 AS change_detected
          FROM events),
        changed AS (
          SELECT object_name,
            (epoch(check_timestamp) - epoch(LAG(check_timestamp, 1)
              OVER (PARTITION BY object_name ORDER BY check_timestamp))) / 3600.0
              AS hours
          FROM checks WHERE change_detected),
        agg_changed AS (
          SELECT object_name, AVG(hours) AS avg_hours
          FROM changed GROUP BY object_name),
        base AS (
          SELECT object_name,
            CAST(COUNT(*) AS BIGINT) AS total_checks,
            CAST(COUNT(CASE WHEN change_detected THEN 1 END) AS BIGINT)
              AS changes_detected
          FROM checks GROUP BY object_name),
        f AS (
          SELECT b.object_name, b.total_checks,
            CASE WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.5
                THEN 'high'
              WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.1
                THEN 'medium'
              ELSE 'low' END AS frequency,
            ROUND(CASE WHEN b.changes_detected >= 2 THEN a.avg_hours END, 6)
              AS avg_hours
          FROM base b LEFT JOIN agg_changed a ON b.object_name = a.object_name),
        s AS (
          SELECT object_name, frequency, total_checks,
            CASE WHEN total_checks < 5 THEN 24
              WHEN frequency = 'high' THEN
                CASE WHEN avg_hours IS NOT NULL THEN
                    GREATEST(1, LEAST(CAST(FLOOR(avg_hours / 3) AS INT), 24))
                  ELSE GREATEST(1, 12) END
              WHEN frequency = 'medium' THEN
                CASE WHEN avg_hours IS NOT NULL AND avg_hours < 24 THEN
                    GREATEST(1, CAST(FLOOR(avg_hours * 0.75) AS INT))
                  ELSE 24 END
              ELSE LEAST(168, 48) END AS raw
          FROM f)
        SELECT object_name, frequency, total_checks,
          CAST(GREATEST(1, LEAST(168, raw)) AS INT)
            AS suggested_interval_hours
        FROM s ORDER BY object_name""")),

    Q("t07_high_impact_objects",
      (s, d) => {
        val checks = eventsTable(s, d).select(
          lit("table").as("object_type"),
          col("event_type").as("object_name"),
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        Trends.highImpactObjects(Trends.changeFrequency(checks), limit = 3)
          .select(col("object_name"), col("changes_detected"))
      },
      Some("""SELECT event_type AS object_name,
          CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS changes_detected
        FROM events GROUP BY event_type
        ORDER BY changes_detected DESC, object_name LIMIT 3""")),

    Q("t08_daily_check_stats",
      (s, d) => {
        val checks = eventsTable(s, d).select(
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        Trends.dailyCheckStats(checks)
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS checks,
          CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS changes,
          ROUND(CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS DOUBLE)
            / COUNT(*) * 100.0, 2) AS change_pct
        FROM events GROUP BY 1 ORDER BY day""")),

    Q("t10_frequency_distribution",
      // T8's frequency half (app.py:5456-5490): ≥5-check objects bucketed
      // by change ratio, one row per non-empty bucket
      (s, d) => {
        val checks = eventsTable(s, d).select(
          col("event_type").as("object_name"),
          (col("value") > 250).as("change_detected"))
        Trends.frequencyDistribution(checks).orderBy("frequency")
      },
      Some("""WITH per_object AS (
          SELECT event_type AS object_name,
            CAST(COUNT(*) AS BIGINT) AS checks,
            CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS changes
          FROM events WHERE event_type IS NOT NULL
          GROUP BY event_type HAVING COUNT(*) >= 5)
        SELECT CASE WHEN CAST(changes AS DOUBLE) / checks >= 0.5 THEN 'high'
            WHEN CAST(changes AS DOUBLE) / checks >= 0.1 THEN 'medium'
            ELSE 'low' END AS frequency,
          CAST(COUNT(*) AS BIGINT) AS object_count
        FROM per_object GROUP BY 1 ORDER BY frequency""")),

    Q("t09_daily_metric_avg",
      (s, d) => {
        val metrics = eventsTable(s, d)
          .select(col("ts"), col("value").as("metric_value"))
        Trends.dailyMetricAvg(metrics)
          .select(col("day"), round(col("avg_value"), 6).as("avg_value"), col("n"))
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value), 6)
            AS avg_value,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1 ORDER BY day""")),

    Q("p23_row_growth",
      (s, d) => {
        val series = eventsTable(s, d)
          .groupBy(to_date(col("ts")).as("ts"))
          .agg(count(lit(1)).cast("double").as("metric_value"))
          .withColumn("series", lit("events"))
        Trends.rowGrowth(series, Seq("series"))
          .select(col("ts").as("day"), col("metric_value"),
            col("prev_value"), round(col("growth_pct"), 6).as("growth_pct"),
            col("unusual_growth"))
          .orderBy("day")
      },
      Some("""WITH series AS (
          SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS v
          FROM events GROUP BY 1)
        SELECT day, v AS metric_value,
          LAG(v, 1) OVER (ORDER BY day) AS prev_value,
          ROUND(CASE WHEN LAG(v, 1) OVER (ORDER BY day) IS NOT NULL
            AND LAG(v, 1) OVER (ORDER BY day) <> 0
            THEN (v - LAG(v, 1) OVER (ORDER BY day))
              / LAG(v, 1) OVER (ORDER BY day) * 100.0 END, 6) AS growth_pct,
          CASE WHEN LAG(v, 1) OVER (ORDER BY day) IS NOT NULL
            THEN ABS(v - LAG(v, 1) OVER (ORDER BY day))
              > LAG(v, 1) OVER (ORDER BY day) * 0.2 END AS unusual_growth
        FROM series ORDER BY day""")))
}
