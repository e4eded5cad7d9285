package graft.history

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * History layer (SURVEY.md §2.1 S8, §2.6 T1–T10): parquet-backed append
 * stores + trend analytics over them.
 *
 * The reference persists profiles/metrics/results into Supabase tables
 * (historical_metrics.py:28-217, supabase_profile_history.py:73-84) and
 * post-processes small series in Python. Spark-native shape: long/narrow
 * DataFrames appended to parquet partitioned by (connection_id,
 * table_name, date) — trend queries partition-prune to one table's
 * slice; at 100 TB of history a trend query touches only its partitions.
 */
final class MetricsStore(spark: SparkSession, path: String) {

  /** S8/T10: append a batch of metric points. Expected columns:
   *  connection_id, table_name, column_name, metric_name, metric_value,
   *  ts (timestamp). A `date` partition column is derived. */
  def append(points: DataFrame): Unit =
    StoreIO.appendLocked(path) {
      points
        .withColumn("date", to_date(col("ts")))
        .write.mode(SaveMode.Append)
        .partitionBy("connection_id", "table_name", "date")
        .parquet(path)
    }

  /** T10: filtered range query (historical_metrics.py:130-217). Filters
   *  on partition columns prune directly at the file listing. */
  def query(
      connectionId: String,
      tableName: Option[String] = None,
      columnName: Option[String] = None,
      metricName: Option[String] = None,
      days: Option[Int] = None,
      now: Option[java.sql.Timestamp] = None,
      limit: Option[Int] = None): DataFrame = {
    var df = spark.read.parquet(path)
      .filter(col("connection_id") === connectionId)
    tableName.foreach(t => df = df.filter(col("table_name") === t))
    columnName.foreach(c => df = df.filter(col("column_name") === c))
    metricName.foreach(m => df = df.filter(col("metric_name") === m))
    for (d <- days; n <- now)
      df = df.filter(col("ts") >= lit(n) - expr(s"INTERVAL $d DAYS"))
    val ordered = df.orderBy(col("ts"))
    limit.map(ordered.limit).getOrElse(ordered)
  }
}

object Trends {

  /** T2: per-(column, metric) trend stats over a metrics series
   *  (app.py:4701-4744): current/min/max value, percent_change =
   *  (last − first)/first × 100 (null when first = 0 or <2 points),
   *  absolute_change = last − first. One shuffle keyed by series. */
  def metricTrends(
      metrics: DataFrame,
      columnCol: String = "column_name",
      metricCol: String = "metric_name",
      valueCol: String = "metric_value",
      tsCol: String = "ts"): DataFrame = {
    val v = col(valueCol); val ts = col(tsCol)
    metrics.groupBy(col(columnCol).as("column"), col(metricCol).as("metric"))
      .agg(
        count(v).as("n"),
        min_by(v, ts).as("first_value"),
        max_by(v, ts).as("current_value"),
        min(v).as("min_value"),
        max(v).as("max_value"))
      .withColumn("absolute_change",
        when(col("n") >= 2, col("current_value") - col("first_value")))
      .withColumn("percent_change",
        when(col("n") >= 2 && col("first_value") =!= 0.0,
          (col("current_value") - col("first_value")) / col("first_value") * 100.0))
      .drop("n", "first_value")
  }

  /** P23: row-count growth vs the previous profile run — percent change
   *  per consecutive point of a row_count series
   *  (default_validations.py:71-97's intent, made executable with real
   *  history). */
  def rowGrowth(
      rowCounts: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "metric_value"): DataFrame = {
    // the extra isNull key keeps the partition spec non-foldable: when a
    // caller tags a single series with a literal column, Catalyst's
    // FoldablePropagation + EliminateWindowPartitions would fold the
    // spec empty and WindowExec would log its move-everything warning.
    // Null-ts rows are dropped first (a point with no timestamp cannot
    // sit in a time series), so isNull(ts) is constant-false for every
    // surviving row and partitioning is genuinely unchanged; the frame
    // here is per-day aggregates (tiny) either way.
    val w = Window.partitionBy(
      (seriesCols.map(col) :+ col(tsCol).isNull): _*).orderBy(col(tsCol))
    rowCounts
      .filter(col(tsCol).isNotNull)
      .withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("growth_pct",
        when(col("prev_value").isNotNull && col("prev_value") =!= 0.0,
          (col(valueCol) - col("prev_value")) / col("prev_value") * 100.0))
      .withColumn("unusual_growth",
        when(col("prev_value").isNotNull,
          abs(col(valueCol) - col("prev_value")) > col("prev_value") * 0.2))
  }

  /** T3: daily validation trends with dense date series
   *  (app.py:4379-4553). Input: one row per validation run with
   *  rule_id, is_valid (nullable boolean — null = errored), run_at.
   *
   *  latest-per-(rule, day) via row_number window; daily aggregates;
   *  densified by joining an exploded `sequence(start, end)` calendar —
   *  days without runs emit total=0, health=0, not_run=totalRules. */
  def validationDailyTrends(
      results: DataFrame,
      totalRules: Int,
      startDate: String,
      endDate: String,
      ruleCol: String = "rule_id",
      validCol: String = "is_valid",
      tsCol: String = "run_at"): DataFrame = {
    val spark = results.sparkSession
    val day = to_date(col(tsCol))
    val w = Window.partitionBy(col(ruleCol), day).orderBy(col(tsCol).desc)
    val latestPerRuleDay = results
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("day", day)
    val daily = latestPerRuleDay.groupBy("day").agg(
      count(lit(1)).as("total_validations"),
      coalesce(sum(when(col(validCol) === true, 1L).otherwise(0L)), lit(0L)).as("passed"),
      coalesce(sum(when(col(validCol) === false, 1L).otherwise(0L)), lit(0L)).as("failed"),
      coalesce(sum(when(col(validCol).isNull, 1L).otherwise(0L)), lit(0L)).as("errored"))
    val calendar = spark.sql(
      s"SELECT explode(sequence(DATE'$startDate', DATE'$endDate', INTERVAL 1 DAY)) AS day")
    calendar.join(daily, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("total_validations"), lit(0L)).as("total_validations"),
        coalesce(col("passed"), lit(0L)).as("passed"),
        coalesce(col("failed"), lit(0L)).as("failed"),
        coalesce(col("errored"), lit(0L)).as("errored"))
      .withColumn("health_score",
        round(when(col("passed") + col("failed") > 0,
          col("passed").cast("double") / (col("passed") + col("failed")) * 100.0)
          .otherwise(0.0), 2))
      .withColumn("not_run", lit(totalRules.toLong) - col("total_validations"))
      .orderBy("day")
  }

  /** T4: current health score — latest result per rule, passed/(passed+
   *  failed)×100 (app.py:4556-4596). */
  def currentHealthScore(
      results: DataFrame,
      ruleCol: String = "rule_id",
      validCol: String = "is_valid",
      tsCol: String = "run_at"): DataFrame = {
    val w = Window.partitionBy(col(ruleCol)).orderBy(col(tsCol).desc)
    results
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .agg(
        coalesce(sum(when(col(validCol) === true, 1L).otherwise(0L)), lit(0L)).as("passed"),
        coalesce(sum(when(col(validCol) === false, 1L).otherwise(0L)), lit(0L)).as("failed"))
      .withColumn("health_score",
        round(when(col("passed") + col("failed") > 0,
          col("passed").cast("double") / (col("passed") + col("failed")) * 100.0)
          .otherwise(0.0), 2))
  }

  /** T5: change frequency per metadata object over a check-record series
   *  (change_analytics.py:80-177): change_ratio, frequency bucket
   *  (≥0.5 high / ≥0.1 medium / low), avg hours between detected
   *  changes (lag diffs, needs ≥2 changes), most recent change. */
  def changeFrequency(
      checks: DataFrame,
      objectCols: Seq[String] = Seq("object_type", "object_name"),
      tsCol: String = "check_timestamp",
      changedCol: String = "change_detected"): DataFrame = {
    // accept any physical ts encoding; integer epoch-micros arithmetic
    // (cast-to-double on timestamps is the fragile form: it rejects NTZ
    // outright and loses sub-second precision past 2^53 µs)
    val checksN = graft.operators.TsNorm.normalizeTs(checks, tsCol)
    val parts = objectCols.map(col)
    val wChg = Window.partitionBy(parts: _*).orderBy(col(tsCol))
    // hours between consecutive DETECTED changes: restrict to changed rows
    val changed = checksN.filter(col(changedCol))
      .withColumn("__prevTs", lag(col(tsCol), 1).over(wChg))
      .withColumn("__hours",
        (unix_micros(col(tsCol)) - unix_micros(col("__prevTs")))
          .cast("double") / 3.6e9)
    val avgHours = changed.groupBy(parts: _*)
      .agg(avg(col("__hours")).as("avg_hours_between_changes"),
        max(col(tsCol)).as("most_recent_change"))
    val base = checksN.groupBy(parts: _*).agg(
      count(lit(1)).as("total_checks"),
      coalesce(sum(when(col(changedCol), 1L).otherwise(0L)), lit(0L))
        .as("changes_detected"))
    base.join(avgHours, objectCols, "left")
      .withColumn("change_ratio",
        col("changes_detected").cast("double") / col("total_checks"))
      .withColumn("frequency",
        when(col("change_ratio") >= 0.5, "high")
          .when(col("change_ratio") >= 0.1, "medium")
          .otherwise("low"))
      .withColumn("avg_hours_between_changes",
        when(col("changes_detected") >= 2, col("avg_hours_between_changes")))
  }

  /** T6: refresh-interval suggestion (change_analytics.py:179-271) —
   *  pure arithmetic over one T5 row. */
  def suggestRefreshInterval(
      frequency: String,
      avgHoursBetweenChanges: Option[Double],
      dataPoints: Long,
      currentIntervalHours: Int = 24,
      minIntervalHours: Int = 1,
      maxIntervalHours: Int = 168): Int = {
    if (dataPoints < 5) return currentIntervalHours
    val suggested = frequency match {
      case "high" => avgHoursBetweenChanges match {
        case Some(h) =>
          math.max(minIntervalHours, math.min((h / 3).toInt, currentIntervalHours))
        case None => math.max(minIntervalHours, currentIntervalHours / 2)
      }
      case "medium" => avgHoursBetweenChanges match {
        case Some(h) if h < currentIntervalHours =>
          math.max(minIntervalHours, (h * 0.75).toInt)
        case _ => currentIntervalHours
      }
      case "low" => math.min(maxIntervalHours, currentIntervalHours * 2)
      case _ => currentIntervalHours
    }
    math.max(minIntervalHours, math.min(maxIntervalHours, suggested))
  }

  /** T7: high-impact objects — top-N by change activity
   *  (change_analytics.py:273+, app.py:5425-5428). */
  def highImpactObjects(frequencies: DataFrame, limit: Int = 5): DataFrame =
    frequencies.orderBy(col("changes_detected").desc,
      col("object_name")).limit(limit)

  /** T8: analytics dashboard daily aggregates (app.py:5397-5533):
   *  per-day checks / changes / change %. */
  def dailyCheckStats(
      checks: DataFrame,
      tsCol: String = "check_timestamp",
      changedCol: String = "change_detected"): DataFrame =
    checks
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("checks"),
        coalesce(sum(when(col(changedCol), 1L).otherwise(0L)), lit(0L))
          .as("changes"))
      .withColumn("change_pct",
        round(col("changes").cast("double") / col("checks") * 100.0, 2))
      .orderBy("day")

  /** T8 (frequency half): dashboard frequency distribution
   *  (app.py:5456-5490) — objects with ≥ `minChecks` checks, bucketed by
   *  change ratio (≥0.5 high / ≥0.1 medium / low), one row per NON-EMPTY
   *  bucket with its object count. Two small shuffles: per-object agg,
   *  then a 3-row bucket agg. */
  def frequencyDistribution(
      checks: DataFrame,
      objectCol: String = "object_name",
      changedCol: String = "change_detected",
      minChecks: Int = 5): DataFrame = {
    val ratio = col("changes").cast("double") / col("checks")
    checks
      .filter(col(objectCol).isNotNull)
      .groupBy(col(objectCol))
      .agg(
        count(lit(1)).as("checks"),
        coalesce(sum(when(col(changedCol), 1L).otherwise(0L)), lit(0L))
          .as("changes"))
      .filter(col("checks") >= minChecks)
      .withColumn("frequency",
        when(ratio >= 0.5, "high").when(ratio >= 0.1, "medium")
          .otherwise("low"))
      .groupBy("frequency")
      .agg(count(lit(1)).as("object_count"))
  }

  /** T9: dashboard metric trends — daily averages of a metric series
   *  (app.py:5659-5845). */
  def dailyMetricAvg(
      metrics: DataFrame,
      tsCol: String = "ts",
      valueCol: String = "metric_value"): DataFrame =
    metrics
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        avg(col(valueCol)).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy("day")
}
