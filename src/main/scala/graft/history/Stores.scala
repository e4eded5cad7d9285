package graft.history

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.{SchemaChange, TableProfile, ValidationResult}

/**
 * Result sinks (SURVEY.md §2.1 S8, §2.3 V5, §2.5 C8): parquet-backed
 * append stores for profiles, validation results (+ failure events) and
 * schema changes — the Spark-native equivalent of the reference's
 * Supabase tables (profiling_history, validation_results,
 * schema_changes; supabase_profile_history.py:73-84,
 * routes/validations.py:804-850, schema_change_detector.py:441-458).
 *
 * All stores append partitioned by (table_name, date) so history reads
 * for one table partition-prune; a 100 TB deployment's history is
 * dominated by the metrics store, which additionally partitions by
 * connection.
 */
final class ProfileStore(spark: SparkSession, path: String) {
  import spark.implicits._

  /** Append one profile run as a flat row per column + a table-level
   *  row (column_name = null). */
  def append(p: TableProfile, runTs: java.sql.Timestamp): Unit = {
    val tableRow = (p.table, null: String, "table", p.rowCount.toDouble,
      runTs, p.healthScore.toDouble, p.duplicateCount.toDouble)
    val colRows = p.columns.map(c =>
      (p.table, c.name, "column", c.nullPercentage, runTs,
        c.distinctCount.map(_.toDouble).getOrElse(-1.0),
        c.nullCount.toDouble))
    val rows = (tableRow +: colRows)
      .toDF("table_name", "column_name", "level", "metric_value", "ts",
        "metric_aux", "metric_aux2")
      .withColumn("date", to_date(col("ts")))
    StoreIO.appendLocked(path) {
      // driver-local rows: one task writes one file per partition dir
      // (a LocalTableScan write otherwise runs one trivial task PER ROW
      // and lands that many files — guide §6, r19)
      rows.coalesce(1).write.mode(SaveMode.Append)
        .partitionBy("table_name", "date")
        .parquet(path)
    }
  }

  /** T1: last-N profile runs for a table, newest first (profile trends
   *  feed off this — supabase_manager.py:218-266). */
  def history(tableName: String, limit: Int = 30): DataFrame =
    spark.read.parquet(path)
      .filter(col("table_name") === tableName && col("level") === "table")
      .orderBy(col("ts").desc)
      .limit(limit)
}

final class ValidationStore(spark: SparkSession, path: String) {
  import spark.implicits._

  /** V5: store per-rule results; failure rows double as failure events
   *  (routes/validations.py:804-850). Schema-mismatch sniffing: an
   *  errored rule whose message mentions a missing column/table is
   *  flagged so downstream can trigger schema re-detection. */
  def append(
      tableName: String,
      results: Seq[ValidationResult],
      runTs: java.sql.Timestamp): Unit = {
    val rows = results.map { r =>
      val err = r.error.getOrElse("")
      val schemaMismatch = err.contains("UNRESOLVED_COLUMN") ||
        err.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        err.toLowerCase.contains("cannot resolve")
      (tableName, r.ruleName, r.isValid,
        r.actualValue.map(_.toString).orNull,
        r.expectedValue.toString, r.operator, r.error.orNull,
        schemaMismatch, runTs)
    }.toDF("table_name", "rule_name", "is_valid", "actual_value",
      "expected_value", "operator", "error", "schema_mismatch", "run_at")
      .withColumn("date", to_date(col("run_at")))
    StoreIO.appendLocked(path) {
      // single-task driver-local append (guide §6, r19 — see ProfileStore)
      rows.coalesce(1).write.mode(SaveMode.Append)
        .partitionBy("table_name", "date")
        .parquet(path)
    }
  }

  def results(tableName: String): DataFrame =
    spark.read.parquet(path).filter(col("table_name") === tableName)

  /** Failure events = failed or errored rows (the reference publishes
   *  one event per failed rule). */
  def failureEvents(tableName: String): DataFrame =
    results(tableName).filter(!col("is_valid") || col("error").isNotNull)
}

final class ChangesStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def append(changes: Seq[SchemaChange], detectedAt: java.sql.Timestamp): Unit = {
    if (changes.isEmpty) return
    val rows = changes.map(c => (c.changeType, c.table, c.column.orNull,
      c.important, detectedAt, false))
      .toDF("change_type", "table_name", "column_name", "important",
        "detected_at", "acknowledged")
      .withColumn("date", to_date(col("detected_at")))
    StoreIO.appendLocked(path) {
      // single-task driver-local append (guide §6, r19 — see ProfileStore)
      rows.coalesce(1).write.mode(SaveMode.Append)
        .partitionBy("date").parquet(path)
    }
  }

  /** C8: filtered listing (app.py:3857-4058). */
  def list(
      tableName: Option[String] = None,
      importantOnly: Boolean = false,
      includeAcknowledged: Boolean = true): DataFrame = {
    var df = spark.read.parquet(path)
    tableName.foreach(t => df = df.filter(col("table_name") === t))
    if (importantOnly) df = df.filter(col("important"))
    if (!includeAcknowledged) df = df.filter(!col("acknowledged"))
    df.orderBy(col("detected_at").desc)
  }

  /** C8: acknowledge = rewrite the store with matching rows flipped to
   *  acknowledged=true (crash-safe swap shared via StoreIO.rewriteLocked). */
  def acknowledge(changeType: String, tableName: String): Unit =
    StoreIO.rewriteLocked(spark, path, Seq("date")) { df =>
      df.withColumn("acknowledged",
        when(col("change_type") === changeType &&
          col("table_name") === tableName, true)
          .otherwise(col("acknowledged")))
        .withColumn("date", to_date(col("detected_at")))
    }
}

/** S8 (sixth sink) / A7: persisted anomaly-scan results — the reference
 *  stores detected anomalies in `anomaly_results` and publishes events
 *  (core/anomalies/scheduler.py:316-336, batch inserts of 50). Spark
 *  shape: one append per scan, partitioned by date, carrying the run
 *  timestamp + metric identity so dashboards read one partition slice.
 *
 *  Triage lifecycle (core/anomalies/api.py:275-332): every stored row
 *  carries `status` ∈ {open, acknowledged, resolved, expected} plus
 *  resolution_note / resolved_at / resolved_by, updated in place via the
 *  crash-safe store rewrite. `anomaly_id` is a deterministic md5 of the
 *  row's metric identity + timestamp + method + scan run_at — the
 *  library analog of the reference's DB-generated UUID (one id per
 *  INSERTED detection, so a re-detection of the same spike in a later
 *  scan is its own addressable row and triaging one never rewrites the
 *  other), but stable across re-reads so callers can address a row
 *  without holding a handle to it. */
final class AnomaliesStore(spark: SparkSession, path: String) {

  import AnomaliesStore.ValidStatuses

  /** Append one scan's detected rows with status='open'. Expects the
   *  `Anomalies.detect` output columns (table_name, column_name,
   *  metric_name, ts, metric_value, score, is_anomaly, threshold,
   *  method, severity). */
  def append(detected: DataFrame, runTs: java.sql.Timestamp): Unit = {
    val withRun = detected
      .withColumn("run_at", lit(runTs))
      .withColumn("date", to_date(col("run_at")))
      .withColumn("anomaly_id", md5(concat_ws("|",
        col("table_name"), coalesce(col("column_name"), lit("")),
        col("metric_name"), col("ts").cast("string"), col("method"),
        col("run_at").cast("string"))))
      .withColumn("status", lit("open"))
      .withColumn("resolution_note", lit(null).cast("string"))
      .withColumn("resolved_at", lit(null).cast("timestamp"))
      .withColumn("resolved_by", lit(null).cast("string"))
    StoreIO.appendLocked(path) {
      withRun.write.mode(SaveMode.Append).partitionBy("date").parquet(path)
    }
  }

  /** Lifecycle columns defaulted — lets a store written before the
   *  status column existed read as all-open instead of failing. */
  private def withLifecycleDefaults(raw: DataFrame): DataFrame = {
    var df = raw
    val present = df.columns.toSet
    if (!present("status")) df = df.withColumn("status", lit("open"))
    if (!present("anomaly_id"))
      df = df.withColumn("anomaly_id", md5(concat_ws("|",
        col("table_name"), coalesce(col("column_name"), lit("")),
        col("metric_name"), col("ts").cast("string"), col("method"),
        col("run_at").cast("string"))))
    if (!present("resolution_note"))
      df = df.withColumn("resolution_note", lit(null).cast("string"))
    if (!present("resolved_at"))
      df = df.withColumn("resolved_at", lit(null).cast("timestamp"))
    if (!present("resolved_by"))
      df = df.withColumn("resolved_by", lit(null).cast("string"))
    df
  }

  /** Fresh-install contract: a store that was never written reads as a
   *  schema-correct EMPTY frame (the standard every other store here
   *  follows), so summary() yields one all-zero row, trends() a
   *  zero-filled spine, and list() an empty listing — no caller-side
   *  placeholder frames with divergent schemas. Column order matches
   *  the parquet read-back of a written store (partition col `date`
   *  last). */
  private def read(): DataFrame =
    if (!exists)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          """table_name STRING, column_name STRING, metric_name STRING,
            |ts TIMESTAMP, metric_value DOUBLE, score DOUBLE,
            |is_anomaly BOOLEAN, threshold DOUBLE, severity STRING,
            |method STRING, run_at TIMESTAMP, anomaly_id STRING,
            |status STRING, resolution_note STRING, resolved_at TIMESTAMP,
            |resolved_by STRING, date DATE""".stripMargin))
    else withLifecycleDefaults(spark.read.parquet(path))

  /** Filtered listing, newest first (get_anomalies, api.py:209-249:
   *  optional table/status filters, days lookback, limit). */
  def list(
      tableName: Option[String] = None,
      metricName: Option[String] = None,
      status: Option[String] = None,
      days: Option[Int] = None,
      now: Option[java.sql.Timestamp] = None,
      anomaliesOnly: Boolean = true,
      limit: Option[Int] = None): DataFrame = {
    require(days.isEmpty || now.isDefined,
      "list(days=...) needs now=... — a lookback without a reference " +
        "time would silently scan the whole history")
    var df = read()
    tableName.foreach(t => df = df.filter(col("table_name") === t))
    metricName.foreach(m => df = df.filter(col("metric_name") === m))
    status.foreach(st => df = df.filter(col("status") === st))
    for (d <- days; n <- now)
      df = df.filter(col("run_at") >= lit(n) - expr(s"INTERVAL $d DAYS"))
    if (anomaliesOnly) df = df.filter(col("is_anomaly"))
    df = df.orderBy(col("run_at").desc, col("anomaly_id"))
    limit.map(df.limit).getOrElse(df)
  }

  /** update_anomaly_status (api.py:275-332): set status (+ note); only
   *  'resolved' stamps resolved_at/by — acknowledge/expected leave them
   *  null, exactly the reference's update_data branches. */
  def updateStatus(
      anomalyId: String,
      status: String,
      now: java.sql.Timestamp,
      resolutionNote: Option[String] = None,
      userId: Option[String] = None): Long =
    updateStatusWhere(col("anomaly_id") === anomalyId, status, now,
      resolutionNote, userId)

  /** Bulk form of updateStatus — one store rewrite updates every row
   *  matching `cond` (the triage-a-whole-series gesture; the reference
   *  loops its single-id endpoint, which at Spark scale would be N full
   *  rewrites instead of one). Returns the number of rows matched —
   *  0 means the id/filter hit nothing (the reference 404s there) and
   *  the store was left untouched. */
  def updateStatusWhere(
      cond: org.apache.spark.sql.Column,
      status: String,
      now: java.sql.Timestamp,
      resolutionNote: Option[String] = None,
      userId: Option[String] = None): Long = {
    require(ValidStatuses(status),
      s"Invalid status: $status. Must be one of ${ValidStatuses.mkString(", ")}")
    val matched =
      if (!exists) 0L else read().filter(cond).count()
    if (matched == 0L) return 0L
    val noteLit = resolutionNote.map(lit(_)).getOrElse(lit(null).cast("string"))
    val userLit = userId.map(lit(_)).getOrElse(lit(null).cast("string"))
    StoreIO.rewriteLocked(spark, path, Seq("date")) { raw =>
      // pre-lifecycle stores upgrade their schema on first update
      withLifecycleDefaults(raw)
        .withColumn("resolution_note",
          when(cond, noteLit).otherwise(col("resolution_note")))
        .withColumn("resolved_at",
          when(cond && lit(status == "resolved"), lit(now))
            .otherwise(col("resolved_at")))
        .withColumn("resolved_by",
          when(cond && lit(status == "resolved"), userLit)
            .otherwise(col("resolved_by")))
        .withColumn("status", when(cond, status).otherwise(col("status")))
    }
    matched
  }

  /** get_summary (api.py:356-506): one row of counts over the lookback —
   *  by severity, by status, detected today — computed in ONE scan of
   *  the date-pruned slice (the reference issues 4 SQL round-trips). */
  def summary(now: java.sql.Timestamp, days: Int = 30): DataFrame = {
    val slice = read().filter(col("is_anomaly"))
      .filter(col("run_at") >= lit(now) - expr(s"INTERVAL $days DAYS"))
    slice.agg(
      count(lit(1)).as("total_anomalies"),
      count(when(col("severity") === "high", 1)).as("high_severity"),
      count(when(col("severity") === "medium", 1)).as("medium_severity"),
      count(when(col("severity") === "low", 1)).as("low_severity"),
      count(when(col("status") === "open", 1)).as("open"),
      count(when(col("status") === "acknowledged", 1)).as("acknowledged"),
      count(when(col("status") === "resolved", 1)).as("resolved"),
      count(when(col("status") === "expected", 1)).as("expected"),
      count(when(to_date(col("run_at")) === to_date(lit(now)), 1))
        .as("detected_today"))
  }

  /** get_summary's by_table block (api.py:404-420): top-N tables by
   *  anomaly count over the lookback. */
  def byTable(now: java.sql.Timestamp, days: Int = 30, top: Int = 10): DataFrame =
    read().filter(col("is_anomaly"))
      .filter(col("run_at") >= lit(now) - expr(s"INTERVAL $days DAYS"))
      .groupBy("table_name").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("table_name"))
      .limit(top)

  /** _get_anomaly_trends (api.py:569-639): densified per-day counts by
   *  severity over the window — every calendar day appears, zero-filled
   *  via a generated day spine left-joined to the grouped counts. */
  def trends(now: java.sql.Timestamp, days: Int = 30): DataFrame = {
    val slice = read().filter(col("is_anomaly"))
      .filter(col("run_at") >= lit(now) - expr(s"INTERVAL $days DAYS"))
    val daily = slice
      .groupBy(to_date(col("run_at")).as("day"))
      .agg(count(lit(1)).as("total"),
        count(when(col("severity") === "high", 1)).as("high"),
        count(when(col("severity") === "medium", 1)).as("medium"),
        count(when(col("severity") === "low", 1)).as("low"))
    // sequence(date, date) defaults to a 1-day step; avoids the ANSI
    // date-minus-interval type promotion to timestamp
    val spine = spark.range(1).select(explode(sequence(
      date_sub(to_date(lit(now)), days), to_date(lit(now)))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("date"),
        coalesce(col("total"), lit(0L)).as("total"),
        coalesce(col("high"), lit(0L)).as("high"),
        coalesce(col("medium"), lit(0L)).as("medium"),
        coalesce(col("low"), lit(0L)).as("low"))
      .orderBy("date")
  }

  /** Distinct series identities whose anomalies a user marked
   *  'expected' — the re-alert suppression key set (api.py:223's status
   *  filter feeding the scheduler: expected anomalies are excluded from
   *  the active triage view, so re-detections of the same series don't
   *  re-notify). Driver-small: bounded by configured series, not rows. */
  def expectedSeries(): DataFrame =
    read().filter(col("status") === "expected")
      .select("table_name", "column_name", "metric_name").distinct()

  def exists: Boolean = StoreIO.exists(spark, path)
}

object AnomaliesStore {
  val ValidStatuses: Set[String] =
    Set("open", "acknowledged", "resolved", "expected")
}
