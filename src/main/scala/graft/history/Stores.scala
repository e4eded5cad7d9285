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
      rows.write.mode(SaveMode.Append).partitionBy("table_name", "date")
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
      rows.write.mode(SaveMode.Append).partitionBy("table_name", "date")
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
      rows.write.mode(SaveMode.Append).partitionBy("date").parquet(path)
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
   *  acknowledged=true. Parquet has no in-place update, so the whole
   *  store is rewritten (an ACID table format would replace this with a
   *  partition-scoped MERGE at scale). Crash-safe swap: the live path is
   *  renamed ASIDE before the new data moves in, so no failure point
   *  leaves the store empty — worst case the backup dir survives next
   *  to a consistent live store. */
  def acknowledge(changeType: String, tableName: String): Unit = {
    val df = spark.read.parquet(path)
    val updated = df.withColumn("acknowledged",
      when(col("change_type") === changeType &&
        col("table_name") === tableName, true)
        .otherwise(col("acknowledged")))
    val tmp = path + "__tmp"
    updated.withColumn("date", to_date(col("detected_at")))
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val backup = new org.apache.hadoop.fs.Path(path + "__bak")
    fs.delete(backup, true) // clear any leftover from a prior crash
    if (!fs.rename(live, backup))
      throw new java.io.IOException(s"acknowledge: cannot move $live aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), live)) {
      fs.rename(backup, live) // roll back: old data returns to the live path
      throw new java.io.IOException(s"acknowledge: cannot activate $tmp")
    }
    fs.delete(backup, true)
  }
}

/** S8 (sixth sink) / A7: persisted anomaly-scan results — the reference
 *  stores detected anomalies in `anomaly_results` and publishes events
 *  (core/anomalies/scheduler.py:316-336, batch inserts of 50). Spark
 *  shape: one append per scan, partitioned by date, carrying the run
 *  timestamp + metric identity so dashboards read one partition slice. */
final class AnomaliesStore(spark: SparkSession, path: String) {

  /** Append one scan's detected rows. Expects the `Anomalies.detect`
   *  output columns (table_name, column_name, metric_name, ts, value/
   *  metric_value, score, is_anomaly, threshold, method, severity). */
  def append(detected: DataFrame, runTs: java.sql.Timestamp): Unit = {
    val withRun = detected
      .withColumn("run_at", lit(runTs))
      .withColumn("date", to_date(col("run_at")))
    StoreIO.appendLocked(path) {
      withRun.write.mode(SaveMode.Append).partitionBy("date").parquet(path)
    }
  }

  /** Filtered listing, newest scan first. */
  def list(
      tableName: Option[String] = None,
      metricName: Option[String] = None,
      anomaliesOnly: Boolean = true): DataFrame = {
    var df = spark.read.parquet(path)
    tableName.foreach(t => df = df.filter(col("table_name") === t))
    metricName.foreach(m => df = df.filter(col("metric_name") === m))
    if (anomaliesOnly) df = df.filter(col("is_anomaly"))
    df.orderBy(col("run_at").desc)
  }
}
