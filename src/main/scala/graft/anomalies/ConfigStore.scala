package graft.anomalies

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.AnomalyConfig

/**
 * Persisted anomaly-detection configurations (reference:
 * core/anomalies/api.py:24-174 get/create/update/delete over the
 * `anomaly_detection_configs` table) driving scheduled batch detection
 * (scheduler.py:211-341 runs every active config per connection).
 *
 * Same event-sourced shape as [[graft.validations.RuleStore]]:
 * append-only versioned parquet keyed by the config identity
 * (table_name, column_name, metric_name); latest version wins; deleted
 * = tombstone. The batch scan reads ACTIVE configs and the engine runs
 * them all in one job (GraftEngine.runAnomalyScanAll).
 */
final class AnomalyConfigStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def appendVersion(
      c: AnomalyConfig, active: Boolean, deleted: Boolean,
      now: Timestamp): Unit = {
    val row = Seq((c.tableName, c.columnName.orNull, c.metricName,
      c.detectionMethod, c.sensitivity, c.minDataPoints, c.window,
      c.stdWindow, active, deleted, now))
      .toDF("table_name", "column_name", "metric_name", "detection_method",
        "sensitivity", "min_data_points", "window", "std_window",
        "is_active", "deleted", "updated_at")
    graft.history.StoreIO.appendLocked(path) {
      row.write.mode(SaveMode.Append).parquet(path)
    }
  }

  def createConfig(c: AnomalyConfig, now: Timestamp): Unit =
    appendVersion(c, active = true, deleted = false, now)

  def updateConfig(c: AnomalyConfig, now: Timestamp): Unit =
    appendVersion(c, active = true, deleted = false, now)

  def deactivateConfig(c: AnomalyConfig, now: Timestamp): Unit =
    appendVersion(c, active = false, deleted = false, now)

  def deleteConfig(c: AnomalyConfig, now: Timestamp): Unit =
    appendVersion(c, active = false, deleted = true, now)

  private def exists: Boolean =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** Latest version per config identity; tombstones excluded. */
  def configs(activeOnly: Boolean = true): DataFrame = {
    if (!exists)
      return Seq.empty[(String, String, String, String, Double, Int, Int,
        Int, Boolean, Boolean, Timestamp)]
        .toDF("table_name", "column_name", "metric_name", "detection_method",
          "sensitivity", "min_data_points", "window", "std_window",
          "is_active", "deleted", "updated_at")
        .drop("deleted")
    val latest = spark.read.parquet(path)
      .groupBy(col("table_name"),
        coalesce(col("column_name"), lit("")).as("__ck"),
        col("metric_name"))
      .agg(max_by(
        struct(col("column_name"), col("detection_method"),
          col("sensitivity"), col("min_data_points"), col("window"),
          col("std_window"), col("is_active"), col("deleted"),
          col("updated_at")),
        col("updated_at")).as("v"))
      .select(col("table_name"), col("metric_name"), col("v.*"))
      .filter(!col("deleted")).drop("deleted", "__ck")
    if (activeOnly) latest.filter(col("is_active")) else latest
  }

  /** Active configs as the typed model (driver-small by design — the
   *  reference caps detection input per config at 1000 points and runs
   *  ≤ hundreds of configs per org). */
  def activeConfigs(): Seq[AnomalyConfig] =
    configs(activeOnly = true)
      .orderBy("table_name", "metric_name", "column_name")
      .collect().toSeq.map { r =>
        AnomalyConfig(
          metricName = r.getAs[String]("metric_name"),
          tableName = r.getAs[String]("table_name"),
          columnName = Option(r.getAs[String]("column_name")),
          detectionMethod = r.getAs[String]("detection_method"),
          sensitivity = r.getAs[Double]("sensitivity"),
          minDataPoints = r.getAs[Int]("min_data_points"),
          window = r.getAs[Int]("window"),
          stdWindow = r.getAs[Int]("std_window"))
      }
}
