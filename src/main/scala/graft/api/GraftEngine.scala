package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.anomalies.{Anomalies, Metrics}
import graft.history.{AnomaliesStore, ChangesStore, MetricsStore, ProfileStore, Trends, ValidationStore}
import graft.profiler.Profiler
import graft.schemadiff.SchemaDiff
import graft.sources.Catalog
import graft.types.{SchemaChange, TableMeta, TableProfile, ValidationResult}
import graft.validations.{DefaultValidations, Runner}

/**
 * Top-level facade (SURVEY.md §2.8, §3): the library-call equivalents of
 * the reference's API routes, wired to the history stores so every run
 * feeds the trend/anomaly layers — a user of the reference switches by
 * pointing this at a directory of tables.
 *
 *   GET /api/profile            → engine.profileTable
 *   POST /api/run-validations   → engine.runValidations
 *   schema detection task       → engine.detectSchemaChanges
 *   anomaly scan                → engine.runAnomalyScan
 *   trends endpoints            → engine.metricTrends / validationTrends
 */
final class GraftEngine(
    val spark: SparkSession,
    dataDir: String,
    stateDir: String,
    connectionId: String = "default") {

  val catalog: Catalog = Catalog(spark, dataDir)
  val profiles = new ProfileStore(spark, s"$stateDir/profiles")
  val validations = new ValidationStore(spark, s"$stateDir/validation_results")
  val changes = new ChangesStore(spark, s"$stateDir/schema_changes")
  val metrics = new MetricsStore(spark, s"$stateDir/metrics")
  val anomalies = new AnomaliesStore(spark, s"$stateDir/anomaly_results")

  @volatile private var baselineSnapshot: Option[Map[String, TableMeta]] = None

  /** §3.1: profile one table, persist to history, feed the metrics
   *  store (row_count + per-column null %). */
  def profileTable(
      table: String,
      now: Timestamp,
      exact: Boolean = false): TableProfile = {
    val p = Profiler.profile(catalog.table(table), table,
      Some(catalog.tableMeta(table)), exact = exact, now = now)
    profiles.append(p, now)
    import spark.implicits._
    val points = (s"row_count", null: String, p.rowCount.toDouble) +:
      p.columns.map(c => ("null_percentage", c.name, c.nullPercentage))
    metrics.append(points
      .map { case (m, c, v) => (connectionId, table, c, m, v, now) }
      .toDF("connection_id", "table_name", "column_name", "metric_name",
        "metric_value", "ts"))
    p
  }

  /** §3.2: generate (or accept) rules, run them in parallel, persist
   *  results + failure events. */
  def runValidations(
      table: String,
      now: Timestamp,
      extraRules: Seq[graft.types.ValidationRule] = Nil): Seq[ValidationResult] = {
    catalog.registerAll()
    val meta = catalog.tableMeta(table)
    val generated = DefaultValidations.generate(table,
      catalog.schemaOf(table), meta.primaryKeys, meta.foreignKeys.map(_.column))
    val rules = generated ++ Runner.dedupNew(extraRules,
      generated.map(_.name).toSet)
    val results = Runner.runAll(spark, rules)
    validations.append(table, results, now)
    results
  }

  /** §3.3 / C1–C8: snapshot, diff vs baseline, persist, advance the
   *  baseline. First run bootstraps and reports no changes. */
  def detectSchemaChanges(now: Timestamp): Seq[SchemaChange] = {
    val current = catalog.snapshot()
    val found = SchemaDiff.detect(current, baselineSnapshot)
    baselineSnapshot = Some(current)
    changes.append(found, now)
    found
  }

  /** A7/A8: extract a metric series from the store and run the
   *  configured detector over it (all series in one job). When `persist`
   *  is set, detected anomalies are appended to the anomalies store —
   *  the reference persists results + publishes events per scan
   *  (core/anomalies/scheduler.py:316-336); here the stored rows ARE the
   *  event feed (`anomalies.list` reads them back). */
  def runAnomalyScan(
      metricName: String,
      method: String = "zscore",
      sensitivity: Double = 1.0,
      window: Option[Int] = None,
      now: Option[Timestamp] = None,
      historyDays: Int = 30,
      persist: Boolean = false): DataFrame = {
    val series = metrics.query(connectionId, metricName = Some(metricName),
      days = Some(historyDays), now = now)
      .withColumn("__col", coalesce(col("column_name"), lit("")))
    val detected = Anomalies.detect(series,
      seriesCols = Seq("table_name", "__col", "metric_name"),
      tsCol = "ts", valueCol = "metric_value",
      method = method, sensitivity = sensitivity, window = window)
      .drop("column_name") // the nullable original; __col is its key form
      .withColumnRenamed("__col", "column_name")
    if (persist)
      anomalies.append(
        detected.filter(col("is_anomaly")),
        now.getOrElse(new Timestamp(System.currentTimeMillis())))
    detected
  }

  /** T2-style per-(column, metric) trend stats for one table. */
  def metricTrends(table: String): DataFrame =
    Trends.metricTrends(
      metrics.query(connectionId, tableName = Some(table))
        .withColumn("column_name", coalesce(col("column_name"), lit("table"))))

  /** T3/T4: daily validation trend + current health for one table. */
  def validationTrends(
      table: String,
      totalRules: Int,
      startDate: String,
      endDate: String): DataFrame =
    Trends.validationDailyTrends(
      validations.results(table)
        .select(col("rule_name").as("rule_id"),
          when(col("error").isNotNull, lit(null).cast("boolean"))
            .otherwise(col("is_valid")).as("is_valid"),
          col("run_at")),
      totalRules, startDate, endDate)

  // ---- training-data pipeline surface (COVERAGE.md "beyond the
  // reference") — the same operators, reachable from the facade ------

  /** End-to-end dedup of a document table: exact + near-dup clusters →
   *  one canonical survivor each (Dedup.dedupCorpus). */
  def dedupTable(
      table: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      jaccardThreshold: Double = 0.9): DataFrame =
    graft.pipeline.Dedup.dedupCorpus(catalog.table(table),
      idCol, textCol, jaccardThreshold)

  /** Corpus vocabulary (token total + doc frequency, top-N). */
  def vocabulary(table: String, top: Int = 1000): DataFrame =
    graft.pipeline.TextAnalysis.vocabulary(catalog.table(table), top = top)

  /** Deterministic train/val/test split of a table (stable md5 buckets). */
  def splitTable(
      table: String,
      idCol: String = "doc_id",
      trainFraction: Double = 0.8,
      valFraction: Double = 0.1): DataFrame =
    graft.pipeline.Sampling.hashSplit(catalog.table(table), idCol,
      trainFraction, valFraction)

  /** S9 usage half: engine-maintained query log + per-table usage
   *  patterns (QUERY_HISTORY analog). */
  val queryLog = new graft.sources.QueryLogStore(spark, s"$stateDir/query_log")

  def usagePatterns(tables: Seq[String] = catalog.listTables()): DataFrame =
    graft.sources.UsageLog.usagePatterns(queryLog.log, tables)
}
