package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.anomalies.{Anomalies, AnomalyConfigStore, Metrics}
import graft.history.{AnomaliesStore, ChangesStore, MetricsStore, ProfileStore, Trends, ValidationStore}
import graft.notifications.{EventStore, Notifications}
import graft.notifications.Notifications.{EventSink, GraftEvent, LogSink, NotificationPublisher, NotificationSettings}
import graft.profiler.Profiler
import graft.schemadiff.SchemaDiff
import graft.sources.Catalog
import graft.types.{AnomalyConfig, SchemaChange, TableMeta, TableProfile, ValidationResult}
import graft.validations.{DefaultValidations, RuleStore, Runner}

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
    connectionId: String = "default",
    notificationSettings: NotificationSettings = NotificationSettings(),
    extraSinks: Seq[EventSink] = Nil) {

  val catalog: Catalog = Catalog(spark, dataDir)
  val profiles = new ProfileStore(spark, s"$stateDir/profiles")
  val validations = new ValidationStore(spark, s"$stateDir/validation_results")
  val changes = new ChangesStore(spark, s"$stateDir/schema_changes")
  val metrics = new MetricsStore(spark, s"$stateDir/metrics")
  val anomalies = new AnomaliesStore(spark, s"$stateDir/anomaly_results")
  /** Persisted rule suite (supabase_validation_manager.py:130-171,406). */
  val ruleStore = new RuleStore(spark, s"$stateDir/validation_rules")
  /** Persisted anomaly configs (core/anomalies/api.py:24-174). */
  val anomalyConfigs = new AnomalyConfigStore(spark, s"$stateDir/anomaly_configs")
  /** Durable event feed + notification fan-out (publisher.py:24-49). */
  val events = new EventStore(spark, s"$stateDir/events")
  val notifier = new NotificationPublisher(events, notificationSettings,
    new LogSink +: extraSinks)

  @volatile private var baselineSnapshot: Option[Map[String, TableMeta]] = None

  /** §3.1: profile one table, persist to history, feed the metrics
   *  store (row_count + per-column null %). `maxColumns` is the tier
   *  depth knob (P26): lower tiers stat only the first N columns. */
  def profileTable(
      table: String,
      now: Timestamp,
      exact: Boolean = false,
      maxColumns: Int = Int.MaxValue): TableProfile = {
    val p = Profiler.profile(catalog.table(table), table,
      Some(catalog.tableMeta(table)), exact = exact, now = now,
      maxColumns = maxColumns)
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

  /** Incremental profiling through the persisted slice-state store —
   *  the scale replacement for re-running [[profileTable]] over the
   *  whole table each poll: record each arriving slice ONCE (battery +
   *  optional quantile / top-K lanes), then answer any slice range
   *  from the tiny persisted states. One store per table under
   *  stateDir/slice_states/<table>. */
  def sliceStates(table: String): graft.profiler.SliceStateStore =
    new graft.profiler.SliceStateStore(spark,
      s"$stateDir/slice_states/$table")

  /** Profile one slice of a table (rows matching `predicate`) into the
   *  table's slice-state store. */
  def recordProfileSlice(
      table: String,
      sliceId: String,
      predicate: org.apache.spark.sql.Column,
      quantileCols: Seq[String] = Nil,
      topKCol: Option[String] = None,
      k: Int = 100): Unit =
    sliceStates(table).record(catalog.table(table).filter(predicate),
      sliceId, quantileCols = quantileCols, topKCol = topKCol, k = k)

  /** Merged per-column profile over recorded slices (all if empty) —
   *  metadata-only, no table rescan. */
  def profileRange(table: String, slices: Seq[String] = Nil): DataFrame =
    sliceStates(table).profile(slices)

  /** §3.2: generate (or accept) rules, run them in parallel, persist
   *  results + failure events; failures publish one
   *  `validation_failures_detected` event (events.py:196-242). */
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
    runAndRecord(table, rules, now)
  }

  /** Seed the persisted rule suite with the table's generated defaults,
   *  skipping names already stored (add_default_validations dedup,
   *  default_validations.py:460-476). Returns the newly added rules. */
  def seedDefaultRules(table: String, now: Timestamp): Seq[graft.types.ValidationRule] = {
    val meta = catalog.tableMeta(table)
    val generated = DefaultValidations.generate(table,
      catalog.schemaOf(table), meta.primaryKeys, meta.foreignKeys.map(_.column))
    val fresh = Runner.dedupNew(generated, ruleStore.ruleNames(table))
    fresh.foreach(r => ruleStore.addRule(table, r, now))
    fresh
  }

  /** Run the PERSISTED active rule suite — the curated-suite path the
   *  reference serves from `validation_rules`
   *  (supabase_validation_manager.py:263-330). */
  def runStoredValidations(table: String, now: Timestamp): Seq[ValidationResult] = {
    catalog.registerAll()
    runAndRecord(table, ruleStore.activeRules(table), now)
  }

  private def runAndRecord(
      table: String,
      rules: Seq[graft.types.ValidationRule],
      now: Timestamp): Seq[ValidationResult] = {
    val results = Runner.runAll(spark, rules)
    validations.append(table, results, now)
    val failures = results.count(r => !r.isValid || r.error.isDefined)
    if (failures > 0)
      notifier.publish(GraftEvent("automation", "validation_failures_detected",
        connectionId, Some(table),
        Map("failed_count" -> failures.toString,
          "total_rules" -> rules.size.toString), now))
    results
  }

  /** §3.3 / C1–C8: snapshot, diff vs baseline, persist, advance the
   *  baseline. First run bootstraps and reports no changes; important
   *  changes publish one `schema_changes_detected` event. */
  def detectSchemaChanges(now: Timestamp): Seq[SchemaChange] = {
    val current = catalog.snapshot()
    val found = SchemaDiff.detect(current, baselineSnapshot)
    baselineSnapshot = Some(current)
    changes.append(found, now)
    val important = found.count(_.important)
    if (important > 0)
      notifier.publish(GraftEvent("automation", "schema_changes_detected",
        connectionId, None,
        Map("changes_detected" -> found.size.toString,
          "important_count" -> important.toString), now))
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
    // persisting writes run_at rows — the injected-now discipline
    // (SURVEY §7.4) forbids a wall-clock fallback on any stored value
    require(!persist || now.isDefined,
      "runAnomalyScan(persist = true) requires an injected `now`")
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
      persistAndNotify(detected.withColumn("method", lit(method)),
        metricName, now.get)
    detected
  }

  /** A7 (batch half): detect over EVERY stored active config in one
   *  job (reference: scheduler.py:211-341 runs each config per
   *  connection; here configs sharing detector parameters share one
   *  window pass, and all branches union into a single action). The
   *  metrics store is scanned once; each parameter group semi-joins its
   *  (table, column, metric) identities against the broadcast config
   *  list, so series selection is map-side. */
  def runAnomalyScanAll(
      now: Timestamp,
      historyDays: Int = 30,
      persist: Boolean = false): DataFrame = {
    import spark.implicits._
    val cfgs = anomalyConfigs.activeConfigs()
    val base = metrics.query(connectionId, days = Some(historyDays),
      now = Some(now))
      .withColumn("__col", coalesce(col("column_name"), lit("")))
    val branches = cfgs
      .groupBy(c => (c.detectionMethod, c.sensitivity, c.window, c.stdWindow,
        c.minDataPoints))
      .toSeq.sortBy(_._1.toString)
      .map { case ((method, sens, win, stdWin, minPts), group) =>
        val keys = broadcast(group
          .map(c => (c.tableName, c.columnName.getOrElse(""), c.metricName))
          .toDF("table_name", "__col", "metric_name"))
        val series = base.join(keys, Seq("table_name", "__col", "metric_name"),
          "left_semi")
        // normalize branch schemas (moving_average emits an extra
        // moving_avg column) and stamp the method so mixed-method
        // results union + persist with their provenance
        Anomalies.detect(series,
          seriesCols = Seq("table_name", "__col", "metric_name"),
          tsCol = "ts", valueCol = "metric_value",
          method = method, sensitivity = sens,
          // zscore/iqr/mad stored configs detect over the full history
          // slice (the reference bounds input by days, not points —
          // parity; mad follows them because AnomalyConfig.window always
          // carries its default, so forwarding it would silently flip
          // every stored mad config from global to rolling, and a series
          // with exactly minDataPoints points would then emit nothing).
          // The window drives the INHERENTLY windowed detectors only.
          window = if (method == "moving_average" || method == "ewma")
            Some(win) else None,
          stdWindow = if (method == "moving_average") Some(stdWin) else None,
          minDataPoints = minPts)
          .select(col("table_name"), col("__col"), col("metric_name"),
            col("ts"), col("metric_value"), col("score"), col("is_anomaly"),
            col("threshold"), col("severity"))
          .withColumn("method", lit(method))
      }
    val detected = branches match {
      case Nil => // schema-correct empty result for a fresh install
        Anomalies.detect(base.limit(0),
          Seq("table_name", "__col", "metric_name"), "ts", "metric_value")
          .select(col("table_name"), col("__col"), col("metric_name"),
            col("ts"), col("metric_value"), col("score"), col("is_anomaly"),
            col("threshold"), col("severity"))
          .withColumn("method", lit("zscore"))
      case head +: tail => tail.foldLeft(head)(_ unionByName _)
    }
    val out = detected.withColumnRenamed("__col", "column_name")
    if (persist) persistAndNotify(out, "all_configs", now)
    out
  }

  /** Persist detected anomalies + publish one `anomaly_detected` event
   *  with per-severity counts (publisher.py:69-90 gating contract).
   *  The persisted rows are normalized to ONE canonical column set —
   *  the single-metric and batch scans carry different extras
   *  (connection_id/date vs method), and mixing schemas in one parquet
   *  store makes reads depend on which file's footer wins.
   *
   *  Re-alert suppression (core/anomalies/api.py:223's status filter):
   *  series a user marked 'expected' still persist their re-detections
   *  (the history stays complete) but are excluded from the notification
   *  counts — a fully-expected scan publishes nothing. The expected set
   *  is driver-bounded (distinct configured series), so the anti-join
   *  broadcasts. */
  private def persistAndNotify(
      detected: DataFrame, metricName: String, now: Timestamp): Unit = {
    val present = detected.columns.toSet
    val hits = detected.filter(col("is_anomaly"))
      .select(
        (if (present("connection_id")) col("connection_id")
         else lit(connectionId)).as("connection_id"),
        col("table_name"), col("column_name"), col("metric_name"),
        col("ts"), col("metric_value"), col("score"), col("is_anomaly"),
        col("threshold"), col("severity"),
        (if (present("method")) col("method") else lit("unknown"))
          .as("method"))
    // snapshot the expected set BEFORE the append (file listing is fixed
    // when the read resolves, so this never sees the rows being written)
    val expected =
      if (anomalies.exists) Some(anomalies.expectedSeries()) else None
    anomalies.append(hits, now)
    val alertable = expected.fold(hits)(e =>
      hits.join(broadcast(e),
        Seq("table_name", "column_name", "metric_name"), "left_anti"))
    // tiny driver-side pull: 3 longs, the alert payload (detection input
    // is bounded — the reference caps it at 1000 points per config)
    val counts = alertable.groupBy("severity").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    if (total > 0)
      notifier.publish(GraftEvent("anomaly", "anomaly_detected",
        connectionId, None,
        Map(
          "metric_name" -> metricName,
          "anomaly_count" -> total.toString,
          "high_severity_count" -> counts.getOrElse("high", 0L).toString,
          "medium_severity_count" -> counts.getOrElse("medium", 0L).toString,
          "low_severity_count" -> counts.getOrElse("low", 0L).toString), now))
  }

  /** Anomaly triage surface (api.py:275-332): update one anomaly's
   *  status; 'resolved' stamps resolved_at/by. Publishes the matching
   *  triage event like the reference — but only when the id actually
   *  matched a row (the reference 404s on an unknown id; recording a
   *  triage event for an update that never happened would corrupt the
   *  feed). Returns whether the anomaly existed. */
  def updateAnomalyStatus(
      anomalyId: String,
      status: String,
      now: Timestamp,
      resolutionNote: Option[String] = None,
      userId: Option[String] = None): Boolean = {
    val matched =
      anomalies.updateStatus(anomalyId, status, now, resolutionNote, userId)
    if (matched > 0L) {
      val eventName = status match {
        case "resolved" => "anomaly_resolved"
        case "expected" => "anomaly_marked_expected"
        case "open"     => "anomaly_reopened"
        case _          => "anomaly_acknowledged"
      }
      notifier.publish(GraftEvent("anomaly", eventName, connectionId, None,
        Map("anomaly_id" -> anomalyId, "status" -> status) ++
          userId.map("user_id" -> _), now))
    }
    matched > 0L
  }

  /** get_dashboard_data (api.py:508-567): summary + recent open
   *  anomalies + densified daily trends + active-config count, one call. */
  def anomalyDashboard(
      now: Timestamp,
      days: Int = 30): GraftEngine.AnomalyDashboard =
    // fresh installs need no special-casing: an unwritten store reads
    // as a schema-correct empty frame, so summary is one all-zero row,
    // trends a zero-filled spine, and the listing empty — identical
    // schemas either way
    GraftEngine.AnomalyDashboard(
      summary = anomalies.summary(now, days),
      recentAnomalies = anomalies.list(status = Some("open"),
        days = Some(days), now = Some(now), limit = Some(10)),
      trends = anomalies.trends(now, days),
      activeConfigs = anomalyConfigs.activeConfigs().size)

  /** The read routes a dashboard page batches in one call (reference:
   *  the frontend fans per-widget GETs through /api/batch,
   *  app.py:5853). Route names mirror the REST paths; every route is a
   *  read — side-effecting ops (profile runs, scans) stay single
   *  explicit calls. */
  def batchRoutes(
      now: Timestamp,
      days: Int = 30): Map[String, (SparkSession, String) => DataFrame] = {
    val tables = catalog.listTables()
    val perTable = tables.flatMap { t =>
      Seq[(String, (SparkSession, String) => DataFrame)](
        s"profiles/$t" -> ((_, _) => profiles.history(t)),
        s"validations/$t" -> ((_, _) => validations.results(t)),
        s"trends/$t" -> ((_, _) => metricTrends(t)),
        // table routes live under their own segment so a table named
        // "summary"/"trends" can never shadow (or be shadowed by) the
        // global aggregate routes below
        s"anomalies/table/$t" -> ((_, _) => anomalies.list(
          tableName = Some(t), days = Some(days), now = Some(now))))
    }.toMap
    perTable ++ Map[String, (SparkSession, String) => DataFrame](
      "anomalies/summary" -> ((_, _) => anomalies.summary(now, days)),
      "anomalies/trends" -> ((_, _) => anomalies.trends(now, days)),
      "changes" -> ((_, _) => changes.list()),
      "events" -> ((_, _) => events.feed()))
  }

  /** One call, many widgets: resolve `requests` against [[batchRoutes]]
   *  in the shared session with per-request isolation. */
  def batch(
      requests: Seq[BatchRunner.BatchRequest],
      now: Timestamp,
      days: Int = 30): Seq[BatchRunner.BatchResponse] =
    BatchRunner.run(spark, dataDir, requests, batchRoutes(now, days))

  /** Comprehensive collection (reference: collector.py:323-345): profile
   *  every table up to the tier's table cap, statting only the first
   *  `maxColumns` columns per table at lower depths ("low" = 5 cols,
   *  "medium" = 10, "high" = all — collector.py:152,639). Each profile
   *  persists + feeds metrics exactly like a single-table run. */
  def profileAll(
      now: Timestamp,
      maxTables: Int = 50,
      maxColumns: Int = Int.MaxValue,
      exact: Boolean = false): Map[String, TableProfile] =
    catalog.listTables().take(maxTables)
      .map(t => t -> profileTable(t, now, exact, maxColumns)).toMap

  /** Profile response with trends attached (routes/profiles.py:89-92:
   *  every profile API response carries the history trend slice) — the
   *  one-call composition the reference serves. */
  def profileTableWithTrends(
      table: String,
      now: Timestamp,
      exact: Boolean = false,
      historyLimit: Int = 30): GraftEngine.ProfileResponse = {
    val p = profileTable(table, now, exact)
    GraftEngine.ProfileResponse(
      profile = p,
      history = profiles.history(table, historyLimit),
      trends = metricTrends(table))
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

  /** Per-segment profile of a table (the x33 battery): one hash agg,
   *  one row per value of `groupCol`. */
  def profileByGroup(
      table: String,
      groupCol: String,
      now: Timestamp): DataFrame =
    Profiler.profileByGroup(catalog.table(table), groupCol, now = now)

  /** Functional-dependency probe lhs → rhs over a table (per-group
   *  consistency frame; aggregate `violates` for the rate). */
  def checkFunctionalDependency(
      table: String,
      lhs: Seq[String],
      rhs: String): DataFrame =
    Profiler.fdViolations(catalog.table(table), lhs, rhs)

  /** S9 usage half: engine-maintained query log + per-table usage
   *  patterns (QUERY_HISTORY analog). */
  val queryLog = new graft.sources.QueryLogStore(spark, s"$stateDir/query_log")

  def usagePatterns(tables: Seq[String] = catalog.listTables()): DataFrame =
    graft.sources.UsageLog.usagePatterns(queryLog.log, tables)
}

object GraftEngine {
  /** The reference's profile API response shape: the profile dict plus
   *  its `trends` slice (routes/profiles.py:89-92). `history` = T1
   *  last-N table-level runs; `trends` = T2 per-(column, metric) stats. */
  final case class ProfileResponse(
      profile: TableProfile,
      history: org.apache.spark.sql.DataFrame,
      trends: org.apache.spark.sql.DataFrame)

  /** get_dashboard_data's response shape (api.py:548-554). */
  final case class AnomalyDashboard(
      summary: org.apache.spark.sql.DataFrame,
      recentAnomalies: org.apache.spark.sql.DataFrame,
      trends: org.apache.spark.sql.DataFrame,
      activeConfigs: Long)
}
