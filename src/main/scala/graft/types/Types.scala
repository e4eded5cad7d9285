package graft.types

/**
 * Core data model of the engine — the Spark-native re-expression of the
 * reference's profile / validation / anomaly / schema-change dictionaries.
 *
 * Reference shapes (see SURVEY.md §1):
 *  - profile dict keys: backend/core/history/supabase_profile_history.py:145-153,
 *    sparvi-frontend TableProfile.js:58-70
 *  - validation rule/result: backend/routes/validations.py:228-231,
 *    backend/core/validations/supabase_validation_manager.py:273-280
 *  - anomaly config/result: backend/core/anomalies/detector.py:92-127,
 *    backend/core/anomalies/algorithms.py:267-275
 *  - schema change record: backend/core/metadata/schema_change_detector.py:196-327
 */

/** Column-level metadata (reference: collector.py:80-93). */
final case class ColumnMeta(
    name: String,
    dataType: String,
    nullable: Boolean)

/** Table-level metadata sidecar — Spark has no PK/FK catalog, so primary
 *  keys / foreign keys are carried alongside the schema
 *  (reference: schema_change_detector.py:84-126). */
final case class TableMeta(
    table: String,
    columns: Seq[ColumnMeta],
    primaryKeys: Seq[String] = Nil,
    foreignKeys: Seq[ForeignKey] = Nil,
    indexes: Seq[String] = Nil) {
  def columnCount: Int = columns.size
}

final case class ForeignKey(
    column: String,
    refTable: String,
    refColumn: String)

/** Per-column slice of a profile (SURVEY.md §1.3). All stats optional —
 *  only the ones applicable to the column's type bucket are filled. */
final case class ColumnProfile(
    name: String,
    dataType: String,
    typeBucket: String, // numeric | string | datetime | boolean | other
    nullCount: Long,
    nullPercentage: Double,
    distinctCount: Option[Long] = None,
    distinctPercentage: Option[Double] = None,
    isUnique: Option[Boolean] = None,
    // numeric
    min: Option[Double] = None,
    max: Option[Double] = None,
    mean: Option[Double] = None,
    sum: Option[Double] = None,
    stddev: Option[Double] = None,
    median: Option[Double] = None,
    zeroCount: Option[Long] = None,
    negativeCount: Option[Long] = None,
    positiveCount: Option[Long] = None,
    // string
    minLength: Option[Long] = None,
    maxLength: Option[Long] = None,
    avgLength: Option[Double] = None,
    emptyCount: Option[Long] = None,
    // datetime
    minDate: Option[String] = None,
    maxDate: Option[String] = None,
    futureCount: Option[Long] = None,
    pastCount: Option[Long] = None,
    freshnessHours: Option[Long] = None, // P19: hours since max(ts) vs injected now

    // top-K frequent values (P14)
    topValues: Seq[TopValue] = Nil,
    // P28 / §1.3 `distribution_data`: equal-width histogram for numeric
    // columns (frontend consumer: TableColumns.js:109)
    distribution: Seq[HistBucket] = Nil)

final case class TopValue(value: String, count: Long, percentage: Double)

/** One equal-width histogram bucket: [lo, hi) except the last, which is
 *  [lo, hi]. */
final case class HistBucket(lo: Double, hi: Double, count: Long)

/** The canonical profile object (SURVEY.md §1.3 key-for-key). */
final case class TableProfile(
    table: String,
    timestamp: String,
    rowCount: Long,
    columnCount: Int,
    duplicateCount: Long,
    columns: Seq[ColumnProfile],
    typeDistribution: Map[String, Int], // P25: numeric/text/datetime/boolean/other
    healthScore: Int, // P24
    // `include_samples` (routes/profiles.py:30-31,76): ≤50 preview rows as
    // column-name → string-value maps; empty unless explicitly requested
    samples: Seq[Map[String, String]] = Nil)

/** Validation rule (reference: default_validations.py:43-49). `query` must
 *  return a single scalar. */
final case class ValidationRule(
    name: String,
    description: String,
    query: String,
    operator: String, // equals | greater_than | less_than | between
    expectedValue: Any)

/** Validation result (reference: supabase_validation_manager.py:273-280). */
final case class ValidationResult(
    ruleName: String,
    isValid: Boolean,
    actualValue: Option[Any],
    expectedValue: Any,
    operator: String,
    error: Option[String] = None)

/** One point of a metric time series (reference:
 *  core/analytics/historical_metrics.py:72-88). The long/narrow metrics
 *  store is the natural Spark representation of all history. */
final case class MetricPoint(
    connectionId: String,
    tableName: String,
    columnName: Option[String],
    metricName: String,
    metricValue: Double,
    timestamp: java.sql.Timestamp)

/** Anomaly-detector configuration (reference: detector.py:92-127). */
final case class AnomalyConfig(
    metricName: String,
    tableName: String,
    columnName: Option[String] = None,
    detectionMethod: String = "zscore", // zscore | iqr | moving_average | mad | ewma
    sensitivity: Double = 1.0,
    minDataPoints: Int = 7,
    window: Int = 7,
    stdWindow: Int = 5)

/** Anomaly result row (reference: algorithms.py:267-275). */
final case class AnomalyResult(
    timestamp: java.sql.Timestamp,
    value: Double,
    score: Double,
    isAnomaly: Boolean,
    threshold: Double,
    method: String,
    severity: String)

/** Schema change record (reference: schema_change_detector.py:196-327). */
final case class SchemaChange(
    changeType: String, // table_added | table_removed | column_added | ...
    table: String,
    column: Option[String],
    details: Map[String, String],
    important: Boolean)
