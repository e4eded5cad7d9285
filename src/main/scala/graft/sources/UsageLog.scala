package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * S9 (usage half): table usage patterns from a query log — the
 * Spark-native analog of the reference's Snowflake
 * `INFORMATION_SCHEMA.QUERY_HISTORY()` scan
 * (core/metadata/collector.py:281-320: `access_count` = SELECT queries
 * whose text mentions the table, `last_accessed` = their max start
 * time). Spark has no warehouse query history, so the log is a table
 * the engine maintains itself: [[QueryLogStore]] appends one row per
 * executed query, and [[UsageLog.usagePatterns]] aggregates it.
 */
object UsageLog {

  /**
   * Usage patterns for MANY tables in one pass over the log: the log is
   * scanned once and matched against the (broadcast, driver-small)
   * table list, instead of the reference's one QUERY_HISTORY scan per
   * table. Output is densified — a table never mentioned still gets a
   * row with `access_count` 0 and null `last_accessed`.
   *
   * Matching mirrors the reference: `query_type = 'SELECT'` and the
   * lowercased query text contains the lowercased table name.
   */
  def usagePatterns(
      queryLog: DataFrame,
      tables: Seq[String],
      queryTextCol: String = "query_text",
      queryTypeCol: String = "query_type",
      tsCol: String = "start_time"): DataFrame = {
    val spark = queryLog.sparkSession
    import spark.implicits._
    val tabs = tables.toDF("table_name")
    val selects = queryLog
      .filter(col(queryTypeCol) === "SELECT")
      .select(lower(col(queryTextCol)).as("__txt"), col(tsCol).as("__ts"))
    // STREAM the (unbounded) log, BROADCAST the (driver-small) table
    // list: the non-equi contains() join can only be a nested-loop join,
    // and only a broadcast of the table side keeps it parallel — the
    // inverted form (broadcast hint on the left of a left join) is
    // unusable for BNLJ build and made Spark broadcast the whole log.
    val matched = selects
      .join(broadcast(tabs), contains(col("__txt"), lower(col("table_name"))))
      .groupBy("table_name")
      .agg(
        count(col("__ts")).as("access_count"),
        max(col("__ts")).as("last_accessed"))
    // densify: tables never mentioned still get a row (0, null) — a
    // tiny post-aggregation join (|tables| rows on both sides)
    tabs.join(matched, Seq("table_name"), "left")
      .select(col("table_name"),
        coalesce(col("access_count"), lit(0L)).as("access_count"),
        col("last_accessed"))
  }

  /** Single-table convenience matching the reference's return shape. */
  def usagePattern(
      queryLog: DataFrame,
      table: String,
      queryTextCol: String = "query_text",
      queryTypeCol: String = "query_type",
      tsCol: String = "start_time"): DataFrame =
    usagePatterns(queryLog, Seq(table), queryTextCol, queryTypeCol, tsCol)
}

/** Append-only query log, partitioned by date — the engine-side stand-in
 *  for warehouse QUERY_HISTORY. One row per executed query. */
final class QueryLogStore(spark: SparkSession, path: String) {

  def append(
      queryText: String,
      queryType: String,
      startTime: java.sql.Timestamp): Unit = {
    import spark.implicits._
    val row = Seq((queryText, queryType, startTime))
      .toDF("query_text", "query_type", "start_time")
      .withColumn("date", to_date(col("start_time")))
    graft.history.StoreIO.appendLocked(path) {
      row.write.mode(SaveMode.Append).partitionBy("date").parquet(path)
    }
  }

  /** The log as a DataFrame; an empty (schema-correct) frame before the
   *  first append, so usage queries work on a fresh install. */
  def log: DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.parquet(path)
    else {
      import spark.implicits._
      Seq.empty[(String, String, java.sql.Timestamp)]
        .toDF("query_text", "query_type", "start_time")
    }
  }
}
