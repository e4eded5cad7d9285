package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType,
  TimestampType}

/**
 * Physical-encoding normalization for event timestamps.
 *
 * Real parquet corpora carry at least three encodings of "a timestamp":
 *  - TIMESTAMP(MICROS/MILLIS, adjustedToUTC=true) → Spark `TimestampType`;
 *  - TIMESTAMP(..., adjustedToUTC=false) — what Spark 3.4+, pandas and
 *    Arrow write for naive datetimes → Spark `TimestampNTZType`;
 *  - TIMESTAMP(NANOS), which Spark only reads as a nanos-since-epoch
 *    long under `spark.sql.legacy.parquet.nanosAsLong`.
 *
 * Every event-time operator in this engine (sessionize, range/interval
 * join, change analytics, streaming watermarks) does its arithmetic on
 * integer epoch micros and its windowing on `TimestampType`, so they all
 * normalize through here instead of assuming one encoding at the scan.
 * With a UTC session zone the NTZ→LTZ cast is value-identical, matching
 * the reference's naive-datetime semantics (SQLAlchemy returns naive
 * datetimes; core/anomalies/algorithms.py never touches a timezone).
 */
object TsNorm {

  /** Normalize the named columns to `TimestampType`. Columns already
   *  LTZ (or absent from the frame) pass through untouched, so calling
   *  this at every operator entry is free for already-normal input —
   *  it's a plan-time rewrite, never a data scan. */
  def normalizeTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, name) =>
      if (!d.columns.contains(name)) d
      else d.schema(name).dataType match {
        case LongType =>
          // epoch-integer column: dispatch on magnitude instead of
          // assuming one unit — seconds (~1e9 for 2001-2100), millis
          // (~1e12), micros (~1e15), nanos (~1e18) are separated by
          // ~250× so the per-value bands are unambiguous for any
          // timestamp between 1973 and 5138. Integral `div` (a double
          // divide would lose precision above 2^53) truncates toward
          // the micro grid, matching DuckDB's ns→us cast. Bands use
          // sign-aware comparisons, not abs(): under ANSI mode
          // abs(Long.MinValue) raises ARITHMETIC_OVERFLOW, so one
          // pathological sentinel value would fail the whole query.
          // (Note: epoch-MILLIS values before ~1973-03 fall under 1e11
          // and land in the seconds band — pre-1973 millis data must be
          // normalized upstream; see the magnitude table above.)
          d.withColumn(name, expr(
            s"""CASE
               |  WHEN `$name` < ${100000000000L}
               |       AND `$name` > ${-100000000000L} THEN
               |    timestamp_seconds(`$name`)
               |  WHEN `$name` < ${100000000000000L}
               |       AND `$name` > ${-100000000000000L} THEN
               |    timestamp_millis(`$name`)
               |  WHEN `$name` < ${100000000000000000L}
               |       AND `$name` > ${-100000000000000000L} THEN
               |    timestamp_micros(`$name`)
               |  ELSE timestamp_micros(`$name` div 1000)
               |END""".stripMargin))
        case TimestampNTZType =>
          d.withColumn(name, col(name).cast(TimestampType))
        case StringType =>
          // ISO-8601 text timestamps (some exporters write these);
          // cast parses in the session zone — UTC here
          d.withColumn(name, col(name).cast(TimestampType))
        case _ => d
      }
    }
}
