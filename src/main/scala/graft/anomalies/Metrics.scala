package graft.anomalies

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/**
 * A8: metric extraction (core/anomalies/metrics.py:14-212) — compute the
 * metric values the detectors consume and emit them in the long/narrow
 * metrics-store shape (table_name, column_name, metric_name,
 * metric_value, ts).
 *
 * All requested metrics for one table are folded into ONE single-pass
 * aggregate (the reference issues one SELECT per metric); the result is
 * a handful of scalars melted driver-side — no extra scans, no shuffle.
 */
object Metrics {

  sealed trait MetricSpec { def column: Option[String] }
  final case class RowCount() extends MetricSpec { val column = None }
  final case class NullPercentage(col: String) extends MetricSpec {
    val column = Some(col)
  }
  final case class DistinctCount(col: String) extends MetricSpec {
    val column = Some(col)
  }
  final case class DistinctPercentage(col: String) extends MetricSpec {
    val column = Some(col)
  }
  final case class HoursSinceUpdate(tsCol: String) extends MetricSpec {
    val column = Some(tsCol)
  }
  final case class Stats(col: String) extends MetricSpec { // min/max/avg/median/stddev
    val column = Some(col)
  }

  /** Extract all requested metrics in one aggregate pass. */
  def extract(
      df: DataFrame,
      tableName: String,
      specs: Seq[MetricSpec],
      now: java.sql.Timestamp): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val exprs = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column]()
    exprs += count(lit(1)).as("__rows")
    specs.foreach {
      case RowCount() => ()
      case NullPercentage(c) =>
        exprs += count(col(c)).as(s"__nonnull_$c")
      case DistinctCount(c) =>
        exprs += countDistinct(col(c)).as(s"__distinct_$c")
        exprs += count(col(c)).as(s"__nonnull_$c")
      case DistinctPercentage(c) =>
        exprs += countDistinct(col(c)).as(s"__distinct_$c")
        exprs += count(col(c)).as(s"__nonnull_$c")
      case HoursSinceUpdate(c) =>
        exprs += max(col(c)).cast(TimestampType).cast(LongType).as(s"__maxts_$c")
      case Stats(c) =>
        exprs += min(col(c)).cast(DoubleType).as(s"__min_$c")
        exprs += max(col(c)).cast(DoubleType).as(s"__max_$c")
        exprs += avg(col(c)).as(s"__avg_$c")
        exprs += expr(s"percentile(`$c`, 0.5)").as(s"__median_$c")
        exprs += stddev_samp(col(c).cast(DoubleType)).as(s"__stddev_$c")
    }
    // distinct exprs may repeat for DistinctCount+DistinctPercentage on
    // the same column — dedupe by alias
    val seen = scala.collection.mutable.Set[String]()
    val unique = exprs.filter { e =>
      val name = e.toString
      seen.add(name)
    }
    val uniqueSeq = unique.toSeq
    val row: Row = df.agg(uniqueSeq.head, uniqueSeq.tail: _*).first()
    def d(name: String): Double = row.get(row.fieldIndex(name)) match {
      case null => Double.NaN
      case x: Double => x
      case x: Long => x.toDouble
      case x: Int => x.toDouble
      case x: java.math.BigDecimal => x.doubleValue
      case x => x.toString.toDouble
    }
    val rows = row.getLong(row.fieldIndex("__rows"))
    val out = specs.flatMap {
      case RowCount() =>
        Seq((tableName, null: String, "row_count", rows.toDouble))
      case NullPercentage(c) =>
        val pct = if (rows == 0) 0.0
          else (rows - d(s"__nonnull_$c")) * 100.0 / rows
        Seq((tableName, c, "null_percentage", pct))
      case DistinctCount(c) =>
        Seq((tableName, c, "distinct_count", d(s"__distinct_$c")))
      case DistinctPercentage(c) =>
        val nn = d(s"__nonnull_$c")
        val pct = if (nn == 0) 0.0 else d(s"__distinct_$c") * 100.0 / nn
        Seq((tableName, c, "distinct_percentage", pct))
      case HoursSinceUpdate(c) =>
        val hours = math.floor(
          (now.getTime / 1000 - d(s"__maxts_$c")) / 3600.0)
        Seq((tableName, c, "hours_since_update", hours))
      case Stats(c) => Seq(
        (tableName, c, "min_value", d(s"__min_$c")),
        (tableName, c, "max_value", d(s"__max_$c")),
        (tableName, c, "avg_value", d(s"__avg_$c")),
        (tableName, c, "median", d(s"__median_$c")),
        (tableName, c, "std_dev", d(s"__stddev_$c")))
    }
    out.toDF("table_name", "column_name", "metric_name", "metric_value")
      .withColumn("ts", lit(now))
  }
}
