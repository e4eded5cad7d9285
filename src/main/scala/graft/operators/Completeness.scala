package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-delivery completeness: find the calendar holes in an event
 * feed. The reference monitors table freshness and row growth
 * (backend/core/metadata/collector.py usage/freshness lanes,
 * backend/core/anomalies timeliness configs); this is the
 * finer-grained SLA question a feed owner actually asks — "which
 * hours never arrived, per series?".
 *
 * Scale shape: the observed-hour frame is `distinct(series, hour)` —
 * one shuffle whose size is calendar-bounded (series × span-hours),
 * NOT data-bounded, so it is tiny even when the raw feed is 100 TB.
 * The expected spine explodes from one per-series (min, max) row, the
 * holes fall out of a left-anti join, and consecutive holes collapse
 * into runs with the classic hour-minus-rank trick. The window
 * partitions by series over at most span-hours rows — never the raw
 * events.
 */
object Completeness {

  /** Missing-hour runs per series: (series, gap_start, gap_end,
   *  n_missing_hours), timestamps formatted `yyyy-MM-dd HH:mm:ss`.
   *  A series with full coverage emits nothing. */
  def deliveryGaps(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val observed = events
      .select(col(keyCol).as("series"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .distinct()
    val span = observed.groupBy("series")
      .agg(min("hour").as("__lo"), max("hour").as("__hi"))
    val spine = span.select(col("series"),
      explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 hour"))).as("hour"))
    val missing = spine.join(observed, Seq("series", "hour"), "left_anti")
    val w = Window.partitionBy("series").orderBy("hour")
    missing
      .withColumn("__grp",
        (unix_timestamp(col("hour")) / 3600L -
          row_number().over(w)).cast("long"))
      .groupBy("series", "__grp")
      .agg(min("hour").as("__s"), max("hour").as("__e"),
        count(lit(1)).as("n_missing_hours"))
      .select(col("series"),
        date_format(col("__s"), "yyyy-MM-dd HH:mm:ss").as("gap_start"),
        date_format(col("__e"), "yyyy-MM-dd HH:mm:ss").as("gap_end"),
        col("n_missing_hours"))
  }
}
