package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: a new session starts when the time since the
 * key's previous event exceeds `gapSeconds` — the standard event-log →
 * sessions rollup (the batch analog of Spark's streaming session
 * windows).
 *
 * Scale shape: ONE shuffle on the key (the window partition), then the
 * session aggregation groups (key, session_idx) — a prefix of the same
 * partitioning, so it needs no second exchange and gets map-side partial
 * aggregation. Gap arithmetic runs on integer epoch micros (exact,
 * engine-portable). Keys with equal-timestamp ties are safe: a 0 gap
 * can never open a session, so ordering among ties doesn't change any
 * session boundary or aggregate.
 */
object Sessionize {

  /** Per-event session assignment: adds `session_idx` (1-based per key). */
  def assignSessions(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      gapSeconds: Long = 1800L): DataFrame = {
    // accept any physical ts encoding (LTZ / NTZ / nanos-long)
    val eventsN = TsNorm.normalizeTs(events, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val opens = when(
      prevUs.isNull || us - prevUs > gapSeconds * 1000000L, 1L).otherwise(0L)
    eventsN.withColumn("session_idx",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Session rollup: one row per (key, session) with bounds and volume.
   *  `valueCol` (if non-empty) is summed with the decimal-exact recipe. */
  def sessionize(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      gapSeconds: Long = 1800L,
      valueCol: String = ""): DataFrame = {
    val assigned = assignSessions(events, keyCol, tsCol, gapSeconds)
    val base = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"))
    val aggs =
      if (valueCol.isEmpty) base
      else base :+ sum(col(valueCol).cast("decimal(28,6)")).cast("double")
        .as("value_sum")
    assigned
      .groupBy(col(keyCol), col("session_idx"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
