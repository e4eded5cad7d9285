package graft.anomalies

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SLO error-budget burn rate with multiwindow alerting (the SRE
 * workbook pattern): the error ratio over a short and a long trailing
 * window, each divided by the error budget (1 − SLO); an alert pages
 * only when BOTH windows burn hot — the short window gives speed, the
 * long window suppresses blips.
 *
 * Exactness: ratios and burn rates quantize to ppm from integer
 * hourly counts, and the ALERT DECISION never touches a float — it is
 * the integer cross-multiplied form of
 * `err/total ≥ threshold·budget` with threshold and budget taken as
 * ppm integers.
 *
 * Scale shape: one hourly rollup of the raw feed (the only data-bound
 * stage), then trailing RANGE windows over the calendar-bounded
 * hourly series — hours/year ≈ 8.8k rows regardless of feed volume.
 * The hourly series is a single ordered window (documented
 * single-partition; it is metadata-sized by construction — partition
 * by service/tenant when monitoring many SLOs).
 */
object Slo {

  /** Per-hour burn-rate rows: (hour, err_1h, total_1h, burn_short_ppm,
   *  burn_long_ppm, page). `sloPpm` is the SLO in ppm (950000 = 99.5%
   *  would be 995000); budgetPpm = 1e6 − sloPpm. `alertPpm` is the
   *  burn-rate threshold in ppm (1200000 = burn ≥ 1.2×budget). */
  def burnRate(
      events: DataFrame,
      tsCol: String = "ts",
      isError: Column = col("event_type") === "error",
      sloPpm: Long = 750000L,
      alertPpm: Long = 1200000L,
      longWindowHours: Int = 6): DataFrame =
    burnFromHourly(
      events.groupBy(date_trunc("hour", col(tsCol)).as("hour"))
        .agg(count(lit(1)).as("total_1h"),
          sum(when(isError, 1L).otherwise(0L)).as("err_1h")),
      sloPpm, alertPpm, longWindowHours)

  /** The trailing-window/alert stage alone, over an ALREADY-rolled-up
   *  hourly frame (hour, err_1h, total_1h) — shared by the batch form
   *  above and the streaming form (where the hourly rollup is a
   *  watermarked windowed aggregation and THIS stage runs over the
   *  drained, hours-sized sink). */
  def burnFromHourly(
      hourly: DataFrame,
      sloPpm: Long = 750000L,
      alertPpm: Long = 1200000L,
      longWindowHours: Int = 6): DataFrame = {
    require(sloPpm > 0 && sloPpm < 1000000L, "sloPpm must be in (0, 1e6)")
    val budgetPpm = 1000000L - sloPpm
    val w = Window.orderBy(col("hour").cast("long"))
      .rangeBetween(-(longWindowHours - 1) * 3600L, 0)
    val windowed = hourly
      .withColumn("err_l", sum("err_1h").over(w))
      .withColumn("total_l", sum("total_1h").over(w))
    def burnPpm(err: Column, total: Column): Column =
      round(lit(1e12) * err.cast("double") /
        (total * budgetPpm).cast("double"), 0).cast("long")
    // integer alert test: err/total ≥ (alertPpm/1e6)·(budgetPpm/1e6)
    //   ⇔ err · 1e12 ≥ total · alertPpm · budgetPpm
    // — through DECIMAL, because the Long form overflows once
    // total · alertPpm · budgetPpm passes 2^63 (≈31M events/hour at
    // these defaults — reachable for a busy service); decimal keeps
    // the comparison exact-integer at any volume
    def hot(err: Column, total: Column): Column =
      err.cast("decimal(38,0)") * lit(1000000000000L) >=
        total.cast("decimal(38,0)") * lit(alertPpm * budgetPpm)
    windowed.select(
      date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
      col("err_1h"), col("total_1h"),
      burnPpm(col("err_1h"), col("total_1h")).as("burn_short_ppm"),
      burnPpm(col("err_l"), col("total_l")).as("burn_long_ppm"),
      (hot(col("err_1h"), col("total_1h")) &&
        hot(col("err_l"), col("total_l"))).as("page"))
  }
}
