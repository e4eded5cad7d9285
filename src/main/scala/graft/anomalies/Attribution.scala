package graft.anomalies

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Anomaly root-cause attribution: when a series' daily volume spikes,
 * WHICH contributor moved? The detection battery says "this day is
 * anomalous" ([[Anomalies]], [[Changepoint]]); this ranks the
 * contributors (users, sources, shards...) whose share of the day
 * deviates most from their share of every OTHER day — the drill-down
 * an on-call run actually performs.
 *
 * Engine-exact throughout: the day flag is the global 2σ z-score test
 * rewritten as an INTEGER cross-multiplied comparison
 * (n·x − S)² ≥ z²·(n·Σx² − S²) over event counts (no float mean, no
 * float σ, no rounding at the decision boundary), and the share delta
 * quantizes to ppm from exact integer counts. Shapes: one (series,
 * day) rollup, one (series, day, contributor) rollup, one broadcast
 * of the flagged-day frame (anomalous days are few by definition),
 * one top-k window per flagged day.
 */
object Attribution {

  /** Top-`k` contributors per flagged (series, day):
   *  (series, day, contributor, day_count, day_total, delta_ppm) where
   *  delta_ppm = 1e6·(share on the day − share on all other days),
   *  computed from exact integer counts. A day flags when its count
   *  sits ≥ `zInt`σ from the series mean (population σ, integer
   *  cross-multiplied — zInt must be a small integer). */
  def anomalyContributors(
      events: DataFrame,
      seriesCol: String = "event_type",
      contributorCol: String = "user_id",
      tsCol: String = "ts",
      zInt: Int = 2,
      k: Int = 3): DataFrame = {
    require(zInt >= 1, "zInt must be a positive integer")
    val days = events
      .groupBy(col(seriesCol).as("series"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = days.groupBy("series")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("s2"))
    // (n·x − S)² ≥ z²·(n·Σx² − S²)  ⇔  |x − mean| ≥ z·σ_pop, exactly.
    // decimal(38,0), not Long: (n·x)² overflows 2^63 at ~365 days ×
    // tens of millions of events/day — same discipline as Slo.burn
    val dec = "decimal(38,0)"
    val devN = col("n").cast(dec) * col("x").cast(dec) -
      col("s").cast(dec)
    val flagged = days.join(broadcast(stats), "series")
      .filter(col("n") >= 2 &&
        devN * devN >=
          lit(zInt.toLong * zInt).cast(dec) *
            (col("n").cast(dec) * col("s2").cast(dec) -
              col("s").cast(dec) * col("s").cast(dec)))
      .select(col("series"), col("day"), col("x").as("day_total"),
        col("s").as("all_total"))
    val contrib = events
      .groupBy(col(seriesCol).as("series"),
        to_date(col(tsCol)).as("day"),
        col(contributorCol).as("contributor"))
      .agg(count(lit(1)).as("c"))
    val contribAll = contrib.groupBy("series", "contributor")
      .agg(sum("c").as("c_all"))
    val scored = contrib
      .join(broadcast(flagged), Seq("series", "day"))
      .join(contribAll, Seq("series", "contributor"))
      // share(day) − share(other days), in exact integers before the
      // one double division: d1/t1 − d0/t0 with
      // d0 = c_all − c, t0 = all_total − day_total
      .withColumn("__d0", col("c_all") - col("c"))
      .withColumn("__t0", col("all_total") - col("day_total"))
      .filter(col("__t0") > 0)
      .withColumn("delta_ppm",
        round(lit(1e6) *
          (col("c") * col("__t0") - col("__d0") * col("day_total"))
            .cast("double") /
          (col("day_total") * col("__t0")).cast("double"), 0)
          .cast("long"))
    val w = Window.partitionBy("series", "day")
      .orderBy(col("delta_ppm").desc, col("contributor").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("series"), col("day"), col("contributor"),
        col("c").as("day_count"), col("day_total"), col("delta_ppm"),
        col("__rk").as("rank"))
  }
}
