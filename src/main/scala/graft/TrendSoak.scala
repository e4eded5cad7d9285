package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * a22 scaling demo (verdict r14 ask #5): Theil–Sen's pair stage is
 * quadratic PER SERIES and refuses loudly past `maxPoints` — so the
 * axis that grows at 100 TB is the SERIES COUNT, which parallelizes
 * freely (the pair join is series-keyed equi). This main times
 * `Forecast.theilSen` over synthetic daily series at 1×/10×/30× the
 * series count with a fixed per-series length, and prints one JSON
 * line of {series → seconds}. Flat-per-series (ratio ≈ mult or
 * better once scan setup amortizes) is the pass condition recorded in
 * BASELINE.md §17.
 *
 * Usage: graft.TrendSoak [baseSeries] [pointsPerSeries]
 *   (defaults 300 and 60; scales ×1, ×10, ×30)
 */
object TrendSoak {
  def main(args: Array[String]): Unit = {
    val baseSeries = args.headOption.map(_.toInt).getOrElse(300)
    val points = args.lift(1).map(_.toInt).getOrElse(60)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def frame(series: Int) = spark.range(series.toLong * points)
      .select(
        concat(lit("m"), (col("id") % series).cast("string")).as("k"),
        date_add(lit("2026-01-01").cast("date"),
          (col("id") / series).cast("int")).as("day"),
        // deterministic value: trend + per-series phase wobble
        ((col("id") / series) * 2 + pmod(col("id"), lit(7)))
          .cast("double").as("v"))

    def time(series: Int): Double = {
      val t0 = System.nanoTime()
      val n = graft.anomalies.Forecast.theilSen(
        frame(series), Seq("k"), "day", "v").count()
      require(n == series, s"expected $series rows, got $n")
      (System.nanoTime() - t0) / 1e9
    }

    time(baseSeries) // warm the JIT/codegen once
    val rows = Seq(1, 10, 30).map { mult =>
      val s = baseSeries * mult
      val sec = time(s)
      System.err.println(f"[trend-soak] series=$s%6d  ${sec}%6.2f s")
      s""""x$mult":{"series":$s,"sec":${f"$sec%.2f"}}"""
    }
    println(s"""{"metric":"trend_soak","points":$points,""" +
      s""""queries":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
