package graft.anomalies

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Holt's linear-trend exponential smoothing per series — the forecast
 * companion to the detection battery in [[Anomalies]] (the reference's
 * anomaly configs carry expected-range semantics; a level+trend
 * forecast is how those ranges get set for trending metrics).
 *
 *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
 *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
 * initialized l_1 = y_1, b_1 = y_2 − y_1, updates from t = 2; the
 * h-step forecast is l_n + h·b_n (Hyndman & Athanasopoulos, fpp ch. 8).
 *
 * Scale shape: a series is one GROUP (metric × key), collected to an
 * ordered array and folded with the `aggregate` higher-order
 * function — codegen'd, no UDF, no driver participation; thousands of
 * independent series parallelize across the cluster while each fold is
 * sequential by nature (the recurrence is inherently ordered). A
 * series must fit one task — true by construction for daily/hourly
 * ops metrics (365 points/year), the same bounded-state argument as
 * the reference's ≤1000-point detection input.
 */
object Forecast {

  /** Per-series Holt state + h-step-ahead forecasts (h = 1..horizon).
   *  Series shorter than 2 points are dropped (no trend to estimate).
   *  Output: keyCols, n_points, level, trend, forecast_1..h. */
  def holtLinear(
      series: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      alpha: Double = 0.5,
      beta: Double = 0.3,
      horizon: Int = 3): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha/beta must be in (0, 1)")
    require(horizon >= 1, "horizon must be >= 1")
    val packed = series
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("y")))).as("__arr"))
      .filter(size(col("__arr")) >= 2)
    // l_t is needed in both recurrence lines; the fold recomputes the
    // identical expression (IEEE ops are deterministic, so both copies
    // and any replaying engine agree bit-for-bit)
    val lNew = s"(${alpha}D * x.y + ${1 - alpha}D * (acc.l + acc.b))"
    val holt = expr(
      s"""aggregate(
         |  slice(__arr, 2, size(__arr) - 1),
         |  named_struct(
         |    'l', element_at(__arr, 1).y,
         |    'b', element_at(__arr, 2).y - element_at(__arr, 1).y),
         |  (acc, x) -> named_struct(
         |    'l', $lNew,
         |    'b', ${beta}D * ($lNew - acc.l) + ${1 - beta}D * acc.b))
         |""".stripMargin)
    val base = packed.withColumn("__h", holt)
      .select((keyCols.map(col) :+ size(col("__arr")).as("n_points") :+
        col("__h.l").as("level") :+ col("__h.b").as("trend")): _*)
    (1 to horizon).foldLeft(base) { (df, h) =>
      df.withColumn(s"forecast_$h",
        col("level") + lit(h.toDouble) * col("trend"))
    }
  }

  /** Forecast BACKTEST — the "is the model better than persistence"
   *  check run before a forecaster's expected ranges go live: fit
   *  [[holtLinear]] on the series BEFORE `cutoff`, score the held-out
   *  tail k-steps-ahead (ŷ = level + k·trend), and compare MAE
   *  against the naive last-observed-value baseline. Errors quantize
   *  to micro-units before the per-series integer sums (order-
   *  independent), so the verdict lane is engine-exact. One fold per
   *  series + two joins — metadata-sized beside the rollup that
   *  produced the series. */
  def holtBacktest(
      series: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      cutoff: Column,
      alpha: Double = 0.5,
      beta: Double = 0.3): DataFrame = {
    val fitSrc = series.filter(col(orderCol) < cutoff)
    val fit = holtLinear(fitSrc, keyCols, orderCol, valueCol,
        alpha, beta, horizon = 1)
      .select((keyCols.map(col) :+ col("level") :+ col("trend")): _*)
    val lastFit = fitSrc.groupBy(keyCols.map(col): _*)
      .agg(max(col(orderCol)).as("__last_day"),
        max_by(col(valueCol).cast("double"), col(orderCol)).as("__naive"))
    series.filter(col(orderCol) >= cutoff)
      .join(fit, keyCols)
      .join(lastFit, keyCols)
      .withColumn("__k",
        datediff(col(orderCol), col("__last_day")).cast("double"))
      .withColumn("__yhat", col("level") + col("__k") * col("trend"))
      .withColumn("__eh", round(abs(col(valueCol).cast("double")
        - col("__yhat")) * 1e6, 0).cast("long"))
      .withColumn("__en", round(abs(col(valueCol).cast("double")
        - col("__naive")) * 1e6, 0).cast("long"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_holdout"),
        round(sum("__eh").cast("double") / count(lit(1)) / 1e6, 6)
          .as("mae_holt"),
        round(sum("__en").cast("double") / count(lit(1)) / 1e6, 6)
          .as("mae_naive"),
        (sum("__eh") < sum("__en")).as("holt_beats_naive"))
  }

  /** Theil–Sen robust trend per series: slope = MEDIAN of all pairwise
   *  slopes, intercept = median of (y − slope·x) — up to ~29% outlier
   *  contamination cannot move it, where OLS (and Holt's level) chase
   *  every spike. The robust "is this metric actually drifting"
   *  answer for ops series full of incident days.
   *
   *  Scale shape: the pair join is per-series O(n²) in POINTS PER
   *  SERIES — bounded by the trend window (365 daily points → 66k
   *  pairs), while the series COUNT is what grows at 100 TB and
   *  parallelizes freely; `maxPoints` makes the quadratic bound a
   *  loud contract instead of a silent blowup. x is integer days
   *  since epoch and medians interpolate identically across engines,
   *  so the fit oracle-replays exactly. */
  def theilSen(
      series: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      valueCol: String,
      maxPoints: Int = 1000): DataFrame = {
    val keys = keyCols.map(col)
    val pts = series.select(
      keys :+ datediff(col(dateCol), lit("1970-01-01")).as("__x") :+
        col(valueCol).cast("double").as("__y"): _*)
    val counts = pts.groupBy(keys: _*).agg(count(lit(1)).as("n_points"))
    val over = counts.filter(col("n_points") > maxPoints).limit(1)
      .collect()
    require(over.isEmpty,
      s"theilSen: a series exceeds maxPoints=$maxPoints points — " +
        "window the input (the pair stage is quadratic per series)")
    val a = pts.select(
      keys :+ col("__x").as("__xa") :+ col("__y").as("__ya"): _*)
    val b = pts.select(
      keys :+ col("__x").as("__xb") :+ col("__y").as("__yb"): _*)
    val slopes = a.join(b, keyCols).filter(col("__xa") < col("__xb"))
      .select(keys :+ ((col("__yb") - col("__ya")) /
        (col("__xb") - col("__xa")).cast("double")).as("__s"): _*)
      .groupBy(keys: _*)
      .agg(median(col("__s")).as("slope"), count(lit(1)).as("n_pairs"))
    val intercepts = pts.join(slopes, keyCols)
      .groupBy(keys: _*)
      .agg(median(col("__y") - col("slope") * col("__x"))
        .as("intercept"))
    counts.join(slopes, keyCols).join(intercepts, keyCols)
      .select(keys ++ Seq(col("n_points"), col("n_pairs"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept")): _*)
  }

  /** [[theilSen]] past the `maxPoints` refusal: slope = median of a
   *  DETERMINISTIC hash-seeded sample of `pairsPerSeries` pairwise
   *  slopes (with replacement — the standard randomized Theil–Sen
   *  estimator, e.g. Matoušek '91's randomized variants), so a
   *  10k-point series costs O(pairsPerSeries) instead of the 50M
   *  exact pairs the guard refuses. Converges to the exact median at
   *  O(1/√pairs); keep the exact form as the oracle arm on windowed
   *  input and this lane for the long series a real user actually
   *  has.
   *
   *  Scale shape: points get a per-series index (one series-keyed
   *  window pass), the pair plan is `pairsPerSeries` rows per series
   *  with xxhash64-derived (i, j) indexes, and two series+index
   *  equi-joins attach the endpoints — linear in series × pairs, no
   *  quadratic stage anywhere, no RNG (same corpus + seed = same
   *  slope on any cluster). */
  def theilSenSampled(
      series: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      valueCol: String,
      pairsPerSeries: Int = 20000,
      seed: Long = 42L): DataFrame = {
    require(pairsPerSeries >= 1, "theilSenSampled: pairsPerSeries >= 1")
    val keys = keyCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val pts = series.select(
      keys :+ datediff(col(dateCol), lit("1970-01-01")).as("__x") :+
        col(valueCol).cast("double").as("__y"): _*)
    // (__x, __y) ordering: duplicate dates are legal input (the exact
    // form handles them via its __xa < __xb filter), and an __x-only
    // sort would give tied rows run-dependent indexes — breaking the
    // same-corpus-same-slope determinism contract
    val w = Window.partitionBy(keys: _*).orderBy(col("__x"), col("__y"))
    // keyspace-sized reuse: indexed feeds counts + both endpoint joins
    val indexed = pts
      .withColumn("__i", row_number().over(w) - 1)
      .localCheckpoint()
    val counts = indexed.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_points"))
    // pair plan: per series, t = 0..pairs-1; ia = h(t) mod n,
    // ib = ia + (1 + h'(t) mod (n-1)) mod n — distinct by construction
    val plan = counts.filter(col("n_points") >= lit(2))
      .select(keys :+ col("n_points") :+
        explode(sequence(lit(0), lit(pairsPerSeries - 1))).as("__t"): _*)
      .withColumn("__ia",
        pmod(xxhash64(lit(seed) +: col("__t") +: keys: _*),
          col("n_points")))
      .withColumn("__ib",
        pmod(col("__ia") + lit(1L) +
          pmod(xxhash64(lit(seed + 1) +: col("__t") +: keys: _*),
            col("n_points") - 1), col("n_points")))
      .select(keys :+ least(col("__ia"), col("__ib")).as("__il") :+
        greatest(col("__ia"), col("__ib")).as("__ih"): _*)
    val a = indexed.select(keys :+ col("__i").cast("long").as("__il") :+
      col("__x").as("__xa") :+ col("__y").as("__ya"): _*)
    val b = indexed.select(keys :+ col("__i").cast("long").as("__ih") :+
      col("__x").as("__xb") :+ col("__y").as("__yb"): _*)
    val slopes = plan
      .join(a, keyCols :+ "__il").join(b, keyCols :+ "__ih")
      // duplicate-date pairs have __xa = __xb: their slope is
      // undefined (Spark would yield NULL, which median SKIPS while
      // the count still billed them) — exclude them so
      // n_pairs_sampled counts only slopes that entered the median
      .filter(col("__xa") =!= col("__xb"))
      .select(keys :+ ((col("__yb") - col("__ya")) /
        (col("__xb") - col("__xa")).cast("double")).as("__s"): _*)
      .groupBy(keys: _*)
      .agg(median(col("__s")).as("slope"),
        count(lit(1)).as("n_pairs_sampled"))
    val intercepts = indexed.join(slopes, keyCols)
      .groupBy(keys: _*)
      .agg(median(col("__y") - col("slope") * col("__x"))
        .as("intercept"))
    // LEFT joins from the eligible series (n_points >= 2): a series
    // whose every sampled pair landed on duplicate dates has no valid
    // slope in the SAMPLE but must not silently vanish (the exact arm
    // would have emitted one) — it surfaces with n_pairs_sampled = 0
    // and NULL slope/intercept, telling the caller to re-sample or
    // fall back to the exact arm on that series
    counts.filter(col("n_points") >= lit(2))
      .join(slopes, keyCols, "left").join(intercepts, keyCols, "left")
      .select(keys ++ Seq(col("n_points"),
        coalesce(col("n_pairs_sampled"), lit(0L)).as("n_pairs_sampled"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept")): _*)
  }
}
