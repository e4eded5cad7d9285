package graft.anomalies

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series anomaly detection (SURVEY.md §2.4, A1–A5).
 *
 * The reference runs numpy loops over one metric series at a time
 * (core/anomalies/algorithms.py). The Spark-native re-expression is window
 * functions over a long/narrow metrics DataFrame partitioned by series
 * identity — every series is detected in parallel in ONE job, with no
 * driver-side iteration; at 100 TB of history this scales with the number
 * of (series × points), not with a Python loop.
 *
 * Parity notes (SURVEY.md §7.4):
 *  - numpy `np.std` is POPULATION σ → `stddev_pop`, never `stddev_samp`.
 *  - `np.percentile` does linear interpolation → Spark's exact
 *    `percentile` matches; `percentile_approx` does NOT (scale mode only).
 *  - rolling windows EXCLUDE the current point (`rowsBetween(-w, -1)`)
 *    and emit nothing for the first `window` points
 *    (algorithms.py:46-59,109-130).
 */
object Anomalies {

  /** A4: severity classification (algorithms.py:201-240). */
  def severity(score: Column, method: String): Column = method match {
    case "zscore" =>
      when(score > 5.0, "high").when(score > 3.5, "medium").otherwise("low")
    case "iqr" =>
      when(score > 3.0, "high").when(score > 1.5, "medium").otherwise("low")
    case "moving_average" =>
      when(score > 4.0, "high").when(score > 2.5, "medium").otherwise("low")
    case "mad" => // modified z-score bands (anomaly bar itself is 3.5)
      when(score > 7.0, "high").when(score > 5.0, "medium").otherwise("low")
    case _ =>
      when(score > 5.0, "high").when(score > 2.5, "medium").otherwise("low")
  }

  /** A1: Z-score detector (algorithms.py:10-61).
   *
   *  global (window=None): score = |x − mean| / σ_pop over the whole
   *  series, threshold = 3/sensitivity, σ=0 → score 0.
   *  rolling: stats over the trailing `window` values excluding the
   *  current row; only rows with a full window emit a result. */
  def zscore(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      sensitivity: Double = 1.0,
      window: Option[Int] = None): DataFrame = {
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    val threshold = 3.0 / sensitivity
    val scored = window match {
      case None =>
        val w = part.orderBy(col(tsCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.withColumn("__n", count(v).over(w))
          .withColumn("__mean", avg(v).over(w))
          .withColumn("__std", stddev_pop(v).over(w))
          // len(values) < 2 → no results (algorithms.py:24-25)
          .filter(col("__n") >= 2)
      case Some(wn) =>
        val w = part.orderBy(col(tsCol)).rowsBetween(-wn, -1)
        df.withColumn("__cnt", count(v).over(w))
          .withColumn("__mean", avg(v).over(w))
          .withColumn("__std", stddev_pop(v).over(w))
          .filter(col("__cnt") === wn)
    }
    scored
      .withColumn("score",
        when(col("__std") === 0.0, 0.0)
          .otherwise(abs((v - col("__mean")) / col("__std"))))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly", col("score") > col("threshold"))
      .withColumn("method", lit("zscore"))
      .withColumn("severity", severity(col("score"), "zscore"))
      .drop("__n", "__cnt", "__mean", "__std")
  }

  /** Seasonal z-score (beyond-reference): daily metrics almost always
   *  carry a weekly cycle (weekend traffic dips that a global z-score
   *  flags every Saturday). Scores each point against the mean/σ of
   *  ITS day-of-week within the series — the same window-function
   *  shape as [[zscore]], partitioned by (series, dow), so thousands
   *  of series × 7 seasons detect in one shuffle-free-after-partition
   *  job.
   *
   *  Stats are LEAVE-ONE-OUT (point excluded from its own baseline):
   *  a season holds only n/7 points, and a population z-score that
   *  includes the point is bounded by √(n−1) — an 8-point season could
   *  mathematically never cross the 3σ bar no matter how wild the
   *  spike. Mean/variance come from windowed Σv, Σv² with the point
   *  subtracted out, so the job stays one window pass. Needs ≥
   *  `minPerSeason` points in the point's own season (default 3;
   *  fewer → no verdict for that point, mirroring the global
   *  detector's n≥2 guard). */
  def seasonalZscore(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      sensitivity: Double = 1.0,
      minPerSeason: Int = 3): DataFrame = {
    val v = col(valueCol)
    val threshold = 3.0 / sensitivity
    val w = Window
      .partitionBy((seriesCols.map(col) :+ col("__dow")): _*)
      .orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val n1 = col("__n") - 1
    val looMean = (col("__sum") - v) / n1
    val looVar =
      (col("__sum2") - v * v) / n1 - looMean * looMean
    df.withColumn("__dow", dayofweek(col(tsCol).cast("date")))
      .withColumn("__n", count(v).over(w))
      .withColumn("__sum", sum(v).over(w))
      .withColumn("__sum2", sum(v * v).over(w))
      .filter(col("__n") >= minPerSeason)
      .withColumn("__std", sqrt(greatest(looVar, lit(0.0))))
      .withColumn("score",
        when(col("__std") === 0.0, 0.0)
          .otherwise(abs((v - looMean) / col("__std"))))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly", col("score") > col("threshold"))
      .withColumn("method", lit("seasonal_zscore"))
      .withColumn("severity", severity(col("score"), "zscore"))
      .drop("__n", "__sum", "__sum2", "__std", "__dow")
  }

  /** A2: IQR detector (algorithms.py:64-132).
   *
   *  q1/q3 with np.percentile linear interpolation (exact `percentile`),
   *  bounds q1 − t·iqr / q3 + t·iqr with t = 1.5/sensitivity; score =
   *  distance past the bound in IQRs (∞ when iqr=0); is_anomaly is
   *  OUT-OF-BOUNDS — not score>threshold. Needs ≥4 points. */
  def iqr(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      sensitivity: Double = 1.0,
      window: Option[Int] = None): DataFrame = {
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    val threshold = 1.5 / sensitivity
    val qv = Profiles.quotedCol(valueCol)
    val scored = window match {
      case None =>
        val w = part.orderBy(col(tsCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.withColumn("__n", count(v).over(w))
          .withColumn("__q1", expr(s"percentile($qv, 0.25)").over(w))
          .withColumn("__q3", expr(s"percentile($qv, 0.75)").over(w))
          .filter(col("__n") >= 4) // algorithms.py:78-79
      case Some(wn) =>
        val w = part.orderBy(col(tsCol)).rowsBetween(-wn, -1)
        val whole = part.orderBy(col(tsCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.withColumn("__n", count(v).over(whole))
          .withColumn("__cnt", count(v).over(w))
          .withColumn("__q1", expr(s"percentile($qv, 0.25)").over(w))
          .withColumn("__q3", expr(s"percentile($qv, 0.75)").over(w))
          .filter(col("__n") >= 4 && col("__cnt") === wn)
    }
    val iqrC = col("__q3") - col("__q1")
    val lower = col("__q1") - iqrC * threshold
    val upper = col("__q3") + iqrC * threshold
    scored
      .withColumn("score",
        when(v < lower,
          when(iqrC > 0.0, abs((lower - v) / iqrC)).otherwise(lit(Double.PositiveInfinity)))
        .when(v > upper,
          when(iqrC > 0.0, abs((v - upper) / iqrC)).otherwise(lit(Double.PositiveInfinity)))
        .otherwise(0.0))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly", v < lower || v > upper)
      .withColumn("method", lit("iqr"))
      .withColumn("severity", severity(col("score"), "iqr"))
      .drop("__n", "__cnt", "__q1", "__q3")
  }

  /** Exact linear-interpolated median of an array column — the same
   *  interpolation as `percentile(x, 0.5)` (odd length → middle, even →
   *  mean of the two middles), as a pure array expression so rolling
   *  windows can median PER-ROW derived values. */
  private def arrayMedian(arr: Column): Column = {
    val sorted = array_sort(arr)
    val n = size(sorted)
    val half = floor(n / 2).cast("int") // Column `/` is double division
    when(n === 0, lit(null).cast("double"))
      .when(n % 2 === 1, element_at(sorted, half + 1).cast("double"))
      .otherwise((element_at(sorted, half).cast("double")
        + element_at(sorted, half + 1).cast("double")) / 2.0)
  }

  /** Robust z-score detector (beyond the reference's three methods):
   *  median/MAD instead of mean/σ, so the baseline itself is not dragged
   *  by the anomaly it is trying to flag. score = |x − median| /
   *  (1.4826·MAD) — the Iglewicz–Hoaglin modified z-score — with the
   *  standard 3.5 cutoff (scaled by sensitivity); MAD = 0 → score 0
   *  (mirrors the zscore σ=0 rule).
   *
   *  global: two exact `percentile` window passes over ONE
   *  shuffle+sort (the second medians the deviations from the first).
   *  rolling: the trailing `window` values (excluding current) are
   *  gathered per row — per-row medians differ, so there is no shared
   *  second window; state is bounded at O(window) per row and every
   *  series still detects in parallel in one job. */
  def mad(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      sensitivity: Double = 1.0,
      window: Option[Int] = None): DataFrame = {
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    val threshold = 3.5 / sensitivity
    val qv = Profiles.quotedCol(valueCol)
    val scored = window match {
      case None =>
        val w = part.orderBy(col(tsCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.withColumn("__n", count(v).over(w))
          .withColumn("__med", expr(s"percentile($qv, 0.5)").over(w))
          .withColumn("__dev", abs(v.cast("double") - col("__med")))
          .withColumn("__mad", expr("percentile(__dev, 0.5)").over(w))
          .filter(col("__n") >= 2)
      case Some(wn) =>
        val w = part.orderBy(col(tsCol)).rowsBetween(-wn, -1)
        df.withColumn("__cnt", count(v).over(w))
          .withColumn("__vals", collect_list(v.cast("double")).over(w))
          .withColumn("__med", arrayMedian(col("__vals")))
          .withColumn("__mad", arrayMedian(
            transform(col("__vals"), x => abs(x - col("__med")))))
          .filter(col("__cnt") === wn)
    }
    scored
      .withColumn("score",
        when(col("__mad") === 0.0, 0.0)
          .otherwise(abs(v.cast("double") - col("__med"))
            / (lit(1.4826) * col("__mad"))))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly", col("score") > col("threshold"))
      .withColumn("method", lit("mad"))
      .withColumn("severity", severity(col("score"), "mad"))
      .drop("__n", "__cnt", "__vals", "__med", "__dev", "__mad")
  }

  /** A3: moving-average detector (algorithms.py:135-198).
   *
   *  MA over the trailing `window` values (excluding current); the std is
   *  computed over MAs with the reference's exact (forward-looking)
   *  window alignment: std[i] = σ_pop(mavg[i .. i+sw−1]) while a full
   *  window ahead exists, the LAST full-window σ afterwards, and a global
   *  σ over all MAs when there are fewer than `stdWindow` MAs. */
  def movingAverage(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      sensitivity: Double = 1.0,
      window: Int = 7,
      stdWindow: Option[Int] = None): DataFrame = {
    val sw = stdWindow.getOrElse(window)
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    val threshold = 2.0 / sensitivity
    val wTrail = part.orderBy(col(tsCol)).rowsBetween(-window, -1)
    val withMa = df
      .withColumn("__cnt", count(v).over(wTrail))
      .withColumn("__mavg", avg(v).over(wTrail))
      .filter(col("__cnt") === window) // rows i >= window only
    // windows over the MA sub-series
    val wAll = part.orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wFwd = part.orderBy(col(tsCol)).rowsBetween(0, sw - 1)
    val wUpTo = part.orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withStd = withMa
      .withColumn("__L", count(col("__mavg")).over(wAll))
      .withColumn("__stdGlobal", stddev_pop(col("__mavg")).over(wAll))
      .withColumn("__fwdCnt", count(col("__mavg")).over(wFwd))
      .withColumn("__fwdStd",
        when(col("__fwdCnt") === sw, stddev_pop(col("__mavg")).over(wFwd)))
      .withColumn("__stdRolling",
        last(col("__fwdStd"), ignoreNulls = true).over(wUpTo))
      .withColumn("__std",
        when(col("__L") < sw, col("__stdGlobal")).otherwise(col("__stdRolling")))
    withStd
      .withColumn("score",
        when(col("__std") === 0.0, 0.0)
          .otherwise(abs((v - col("__mavg")) / col("__std"))))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly",
        col("__std") =!= 0.0 && col("score") > col("threshold"))
      .withColumn("method", lit("moving_average"))
      .withColumn("severity", severity(col("score"), "moving_average"))
      .withColumnRenamed("__mavg", "moving_avg")
      .drop("__cnt", "__L", "__stdGlobal", "__fwdCnt", "__fwdStd",
        "__stdRolling", "__std")
  }

  /** A5: result formatting — emit only the anomalies
   *  (algorithms.py:243-279). */
  def anomaliesOnly(detected: DataFrame): DataFrame =
    detected.filter(col("is_anomaly"))

  /** EWMA control chart (beyond-reference detector): the expected value
   *  is a truncated exponentially-weighted average of the `window`
   *  PRIOR points — weight (1−λ)^age, normalized — so level shifts and
   *  slow drifts trip it earlier than a flat moving average, while a
   *  single old spike decays instead of poisoning a whole window. The
   *  deviation scale is the classic EWMA control-limit σ·√(λ/(2−λ))
   *  with σ the series' population std. Expressed as window functions
   *  + an array fold over the collected trailing frame: state is
   *  bounded by `window`, thousands of series detect in one job, and
   *  the same formula replays in any engine (the a11 oracle). */
  def ewma(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      sensitivity: Double = 1.0,
      window: Int = 7,
      lambda: Double = 0.3): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, "lambda must be in (0, 1]")
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    val threshold = 3.0 / sensitivity
    val wTrail = part.orderBy(col(tsCol)).rowsBetween(-window, -1)
    val wAll = part.orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val decay = 1.0 - lambda
    // collect_list preserves frame order (oldest → newest); element j of
    // W gets weight (1-λ)^(W-1-j); Σ weights = (1-(1-λ)^W)/λ
    val norm = (1.0 - math.pow(decay, window)) / lambda
    val sigmaFactor = math.sqrt(lambda / (2.0 - lambda))
    df
      .withColumn("__arr", collect_list(v).over(wTrail))
      .withColumn("__sd", stddev_pop(v).over(wAll))
      .filter(size(col("__arr")) === window)
      .withColumn("ewma",
        aggregate(
          zip_with(col("__arr"),
            sequence(lit(window - 1), lit(0), lit(-1)),
            (x, e) => x * pow(lit(decay), e.cast("double"))),
          lit(0.0), (acc, t) => acc + t) / norm)
      .withColumn("__scale", col("__sd") * sigmaFactor)
      .withColumn("score",
        when(col("__scale") === 0.0 || col("__scale").isNull, 0.0)
          .otherwise(abs((v - col("ewma")) / col("__scale"))))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly",
        col("__scale") =!= 0.0 && col("score") > col("threshold"))
      .withColumn("method", lit("ewma"))
      .withColumn("severity", severity(col("score"), "ewma"))
      .drop("__arr", "__sd", "__scale")
  }

  /** CUSUM changepoint detector (beyond-reference): flags sustained
   *  level SHIFTS that per-point detectors miss — ten consecutive
   *  days each 1σ high never trip a 3σ z-score, but their cumulative
   *  drift does. Tabular CUSUM with slack k·σ and decision bound h·σ:
   *  S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − μ − kσ)), S⁻ mirrored. The clamped
   *  recursion is NOT a recurrence here: S⁺ₜ ≡ Pₜ − min(0, min_{j≤t} Pⱼ)
   *  for the plain prefix sum Pₜ of deviations, so the whole detector
   *  is two stacked window passes (running sum, then running min) —
   *  engine-portable, no UDF, thousands of series in one partitioned
   *  job, and exactly replayable as SQL (the a15 oracle). Scores are
   *  emitted in σ units; direction says which side drifted. */
  def cusum(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      k: Double = 0.5,
      h: Double = 4.0,
      sensitivity: Double = 1.0): DataFrame = {
    require(k >= 0.0 && h > 0.0, "need slack k >= 0 and bound h > 0")
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    val wAll = part.orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = part.orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val threshold = h / sensitivity
    df
      .withColumn("__n", count(v).over(wAll))
      .withColumn("__mean", avg(v).over(wAll))
      .withColumn("__sd", stddev_pop(v).over(wAll))
      .filter(col("__n") >= 2 && col("__sd") > 0.0)
      .withColumn("__pUp",
        sum(v - col("__mean") - lit(k) * col("__sd")).over(wRun))
      .withColumn("__pDn",
        sum(col("__mean") - v - lit(k) * col("__sd")).over(wRun))
      .withColumn("__sUp",
        (col("__pUp") - least(lit(0.0), min(col("__pUp")).over(wRun)))
          / col("__sd"))
      .withColumn("__sDn",
        (col("__pDn") - least(lit(0.0), min(col("__pDn")).over(wRun)))
          / col("__sd"))
      .withColumn("score", greatest(col("__sUp"), col("__sDn")))
      .withColumn("threshold", lit(threshold))
      .withColumn("is_anomaly", col("score") > col("threshold"))
      .withColumn("direction",
        when(!col("is_anomaly"), "none")
          .when(col("__sUp") >= col("__sDn"), "up")
          .otherwise("down"))
      .withColumn("method", lit("cusum"))
      .withColumn("severity", severity(col("score") - lit(threshold - 3.0),
        "zscore"))
      .drop("__n", "__mean", "__sd", "__pUp", "__pDn")
      .withColumnRenamed("__sUp", "cusum_up")
      .withColumnRenamed("__sDn", "cusum_down")
  }

  /** A1–A5 dispatch by configured method (detector.py:92-127 defaults).
   *  `minDataPoints` guards short series (detector.py:59-62). */
  def detect(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      valueCol: String,
      method: String = "zscore",
      sensitivity: Double = 1.0,
      window: Option[Int] = None,
      stdWindow: Option[Int] = None,
      minDataPoints: Int = 7): DataFrame = {
    val part = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val eligible = df
      .withColumn("__seriesN", count(col(valueCol)).over(part))
      .filter(col("__seriesN") >= minDataPoints)
      .drop("__seriesN")
    val detected = method match {
      case "zscore" =>
        zscore(eligible, seriesCols, tsCol, valueCol, sensitivity, window)
      case "iqr" =>
        iqr(eligible, seriesCols, tsCol, valueCol, sensitivity, window)
      case "mad" =>
        mad(eligible, seriesCols, tsCol, valueCol, sensitivity, window)
      case "moving_average" =>
        movingAverage(eligible, seriesCols, tsCol, valueCol, sensitivity,
          window.getOrElse(7), stdWindow)
      case "ewma" =>
        ewma(eligible, seriesCols, tsCol, valueCol, sensitivity,
          window.getOrElse(7))
      // `window` deliberately NOT forwarded: for every other method it
      // means the trailing rolling length (typically 7), and reusing it
      // as the per-season floor would silently blank short series when
      // a stored config flips method to seasonal (7 weekday points =
      // 7 weeks of history). Callers tune minPerSeason directly.
      case "seasonal_zscore" =>
        seasonalZscore(eligible, seriesCols, tsCol, valueCol, sensitivity)
      case "cusum" =>
        cusum(eligible, seriesCols, tsCol, valueCol,
          sensitivity = sensitivity)
      case other =>
        throw new IllegalArgumentException(s"unknown detection method: $other")
    }
    anomaliesOnly(detected)
  }

  /** Alert-fatigue control over any detector output: page on the
   *  LEADING EDGE of an anomaly run (the previous point in the series
   *  was not anomalous), and RE-page every `reAlertEvery` points while
   *  the run persists (a silent week-long incident is the other
   *  failure mode). Adds `run_length` (position within the current
   *  anomalous run, 0 outside) and `alert`. One per-series ordered
   *  window over detector output — metadata-sized next to the scan
   *  that produced it. */
  def leadingEdgeAlerts(
      detections: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      reAlertEvery: Int = 7): DataFrame = {
    require(reAlertEvery > 0, "reAlertEvery must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(tsCol))
    // run id = count of run STARTS so far; position = row number within
    // the run's frame
    val starts = col("is_anomaly") &&
      !coalesce(lag(col("is_anomaly"), 1).over(w), lit(false))
    val withRun = detections
      .withColumn("__start", when(starts, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wr = Window.partitionBy(
        (seriesCols.map(col) :+ col("__run")): _*)
      .orderBy(col(tsCol))
    withRun
      .withColumn("run_length",
        when(col("is_anomaly"), row_number().over(wr).cast("long"))
          .otherwise(0L))
      .withColumn("alert",
        col("is_anomaly") &&
          pmod(col("run_length") - 1, lit(reAlertEvery.toLong)) === 0L)
      .drop("__start", "__run")
  }

  /** Proportion anomaly with the WILSON score interval — exact-binomial
   *  inference where the z-score family silently assumes normal counts:
   *  a day with k target events out of n total is anomalous when its
   *  Wilson interval EXCLUDES the series' pooled baseline share. The
   *  small-n behavior is the point — 3/10 and 300/1000 have the same
   *  p̂ but wildly different evidence, and the interval says so while a
   *  z-score on p̂ treats them alike (the false-alarm storm on
   *  low-traffic days every rate alert hits).
   *
   *  center = (p̂ + z²/2n) / (1 + z²/n);
   *  half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n).
   *  Plain column arithmetic on each group row (one aggregate pass +
   *  one broadcast of the per-series pooled share) — replays exactly
   *  as SQL, scales as a groupBy. */
  def proportionAnomaly(
      df: DataFrame,
      seriesCols: Seq[String],
      bucketCol: String,
      isTarget: Column,
      z: Double = 1.96): DataFrame = {
    val keys = seriesCols.map(col)
    val perBucket = df.groupBy(keys :+ col(bucketCol): _*)
      .agg(sum(when(isTarget, 1L).otherwise(0L)).as("k"),
        count(lit(1)).as("n"))
      .localCheckpoint() // series×bucket-sized; consumed by the pooled
                         // lane AND the join — one input scan, not two
    val pooled = perBucket.groupBy(keys: _*)
      .agg((sum(col("k")).cast("double") / sum(col("n")))
        .as("baseline_p"))
    val z2 = z * z
    val p = col("k").cast("double") / col("n")
    val denom = lit(1.0) + lit(z2) / col("n")
    val center = (p + lit(z2) / (lit(2.0) * col("n"))) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / col("n")
      + lit(z2) / (lit(4.0) * col("n") * col("n")))) / denom
    perBucket.join(broadcast(pooled), seriesCols)
      .withColumn("p_hat", p)
      .withColumn("wilson_lo", center - half)
      .withColumn("wilson_hi", center + half)
      .withColumn("is_anomalous",
        col("baseline_p") < col("wilson_lo") ||
          col("baseline_p") > col("wilson_hi"))
  }
}

private[anomalies] object Profiles {
  def quotedCol(name: String): String = "`" + name.replace("`", "``") + "`"
}
