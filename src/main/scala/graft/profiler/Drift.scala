package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cross-column and cross-slice distribution statistics — the profile
 * depth beyond per-column aggregates: Pearson correlation between
 * numeric columns, and categorical distribution drift between two
 * slices of the same table (deploy-time vs baseline, this week vs
 * last — the corpus-level analog of the reference's per-metric anomaly
 * detection, backend/core/anomalies/detector.py).
 *
 * Scale shape: correlations are ONE single-pass aggregation over the
 * table (all pairwise moments as decimal-exact sums, map-side
 * combined — no shuffle of rows, one reduce of one row); drift is two
 * category-keyed counts (map-side combined) joined on the category —
 * vocabulary-sized frames, never row-sized shuffles.
 *
 * Exactness: every moment is summed as DECIMAL (order-independent),
 * converted to double only inside the final scalar formula, and the
 * result rounded to 6 dp — the same arithmetic an external SQL engine
 * runs, so results are engine-portable bit-for-bit.
 */
object Drift {

  /** Pairwise Pearson correlation for `cols` in ONE pass: moments
   *  n, Σx, Σx², Σxy as decimal-exact sums; output one row per
   *  unordered pair (col_a < col_b). Rows where either side is null
   *  are dropped per-pair (pairwise deletion, matching SQL CORR). */
  def correlations(
      df: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (a, b) =>
      val bothPresent = col(a).isNotNull && col(b).isNotNull
      val x = when(bothPresent, col(a)).cast("decimal(19,6)")
      val y = when(bothPresent, col(b)).cast("decimal(19,6)")
      Seq(
        count(when(bothPresent, lit(1))).as(s"__n_${a}_$b"),
        sum(x).cast("double").as(s"__sx_${a}_$b"),
        sum(y).cast("double").as(s"__sy_${a}_$b"),
        sum((x * y).cast("decimal(38,12)")).cast("double").as(s"__sxy_${a}_$b"),
        sum((x * x).cast("decimal(38,12)")).cast("double").as(s"__sxx_${a}_$b"),
        sum((y * y).cast("decimal(38,12)")).cast("double").as(s"__syy_${a}_$b"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col(s"__n_${a}_$b").cast("double")
      val cov = n * col(s"__sxy_${a}_$b") - col(s"__sx_${a}_$b") * col(s"__sy_${a}_$b")
      val vx = n * col(s"__sxx_${a}_$b") - col(s"__sx_${a}_$b") * col(s"__sx_${a}_$b")
      val vy = n * col(s"__syy_${a}_$b") - col(s"__sy_${a}_$b") * col(s"__sy_${a}_$b")
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_${a}_$b").as("n"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Categorical drift between two slices: per-category frequencies and
   *  the standard divergence summary — KL(P‖Q) with add-one smoothing
   *  (raw KL is infinite on any category Q misses), Jensen–Shannon
   *  divergence, and total variation distance. Returns ONE summary row;
   *  use [[categoryFrequencies]] for the per-category breakdown. */
  def categoricalDrift(
      before: DataFrame,
      after: DataFrame,
      catCol: String): DataFrame = {
    val p = before.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_before"))
    val q = after.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_after"))
    val joined = p.join(q, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
    // smoothed frequencies: (n_c + 1) / (N + K) with K = union category
    // count — deterministic, engine-portable, finite for every category
    val totals = joined.agg(
      sum(col("n_before")).as("__tb"),
      sum(col("n_after")).as("__ta"),
      count(lit(1)).as("__k"))
    // per-category contributions quantized to integer nano-units BEFORE
    // the sum: a double sum is order-dependent in its last ulps and
    // partial-aggregation order is nondeterministic (the x13 lesson);
    // integer sums are exact and engine-portable
    def nano(c: Column): Column = round(c * 1e9, 0).cast("long")
    joined.crossJoin(broadcast(totals))
      .withColumn("__p",
        (col("n_before") + 1).cast("double") / (col("__tb") + col("__k")))
      .withColumn("__q",
        (col("n_after") + 1).cast("double") / (col("__ta") + col("__k")))
      .withColumn("__m", (col("__p") + col("__q")) / 2)
      .agg(
        count(lit(1)).as("n_categories"),
        round(sum(nano(col("__p") * log(col("__p") / col("__q"))))
          .cast("double") / 1e9, 6).as("kl_pq"),
        round(sum(nano(
          col("__p") * log(col("__p") / col("__m")) / 2
            + col("__q") * log(col("__q") / col("__m")) / 2))
          .cast("double") / 1e9, 6).as("js"),
        round(sum(nano(abs(col("__p") - col("__q"))))
          .cast("double") / 2e9, 6).as("total_variation"))
  }

  /** Numeric drift via the Population Stability Index — the standard
   *  monitoring score for a numeric column between two slices: bucket
   *  both into `bins` equal-width bins over the COMBINED range, add-one
   *  smooth, PSI = Σ (p−q)·ln(p/q). Same nano-quantized summation as
   *  [[categoricalDrift]] (order-independent, engine-portable); bin
   *  assignment is pure double arithmetic, identical on any IEEE-754
   *  engine. Two scans (bounds, then one shared bucket-count pass per
   *  slice) — each map-side combined; nothing row-sized shuffles. */
  def numericDrift(
      before: DataFrame,
      after: DataFrame,
      valCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val bounds = before.select(col(valCol).as("__v"))
      .unionAll(after.select(col(valCol).as("__v")))
      .agg(min(col("__v")).cast("double").as("__mn"),
        max(col("__v")).cast("double").as("__mx"))
    def binned(df: DataFrame, n: String) = df
      .filter(col(valCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("__bin",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col(valCol).cast("double") - col("__mn"))
              / ((col("__mx") - col("__mn")) / bins)).cast("int"))))
      .groupBy("__bin").agg(count(lit(1)).as(n))
    val joined = binned(before, "n_before")
      .join(binned(after, "n_after"), Seq("__bin"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
    // +1 smoothing over the OCCUPIED bins (k), exactly as in
    // categoricalDrift — empty bins contribute nothing on either engine
    val totals = joined.agg(
      sum(col("n_before")).as("__tb"), sum(col("n_after")).as("__ta"),
      count(lit(1)).as("__k"))
    def nano(c: Column): Column = round(c * 1e9, 0).cast("long")
    joined.crossJoin(broadcast(totals))
      .withColumn("__p",
        (col("n_before") + 1).cast("double") / (col("__tb") + col("__k")))
      .withColumn("__q",
        (col("n_after") + 1).cast("double") / (col("__ta") + col("__k")))
      .agg(
        count(lit(1)).as("n_bins"),
        round(sum(nano((col("__p") - col("__q")) * log(col("__p") / col("__q"))))
          .cast("double") / 1e9, 6).as("psi"))
  }

  /** Per-category before/after frequency table (unsmoothed, exact). */
  def categoryFrequencies(
      before: DataFrame,
      after: DataFrame,
      catCol: String): DataFrame = {
    val p = before.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_before"))
    val q = after.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_after"))
    p.join(q, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
  }
}
