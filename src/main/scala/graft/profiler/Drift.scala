package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
   *  are dropped per-pair (pairwise deletion, matching SQL CORR).
   *
   *  `exact = false` is the scale twin (the p27 dual-mode pattern):
   *  moments sum as plain doubles — codegen'd primitive accumulation
   *  instead of per-row Decimal objects, same single-scan plan. The
   *  result is FP-accumulation-order dependent in the last ulps, so
   *  the 6 dp rounding almost always agrees with the exact path but is
   *  not engine-portable bit-for-bit; the oracle pins the exact form. */
  def correlations(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    if (!exact) return correlationsDouble(df, cols)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // internal aliases key on the PAIR INDEX, never on joined column
    // names — "a"/"b_c" and "a_b"/"c" would collide on a name-joined
    // alias and make the later col() references ambiguous.
    // Magnitude note: moments accumulate in decimal(19,6), so values
    // with |x| ≥ 1e13 null out of the sums (corr comes back null for
    // such a pair rather than silently wrong — n still counts the row).
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val bothPresent = col(a).isNotNull && col(b).isNotNull
      val x = when(bothPresent, col(a)).cast("decimal(19,6)")
      val y = when(bothPresent, col(b)).cast("decimal(19,6)")
      Seq(
        count(when(bothPresent, lit(1))).as(s"__n_$i"),
        sum(x).cast("double").as(s"__sx_$i"),
        sum(y).cast("double").as(s"__sy_$i"),
        sum((x * y).cast("decimal(38,12)")).cast("double").as(s"__sxy_$i"),
        sum((x * x).cast("decimal(38,12)")).cast("double").as(s"__sxx_$i"),
        sum((y * y).cast("decimal(38,12)")).cast("double").as(s"__syy_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      val n = col(s"__n_$i").cast("double")
      val cov = n * col(s"__sxy_$i") - col(s"__sx_$i") * col(s"__sy_$i")
      val vx = n * col(s"__sxx_$i") - col(s"__sx_$i") * col(s"__sx_$i")
      val vy = n * col(s"__syy_$i") - col(s"__sy_$i") * col(s"__sy_$i")
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_$i").as("n"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Double-moment arm of [[correlations]] — identical plan shape (one
   *  scan, partial/final hash agg of 6 moments per pair), primitive
   *  double sums in place of decimal. Kept private; reach it through
   *  `correlations(df, cols, exact = false)`. */
  private def correlationsDouble(
      df: DataFrame,
      cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val bothPresent = col(a).isNotNull && col(b).isNotNull
      val x = when(bothPresent, col(a)).cast("double")
      val y = when(bothPresent, col(b)).cast("double")
      Seq(
        count(when(bothPresent, lit(1))).as(s"__n_$i"),
        sum(x).as(s"__sx_$i"),
        sum(y).as(s"__sy_$i"),
        sum(x * y).as(s"__sxy_$i"),
        sum(x * x).as(s"__sxx_$i"),
        sum(y * y).as(s"__syy_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      val n = col(s"__n_$i").cast("double")
      val cov = n * col(s"__sxy_$i") - col(s"__sx_$i") * col(s"__sy_$i")
      val vx = n * col(s"__sxx_$i") - col(s"__sx_$i") * col(s"__sx_$i")
      val vy = n * col(s"__syy_$i") - col(s"__sy_$i") * col(s"__sy_$i")
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_$i").as("n"),
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
    // nulls are dropped (P2's metric, and the pattern every other drift
    // score here follows) — a NULL category kept in both slices would
    // split into TWO phantom rows, because an equi full-outer join never
    // matches null keys, inflating K and reporting drift that isn't there
    val p = before.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_before"))
    val q = after.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
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

  /** PSI drift from persisted [[LogSketch]] quantile states — the
   *  monitoring op the slice-state store unlocks: compare ANY two
   *  recorded slices (yesterday vs today, last week vs this week)
   *  WITHOUT rescanning a byte of data. The sketch's fixed log-scale
   *  (lane, bucket) cells play the role of [[numericDrift]]'s
   *  equal-width bins — and being data-independent they need no
   *  combined-range pass, so two corpora profiled on different days by
   *  different jobs still drift-compare cell-for-cell. Same add-one
   *  smoothing over occupied cells and nano-quantized summation as the
   *  other drift scores (order-independent, engine-portable). Inputs
   *  may be merged or raw multi-slice state frames for ONE column. */
  def driftFromStates(stBefore: DataFrame, stAfter: DataFrame): DataFrame = {
    def cells(df: DataFrame, n: String) = df
      .groupBy("lane", "bucket").agg(sum("cnt").as(n))
    val joined = cells(stBefore, "n_before")
      .join(cells(stAfter, "n_after"), Seq("lane", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
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
        count(lit(1)).as("n_cells"),
        round(sum(nano((col("__p") - col("__q")) * log(col("__p") / col("__q"))))
          .cast("double") / 1e9, 6).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between two slices of a
   *  numeric column: D = max over values v of |F_before(v) − F_after(v)|
   *  (exact, not binned — the classic distribution-shift test that, unlike
   *  PSI, needs no bin tuning).
   *
   *  Scale shape: rows collapse to DISTINCT-value counts with map-side
   *  combine (one shuffle of (value, 2 longs)); the exact prefix sums the
   *  ECDFs need are computed with a two-level scan — equal-width range
   *  buckets over the distinct values, per-bucket subtotals rolled into
   *  bucket offsets (one ≤`buckets`-row single-partition window), then a
   *  per-bucket ordered window adds the offset. No global sort, no
   *  single-partition pass over the data: intra-bucket windows run in
   *  parallel, so the plan survives a 100× scale-up as long as distinct
   *  values spread over the range (ties all collapse into one row each).
   *
   *  Exactness: every ECDF value is a ratio of exact integer counts; the
   *  max of |double − double| is order-independent, so the 6-dp round is
   *  pure presentation. */
  def ksDrift(
      before: DataFrame,
      after: DataFrame,
      valCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "need at least one range bucket")
    val tagged = before.select(col(valCol).cast("double").as("__v"))
      .withColumn("__after", lit(false))
      .unionAll(after.select(col(valCol).cast("double").as("__v"))
        .withColumn("__after", lit(true)))
      .filter(col("__v").isNotNull)
    val g = tagged.groupBy("__v").agg(
      sum(when(!col("__after"), 1L).otherwise(0L)).as("__cb"),
      sum(when(col("__after"), 1L).otherwise(0L)).as("__ca"))
    val totals = g.agg(
      min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      sum(col("__cb")).as("__nb"), sum(col("__ca")).as("__na"),
      count(lit(1)).as("__nv"))
    val bucketed = g.crossJoin(broadcast(totals))
      .withColumn("__bucket",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("__v") - col("__mn"))
              / ((col("__mx") - col("__mn")) / buckets)).cast("int"))))
    // bucket offsets: subtotal per bucket, then an exclusive prefix sum
    // computed as a broadcast self-join over the ≤`buckets`-row summary
    // (O(buckets²) pairs of a tiny frame — no single-partition window,
    // no WindowExec move-everything warning, stays parallel)
    val sub = bucketed.groupBy("__bucket")
      .agg(sum(col("__cb")).as("__bb"), sum(col("__ca")).as("__ba"))
    val offsets = sub
      .join(broadcast(sub.select(col("__bucket").as("__pb"),
        col("__bb").as("__pbb"), col("__ba").as("__pba"))),
        col("__pb") < col("__bucket"), "left")
      .groupBy("__bucket")
      .agg(coalesce(sum(col("__pbb")), lit(0L)).as("__ob"),
        coalesce(sum(col("__pba")), lit(0L)).as("__oa"))
    val inW = Window.partitionBy(col("__bucket")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__fb", sum(col("__cb")).over(inW) + col("__ob"))
      .withColumn("__fa", sum(col("__ca")).over(inW) + col("__oa"))
      .agg(
        max(col("__nb")).as("n_before"),
        max(col("__na")).as("n_after"),
        max(col("__nv")).as("n_values"),
        round(max(abs(
          col("__fb").cast("double") / col("__nb")
            - col("__fa").cast("double") / col("__na"))), 6).as("ks"))
  }

  /** Mutual information, chi-square and Cramér's V between two
   *  categorical columns — the feature-association profile (which
   *  metadata columns predict each other; what a stratified sampler
   *  should stratify on). Null pairs are dropped (pairwise deletion).
   *
   *  Scale shape: ONE map-side-combined groupBy collapses rows to
   *  (a, b) cells; everything after runs on the ≤K_a×K_b cell frame
   *  (marginals as windows over the cells, then one tiny aggregate).
   *  Zero-count cells contribute only their expected count to χ², so
   *  Σ_zero E = n − Σ_observed E closes the sum without materializing
   *  the full cross product.
   *
   *  Exactness: every ln/ratio operand is a ratio of exact integer
   *  counts (counts cast to double before multiplying — no i64
   *  overflow at any scale); per-cell terms are nano-quantized before
   *  summing (order-independent, engine-portable); Cramér's V is
   *  derived from the already-rounded χ² so engines agree bit-for-bit. */
  def mutualInformation(
      df: DataFrame,
      colA: String,
      colB: String,
      maxCells: Long = 1L << 22): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__nab"))
    // grand total + cardinality guard as a broadcast 1-row frame, not a
    // global window (an empty partition spec moves the whole cell frame
    // to one partition AND logs the WindowExec warning; the duplicated
    // aggregate here shares the cells shuffle via exchange reuse).
    // assert_true fires if two high-cardinality columns blow the cell
    // frame past maxCells — MI over such a pair is meaningless anyway
    // (every cell count ≈ 1) and the plan would otherwise grind through
    // a K_a×K_b explosion silently.
    val stats = cells.agg(
      sum(col("__nab")).as("__n"), count(lit(1)).as("__ncells"))
    val withMargins = cells
      .crossJoin(broadcast(stats))
      .where(coalesce(
        assert_true(col("__ncells") <= maxCells,
          lit(s"mutualInformation: cell frame exceeds maxCells=$maxCells; " +
            "bucket or cap the category cardinality first")).cast("boolean"),
        lit(true)))
      .withColumn("__na", sum(col("__nab")).over(Window.partitionBy(col("__a"))))
      .withColumn("__nb", sum(col("__nab")).over(Window.partitionBy(col("__b"))))
    def nano(c: Column): Column = round(c * 1e9, 0).cast("long")
    val nab = col("__nab").cast("double")
    val e = col("__na").cast("double") * col("__nb") / col("__n")
    val agg = withMargins.agg(
      max(col("__n")).as("n"),
      count(lit(1)).as("n_cells"),
      countDistinct(col("__a")).as("ka"),
      countDistinct(col("__b")).as("kb"),
      sum(nano((nab / col("__n"))
        * log(nab * col("__n") / (col("__na").cast("double") * col("__nb")))))
        .as("__mi_nano"),
      sum(nano((nab - e) * (nab - e) / e)).as("__chi_nano"),
      sum(nano(e)).as("__e_nano"))
    agg
      .withColumn("mi", round(col("__mi_nano").cast("double") / 1e9, 6))
      .withColumn("chi2", round(
        col("__chi_nano").cast("double") / 1e9 + col("n").cast("double")
          - col("__e_nano").cast("double") / 1e9, 6))
      .withColumn("cramers_v",
        when(least(col("ka"), col("kb")) > 1,
          round(sqrt(col("chi2")
            / (col("n").cast("double") * (least(col("ka"), col("kb")) - 1))), 6))
          .otherwise(lit(null).cast("double")))
      .select("n", "n_cells", "ka", "kb", "mi", "chi2", "cramers_v")
  }

  /** Per-category before/after frequency table (unsmoothed, exact). */
  def categoryFrequencies(
      before: DataFrame,
      after: DataFrame,
      catCol: String): DataFrame = {
    // nulls dropped for the same reason as categoricalDrift: the
    // full-outer equi-join would split one null category into two rows
    val p = before.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_before"))
    val q = after.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_after"))
    p.join(q, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
  }

  /** Shannon entropy (nats) of a categorical column — the skew/id-ness
   *  profile signal: ~0 for a near-constant column, ln(k) for uniform
   *  over k values, high for id-like columns. One map-side-combined
   *  groupBy to value counts; the Σ p·ln p folds over that frame with
   *  integer MICRO-nat quantization so the sum is exact and
   *  order-independent across engines. Micro (not nano) keeps the
   *  accumulator in Long range: Σ c·ln c ≤ N·ln N, so the 1e6 scale is
   *  safe to N ≈ 3×10¹¹ rows (nano overflowed past ~4×10⁸ rows in ONE
   *  category). Nulls are excluded (their share is P2's metric). */
  def entropy(
      df: DataFrame,
      catCol: String): DataFrame = {
    val counts = df
      .filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .agg(
        count(lit(1)).as("distinct_values"),
        sum(col("cnt")).as("__n"),
        sum(round(-(col("cnt") * log(col("cnt"))) * 1e6, 0).cast("long"))
          .as("__num"))
      .select(
        col("distinct_values"),
        col("__n").as("n_rows"),
        // H = ln n − (Σ c·ln c)/n, algebraically = −Σ p·ln p
        round(log(col("__n")) +
          col("__num").cast("double") / 1e6 / col("__n"), 6).as("entropy"))
  }

  /** Percentile-rank lookup table for a numeric column — the
   *  quantile-normalization primitive (map scores onto [0,1] by rank,
   *  robust to arbitrary distributions). SQL's
   *  `percent_rank() OVER (ORDER BY v)` is a single-partition sort of
   *  EVERY ROW — a scale-killer; this computes the identical statistic
   *  from value COUNTS instead: one shuffle collapses rows to distinct
   *  values, and the cumulative counts come from range-bucketed prefix
   *  sums (the p31 KS pattern), so even a continuous column with ~all
   *  rows distinct never sorts in one task — the only single-partition
   *  step is the O(`buckets`) offset summary.
   *  percentile_rank = (#values below) / (n − 1), the
   *  min-rank tie convention — exactly `percent_rank`. Join the result
   *  back (broadcast when cardinality is small) to annotate rows. */
  def percentileRanks(
      df: DataFrame,
      valueCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "need at least one range bucket")
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("value"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      min(col("value")).as("__mn"), max(col("value")).as("__mx"),
      sum(col("cnt")).as("__n"))
    // distributed prefix sums (the p31 KS pattern): range-bucket the
    // distinct values, prefix-sum the ≤`buckets`-row bucket summary
    // (the only single-partition step, O(buckets)), then cumulate
    // WITHIN each bucket in parallel — no global sort of the values
    val bucketed = counts.crossJoin(broadcast(totals))
      .withColumn("__bucket",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("value") - col("__mn"))
              / ((col("__mx") - col("__mn")) / buckets)).cast("int"))))
    // exclusive prefix per bucket via broadcast self-join over the
    // ≤`buckets`-row summary (the p31 pattern: no single-partition
    // window, no WindowExec warning, O(buckets²) tiny pairs)
    val sub = bucketed.groupBy("__bucket")
      .agg(sum(col("cnt")).as("__bc"))
    val offsets = sub
      .join(broadcast(sub.select(col("__bucket").as("__pb"),
        col("__bc").as("__pbc"))),
        col("__pb") < col("__bucket"), "left")
      .groupBy("__bucket")
      .agg(coalesce(sum(col("__pbc")), lit(0L)).as("__off"))
    val inW = Window.partitionBy(col("__bucket")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__lt",
        coalesce(sum(col("cnt")).over(inW), lit(0L)) + col("__off"))
      .withColumn("percentile_rank",
        when(col("__n") === 1L, 0.0)
          .otherwise(round(col("__lt").cast("double")
            / (col("__n") - 1L), 6)))
      .select(col("value"), col("cnt"), col("percentile_rank"))
  }
}
