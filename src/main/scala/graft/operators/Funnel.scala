package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-log funnel and cohort-retention analytics — the two classic
 * product-analytics rollups over an append-only event stream, expressed
 * so the heavy lifting is ONE user-keyed shuffle each.
 *
 * Funnel semantics (loose ordering): a user reaches step i at the
 * EARLIEST event of type steps(i) at-or-after their step i−1 time —
 * the standard "did view, then later click, then later purchase"
 * conversion chain. Order within the chain matters; unrelated events
 * between steps are ignored.
 *
 * Scale shape: one groupBy(user) collects a per-step SORTED timestamp
 * array (bounded by the user's own activity, never the corpus); the
 * chained step times are pure array expressions (array_min over a
 * filtered array), and the k-row summary falls out of a tiny explode.
 * No self-joins, no window over the full log, no driver loops.
 */
object Funnel {

  /** Per-step funnel summary: (step_idx, step, users, conversion) where
   *  `conversion` is users ÷ step-1 users, 6 dp. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val aggs = steps.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(col(typeCol) === s, col(tsCol))))
        .as(s"__a$i")
    }
    val perUser = events.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    // chain the step times: t0 = first step-0 event; t_i = earliest
    // step-i event at-or-after t_{i-1} (get() is OOB-null, ANSI-safe)
    val withT = steps.indices.foldLeft(perUser) { (df, i) =>
      val ti =
        if (i == 0) get(col("__a0"), lit(0))
        else array_min(filter(col(s"__a$i"), x => x >= col(s"__t${i - 1}")))
      df.withColumn(s"__t$i", ti)
    }
    val stepRows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
        when(col(s"__t$i").isNotNull, 1L).otherwise(0L).as("__reached"))
    }
    val counts = withT
      .select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.*"))
      .groupBy("step_idx", "step")
      .agg(sum(col("__reached")).as("users"))
    // conversion vs step 1 — 1-row broadcast of the first step's count
    // instead of an unpartitioned window over the k-row summary (empty
    // partition spec logs the WindowExec warning; min_by picks the
    // users count at the smallest step_idx)
    val firstStep = counts.agg(
      min_by(col("users"), col("step_idx")).as("__first"))
    counts.crossJoin(broadcast(firstStep))
      .withColumn("conversion",
        when(col("__first") > 0,
          round(col("users").cast("double") / col("__first"), 6))
          .otherwise(lit(null).cast("double")))
      .drop("__first")
  }

  /** Cohort retention: users cohorted by first-seen DATE; one row per
   *  (cohort_date, day_offset ≤ maxDays) with the distinct users active
   *  that day. Two user-keyed shuffles (first-seen aggregate + join back
   *  — co-partitioned on the same key) and one cohort-cell aggregate. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxDays: Int = 30): DataFrame = {
    require(maxDays >= 0, "maxDays must be non-negative")
    val firstSeen = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    events
      .select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(firstSeen, Seq(userCol))
      .withColumn("day_offset", datediff(col("__d"), col("cohort_date")))
      .filter(col("day_offset") <= maxDays)
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** First/last-touch conversion attribution: for every conversion
   *  event (type == `conversionType`), the user's FIRST and LAST
   *  preceding non-conversion events name the credited channels, and
   *  the conversion's value is attributed to each under the two
   *  classic single-touch models. Conversions with no preceding touch
   *  credit the `(direct)` sentinel — losing them would overstate
   *  every channel's share.
   *
   *  Output: one row per channel with
   *  (channel, first_touch_conversions, first_touch_value,
   *  last_touch_conversions, last_touch_value) — the side-by-side
   *  frame a mixture/spend decision actually reads, because the two
   *  models disagreeing IS the signal (a channel strong on last-touch
   *  but absent on first-touch closes deals it never opens).
   *
   *  Scale shape: ONE user-keyed shuffle (the window sort); both
   *  touches come from the same running `first/last(..., ignoreNulls)`
   *  frame over rows [unbounded, -1], so the log is scanned once and
   *  never self-joined. The two models roll up in ONE conditional
   *  aggregation over a 2-way explode of the conversions-only frame —
   *  not two groupBys over the windowed frame, which would recompute
   *  the window per consumer. Ordering ties break on `eventIdCol` so
   *  the assignment is total and engine-independent. */
  def touchAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value",
      eventIdCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(eventIdCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= conversionType, col(typeCol))
    events
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(explode(array(
        struct(lit("first").as("model"),
          coalesce(col("__first"), lit("(direct)")).as("channel"),
          col(valueCol).cast("decimal(28,6)").as("v")),
        struct(lit("last").as("model"),
          coalesce(col("__last"), lit("(direct)")).as("channel"),
          col(valueCol).cast("decimal(28,6)").as("v")))).as("r"))
      .select(col("r.*"))
      .groupBy(col("channel"))
      .agg(
        sum(when(col("model") === "first", 1L).otherwise(0L))
          .as("first_touch_conversions"),
        // exact, order-independent money math: DECIMAL(28,6) partials,
        // one double conversion at the very end
        sum(when(col("model") === "first", col("v"))
          .otherwise(lit(0).cast("decimal(28,6)"))).cast("double")
          .as("first_touch_value"),
        sum(when(col("model") === "last", 1L).otherwise(0L))
          .as("last_touch_conversions"),
        sum(when(col("model") === "last", col("v"))
          .otherwise(lit(0).cast("decimal(28,6)"))).cast("double")
          .as("last_touch_value"))
  }

  /** Time-to-convert distribution per first-touch channel — the
   *  latency half of the attribution story ([[touchAttribution]] says
   *  WHO gets credit; this says HOW LONG that channel takes to close):
   *  for each conversion with at least one prior touch, the lag from
   *  the journey's FIRST touch to the conversion, rolled up per
   *  first-touch channel as (n, min, exact interpolated median and
   *  p90, max). Lags are integer MICROSECONDS (exact cross-engine
   *  arithmetic; the percentile interpolation is the only double).
   *  Direct conversions have no journey start and are excluded by
   *  definition. Same single user-keyed window pass as
   *  [[touchAttribution]] — one shuffle, no self-join. */
  def conversionLag(
      events: DataFrame,
      conversionType: String = "purchase",
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      eventIdCol: String = "event_id"): DataFrame = {
    val typeC = typeCol
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(eventIdCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchType = when(col(typeC) =!= conversionType, col(typeC))
    val touchTs = when(col(typeC) =!= conversionType, col(tsCol))
    events
      .withColumn("__fch", first(touchType, ignoreNulls = true).over(w))
      .withColumn("__fts", first(touchTs, ignoreNulls = true).over(w))
      .filter(col(typeC) === conversionType && col("__fch").isNotNull)
      .select(col("__fch").as("channel"),
        (unix_micros(col(tsCol)) - unix_micros(col("__fts")))
          .as("__lag_us"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        min(col("__lag_us")).as("min_lag_us"),
        // integer-µs inputs make the interpolated quantile a multiple
        // of 0.1 µs; rounding to 1 dp leaves a 0.05 margin that
        // swallows the ~1 ulp (±6e-4 at month-scale lags) difference
        // between engines' interpolation formulas — at 6 dp that ulp
        // IS the rounding step and cross-engine equality breaks
        round(expr("percentile(__lag_us, 0.5)"), 1).as("median_lag_us"),
        round(expr("percentile(__lag_us, 0.9)"), 1).as("p90_lag_us"),
        max(col("__lag_us")).as("max_lag_us"))
  }

  /** Event volume rollup: counts and value sums by (type, day) PLUS
   *  per-type subtotals and the grand total, in ONE job — Spark's
   *  native `rollup` expands every row to its grouping sets before the
   *  same partial/final hash aggregation a flat groupBy uses, so the
   *  dashboard's three granularities cost one shuffle instead of three
   *  queries. Subtotal rows carry NULL in the rolled-up columns plus
   *  explicit `grouping(...)` flags (`type_total`, `day_total`), so a
   *  genuine NULL data value is never confused with a subtotal row. */
  def eventVolumeRollup(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      .select(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"),
        col(valueCol).cast("double").as("__v"))
      .rollup(col("event_type"), col("day"))
      .agg(
        grouping(col("event_type")).cast("int").as("type_total"),
        grouping(col("day")).cast("int").as("day_total"),
        count(lit(1)).as("events"),
        round(sum(col("__v")), 6).as("value_sum"))

  /** First-order event-type transition matrix — P(next type | type)
   *  per user journey, the Markov view of the event stream that
   *  funnels (fixed step order) and sessionization (gap splitting)
   *  don't give: which states actually feed which. Consecutive pairs
   *  come from ONE user-keyed lead window ordered (ts, event id) —
   *  the x103 tie-break — then a types²-sized aggregate;
   *  probabilities are integer ppm by floor division. */
  def eventTransitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    // the transition-count frame feeds the row totals AND the final
    // join: cut lineage so the events window runs once (types²-sized)
    val tr = events.filter(col(userCol).isNotNull)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = tr.groupBy("from_type").agg(sum(col("n")).as("__tot"))
    tr.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div __tot").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  /** RFM segmentation (recency / frequency / monetary quartiles) — the
   *  classic customer-value grid: per user, days since last purchase
   *  (vs the latest purchase date in the log), purchase count, and
   *  exact-decimal spend; each metric bucketed 1–4 by its own exact
   *  interpolated quartile edges. Segment ids are raw quartile indexes
   *  (1 = lowest metric VALUE — note for recency that means MOST
   *  recent); the output is the segment-grid rollup.
   *
   *  Determinism: quartile edges round to 6 dp BEFORE the bucket
   *  compare (the p45 clamp-bound move) so the boundary user set is
   *  engine-exact; money rides decimal(28,6) sums. Scale shape: one
   *  user-keyed aggregate, a 1-row anchor + 1-row edge frame
   *  broadcast, one segment-keyed rollup; the user frame is
   *  lineage-cut because the edge aggregate and the bucket assignment
   *  both consume it. */
  def rfmSegments(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value",
      purchaseType: String = "purchase"): DataFrame = {
    val p = events.filter(col(typeCol) === purchaseType
      && col(userCol).isNotNull)
    val anchor = p.agg(max(to_date(col(tsCol))).as("__anchor"))
    val users = p.groupBy(col(userCol))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(28,6)")).as("__money"))
      .crossJoin(broadcast(anchor))
      .select(col(userCol),
        datediff(col("__anchor"), col("__last")).cast("long")
          .as("recency_days"),
        col("frequency"),
        col("__money").cast("double").as("monetary"))
      .localCheckpoint()
    def q(c: String, f: Double, as: String): Column =
      round(expr(s"percentile(cast($c as double), $f)"), 6).as(as)
    val edges = users.agg(
      q("recency_days", 0.25, "r1"), q("recency_days", 0.5, "r2"),
      q("recency_days", 0.75, "r3"),
      q("frequency", 0.25, "f1"), q("frequency", 0.5, "f2"),
      q("frequency", 0.75, "f3"),
      q("monetary", 0.25, "m1"), q("monetary", 0.5, "m2"),
      q("monetary", 0.75, "m3"))
    def seg(c: String, e: String): Column =
      lit(1) + (col(c).cast("double") > col(s"${e}1")).cast("int") +
        (col(c).cast("double") > col(s"${e}2")).cast("int") +
        (col(c).cast("double") > col(s"${e}3")).cast("int")
    users.crossJoin(broadcast(edges))
      .select(seg("recency_days", "r").as("r_seg"),
        seg("frequency", "f").as("f_seg"),
        seg("monetary", "m").as("m_seg"),
        col("monetary"))
      .groupBy("r_seg", "f_seg", "m_seg")
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary").cast("decimal(28,6)")).cast("double")
          .as("total_monetary"))
      .orderBy("r_seg", "f_seg", "m_seg")
  }
}
