package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Incremental (mergeable) profiling — the 100 TB upgrade over rescanning:
 * profile each data slice (a day's partition, a new file batch) ONCE into
 * a tiny mergeable state row per column, then combine states instead of
 * re-reading data. Additive stats (count/nulls/sum) add, min/max take
 * extrema, and distinct counts merge losslessly through DataSketches HLL
 * union (`hll_sketch_agg` / `hll_union_agg` — mergeable by construction,
 * unlike a finished COUNT(DISTINCT)). A year of daily states is 365 tiny
 * rows per column; the combined profile is a metadata-only aggregation.
 *
 * The reference recomputes its profile from scratch per run
 * (profile_engine polls the warehouse each time); this is the Spark-first
 * replacement for that loop at scale.
 */
object IncrementalProfile {

  /** Columns eligible for a state row (atomic types). */
  private def eligible(f: StructField): Boolean = f.dataType match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** One pass over a slice → one state row per column:
   *  (column, cnt, nulls, mn, mx, sm, sketch).
   *  min/max/sum are carried as doubles for numerics (null otherwise);
   *  the HLL sketch hashes the string form so every atomic type merges
   *  uniformly. All per-column aggregates run in a SINGLE df.agg —
   *  one scan per slice regardless of column count. */
  def sliceState(df: DataFrame, sliceId: String): DataFrame = {
    val cols = df.schema.fields.filter(eligible)
    require(cols.nonEmpty, "no profilable columns")
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      val num = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(c).as(s"${f.name}__cnt"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        (if (num) min(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${f.name}__mn"),
        (if (num) max(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${f.name}__mx"),
        (if (num) sum(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${f.name}__sm"),
        hll_sketch_agg(c.cast(StringType)).as(s"${f.name}__hll"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // melt the single wide row into one state row per column
    val perCol = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        col(s"${f.name}__cnt").as("cnt"),
        col(s"${f.name}__nulls").as("nulls"),
        col(s"${f.name}__mn").as("mn"),
        col(s"${f.name}__mx").as("mx"),
        col(s"${f.name}__sm").as("sm"),
        col(s"${f.name}__hll").as("hll"))
    }
    row
      .select(explode(array(perCol: _*)).as("s"))
      .select(lit(sliceId).as("slice_id"), col("s.*"))
  }

  /** Merge any number of slice states into a combined per-column profile:
   *  metadata-only aggregation over state rows (no data rescan).
   *  `distinct_estimate` comes from the unioned HLL sketches. */
  def merge(states: DataFrame): DataFrame =
    states
      .groupBy("column")
      .agg(
        sum("cnt").as("cnt"),
        sum("nulls").as("nulls"),
        min("mn").as("mn"),
        max("mx").as("mx"),
        sum("sm").as("sm"),
        hll_union_agg(col("hll")).as("hll"))
      .select(col("column"), col("cnt"), col("nulls"), col("mn"),
        col("mx"), col("sm"),
        hll_sketch_estimate(col("hll")).as("distinct_estimate"))
}

/**
 * Mergeable heavy hitters with DETERMINISTIC count bounds — the top-K
 * member of the mergeable-state family (count/sum/min/max/HLL merge in
 * [[IncrementalProfile]], quantiles in [[graft.profiler.LogSketch]]).
 *
 * Per slice s (n_s non-null rows, capacity k), the state keeps the
 * EXACT count of every value v with k·f_s(v) > n_s — at most k−1
 * values, so state is O(k) regardless of slice size. Merging is pure
 * arithmetic over state rows:
 *
 *   lower(v) = Σ f_s(v) over slices whose state has v
 *   upper(v) = lower(v) + Σ ⌊n_s/k⌋ over slices whose state lacks v
 *
 * Guarantees (pigeonhole over sums): every v with GLOBAL count
 * k·f(v) > n appears in at least one slice state, and the true count
 * always sits in [lower, upper]. Unlike Misra–Gries / SpaceSaving
 * summaries (whose merged counter values depend on merge order), every
 * number here is exact integer arithmetic — order-independent,
 * deterministic, and replayable in plain SQL, so the whole operator is
 * oracle-checkable. The price is the bound width (≤ slices·⌊n_s/k⌋
 * for a value missing everywhere) instead of MG's single-summary n/k —
 * the right trade for persisted per-partition states, where slices are
 * few (days) and k is small.
 */
object MergeableTopK {

  /** One pass over a slice → its heavy-hitter state: one row per
   *  candidate value, `(slice_id, value, cnt, n)` with n = the slice's
   *  non-null total (carried on every row so merge needs no side
   *  table). The candidate filter is the integer compare k·cnt > n —
   *  no float thresholds to diverge across engines. */
  def sliceState(
      df: DataFrame,
      column: String,
      k: Int,
      sliceId: String): DataFrame = {
    require(k > 1, "capacity k must be > 1")
    val counts = df.where(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("value"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum("cnt"), lit(0L)).as("n"))
    val cands = counts.crossJoin(broadcast(total))
      .where(col("cnt") * k > col("n"))
      .select(lit(sliceId).as("slice_id"), col("value"), col("cnt"),
        col("n"))
    // sentinel row (NULL value) carrying n even when the slice has no
    // candidates — without it an all-light slice would vanish from the
    // merge and its ⌊n/k⌋ miss mass would silently drop out of `upper`
    val sentinel = total.select(lit(sliceId).as("slice_id"),
      lit(null).cast(StringType).as("value"), lit(0L).as("cnt"), col("n"))
    cands.unionByName(sentinel)
  }

  /** Merge slice states → `(value, lower, upper, slices_present)`,
   *  descending by lower bound. Metadata-only: joins the candidate
   *  rows against the (broadcast, one-row-per-slice) totals frame. */
  def merge(states: DataFrame, k: Int): DataFrame = {
    require(k > 1, "capacity k must be > 1")
    val perSlice = states.select("slice_id", "n").distinct()
      .select(col("slice_id"), floor(col("n") / k).as("__miss"))
    val missTotal = perSlice.agg(sum("__miss").as("__miss_all"))
    states
      .where(col("value").isNotNull) // drop the per-slice sentinels
      .groupBy("value")
      .agg(
        sum("cnt").as("lower"),
        sum(floor(col("n") / k)).as("__miss_present"),
        count(lit(1)).as("slices_present"))
      .crossJoin(broadcast(missTotal))
      .select(col("value"), col("lower"),
        (col("lower") + col("__miss_all") - col("__miss_present"))
          .as("upper"),
        col("slices_present"))
      .orderBy(col("lower").desc, col("value"))
  }
}
