package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable quantile sketch with fixed logarithmic bucket boundaries —
 * the DDSketch design (Masson, Rim & Lee, "DDSketch: a fast and
 * fully-mergeable quantile sketch with relative-error guarantees",
 * VLDB 2019): a value x > 0 lands in bucket ceil(log_γ x) with
 * γ = (1+α)/(1−α), so reporting the bucket midpoint 2γ^k/(γ+1) is
 * within relative error α of every value the bucket holds. Negative
 * values mirror into a negative lane on |x|; zeros get their own lane.
 *
 * Why this sketch (and not GK / t-digest) for the incremental-profile
 * family: the bucket boundaries depend only on α — never on the data —
 * so a slice's state is a plain (lane, bucket) → count histogram.
 * Merging is count addition: ORDER-INDEPENDENT, DETERMINISTIC, and
 * exact (merging slice sketches equals sketching the concatenation,
 * bucket for bucket). GK summaries are not mergeable; t-digest merges
 * depend on merge order, which a distributed shuffle does not fix.
 * That makes this the quantile column [[IncrementalProfile]] could not
 * carry: min/max/sum/HLL merge losslessly, and now p50/p90/p99 travel
 * the same way — profile each day's partition once, answer "p99 over
 * any date range" from tiny persisted states with no rescan.
 *
 * Size: bucket count is O(log(max/min)/α) per lane — a few hundred
 * rows at α = 0.01 across any realistic numeric range — so the merge
 * and the quantile walk are metadata-scale no matter how big the data
 * was. The reference recomputes its medians from scratch per profile
 * run (reference backend metrics collector, exact percentile per
 * poll); this is the Spark-first replacement at 100 TB.
 */
object LogSketch {

  /** γ for a relative-accuracy target α ∈ (0, 1). */
  def gamma(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    (1 + alpha) / (1 - alpha)
  }

  /** Sign lane of a value: 1 positive, −1 negative, 0 zero. */
  def laneExpr(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v > 0, 1).when(v < 0, -1).otherwise(0)

  /** Log-bucket index ⌈log_γ |v|⌉ (0 for the zero lane). Branch values
   *  only evaluate when their condition holds (CaseWhen short-circuits
   *  in codegen), so log never sees a non-positive argument. */
  def bucketExpr(
      v: org.apache.spark.sql.Column,
      alpha: Double): org.apache.spark.sql.Column = {
    val lg = math.log(gamma(alpha))
    when(v > 0, ceil(log(v) / lit(lg)).cast("long"))
      .when(v < 0, ceil(log(-v) / lit(lg)).cast("long"))
      .otherwise(lit(0L))
  }

  /** One pass over a slice → its sketch state: one row per occupied
   *  (lane, bucket) cell, `(slice_id, column, lane, bucket, cnt)`.
   *  lane −1 holds negatives (bucketed on |x|), 0 holds zeros, 1 holds
   *  positives. NULLs are excluded (count them in the profile battery,
   *  not the quantile state). A single groupBy — partial aggregation
   *  collapses each partition to its occupied cells before the (tiny)
   *  shuffle, so the pass is scan-dominated at any scale. */
  def sliceState(
      df: DataFrame,
      column: String,
      alpha: Double,
      sliceId: String): DataFrame = {
    val v = col(column).cast("double")
    df.where(v.isNotNull)
      .groupBy(laneExpr(v).as("lane"), bucketExpr(v, alpha).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit(sliceId).as("slice_id"), lit(column).as("column"),
        col("lane"), col("bucket"), col("cnt"))
  }

  /** Merge any number of slice states (metadata-only count addition —
   *  exactly equals sketching the concatenated data). */
  def merge(states: DataFrame): DataFrame =
    states.groupBy("column", "lane", "bucket")
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a merged sketch: for each q, the midpoint
   *  of the bucket holding the rank-⌈q·n⌉ value (ranks over the global
   *  value order: negatives by descending magnitude, zeros, positives
   *  ascending). Guarantee: within relative error α of that value.
   *
   *  The cumulative walk is a window over the sketch rows — bounded by
   *  the bucket count (hundreds), never the data, so the per-column
   *  single partition is deliberate, not a scale hazard. */
  def quantiles(
      merged: DataFrame,
      alpha: Double,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val g = gamma(alpha)
    val spark = merged.sparkSession
    import spark.implicits._
    // value order across lanes: lane asc; within lane −1 magnitude
    // desc (= most negative first), within lane 1 bucket asc
    val pos = when(col("lane") === -1, -col("bucket"))
      .otherwise(col("bucket"))
    val w = Window.partitionBy("column")
      .orderBy(col("lane").asc, pos.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n via an unbounded window over the SAME frame, not a second
    // aggregation of `merged` — one subtree, so an inline-built sketch
    // isn't derived twice
    val wAll = Window.partitionBy("column")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = merged.withColumn("__cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(wAll))
    val qdf = qs.toDF("q")
    val mid = lit(2.0) * pow(lit(g), col("bucket")) / lit(g + 1)
    cum
      .crossJoin(broadcast(qdf))
      .withColumn("__r",
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
      .where(col("__cum") >= col("__r") &&
        col("__cum") - col("cnt") < col("__r"))
      .select(col("column"), col("q"),
        when(col("lane") === 0, lit(0.0))
          .otherwise(col("lane").cast("double") * mid).as("estimate"),
        col("n"))
  }
}
