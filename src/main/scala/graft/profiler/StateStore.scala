package graft.profiler

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted slice-state store — the three mergeable profiling families
 * ([[IncrementalProfile]] count/sum/min/max/HLL, [[LogSketch]]
 * quantiles, [[MergeableTopK]] heavy hitters) behind one durable
 * layout:
 *
 *   basePath/profile/slice_id=<id>/    one state row per column
 *   basePath/quantiles/slice_id=<id>/  one row per (column, lane, bucket)
 *   basePath/topk/slice_id=<id>/       one row per candidate value
 *
 * `record` profiles a slice ONCE (its data is never read again);
 * every read API merges the tiny persisted states for an arbitrary
 * subset of slices. This is the 100 TB replacement for the
 * reference's poll-and-rescan profile loop (reference backend
 * profile_engine re-collects every metric per run): a year of daily
 * slices is 365 small state files per family, any date range answers
 * in a metadata-scale aggregation, and `slice_id` partitioning means
 * range reads PRUNE at the file level — the scan never touches
 * unselected slices.
 */
class SliceStateStore(spark: SparkSession, basePath: String) {

  private def lane(name: String) = s"$basePath/$name"

  /** Profile one slice into all three state families. One scan per
   *  family (they aggregate to different grains); each output is O(k)
   *  / O(columns) / O(log range / α) rows. Re-recording a slice id
   *  overwrites just that partition. */
  def record(
      df: DataFrame,
      sliceId: String,
      quantileCols: Seq[String] = Nil,
      alpha: Double = 0.01,
      topKCol: Option[String] = None,
      k: Int = 100): Unit = {
    val dyn = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(dyn)
    spark.conf.set(dyn, "dynamic")
    try {
      // the three family writes are independent actions on DISJOINT
      // paths (profile/quantiles/topk — never the same committer
      // _temporary), so they run CONCURRENTLY and the record costs one
      // wall-clock write, not three (optimization guide §2.6: overlap
      // independent jobs; r19 — one slice record was three sequential
      // scan+aggregate+commit round-trips)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes = Seq(
        Some(() => IncrementalProfile.sliceState(df, sliceId)
          .write.mode("overwrite").partitionBy("slice_id")
          .parquet(lane("profile"))),
        if (quantileCols.isEmpty) None
        else Some(() =>
          quantileCols.map(c => LogSketch.sliceState(df, c, alpha, sliceId))
            .reduce(_ unionByName _)
            .write.mode("overwrite").partitionBy("slice_id")
            .parquet(lane("quantiles"))),
        topKCol.map(c => () =>
          MergeableTopK.sliceState(df, c, k, sliceId)
            .write.mode("overwrite").partitionBy("slice_id")
            .parquet(lane("topk")))).flatten
      Await.result(
        Future.sequence(writes.map(w => Future(w()))), Duration.Inf)
    } finally spark.conf.set(dyn, prev)
  }

  private def read(name: String, slices: Seq[String]): DataFrame = {
    val df = spark.read.parquet(lane(name))
    // isin on the partition column → partition-pruned read (the plan's
    // PartitionFilters carry it; unselected slice files are never
    // listed into the scan)
    if (slices.isEmpty) df else df.filter(col("slice_id").isin(slices: _*))
  }

  /** Merged per-column profile over the given slices (all if empty). */
  def profile(slices: Seq[String] = Nil): DataFrame =
    IncrementalProfile.merge(read("profile", slices))

  /** Quantile estimates over the given slices for one column. */
  def quantiles(
      column: String,
      qs: Seq[Double],
      alpha: Double = 0.01,
      slices: Seq[String] = Nil): DataFrame =
    LogSketch.quantiles(
      LogSketch.merge(
        read("quantiles", slices).filter(col("column") === column)),
      alpha, qs)

  /** Heavy-hitter brackets over the given slices. `k` must match the
   *  capacity used at record time (it defines the state's semantics). */
  def topK(k: Int = 100, slices: Seq[String] = Nil): DataFrame =
    MergeableTopK.merge(read("topk", slices), k)
}
