package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for compute-heavy map stages.
 *
 *  Parquet scans parallelize at ROW-GROUP granularity: a small input
 *  (one row group — every bench fixture is a single-row-group file)
 *  feeds exactly one non-empty scan task no matter how many cores the
 *  session has, so an expression-/UDF-heavy map chain above it runs
 *  serially while the other cores idle. [[spread]] repartitions ONLY
 *  when the planned input has fewer partitions than the session's
 *  default parallelism — at production scale (many row groups / many
 *  files) the input already carries >= cores partitions and this is a
 *  no-op, so no shuffle is ever added to a large input (optimization
 *  guide §2.4: remove shuffles outright; §2.2: derive partitioning
 *  from input size, never a constant). At small scale the added
 *  round-robin exchange moves only the projected columns of the
 *  compute stage (bench fixtures: well under 1 MB) and is reused
 *  across consumers of the same subtree by ReuseExchange.
 */
object Par {
  /** Repartition `df` up to the session's default parallelism iff its
   *  planned partition count is below it. Call on the projected input
   *  of an expensive per-row compute stage (signature UDFs, shingle
   *  explosions, regex batteries) — not on cheap scan-aggregate paths,
   *  where the exchange would cost more than the serial map. */
  def spread(df: DataFrame): DataFrame = {
    // streaming frames cannot be planned via .rdd; their micro-batch
    // parallelism is the stream's own concern — pass through unchanged
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // .rdd only plans (no job); pass through if the partition count
    // cannot be derived (exotic logical plans)
    val planned =
      try df.rdd.getNumPartitions
      catch { case _: Throwable => Int.MaxValue }
    if (planned >= target) df else df.repartition(target)
  }
}
