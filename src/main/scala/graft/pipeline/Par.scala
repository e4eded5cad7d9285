package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec, RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

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
    val planned =
      try plannedPartitions(df)
      catch { case scala.util.control.NonFatal(_) => Int.MaxValue }
    if (planned >= target) df else df.repartition(target)
  }

  /** The partition count `df` is planned to execute with — WITHOUT
   *  materializing anything. For a plan with no exchanges (the common
   *  spread input: a projected scan under a map chain), `.rdd` is pure
   *  planning and exact. For a plan AQE wraps (any exchange or
   *  subquery present), `.rdd` would MATERIALIZE every query stage —
   *  real broadcast/shuffle jobs at plan-construction time, all
   *  re-executed by the caller's later action (r18 ADVICE) — so the
   *  count is derived from the prepared-but-unexecuted initial plan
   *  instead:
   *    - any shuffle exchange in the plan → the width is already
   *      config/AQE-owned (spark.sql.shuffle.partitions + adaptive
   *      coalescing) → treat as "wide enough", pass through;
   *    - otherwise (scans + broadcast joins only) the streamed-side
   *      width is a leaf scan's width → the max over leaf scan
   *      partition counts (broadcast-side leaves can only OVERestimate,
   *      which degrades to the safe no-op). Leaf kinds we cannot size
   *      (cache scans, v2 sources) degrade to no-op the same way. */
  private def plannedPartitions(df: DataFrame): Int = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        val init = a.initialPlan
        val shuffles = init.collect { case s: ShuffleExchangeLike => s }
        if (shuffles.nonEmpty) Int.MaxValue
        else {
          val leafCounts = init.collectLeaves().map(leafPartitions(_, cores))
          if (leafCounts.isEmpty) Int.MaxValue else leafCounts.max
        }
      case _ =>
        // no exchange / no subquery: .rdd only plans (no job)
        df.rdd.getNumPartitions
    }
  }

  /** Micro-batch width for the bounded stream gates ([[spread]]'s
   *  streaming twin — a streaming frame cannot be probed, so the width
   *  must be declared up front). Derivation, not a constant:
   *  `min(defaultParallelism, 8)` — the single-file bounded sources
   *  yield ONE input partition, so the gate's expression battery needs
   *  an explicit widen, but past ~8 partitions the per-batch exchange
   *  and state-store setup cost more than the battery saves (the same
   *  r7-measured knee `runBoundedStream` caps shuffle partitions at).
   *  Sessions with fewer cores never get an oversized exchange. A
   *  production stream overrides via `spark.graft.stream.gate.width`
   *  (e.g. its real source partition count) — the registry gates are
   *  bounded fixtures, but the knob keeps the width config-owned at
   *  scale instead of baked in. */
  def streamGateWidth(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.stream.gate.width")
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(math.min(spark.sparkContext.defaultParallelism, 8))

  private def leafPartitions(leaf: SparkPlan, cores: Int): Int = leaf match {
    case f: FileSourceScanExec => f.inputRDD.getNumPartitions
    case r: RDDScanExec => r.rdd.getNumPartitions
    case l: LocalTableScanExec =>
      // parallelize()'s slicing: one slice per row up to the session cores
      math.max(1, math.min(l.rows.size, cores))
    case _ => Int.MaxValue // unknown leaf: assume wide (safe no-op)
  }
}
