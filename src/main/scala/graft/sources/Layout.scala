package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Z-order data layout: multi-dimensional clustering for scan pruning.
 *
 * At 100 TB the win is not the query plan but the FILE LAYOUT: parquet
 * footers carry per-file min/max for every column, and a scan with a
 * predicate on any clustered dimension skips files whose range can't
 * match. Range-partitioning by a bit-interleaved Z-value gives every
 * file a narrow range on ALL interleaved dimensions at once (a plain
 * sort gives that for the leading column only), so point/range
 * predicates on either dimension prune most files.
 *
 * The kernel is a pure codegen'd expression (shifts + masks, no UDF):
 * bucket each dimension to `bits` bits, then interleave the bits. Real
 * layouts bucket by RANK (equal-frequency quantile boundaries — robust
 * to skew); the equal-width variant is deterministic from (min, max)
 * alone and engine-portable, which the correctness oracle exercises.
 */
object Layout {

  /** Interleave the low `bits` bits of two bucket ids: bit i of `a`
   *  lands at position 2i+1, bit i of `b` at 2i — the classic Morton
   *  code. Unrolled shift/mask expression, fully codegen'd. */
  def interleaveBits(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Equal-width bucket id in [0, 2^bits): deterministic from (lo, hi)
   *  alone, so any engine reproduces it. Values at/below lo → 0,
   *  at/above hi → 2^bits−1, nulls → 0. */
  def equalWidthBucket(c: Column, lo: Double, hi: Double,
      bits: Int = 8): Column = {
    val n = 1 << bits
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(lit(n - 1), greatest(lit(0),
      floor((coalesce(c.cast("double"), lit(lo)) - lo) / span * n)
        .cast("long")))
  }

  /** Equal-width Z-value over two numeric columns — the portable form:
   *  z = interleave(bucket(x), bucket(y)). */
  def zvalueEqualWidth(
      x: Column, loX: Double, hiX: Double,
      y: Column, loY: Double, hiY: Double,
      bits: Int = 8): Column =
    interleaveBits(
      equalWidthBucket(x, loX, hiX, bits),
      equalWidthBucket(y, loY, hiY, bits), bits)

  /** Rank-bucketed Z-value — the production form, robust to skew: each
   *  dimension is bucketed by its approximate quantile boundaries
   *  (one driver-small `approxQuantile` action; boundaries broadcast
   *  inside a binary-search expression via CASE chain is O(2^bits), so
   *  we use a compiled lookup UDF instead — map-only, no shuffle).
   *  Appends `zCol`. */
  def withZValue(
      df: DataFrame,
      colX: String,
      colY: String,
      bits: Int = 6,
      zCol: String = "__z",
      relativeError: Double = 0.001): DataFrame = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val Array(bx, by) = df.stat.approxQuantile(
      Array(colX, colY), probs, relativeError)
    def bucketUdf(bounds: Array[Double]) = udf { v: java.lang.Double =>
      if (v == null) 0L
      else {
        var lo = 0; var hi = bounds.length // rank via binary search
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (bounds(mid) <= v) lo = mid + 1 else hi = mid
        }
        lo.toLong
      }
    }
    df.withColumn(zCol, interleaveBits(
      bucketUdf(bx)(col(colX).cast("double")),
      bucketUdf(by)(col(colY).cast("double")), bits))
  }

  /** Cluster `df` into `numFiles` range partitions of the Z-value —
   *  each output file then spans a narrow (x, y) rectangle, and a
   *  predicate on either column prunes by footer min/max. Write the
   *  result with `.write.parquet(...)`; the helper only fixes the
   *  layout. */
  def zorder(
      df: DataFrame,
      colX: String,
      colY: String,
      numFiles: Int,
      bits: Int = 6): DataFrame =
    withZValue(df, colX, colY, bits)
      .repartitionByRange(numFiles, col("__z"))
      .drop("__z")

  final case class CompactionStats(
      filesBefore: Int,
      filesAfter: Int,
      bytesTotal: Long,
      targetBytes: Long)

  /** Small-file compaction (the OPTIMIZE half of a table-maintenance
   *  loop; [[zorder]] is the CLUSTER half): rewrite a directory of many
   *  small parquet files into ⌈totalBytes / targetBytes⌉ right-sized
   *  ones. The file census is driver-side metadata (one listStatus, a
   *  few strings per file — never data), and the rewrite is a
   *  `coalesce`, NOT a repartition: each output task concatenates a
   *  subset of input files with no shuffle and no ordering promise —
   *  exactly the bin-packing contract. Streaming ingest at 100 TB
   *  produces minute-sized files whose per-file open/footer cost comes
   *  to dominate scans; compaction is what keeps zone maps ([[ZoneMap]])
   *  and bloom sidecars ([[BloomSkip]]) worth building — both prune
   *  per FILE, so a million tiny files means a million probes. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $inPath")
    val total = files.map(_.getLen).sum
    val numOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    // Spark's file-scan partitioning IS a first-fit bin packer (files
    // sorted by length, packed up to maxPartitionBytes) — scope its
    // knobs to the rewrite so the bins track targetBytes instead of
    // the session default, then cap at ⌈total/target⌉ (packing
    // fragmentation can overshoot; coalesce merges, never splits).
    val conf = spark.conf
    val saved = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      conf.set("spark.sql.files.openCostInBytes", "0")
      spark.read.parquet(inPath)
        .coalesce(numOut)
        .write.mode("overwrite").parquet(outPath)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactionStats(files.length, after, total, targetBytes)
  }
}
