package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable count-min sketch states — the point-frequency leg of the
 * slice-state family (LogSketch quantiles, MergeableTopK, KMV, HLL,
 * bottom-k samples): per slice, a depth×width grid of EXACT cell
 * counts; states merge by cell-wise ADDITION (order-independent,
 * lossless), and a point estimate is the MIN over the value's d cells
 * — an overestimate bounded by ε·N (ε = e/width) with probability
 * 1−δ (δ = e^−depth), per Cormode & Muthukrishnan.
 *
 * Representation: a SPARSE (slice_id, row, cell, cnt) frame — only
 * touched cells materialize, so a slice state is min(distinct values
 * × depth, depth × width) rows. Everything is groupBy arithmetic on
 * deterministic hashes (xxhash64 seeded per row) — engine-exact, no
 * UDF, no RNG.
 */
object CountMin {

  private def cellOf(c: Column, row: Int, width: Int): Column =
    pmod(xxhash64(c.cast("string"), lit(row)), lit(width.toLong))

  /** One slice's CMS state for `valueCol`: exact per-cell counts. */
  def sliceState(
      df: DataFrame,
      valueCol: String,
      sliceId: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val rows = (0 until depth).map { r =>
      df.filter(col(valueCol).isNotNull)
        .groupBy(cellOf(col(valueCol), r, width).as("cell"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("row", lit(r))
    }.reduce(_ unionByName _)
    rows.select(lit(sliceId).as("slice_id"), col("row"), col("cell"),
      col("cnt"))
  }

  /** Merge any union of slice states: cell-wise addition. */
  def merge(states: DataFrame): DataFrame =
    states.groupBy("row", "cell").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `queries` (one `value` column)
   *  against a merged state: min over the value's d cells. Missing
   *  cells count 0 (a value whose every cell is untouched has true
   *  count 0). */
  /** The d (row, cell) positions each query value hashes to — public
   *  so a replay oracle can persist them (xxhash64 has no SQL mirror;
   *  the verification stage downstream of the hash does). */
  def probePositions(
      queries: DataFrame,
      valueCol: String = "value",
      depth: Int = 4,
      width: Int = 256): DataFrame =
    (0 until depth).map { r =>
      queries.select(col(valueCol),
        lit(r).as("row"), cellOf(col(valueCol), r, width).as("cell"))
    }.reduce(_ unionByName _)

  def estimate(
      merged: DataFrame,
      queries: DataFrame,
      valueCol: String = "value",
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val probes = probePositions(queries, valueCol, depth, width)
    probes.join(merged, Seq("row", "cell"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(valueCol)
      .agg(min("cnt").as("est_count"))
  }
}
