package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-level zone maps: min/max/null-count per (file, column), the
 * metastore-less form of Delta/Iceberg data skipping.
 *
 * Parquet footers already let Spark skip row groups, but the driver
 * still LISTS and OPENS every file to find that out. A zone map moves
 * the pruning before the scan: one small stats table (a row per file)
 * answers "which files can possibly match ts ∈ [lo, hi)" without
 * touching a single data-file footer. Combined with a range/Z-order
 * layout ([[Layout]]) that keeps each file's range narrow, a selective
 * predicate over 100 TB touches a handful of files instead of all of
 * them — and the zone map itself is ~1 row × #files, trivially
 * broadcastable.
 *
 * Schema is WIDE (native types preserved): `file`, `row_count`, then
 * `<col>__min`, `<col>__max`, `<col>__nulls` per requested column, so
 * pruning comparisons run with the column's own ordering — no lossy
 * string encoding of timestamps or doubles.
 */
object ZoneMap {

  /** Build the zone map for `columns` over every parquet file under
   *  `path` — ONE scan, grouped by `_metadata.file_path` (file identity
   *  comes from the scan itself, so the map is exactly consistent with
   *  what Spark would read). Re-run after compaction/append. */
  def build(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "zone map needs at least one column")
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("row_count") +: columns.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"))
    }
    df.groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] range on `column` intersects [lo, hi] —
   *  the survivors of zone pruning. A file with only nulls in `column`
   *  has null min/max and cannot match a range predicate, so it prunes
   *  too (range semantics are null-rejecting). Driver-small: one string
   *  per surviving file. */
  def pruneFiles(
      zoneMap: DataFrame,
      column: String,
      lo: Column,
      hi: Column): Array[String] = {
    val mn = col(s"${column}__min"); val mx = col(s"${column}__max")
    zoneMap
      .filter(mn.isNotNull && mx.isNotNull && !(mx < lo) && !(mn > hi))
      .select("file")
      .collect()
      .map(_.getString(0))
  }

  /** Read only the files that can match `column ∈ [lo, hi]`. The zone
   *  map PRUNES, it never filters: callers still apply the real
   *  predicate to the returned frame (exactly like parquet row-group
   *  skipping — pruning is a superset guarantee, not a filter). When
   *  every file prunes, returns an empty frame with the data schema. */
  def prunedRead(
      spark: SparkSession,
      path: String,
      zoneMap: DataFrame,
      column: String,
      lo: Column,
      hi: Column): DataFrame = {
    val files = pruneFiles(zoneMap, column, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(path).limit(0)
    else
      spark.read.parquet(files.toIndexedSeq: _*)
  }
}
