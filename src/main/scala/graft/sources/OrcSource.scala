package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * ORC ingestion/egress — the fifth leg of the source matrix (parquet,
 * JSONL, JDBC, CSV, ORC). Hive-era lakes and Trino/Presto warehouses
 * still hold petabytes of ORC; an engine that can only read parquet
 * forces a full-format rewrite before day one. Spark's native
 * vectorized ORC reader (`spark.sql.orc.impl=native`, the default)
 * gives the same scan economics as parquet: column pruning, predicate
 * pushdown into stripe/row-group skipping via min/max indexes, and
 * splittable stripes.
 *
 * Scale shapes:
 *  - writes partition by a low-cardinality column so reads prune whole
 *    directories BEFORE any ORC byte is opened (partition pruning is
 *    format-independent);
 *  - within a partition, pushed predicates skip stripes by their
 *    min/max statistics — the ORC analog of parquet row-group skipping
 *    (the zone-map idea the engine also implements manually in
 *    [[ZoneMap]] for formats that lack it);
 *  - no small-file trap: one `coalesce` before write keeps stripe
 *    counts sane; [[Layout.compact]] applies to ORC dirs the same way.
 */
object OrcSource {

  /** Write partitioned ORC with zstd stripes — the lake-export path. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .orc(path)

  /** Read back; filters composed on the result push down into the
   *  native ORC scan (assert `PushedFilters` in the plan, not hope). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
