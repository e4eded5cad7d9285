package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed tables for co-located joins (the 100 TB join story): writing
 * both sides bucketed by the join key lets Spark sort-merge-join them
 * with NO Exchange — at scale that removes the dominant shuffle from
 * fact-to-fact joins the engine performs repeatedly (e.g. history
 * self-joins, repeated lineitem↔orders quality checks).
 *
 * Parquet bucketing needs a catalog table (`saveAsTable`), not a bare
 * path — bucket metadata lives in the metastore.
 */
object Bucketing {

  /** Write a DataFrame as a bucketed, sorted catalog table. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two bucketed tables on their bucket key. With matching bucket
   *  counts, the planner produces a shuffle-free sort-merge join. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True if the physical plan contains any shuffle Exchange — the
   *  assertion target for co-location tests. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")
}
