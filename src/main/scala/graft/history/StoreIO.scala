package graft.history

import org.apache.spark.sql.SparkSession

/** Tiny shared IO helper for the parquet-backed stores: the
 *  does-the-store-exist-yet probe every store needs for its
 *  empty-but-schema-correct fresh-install read. */
object StoreIO {
  def exists(spark: SparkSession, path: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))
}
