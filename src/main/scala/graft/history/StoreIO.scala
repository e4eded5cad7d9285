package graft.history

import org.apache.spark.sql.SparkSession

/** Tiny shared IO helper for the parquet-backed stores: the
 *  does-the-store-exist-yet probe every store needs for its
 *  empty-but-schema-correct fresh-install read, and the per-path
 *  append lock every store write must take. */
object StoreIO {
  def exists(spark: SparkSession, path: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  // One monitor per store path (JVM-wide). Hadoop's FileOutputCommitter
  // stages every in-flight attempt under a single <path>/_temporary and
  // deletes it wholesale on commitJob, so two concurrent append jobs to
  // the SAME path can lose files or die with FileNotFoundException —
  // reachable from Automation's worker pool (N tasks appending to one
  // JobStore/EventStore). Appends to DIFFERENT paths stay concurrent.
  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `body` (a parquet append to `path`) holding that path's lock. */
  def appendLocked[A](path: String)(body: => A): A = {
    val key = new org.apache.hadoop.fs.Path(path).toString
    val lock = pathLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized(body)
  }
}
