package graft.history

import org.apache.spark.sql.SparkSession

/** Tiny shared IO helper for the parquet-backed stores: the
 *  does-the-store-exist-yet probe every store needs for its
 *  empty-but-schema-correct fresh-install read, and the per-path
 *  append lock every store write must take. */
object StoreIO {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

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

  /** In-place "update" of a parquet store: write the transformed frame
   *  to a side dir, then swap it in. Parquet has no row update, so the
   *  whole store is rewritten (an ACID table format would replace this
   *  with a partition-scoped MERGE at scale). Crash-safe swap: the live
   *  path is renamed ASIDE before the new data moves in, so no failure
   *  point leaves the store empty — worst case the backup dir survives
   *  next to a consistent live store. Shared by ChangesStore.acknowledge
   *  and AnomaliesStore.updateStatusWhere. */
  def rewriteLocked(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String])(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit =
    appendLocked(path) {
      val updated = transform(spark.read.parquet(path))
      val tmp = path + "__tmp"
      updated.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy(partitionCols: _*).parquet(tmp)
      val live = new org.apache.hadoop.fs.Path(path)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val backup = new org.apache.hadoop.fs.Path(path + "__bak")
      fs.delete(backup, true) // clear any leftover from a prior crash
      if (!fs.rename(live, backup))
        throw new java.io.IOException(s"rewrite: cannot move $live aside")
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), live)) {
        fs.rename(backup, live) // roll back: old data returns to the live path
        throw new java.io.IOException(s"rewrite: cannot activate $tmp")
      }
      fs.delete(backup, true)
    }
}
