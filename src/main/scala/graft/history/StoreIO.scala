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

  /** Driver-side scalar-metadata sidecar (r19, optimization guide §5:
   *  the driver should do the metadata work — and §6: fewer tiny
   *  files). A store's meta is a handful of scalars, but writing it as
   *  parquet costs one Spark job and EVERY load costs two more (schema
   *  inference + head) — ~0.1-0.3 s per index-lifecycle op at bench
   *  scale, and at production scale still a full job-submission round
   *  trip per op. [[writeProps]] lands a deterministic
   *  `meta.properties` (sorted `key=value` lines, UTF-8) plus a
   *  parquet-style `_SUCCESS` marker so dir-level completeness checks
   *  (e.g. Hnsw's rebuild_tmp recovery) work unchanged. Returns false
   *  — the caller must fall back to its parquet form — when a pair
   *  cannot travel one-per-line (a key with '=' or any line break).
   *  [[readProps]] returns None when the dir holds no properties file
   *  (a legacy parquet meta: callers keep their parquet read as the
   *  fallback, so old stores load forever). */
  def writeProps(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      pairs: Seq[(String, String)]): Boolean = {
    val ok = pairs.forall { case (k, v) =>
      !k.contains('=') && !k.exists(c => c == '\n' || c == '\r') &&
        !v.exists(c => c == '\n' || c == '\r')
    }
    if (!ok) return false
    fs.mkdirs(dir)
    val body = pairs.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    val f = fs.create(new org.apache.hadoop.fs.Path(dir, "meta.properties"), true)
    try f.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally f.close()
    fs.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true).close()
    true
  }

  def readProps(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Map[String, String]] = {
    val f = new org.apache.hadoop.fs.Path(dir, "meta.properties")
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val txt =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    Some(txt.split('\n').iterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      require(i >= 0, s"malformed meta line in $f: $line")
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap)
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
