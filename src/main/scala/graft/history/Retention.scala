package graft.history

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Store retention — the VACUUM / expire-snapshots analog for the
 * date-partitioned parquet stores ([[ProfileStore]], [[ValidationStore]],
 * [[AnomaliesStore]], the metrics store): history growth is unbounded
 * by design (every scan appends), so a deployment needs a retention
 * sweep the same way it needs compaction (`sources/Layout.compact`).
 *
 * Scale shape: dropping a `date=YYYY-MM-DD` partition is a DIRECTORY
 * delete — metadata-only, no read or rewrite of surviving data, no
 * Spark job at all. That is the entire point of partitioning history
 * by date: at 100 TB the retention sweep costs O(expired partitions),
 * not O(store).
 */
object Retention {

  final case class RetentionReport(
      dropped: Seq[String],
      kept: Seq[String])

  /** Delete every `dateCol=<date>` partition strictly older than
   *  `cutoff` (cutoff itself survives). Non-date partition values —
   *  including the Hive null-partition sentinel — are conservatively
   *  KEPT. Returns what was dropped and what remains. */
  def expirePartitions(
      spark: SparkSession,
      storePath: String,
      cutoff: LocalDate,
      dateCol: String = "date"): RetentionReport = {
    // resolve the filesystem FROM the store path (not defaultFS) so a
    // store on s3a://gs:// works when defaultFS is hdfs:///file://
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return RetentionReport(Nil, Nil)
    val prefix = s"$dateCol="
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
    val (expired, kept) = parts.partition { st =>
      val v = st.getPath.getName.stripPrefix(prefix)
      try LocalDate.parse(v).isBefore(cutoff)
      catch { case _: Exception => false } // unparseable → keep
    }
    expired.foreach(st => fs.delete(st.getPath, true))
    RetentionReport(
      expired.map(_.getPath.getName).sorted,
      kept.map(_.getPath.getName).sorted)
  }
}
