package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Serializable carrier for the session's Hadoop conf so executor-side
 *  footer reads see the SAME filesystem settings as the driver
 *  (spark.hadoop.*, s3a/gcs/abfs credentials, custom schemes). Hadoop's
 *  Configuration is not serializable, so we ship the key/value pairs
 *  and rebuild. A fresh `new Configuration()` on the task side would
 *  silently drop auth and only work where classpath defaults suffice —
 *  exactly not the 100 TB-lake scenario this tool exists for. */
private[graft] class ConfCarrier(@transient conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private val entries: Array[(String, String)] =
    conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
  @transient private lazy val rebuilt = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  def value: org.apache.hadoop.conf.Configuration = rebuilt
}

/**
 * Parquet ROW-GROUP audit from footers alone — the layout-health tool a
 * 100 TB lake runs before anything else: per column chunk, value
 * counts, null counts and compressed/uncompressed bytes, read from
 * file FOOTERS (a few KB each), never the data pages. Answers "are my
 * row groups sized right / which columns dominate storage / is the
 * encoding actually compressing" at a cost proportional to the FILE
 * COUNT, not the data size.
 *
 * Scale shape: the driver lists the tree (names only — RemoteIterator,
 * so a million-file store never materializes more than the path list),
 * ships the path list to executors, and each task opens only footers —
 * O(files) tiny reads, embarrassingly parallel, zero data-page IO.
 * Listing is RECURSIVE: real lakes partition (`date=.../part-*.parquet`),
 * and the engine's own date-partitioned history stores are audited the
 * same way as flat dirs. DuckDB's `parquet_metadata()` reads the same
 * footer fields, which is what makes this oracle-checkable
 * byte-for-byte (s21 flat, s22 partitioned).
 */
object ParquetAudit {

  /** One row per (file, row_group, column chunk). `null_count` is NULL
   *  (not a sentinel) when the writer recorded no statistics for the
   *  chunk, so SUM(null_count) skips it — matching DuckDB's
   *  parquet_metadata() NULL semantics. */
  def rowGroupChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootStatus = fs.getFileStatus(root)
    val files: Seq[String] =
      if (rootStatus.isDirectory) {
        val it = fs.listFiles(root, /* recursive = */ true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile && s.getPath.getName.endsWith(".parquet"))
            buf += s.getPath.toString
        }
        buf.toSeq
      } else Seq(rootStatus.getPath.toString)
        .filter(_.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $dir (recursive)")
    val carrier = spark.sparkContext.broadcast(new ConfCarrier(conf))
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { paths =>
        val taskConf = carrier.value.value
        paths.flatMap { p =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new Path(p), taskConf))
          try {
            reader.getFooter.getBlocks.asScala.toList.zipWithIndex
              .flatMap { case (block, rg) =>
                block.getColumns.asScala.toList.map { c =>
                  (p, rg, c.getPath.toDotString,
                    c.getValueCount,
                    Option(c.getStatistics).filter(_.isNumNullsSet)
                      .map(_.getNumNulls),
                    c.getTotalSize, c.getTotalUncompressedSize)
                }
              }.iterator
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group", "column_name", "num_values",
        "null_count", "compressed_bytes", "uncompressed_bytes")
  }
}
