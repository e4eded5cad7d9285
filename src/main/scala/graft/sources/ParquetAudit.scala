package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet ROW-GROUP audit from footers alone — the layout-health tool a
 * 100 TB lake runs before anything else: per column chunk, value
 * counts, null counts and compressed/uncompressed bytes, read from
 * file FOOTERS (a few KB each), never the data pages. Answers "are my
 * row groups sized right / which columns dominate storage / is the
 * encoding actually compressing" at a cost proportional to the FILE
 * COUNT, not the data size.
 *
 * Scale shape: the driver lists the directory (names only), ships the
 * path list to executors, and each task opens only footers —
 * O(files) tiny reads, embarrassingly parallel, zero data-page IO.
 * DuckDB's `parquet_metadata()` reads the same footer fields, which is
 * what makes this oracle-checkable byte-for-byte (s21).
 */
object ParquetAudit {

  /** One row per (file, row_group, column chunk). */
  def rowGroupChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootStatus = fs.getFileStatus(root)
    val files: Seq[String] =
      (if (rootStatus.isDirectory) fs.listStatus(root).toSeq
       else Seq(rootStatus))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    require(files.nonEmpty, s"no parquet files under $dir")
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { paths =>
        // task-local Configuration: Hadoop's Configuration is not
        // serializable and footer reads need no cluster-specific conf
        val taskConf = new org.apache.hadoop.conf.Configuration()
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
                    Option(c.getStatistics).map(_.getNumNulls)
                      .getOrElse(-1L),
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
