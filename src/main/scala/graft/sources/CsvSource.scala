package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Delimited-text ingestion — the fourth leg of the source matrix
 * (parquet, JSONL, JDBC, CSV). Export dumps and vendor feeds arrive as
 * CSV; the pipeline needs them typed and split-scannable before
 * anything else runs.
 *
 * Scale shapes:
 *  - schema inference is a sampled pass (Spark's own CSV inferrer) —
 *    infer once, PIN the schema, reuse it across daily drops so a
 *    drifting feed fails loudly at the boundary;
 *  - reads use RFC-4180 doubled-quote escaping and stay SPLITTABLE
 *    (no multiLine): a quoted field may contain separators and quotes
 *    but not raw newlines, which is what keeps a 100 TB feed readable
 *    in parallel — a multiLine file pins each whole file to one task;
 *  - malformed rows yield NULL columns (PERMISSIVE), never a failed
 *    scan; count them with a null-rate profile downstream.
 */
object CsvSource {

  /** Options every read/write here shares: header row, RFC-4180
   *  doubled-quote escaping (Spark's default escape is backslash,
   *  which standard CSV consumers do not understand). */
  private val common = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"")

  /** Infer the schema from a sample of the files. */
  def inferSchema(
      spark: SparkSession,
      path: String,
      samplingRatio: Double = 1.0): StructType =
    spark.read.options(common)
      .option("inferSchema", "true")
      .option("samplingRatio", samplingRatio.toString)
      .csv(path).schema

  /** Read with a PINNED schema — the production path. Splittable,
   *  codegen'd scan; malformed rows become all-NULL rows. */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.read.options(common)
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Write a frame as standard CSV (header + doubled-quote escaping),
   *  so any RFC-4180 consumer can read the output back. */
  def write(df: DataFrame, path: String): Unit =
    df.write.options(common).mode("overwrite").csv(path)
}
