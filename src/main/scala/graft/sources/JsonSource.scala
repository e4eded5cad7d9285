package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Semi-structured ingestion: raw crawl/export dumps arrive as JSON
 * lines (a string column, one object per row), and the pipeline needs
 * them as flat typed columns before any profiling or dedup can run
 * (reference analog: sparvi's source-onboarding preview flattens
 * nested payloads the same way before metadata extraction).
 *
 * Scale shapes:
 *  - schema inference is a SAMPLED distributed pass
 *    (`samplingRatio` → Spark's own JSON inferrer, partial-merged per
 *    partition) — never a full extra scan at 100 TB unless asked;
 *  - parsing is `from_json` with the pinned schema: map-only,
 *    whole-stage-codegen'd, no UDF;
 *  - flattening is a projection (struct field access), zero shuffle.
 *    Pin the inferred schema once and reuse it across daily slices so
 *    a drifting upstream payload fails loudly at the boundary instead
 *    of silently re-inferring a different shape (the schema-diff
 *    family then monitors the flattened output like any other table).
 */
object JsonSource {

  /** Infer the schema of a JSON-string column using Spark's
   *  distributed JSON inference over a sample of the rows. */
  def inferSchema(
      df: DataFrame,
      jsonCol: String,
      samplingRatio: Double = 1.0): StructType = {
    val ds = df.select(col(jsonCol).cast("string"))
      .na.drop(Seq(jsonCol))
      .map(_.getString(0))(Encoders.STRING)
    val inferred = df.sparkSession.read
      .option("samplingRatio", samplingRatio.toString)
      .json(ds).schema
    // permissive inference grows a corrupt-record column when any row
    // fails to parse — that's scan diagnostics, not payload schema
    val corruptCol = df.sparkSession.conf
      .get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    StructType(inferred.fields.filterNot(_.name == corruptCol))
  }

  /** Struct leaves of `s` as `prefix`-joined flat columns (arrays and
   *  maps stay opaque — exploding is a semantic choice the caller
   *  makes, not a default). */
  private def leafCols(
      prefix: String,
      path: String,
      s: StructType): Seq[Column] =
    s.fields.flatMap {
      case StructField(name, st: StructType, _, _) =>
        leafCols(s"$prefix${name}_", s"$path.`$name`", st)
      case StructField(name, _, _, _) =>
        Seq(col(s"$path.`$name`").as(s"$prefix$name"))
    }

  /** Recursively flatten every struct column of `df` into
   *  `parent_child` top-level columns. Pure projection: no shuffle,
   *  stays inside whole-stage codegen. */
  def flatten(df: DataFrame): DataFrame = {
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[StructType])) df
    else df.select(df.schema.fields.flatMap {
      case StructField(name, st: StructType, _, _) =>
        leafCols(s"${name}_", s"`$name`", st)
      case StructField(name, _, _, _) => Seq(col(s"`$name`"))
    }.toIndexedSeq: _*)
  }

  /** Parse a JSON-string column (with a supplied or inferred schema)
   *  and return the original frame with the payload flattened to
   *  typed `a_b` columns beside the other columns; the raw string is
   *  dropped. Corrupt rows yield NULLs in every payload column
   *  (from_json's PERMISSIVE default) rather than failing the scan —
   *  count them with a null-rate profile downstream. */
  def parseJson(
      df: DataFrame,
      jsonCol: String,
      schema: Option[StructType] = None,
      samplingRatio: Double = 1.0): DataFrame = {
    val sch = schema.getOrElse(inferSchema(df, jsonCol, samplingRatio))
    val keep = df.columns.filterNot(_ == jsonCol)
      .map(c => col(s"`$c`")).toIndexedSeq
    df.select(keep :+ from_json(col(jsonCol), sch).as("__parsed"): _*)
      .select(keep ++ leafCols("", "`__parsed`", sch): _*)
  }
}
