package graft.validations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Row-level quarantine — the ACTION side of validation: where the rule
 * engine ([[Runner]]) reports "0.3% of rows violate X" per table, this
 * splits the actual rows, each carrying WHICH rules it violated, so a
 * pipeline can route clean rows onward and quarantined rows to a
 * review table instead of failing the whole batch.
 *
 * Rules are row predicates (`valid` = the row passes). Annotation is
 * ONE map-only pass — the violations array is built from the same
 * projected expressions the filter uses, no per-rule jobs; the
 * summary is one stacked aggregate over the annotated frame.
 */
object Quarantine {

  final case class RowRule(name: String, valid: Column)

  /** Annotate every row with `violations` (names of failed rules,
   *  build order) and `quarantined`. NULL predicate results count as
   *  VIOLATIONS — an unevaluable rule must not wave a row through. */
  def annotate(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be distinct — duplicates would collide in the " +
        "violations array and the summary's stacked aggregate")
    val marks = rules.map(r =>
      when(coalesce(r.valid, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name)))
    df.withColumn("violations",
        filter(array(marks: _*), v => v.isNotNull))
      .withColumn("quarantined", size(col("violations")) > 0)
  }

  /** (clean, quarantined) split of an annotated-or-raw frame. */
  def split(df: DataFrame, rules: Seq[RowRule]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.filter(!col("quarantined")).drop("violations", "quarantined"),
      a.filter(col("quarantined")))
  }

  /** Per-rule violation counts plus the clean/total lanes — one
   *  stacked aggregate. */
  def summary(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    val a = annotate(df, rules)
    val perRule = rules.map(r =>
      sum(when(array_contains(col("violations"), r.name), 1L)
        .otherwise(0L)).as(s"__v_${r.name}"))
    val totals = a.agg(
      count(lit(1)).as("__total"),
      (sum(when(!col("quarantined"), 1L).otherwise(0L)).as("__clean")
        +: perRule): _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    (rules.map(r => (r.name, totals.getAs[Long](s"__v_${r.name}"))) ++
      Seq(("_rows_clean", totals.getAs[Long]("__clean")),
        ("_rows_total", totals.getAs[Long]("__total"))))
      .toDF("rule", "n_rows")
  }
}
