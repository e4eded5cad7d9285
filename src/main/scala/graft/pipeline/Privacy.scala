package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Privacy audits over tabular data — the re-identification companion
 * to the PII text scrub ([[Pii]]): a table with direct identifiers
 * removed can still expose individuals through rare QUASI-identifier
 * combinations (Sweeney's k-anonymity). Before a customer-derived
 * table feeds a training corpus, the release checklist asks "what is
 * its k, and which cells violate the floor?".
 *
 * Scale shape: one groupBy over the quasi-identifier columns (hash
 * aggregate, map-side combined) — the class frame is |distinct
 * combinations| rows, metadata-sized next to the table; the k level
 * is one more metadata aggregation, broadcast back onto the
 * violating classes.
 */
object Privacy {

  /** Equivalence classes below the `k` floor, each row carrying the
   *  whole table's k-anonymity level (the minimum class size):
   *  (quasiCols..., class_size, table_k), smallest classes first. An
   *  already-k-anonymous table returns no rows. NULL quasi values
   *  group as their own class (NULL is a disclosure-relevant value). */
  def kAnonymityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k must be >= 2")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val tableK = classes.agg(min("class_size").as("table_k"))
    classes.filter(col("class_size") < k)
      .crossJoin(broadcast(tableK))
      .orderBy((col("class_size").asc +: quasiCols.map(col(_).asc)): _*)
  }

  /** One-row audit summary: class count, the table's k level, and how
   *  many classes / rows sit below the `k` floor. */
  def kAnonymitySummary(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        min("class_size").as("table_k"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("n_classes_below_k"),
        sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)).as("n_rows_below_k"))
  }

  /** l-diversity audit (Machanavajjhala et al.) — k-anonymity's
   *  companion: a class can be large (k-anonymous) yet still leak if
   *  every member shares the same SENSITIVE value, so each
   *  quasi-identifier class also needs ≥ l DISTINCT sensitive values.
   *  Classes below the floor, with their size and distinct-l. One
   *  hash aggregate (count + count-distinct per class) — the class
   *  frame is equivalence-classes-sized, never row-sized. */
  def lDiversityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, "l must be >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .filter(col("l_distinct") < l)
      .orderBy((col("l_distinct").asc +: col("class_size").asc +:
        quasiCols.map(col(_).asc)): _*)
  }

  /** One-row l-diversity summary: class count, the table's l level
   *  (min distinct sensitive over classes), and the below-floor mass. */
  def lDiversitySummary(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .agg(count(lit(1)).as("n_classes"),
        min("l_distinct").as("table_l"),
        sum(when(col("l_distinct") < l, 1L).otherwise(0L))
          .as("n_classes_below_l"),
        sum(when(col("l_distinct") < l, col("class_size"))
          .otherwise(0L)).as("n_rows_below_l"))
  }
}
