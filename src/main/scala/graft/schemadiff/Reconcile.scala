package graft.schemadiff

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level table reconciliation — the migration/replication
 * validation classic: given two snapshots of a table keyed by the same
 * primary key, report PER COLUMN how many key-matched rows agree,
 * disagree, and how many keys exist on only one side. This is the
 * row-content companion to the schema-level diff
 * ([[SchemaDiff]] says "the column changed type"; this says "12 of
 * 50k values changed").
 *
 * Plan shape: ONE key-keyed full-outer join carrying only (key,
 * compared columns), then one aggregate stacking every column's
 * equal/diff counters in a single pass — columns-sized output, no
 * per-column job. Equality is null-safe (`<=>`): NULL agreeing with
 * NULL counts as equal, NULL-vs-value as a diff. At 100 TB both
 * sides shuffle once on the key (co-partitioned if bucketed), and the
 * compared-column projection prunes everything else from the scans.
 */
object Reconcile {

  def tableReconcile(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filterNot(keyCols.contains).toSeq
        .filter(newDf.columns.contains)
    require(cols.nonEmpty, "no comparable columns")
    val o = oldDf.select((keyCols.map(col) :+ lit(true).as("__inOld")) ++
      cols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select((keyCols.map(col) :+ lit(true).as("__inNew")) ++
      cols.map(c => col(c).as(s"__n_$c")): _*)
    val j = o.join(n, keyCols, "full_outer")
    val both = col("__inOld").isNotNull && col("__inNew").isNotNull
    val perCol = cols.flatMap { c =>
      Seq(
        sum(when(both && (col(s"__o_$c") <=> col(s"__n_$c")), 1L)
          .otherwise(0L)).as(s"__eq_$c"),
        sum(when(both && !(col(s"__o_$c") <=> col(s"__n_$c")), 1L)
          .otherwise(0L)).as(s"__df_$c"))
    }
    val totals = j.agg(
      sum(when(both, 1L).otherwise(0L)).as("__matched"),
      (Seq(
        sum(when(col("__inNew").isNull, 1L).otherwise(0L))
          .as("__only_old"),
        sum(when(col("__inOld").isNull, 1L).otherwise(0L))
          .as("__only_new")) ++ perCol): _*).head()
    val spark = oldDf.sparkSession
    import spark.implicits._
    cols.map { c =>
      (c, totals.getAs[Long]("__matched"),
        totals.getAs[Long](s"__eq_$c"), totals.getAs[Long](s"__df_$c"),
        totals.getAs[Long]("__only_old"), totals.getAs[Long]("__only_new"))
    }.toDF("column", "n_matched", "n_equal", "n_diff",
      "n_only_old", "n_only_new")
  }
}
