package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus version diff — the dataset-versioning primitive a recurring
 * crawl pipeline reports on: between snapshot v1 and snapshot v2,
 * which documents are unchanged, modified in place, gone, brand new —
 * and which merely MOVED (same bytes under a new id, the re-crawl
 * URL-shuffle case that naive id-diffs misreport as churn).
 *
 * Scale shape: one id-keyed full-outer join (co-partitioned on the
 * join key; both sides hash-exchange once) carrying (id, md5, len) —
 * text reduces to its hash at the scan, so the exchange is ~48 B/doc
 * regardless of document size. Rename detection joins the removed and
 * added md5 SETS (each a fraction of the corpus), counting per-hash
 * min(removed, added) so duplicate content can never pair twice.
 */
object CorpusDiff {

  /** Per-document classification: (id, change) with change ∈
   *  unchanged | modified | removed | added. Rename attribution is a
   *  CONTENT-level call, not an id-level one — see [[diffSummary]]. */
  def classify(
      v1: DataFrame,
      v2: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def keyed(df: DataFrame, side: String) = df.select(
      col(idCol),
      md5(coalesce(col(textCol), lit("")).cast("binary")).as(s"__h$side"),
      length(coalesce(col(textCol), lit(""))).cast("long")
        .as(s"__len$side"))
    keyed(v1, "1").join(keyed(v2, "2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h1").isNull, "added")
          .when(col("__h2").isNull, "removed")
          .when(col("__h1") === col("__h2"), "unchanged")
          .otherwise("modified").as("change"),
        col("__h1"), col("__h2"),
        coalesce(col("__len2"), col("__len1")).as("n_chars"))
  }

  /** Change-type rollup with rename attribution: `renamed` counts
   *  content present on BOTH sides under different ids (per-md5
   *  min(removed, added) — duplicate content pairs at most its
   *  multiplicity); `added_new` / `removed_gone` are the raw
   *  added/removed classes minus the renamed mass, so the five
   *  classes partition id-level churn into honest content-level
   *  stories. One row per change type: (change, n_docs, total_chars;
   *  renamed rows carry the PAIRED char mass once, from the v2 side). */
  def diffSummary(
      v1: DataFrame,
      v2: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // the classification frame feeds TWO independent rollups (the
    // change-type base and the rename pairing); without a lineage cut
    // each consumer would recompute the id-keyed full-outer join —
    // the skinny (id, change, md5, len) frame is far cheaper to
    // materialize once than to join twice at corpus scale
    val cls = classify(v1, v2, idCol, textCol).localCheckpoint()
    val base = cls.groupBy("change")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    // per-content-hash rename pairing over the churn classes: ONE
    // pass builds both sides' per-md5 counters as conditional sums
    // (no removed⋈added join — the pairing is a same-group min)
    val renamed = cls.filter(col("change").isin("removed", "added"))
      .groupBy(coalesce(col("__h1"), col("__h2")).as("__h"))
      .agg(
        sum(when(col("change") === "removed", 1L).otherwise(0L))
          .as("__nr"),
        sum(when(col("change") === "added", 1L).otherwise(0L))
          .as("__na"),
        sum(when(col("change") === "added", col("n_chars"))
          .otherwise(0L)).as("__ba"))
      .filter(col("__nr") > 0 && col("__na") > 0)
      .select(least(col("__nr"), col("__na")).as("__n"),
        // char mass of the paired copies, charged once (sides agree:
        // same hash, same bytes — per-copy mass is __ba / __na)
        (least(col("__nr"), col("__na")) *
          (col("__ba") / col("__na"))).cast("long").as("__b"))
      .agg(coalesce(sum("__n"), lit(0L)).as("n_renamed"),
        coalesce(sum("__b"), lit(0L)).as("b_renamed"))
    val withRen = base.crossJoin(broadcast(renamed))
      .select(col("change"),
        when(col("change") === "added",
          col("n_docs") - col("n_renamed"))
          .when(col("change") === "removed",
            col("n_docs") - col("n_renamed"))
          .otherwise(col("n_docs")).as("n_docs"),
        when(col("change") === "added",
          col("total_chars") - col("b_renamed"))
          .when(col("change") === "removed",
            col("total_chars") - col("b_renamed"))
          .otherwise(col("total_chars")).as("total_chars"),
        col("n_renamed"), col("b_renamed"))
    withRen
      .withColumn("change",
        when(col("change") === "added", "added_new")
          .when(col("change") === "removed", "removed_gone")
          .otherwise(col("change")))
      .select("change", "n_docs", "total_chars")
      .unionByName(withRen.limit(1).select(
        lit("renamed").as("change"),
        col("n_renamed").as("n_docs"),
        col("b_renamed").as("total_chars")))
      .orderBy("change")
  }
}
