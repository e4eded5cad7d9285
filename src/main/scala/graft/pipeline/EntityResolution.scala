package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocking-based entity resolution: the classic record-linkage shape —
 * cheap blocking key → within-block candidate pairs → edit-distance
 * match → transitive closure into entity clusters. The reference's
 * dedup lanes are exact-hash only; this adds the fuzzy-match family a
 * master-data pipeline needs (same entity, slightly different spelling).
 *
 * Scale shape: the self-join is an EQUI-join on the blocking key, so
 * pair generation is Σ_b |block_b|² — bounded by the blocking design,
 * never corpus², and shuffles only (id, name) pairs. `levenshtein` is
 * Spark's codegen'd built-in (identical semantics to DuckDB's, which
 * is what makes the oracle exact). The closure reuses
 * [[Dedup.duplicateClusters]]' label propagation. Skewed blocks are a
 * DESIGN input here: pick `blockChars` so the hottest block stays
 * rectangular-join-sized, the same way LSH band width is chosen.
 */
object EntityResolution {

  /** Within-block candidate pairs at edit distance ≤ `maxDistance`:
   *  (id_a, id_b, distance) with id_a < id_b. */
  def candidatePairs(
      records: DataFrame,
      idCol: String = "record_id",
      nameCol: String = "name",
      blockChars: Int = 4,
      maxDistance: Int = 5): DataFrame = {
    val base = records.select(col(idCol), col(nameCol),
      lower(substring(col(nameCol), 1, blockChars)).as("__block"))
    val a = base.select(col(idCol).as("id_a"), col(nameCol).as("__na"),
      col("__block"))
    val b = base.select(col(idCol).as("id_b"), col(nameCol).as("__nb"),
      col("__block"))
    a.join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("distance", levenshtein(col("__na"), col("__nb")))
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
  }

  /** Resolve records into entities: every record gets a cluster_id
   *  (the minimum member id; singletons cluster with themselves) and
   *  the entity size. */
  def resolve(
      records: DataFrame,
      idCol: String = "record_id",
      nameCol: String = "name",
      blockChars: Int = 4,
      maxDistance: Int = 5): DataFrame = {
    val pairs = candidatePairs(records, idCol, nameCol, blockChars,
      maxDistance)
    val clusters = Dedup.duplicateClusters(
      pairs.select("id_a", "id_b"), "id_a", "id_b")
    val assigned = records.select(col(idCol))
      .join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id",
        coalesce(col("cluster_id"), col(idCol)))
    val sizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
    assigned.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("n_members"))
  }
}
