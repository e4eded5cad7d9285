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

  // ---- Fellegi–Sunter linkage weights --------------------------------

  /** Per-field Fellegi–Sunter weight estimation over a LABELED
   *  candidate-pair frame: for each agreement column, m = P(fields
   *  agree | pair is a match) and u = P(agree | non-match) — the two
   *  numbers whose log-ratio orders every probabilistic linkage
   *  decision (a field with m≈1, u≈0 is discriminating; m≈u carries
   *  nothing). Estimated SUPERVISED from `labelCol` (the EM variant is
   *  a driver loop over exactly this aggregate; given labels, the
   *  closed form is one pass). Output one row per field:
   *  (field, n_matches, n_nonmatches, m_ppm, u_ppm) — ppm by INTEGER
   *  floor division, so any engine reproduces the estimate exactly.
   *
   *  Scale shape: ONE aggregate over the candidate frame produces
   *  every field's four counters (conditional sums, map-side
   *  combined); the per-field unpivot runs on that single row. */
  def linkageFieldWeights(
      pairs: DataFrame,
      labelCol: String,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    val aggs = Seq(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("__nm"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("__nu")) ++
      agreeCols.flatMap(f => Seq(
        sum(when(col(labelCol) && col(f), 1L).otherwise(0L))
          .as(s"__am_$f"),
        sum(when(!col(labelCol) && col(f), 1L).otherwise(0L))
          .as(s"__au_$f")))
    val one = pairs.agg(aggs.head, aggs.tail: _*)
    agreeCols.map { f =>
      one.select(lit(f).as("field"),
        col("__nm").as("n_matches"),
        col("__nu").as("n_nonmatches"),
        expr(s"CAST(__am_$f * 1000000 DIV __nm AS BIGINT)").as("m_ppm"),
        expr(s"CAST(__au_$f * 1000000 DIV __nu AS BIGINT)").as("u_ppm"))
    }.reduce(_ unionByName _).orderBy("field")
  }

  /** Agreement-pattern rollup — the evidence table behind the weights:
   *  one row per distinct agreement vector with its pair count, match
   *  count, and exact match rate in ppm. The pattern frame is at most
   *  2^|fields| rows of metadata. */
  def linkagePatterns(
      pairs: DataFrame,
      labelCol: String,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    pairs.groupBy(agreeCols.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_matches"))
      .withColumn("match_rate_ppm",
        expr("CAST(n_matches * 1000000 DIV n_pairs AS BIGINT)"))
      .orderBy(agreeCols.map(col(_).asc): _*)
  }
}
