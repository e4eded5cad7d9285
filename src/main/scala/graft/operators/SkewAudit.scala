package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shuffle-key skew audit — the pre-flight check before a groupBy/join
 * key is trusted at cluster scale: one reducer's key receiving a
 * multiple of the average partition's rows is the single most common
 * way a 100 TB job goes from "done in an hour" to "one straggler task
 * for six". The audit reports the hottest keys with their exact row
 * share and a per-key SALT factor — the number of ways to split that
 * key so its shards return to the average key's size — which is
 * exactly the parameter a salted-aggregation rewrite
 * (key, pmod(hash(row), salt)) needs.
 *
 * Scale shape: one count aggregate over the key columns (map-side
 * combined — the audit itself never skews, because partial counts
 * spread hot keys across mappers), a 1-row global stats frame
 * broadcast back (the P15 pattern), and a TakeOrdered top-K. Integer
 * arithmetic throughout (share in ppm, salt by ceiling division) so
 * the advisory is engine-exact.
 */
object SkewAudit {

  /** Top-`topK` hottest keys: (keyCols..., n_rows, share_ppm,
   *  salt_suggested). salt_suggested = ceil(n_rows · n_keys / total),
   *  floored at 1 — a uniform key suggests 1 (no salting needed); the
   *  2×-average key suggests 2. Deterministic order: count desc, then
   *  the key columns. */
  def keySkew(
      df: DataFrame,
      keyCols: Seq[String],
      topK: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(sum("n_rows").as("__total"),
      count(lit(1)).as("__n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(keyCols.map(col) ++ Seq(
        col("n_rows"),
        expr("CAST(n_rows * 1000000 DIV __total AS BIGINT)")
          .as("share_ppm"),
        greatest(lit(1L),
          expr("CAST((n_rows * __n_keys + __total - 1) DIV __total" +
            " AS BIGINT)")).as("salt_suggested")): _*)
      .orderBy((col("n_rows").desc +: keyCols.map(col(_).asc)): _*)
      .limit(topK)
  }
}
