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

  /** t-closeness audit (Li, Li & Venkatasubramanian) — the third leg
   *  of the release triad: a class can be k-anonymous AND l-diverse
   *  yet still leak when its sensitive-value DISTRIBUTION skews far
   *  from the table's (all-but-one member negative-balance in a
   *  nonneg-dominated table discloses plenty). Distance is the
   *  ordered-attribute Earth Mover's Distance over `numBuckets`
   *  ordinal buckets (`bucketCol` must hold ints in [0, numBuckets));
   *  for ordered values EMD reduces to the mean absolute difference
   *  of the cumulative distributions: Σ|P_i − Q_i| / (m−1).
   *
   *  Exactness: the EMD is computed in INTEGER arithmetic and floor-
   *  quantized to ppm — emd_ppm = 10⁶·Σ|cumC_i·G − cumG_i·C| div
   *  (C·G·(m−1)) with C = class size, G = table size — so any engine
   *  reproduces it bit-for-bit (float division would make the
   *  hash-compare flap). Returns classes with emd_ppm > tPpm.
   *
   *  Scale shape: one conditional-aggregation groupBy over the quasi
   *  columns (m fixed count columns per class — no pivot shuffle, no
   *  per-bucket rows), one 1-row global aggregate broadcast back; the
   *  class frame stays |distinct quasi combinations| rows. */
  def tClosenessViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      bucketCol: String,
      numBuckets: Int,
      tPpm: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(numBuckets >= 2 && numBuckets <= 64,
      "numBuckets must be in [2, 64] (m count columns per class)")
    def bucketCounts(prefix: String) = (0 until numBuckets).map(i =>
      sum(when(col(bucketCol) === i, 1L).otherwise(0L))
        .as(s"$prefix$i"))
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        bucketCounts("__c"): _*)
    val global = df.agg(count(lit(1)).as("__g_total"),
      bucketCounts("__g"): _*)
    // cumulative counts as expression sums over the fixed m columns
    def cum(prefix: String, i: Int) =
      (0 to i).map(j => col(s"$prefix$j")).reduce(_ + _)
    val num = (0 until numBuckets - 1).map(i =>
      abs(cum("__c", i) * col("__g_total") -
        cum("__g", i) * col("class_size"))).reduce(_ + _)
    classes.crossJoin(broadcast(global))
      .withColumn("__emd_num", num)
      .withColumn("emd_ppm",
        expr(s"CAST(__emd_num * 1000000 DIV " +
          s"(class_size * __g_total * ${numBuckets - 1}) AS BIGINT)"))
      .filter(col("emd_ppm") > tPpm)
      .select(quasiCols.map(col) ++
        Seq(col("class_size"), col("emd_ppm")): _*)
      .orderBy((col("emd_ppm").desc +: quasiCols.map(col(_).asc)): _*)
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

  /** ==NOT a differentially-private release== — the name says SEEDED
   *  because the Laplace noise is a deterministic function of
   *  (seed, group key) alone, independent of the data: anyone who
   *  knows the seed recovers the exact counts, and re-releasing after
   *  updates leaks exact deltas. What this IS: the Laplace mechanism's
   *  TESTABLE core (per-group counts + Laplace(1/ε) noise, count
   *  sensitivity 1) with a pinned draw, so any engine replays the
   *  release bit-for-bit (the x06 portable-hash discipline) — and the
   *  "stable across reruns" variant some pipelines actually want. For
   *  a release with the ε-DP guarantee, use [[dpGroupCountsFresh]].
   *
   *  u ∈ (0,1) from the group's md5; noise = −(1/ε)·sign(u−½)·
   *  ln(1−2|u−½|); the noise micro-quantizes before adding so the
   *  noisy count is engine-exact. True counts are NOT in the output
   *  (they would defeat the release); specs verify the mechanism by
   *  recomputing the draw. Scale: one group-keyed aggregate plus
   *  map-only noise arithmetic. */
  def seededLaplaceCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double = 1.0,
      seed: String = "dp-v1"): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    // a null group is not a releasable cohort — and it would
    // null-propagate through the md5 seed into a silent NULL release;
    // drop it explicitly (the source-keyed oracle convention)
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    counts
      // 32-bit md5 prefix -> u in (0,1): the +0.5 offset keeps u off
      // both endpoints, so ln(1-2|u-0.5|) is finite for every draw
      .withColumn("__h",
        conv(substring(md5(concat(lit(seed), lit(":"),
          col(groupCol).cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("__u",
        (col("__h").cast("double") + 0.5) / 4294967296.0)
      .withColumn("__noise_micro",
        round((lit(-1.0 / epsilon)
          * signum(col("__u") - 0.5)
          * log(lit(1.0) - lit(2.0) * abs(col("__u") - 0.5))) * 1e6, 0)
          .cast("long"))
      .select(col(groupCol),
        lit(epsilon).as("epsilon"),
        round(col("__n").cast("double")
          + col("__noise_micro").cast("double") / 1e6, 6)
          .as("noisy_count"))
      .orderBy(groupCol)
  }

  /** ε-DP group counts with FRESH Laplace noise — the actual release
   *  mode: noise is drawn from `rand()` with a per-run seed, so two
   *  publications of the same data differ and the seeded-replay
   *  recovery attack on [[seededLaplaceCounts]] does not apply. NOT
   *  oracle-replayable by construction (specs pin distributional
   *  properties instead). Standard caveat: double-precision Laplace
   *  sampling admits the Mironov floating-point attack; a hardened
   *  release would use the snapping mechanism or discrete Laplace.
   *  Re-releasing after data updates still composes: spend ε per
   *  publication. */
  def dpGroupCountsFresh(
      df: DataFrame,
      groupCol: String,
      epsilon: Double = 1.0): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    counts
      // keep u off both endpoints so ln(1-2|u-0.5|) stays finite
      .withColumn("__u", rand() * lit(1.0 - 1e-9) + lit(5e-10))
      .withColumn("__noise",
        lit(-1.0 / epsilon)
          * signum(col("__u") - 0.5)
          * log(lit(1.0) - lit(2.0) * abs(col("__u") - 0.5)))
      .select(col(groupCol),
        lit(epsilon).as("epsilon"),
        (col("__n").cast("double") + col("__noise")).as("noisy_count"))
      .orderBy(groupCol)
  }
}
