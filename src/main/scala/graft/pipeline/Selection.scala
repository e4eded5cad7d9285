package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection via importance resampling (DSIR, Xie et al. 2023):
 * pick raw-pool documents whose hashed n-gram profile looks like a
 * target corpus. The importance weight of a doc is
 * Σ_f tf(f) · (log p_target(f) − log p_raw(f)) over hashed bigram
 * features f — two smoothed unigram models over a fixed feature space.
 *
 * Scale shape: exactly TWO corpus passes. Pass 1 aggregates BOTH
 * feature models in one map-side-combined groupBy (B = 4096 result
 * rows, collected — the models are metadata no matter the corpus
 * size). Pass 2 scores: the per-doc feature tf frame joins the
 * B-row BROADCAST score grid and sums per doc — one doc-keyed
 * shuffle, nothing quadratic, and the raw text never shuffles (only
 * (doc, bucket, tf) triples).
 *
 * Engine-exact: features hash through the stable md5 bucket (the same
 * portable hash as [[Sampling.hashBucket]]); the log-probability
 * quantization runs as Spark `round(log(...))` column expressions
 * over the collected model frame, so the arithmetic is the engine's
 * own (the [[Classify]] micro-nat convention) and every weight and
 * the top-k cut are bit-reproducible from any engine.
 */
object Selection {

  /** Per-doc hashed-bigram features with the doc's target flag:
   *  (idCol, __t, bucket, tf). */
  private def docFeatures(
      docs: DataFrame,
      targetFilter: Column,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = expr(
      """filter(transform(sequence(0, size(__toks) - 2),
        |  i -> array_join(slice(__toks, i + 1, 2), ' ')),
        |  g -> g != '')""".stripMargin)
    docs
      .select(col(idCol), targetFilter.as("__t"), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), col("__t"), explode(grams).as("__g"))
      .select(col(idCol), col("__t"),
        Sampling.hashBucket(col("__g"), buckets).as("bucket"))
      .groupBy(col(idCol), col("__t"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Importance weight per doc: (idCol, n_feat, weight_micro). Docs
   *  with no bigrams weigh 0. `targetFilter` marks the target slice
   *  INSIDE `docs` (it also stays in the raw pool, per DSIR: raw =
   *  the whole pool). */
  def dsirWeights(
      docs: DataFrame,
      targetFilter: Column,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    val feats = docFeatures(docs, targetFilter, idCol, textCol, buckets)
    // pass 1: both models in one groupBy; ≤ B rows come back
    val countRows = feats.groupBy("bucket")
      .agg(sum("tf").as("rc"),
        sum(when(col("__t"), col("tf")).otherwise(0L)).as("tc"))
      .collect()
    val rTot = countRows.map(_.getLong(1)).sum
    val tTot = countRows.map(_.getLong(2)).sum
    import spark.implicits._
    val counts = countRows
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("bucket", "rc", "tc")
    def lpMicro(cnt: Column, total: Long): Column =
      round(log((cnt + lit(1)).cast("double") /
        lit((total + buckets).toDouble)) * 1e6, 0).cast("long")
    // the engine's own round(log(...)) arithmetic, on a local B-row
    // frame — a bucket absent from the target scores the smoothed
    // tc = 0 floor through the same expression
    val scores = counts.select(col("bucket"),
      (lpMicro(col("tc"), tTot) - lpMicro(col("rc"), rTot)).as("__d"))
    // pass 2: score — broadcast the B-row grid, one doc-keyed shuffle
    val perDoc = feats.join(broadcast(scores), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("__d")).as("__w"),
        sum("tf").as("__n"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_feat"),
        coalesce(col("__w"), lit(0L)).as("weight_micro"))
  }

  /** Top-k most target-like docs from the pool (TakeOrdered under
   *  (weight desc, id asc) — no global sort). */
  def dsirSelect(
      docs: DataFrame,
      targetFilter: Column,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 4096): DataFrame =
    dsirWeights(docs, targetFilter, idCol, textCol, buckets)
      .orderBy(col("weight_micro").desc, col(idCol).asc)
      .limit(k)
}
