package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Trainable corpus classification — the CCNet/fastText-shaped quality
 * and domain filter of a training-data pipeline, as a Multinomial
 * Naive Bayes model expressed in pure Spark aggregations (reference
 * analog: sparvi's per-source quality gating; the model itself is the
 * standard public NB formulation with Laplace smoothing).
 *
 * Why NB and not a gradient model: at 100 TB the training pass must be
 * a single token-keyed aggregation with map-side combine — NB's
 * sufficient statistics ARE counts, so "training" is one groupBy and
 * the model is a small (label × vocab) frame that broadcasts or
 * shuffle-joins by token. No driver iteration, no collect of anything
 * larger than two scalars (vocab size, corpus doc count).
 *
 * Determinism discipline (shared with TextAnalysis.unigramLogProb):
 * every per-token log-probability is quantized to integer micro-nats
 * BEFORE any sum. Double sums are order-dependent in their last ulps
 * and partial-aggregation order is nondeterministic across runs and
 * engines; integer sums are exact, so the argmax label is reproducible
 * bit-for-bit against an independent implementation.
 *
 * Scale shapes:
 *  - train: one explode + one (label, token) groupBy — map-side
 *    combined, shuffle keys are short strings.
 *  - score: one token-keyed join of doc term frequencies against the
 *    model (the only large shuffle), then a (doc × label) grid built
 *    from a BROADCAST of the per-label metadata — never doc × vocab.
 *    Unseen-token mass is closed-form ((n_tok − hit_tf) · unseen), so
 *    tokens outside the vocabulary never join anything.
 */
object Classify {

  /** A trained model: per-(label, token) and per-label integer
   *  micro-nat scores. Both frames are engine-portable data (no UDTs),
   *  so they persist through any store and merge across slices by
   *  re-aggregation of the underlying counts. */
  final case class NBModel(
      tokenScores: DataFrame, // (labelCol, token, lp_micro: long)
      labelMeta: DataFrame, // (labelCol, prior_micro, unseen_micro: long)
      labelCol: String)

  /** ONE tokenizer across the text stack: ROOT-locale lowercase, \s+
   *  split, empties dropped — identical to the dedup shingler and the
   *  unigram/bigram LM paths, so a classifier trained here scores the
   *  same token stream those operators profile. */
  private def tokens(textCol: String) = {
    split(lower(trim(col(textCol))), "\\s+")
  }

  /** The model's sufficient statistics — NB "training" is counting, so
   *  a slice's state is two count frames and states MERGE EXACTLY by
   *  union + re-aggregation (the same mergeability contract as the
   *  profiler's sketch states). Persist per-slice states and refresh
   *  the model on each ingest without re-reading old text. */
  final case class NBState(
      tokenCounts: DataFrame, // (labelCol, token, cnt: long)
      docCounts: DataFrame, // (labelCol, n_docs: long)
      labelCol: String)

  /** One slice's sufficient statistics: one (label, token) groupBy +
   *  one label groupBy, both map-side combined. */
  def nbState(
      slice: DataFrame,
      textCol: String = "text",
      labelCol: String = "label"): NBState = {
    val toks = slice
      .select(col(labelCol), explode(tokens(textCol)).as("token"))
      .filter(length(col("token")) > 0)
    NBState(
      toks.groupBy(col(labelCol), col("token"))
        .agg(count(lit(1)).as("cnt")),
      slice.groupBy(col(labelCol)).agg(count(lit(1)).as("n_docs")),
      labelCol)
  }

  /** Exact state merge: counts add. Order-independent, so daily slices
   *  combine in any grouping — merge(a, merge(b, c)) ≡ train(a∪b∪c). */
  def nbMerge(states: Seq[NBState]): NBState = {
    require(states.nonEmpty, "nbMerge needs at least one state")
    val l = states.head.labelCol
    require(states.forall(_.labelCol == l),
      "nbMerge: states disagree on the label column")
    NBState(
      states.map(_.tokenCounts).reduce(_ unionByName _)
        .groupBy(col(l), col("token")).agg(sum("cnt").as("cnt")),
      states.map(_.docCounts).reduce(_ unionByName _)
        .groupBy(col(l)).agg(sum("n_docs").as("n_docs")),
      l)
  }

  /** Persist / restore a state (plain parquet — engine-portable). */
  def nbStateSave(state: NBState, dir: String): Unit = {
    state.tokenCounts.write.mode("overwrite").parquet(s"$dir/token_counts")
    state.docCounts.write.mode("overwrite").parquet(s"$dir/doc_counts")
  }

  def nbStateLoad(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      labelCol: String = "label"): NBState =
    NBState(spark.read.parquet(s"$dir/token_counts"),
      spark.read.parquet(s"$dir/doc_counts"), labelCol)

  /** Finish a model from (possibly merged) sufficient statistics —
   *  the smoothing/prior/quantization arithmetic of
   *  [[trainNaiveBayes]], factored so batch and incremental training
   *  are the same code path. */
  def modelFromState(state: NBState): NBModel = {
    val labelCol = state.labelCol
    // cache the sufficient statistics for the multiple passes below,
    // then localCheckpoint the two (small) model frames so the cache
    // can be RELEASED before returning — a plain cache() here leaked
    // one pinned frame per train/merge/compact call (r10 advice)
    val counts = state.tokenCounts
    counts.cache()
    val vocab = counts.select("token").distinct().count()
    val totals = counts.groupBy(col(labelCol)).agg(sum("cnt").as("tot"))
    val nDocs = state.docCounts.agg(sum("n_docs")).head().getLong(0)
    val docsPerLabel = state.docCounts
    val tokenScores = counts.join(totals, labelCol)
      .withColumn("lp_micro",
        round(log((col("cnt") + lit(1)).cast("double") /
          (col("tot") + lit(vocab))) * 1e6, 0).cast("long"))
      .select(col(labelCol), col("token"), col("lp_micro"))
    val labelMeta = docsPerLabel.join(totals, labelCol)
      .withColumn("prior_micro",
        round(log(col("n_docs").cast("double") / lit(nDocs.toDouble)) * 1e6,
          0).cast("long"))
      .withColumn("unseen_micro",
        round(log(lit(1.0) / (col("tot") + lit(vocab)).cast("double")) * 1e6,
          0).cast("long"))
      .select(col(labelCol), col("prior_micro"), col("unseen_micro"))
    // eager localCheckpoint materializes both frames off the counts
    // lineage (blocks are context-cleaned on GC, unlike a cache)
    val model = NBModel(tokenScores.localCheckpoint(true),
      labelMeta.localCheckpoint(true), labelCol)
    counts.unpersist()
    model
  }

  /** Train Multinomial NB with add-one (Laplace) smoothing over the
   *  training vocabulary. P(token|label) = (cnt + 1) / (tot_l + V);
   *  prior P(label) = docs_l / docs. Only two driver-side scalars are
   *  read (V and the doc count) — the model itself never leaves the
   *  cluster. Batch training is exactly the incremental path with one
   *  slice: state → model. */
  def trainNaiveBayes(
      train: DataFrame,
      textCol: String = "text",
      labelCol: String = "label"): NBModel =
    modelFromState(nbState(train, textCol, labelCol))

  /** Score a corpus: per doc, argmax over labels of
   *  prior + Σ tf(token)·lp(label, token), with every token absent
   *  from (label, vocab) contributing the label's smoothed unseen
   *  score. Ties break to the lexicographically smallest label so the
   *  prediction is total. Returns (idCol, predicted, score_micro) —
   *  the score stays in integer micro-nats (exact, order-independent).
   *  CONTRACT: every input doc gets exactly one row — a doc whose text
   *  is null/empty/whitespace-only scores prior-only (n_tok = 0),
   *  identical to [[scoreBroadcast]].
   */
  def scoreNaiveBayes(
      model: NBModel,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val l = model.labelCol
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col(l).asc)
    scoredGrid(model, docs, idCol, textCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(l).as("predicted"), col("score_micro"))
  }

  /** The full (doc × label) score grid both pickers rank over. */
  private def scoredGrid(
      model: NBModel,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val l = model.labelCol
    val toks = docs
      .select(col(idCol), explode(tokens(textCol)).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // left join from the doc frame so token-less docs (null/empty/
    // whitespace text) keep a row and score prior-only — the same
    // total contract as the broadcast scorer
    val docLen = docs.select(col(idCol))
      .join(tf.groupBy(col(idCol)).agg(sum("tf").as("__n")),
        Seq(idCol), "left")
      .withColumn("n_tok", coalesce(col("__n"), lit(0L)))
      .select(col(idCol), col("n_tok"))
    // the one big shuffle: token-keyed join of doc tf against the model
    val hits = tf.join(model.tokenScores, "token")
      .groupBy(col(idCol), col(l))
      .agg(sum(col("tf") * col("lp_micro")).as("hit_sum"),
        sum(col("tf")).as("hit_tf"))
    // (doc × label) grid from a broadcast of the tiny per-label frame;
    // unseen mass is closed-form so out-of-vocab tokens never join
    val grid = docLen.crossJoin(broadcast(model.labelMeta))
    grid.join(hits, Seq(idCol, l), "left")
      .withColumn("score_micro",
        col("prior_micro") + coalesce(col("hit_sum"), lit(0L)) +
          (col("n_tok") - coalesce(col("hit_tf"), lit(0L))) *
          col("unseen_micro"))
  }

  /** [[scoreNaiveBayes]] plus the top-1-vs-top-2 score margin — the
   *  model's own confidence signal, in the same exact integer
   *  micro-nats as the scores (a softmax would be float-fragile and
   *  adds nothing: the margin IS the log of the top-two odds ratio).
   *  Same plan as the plain scorer — one extra lead() in the existing
   *  per-doc window, no new shuffle. `margin_micro` is NULL for a
   *  single-label model (there is no second-best to measure against).
   */
  def scoreWithMargin(
      model: NBModel,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val l = model.labelCol
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col(l).asc)
    scoredGrid(model, docs, idCol, textCol)
      .withColumn("__rk", row_number().over(w))
      .withColumn("__next", lead(col("score_micro"), 1).over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(l).as("predicted"), col("score_micro"),
        (col("score_micro") - col("__next")).as("margin_micro"))
  }

  /** Margin-reliability curve: does a bigger scoring margin actually
   *  mean a more reliable prediction? Buckets are the BIT LENGTH of
   *  (margin + 1) — log2-spaced bins computed with integer bit
   *  arithmetic (`length(bin(x))`), never float log2, whose libm
   *  rounding could flip a power-of-two boundary between engines.
   *  Output is O(bits): per bucket, doc count, hit count, accuracy —
   *  the curve that calibrates "how big a margin do I need before
   *  auto-accepting this label at 100 TB" from a held-out slice.
   *  Scale shape: one join on the doc id + a ≤64-row groupBy. */
  def reliabilityByMargin(
      scored: DataFrame,
      actual: DataFrame,
      idCol: String = "doc_id",
      labelCol: String = "label"): DataFrame =
    scored.join(actual.select(col(idCol), col(labelCol).as("__actual")),
        Seq(idCol))
      .withColumn("margin_bucket",
        length(bin(col("margin_micro") + 1)))
      .groupBy("margin_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("predicted") === col("__actual"), 1L)
          .otherwise(0L)).as("n_correct"),
        min("margin_micro").as("min_margin"),
        max("margin_micro").as("max_margin"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n_docs"), 6))

  /** Serving form of the model: the training vocabulary capped to the
   *  `maxVocab` highest-total-count tokens (ties → token asc), then the
   *  model finished over the REDUCED vocabulary — the fastText/CCNet
   *  serving shape. Dropped tokens score as unseen; V, per-label
   *  totals, priors and unseen mass are all recomputed from the kept
   *  counts, so this is exactly "train on a capped vocabulary", not a
   *  lossy truncation of an existing model. The result is small enough
   *  to broadcast and score map-only (see [[scoreBroadcast]]). */
  def compactModel(state: NBState, maxVocab: Int): NBModel = {
    val l = state.labelCol
    // top-N by TakeOrdered (orderBy+limit), never a global window —
    // the token-count frame is vocab-sized but a single-partition
    // row_number over it would still serialize the whole vocabulary
    val ranked = state.tokenCounts
      .groupBy(col("token")).agg(sum("cnt").as("__tot"))
      .orderBy(col("__tot").desc, col("token").asc)
      .limit(maxVocab)
      .select("token")
    modelFromState(NBState(
      state.tokenCounts.join(broadcast(ranked), "token")
        .select(col(l), col("token"), col("cnt")),
      state.docCounts, l))
  }

  /** Map-only scorer for a COMPACT model: the (label × vocab) scores
   *  collect to a broadcast map and every doc scores in place — no
   *  shuffle, no aggregation, so this runs on a STREAMING frame (the
   *  model-at-ingest serving path) as well as batch. Same output and
   *  the same integer arithmetic as [[scoreNaiveBayes]] — including a
   *  prior-only row for token-less docs; a UDF is used
   *  deliberately — there is no built-in expression for scoring against
   *  a broadcast hash of (token → per-label weights). Fails loudly if
   *  the model was never capped (use [[compactModel]] first). */
  def scoreBroadcast(
      model: NBModel,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBroadcastRows: Long = 2000000L): DataFrame = {
    val l = model.labelCol
    val metaRows = model.labelMeta
      .select(col(l).cast("string"), col("prior_micro"),
        col("unseen_micro"))
      .collect().sortBy(_.getString(0))
    val labels = metaRows.map(_.getString(0))
    val priors = metaRows.map(_.getLong(1))
    val unseens = metaRows.map(_.getLong(2))
    val labelIdx = labels.zipWithIndex.toMap
    val scoreRows = model.tokenScores
      .select(col(l).cast("string"), col("token"), col("lp_micro"))
    require(scoreRows.count() <= maxBroadcastRows,
      s"model has more than $maxBroadcastRows (label, token) scores — " +
        "cap the vocabulary with compactModel before broadcast scoring")
    // token → per-label lp array; Long.MinValue marks "this label never
    // saw the token" (its smoothed unseen mass applies instead)
    val tokMap = new java.util.HashMap[String, Array[Long]]()
    scoreRows.collect().foreach { r =>
      val arr = tokMap.computeIfAbsent(r.getString(1),
        _ => Array.fill(labels.length)(Long.MinValue))
      arr(labelIdx(r.getString(0))) = r.getLong(2)
    }
    val bTok = docs.sparkSession.sparkContext.broadcast(tokMap)
    val score = udf { text: String =>
      val sums = priors.clone()
      if (text != null) {
        val words = text.trim.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+")
        var i = 0
        while (i < words.length) {
          if (words(i).nonEmpty) {
            val arr = bTok.value.get(words(i))
            var j = 0
            while (j < sums.length) {
              sums(j) +=
                (if (arr != null && arr(j) != Long.MinValue) arr(j)
                 else unseens(j))
              j += 1
            }
          }
          i += 1
        }
      }
      var best = 0
      var j = 1
      while (j < sums.length) { // strict > keeps the asc-label tie rule
        if (sums(j) > sums(best)) best = j
        j += 1
      }
      (labels(best), sums(best))
    }
    docs.select(col(idCol), score(col(textCol)).as("__p"))
      .select(col(idCol), col("__p._1").as("predicted"),
        col("__p._2").as("score_micro"))
  }

  /** Per-class precision / recall / F1 from a frame carrying truth and
   *  predicted label columns — the classifier-agnostic report that
   *  closes the eval family (e17 ANN recall, d12 dedup P/R). Three
   *  label-keyed aggregations over the scored frame, label-count rows
   *  out: metadata scale at any corpus size. Classes appearing only in
   *  truth or only in predictions still get their row (their missing
   *  side counts 0); F1 is the closed Dice form 2·correct/(pred+truth),
   *  no intermediate rounding. */
  def classificationReport(
      scored: DataFrame,
      truthCol: String = "truth",
      predCol: String = "predicted"): DataFrame = {
    val t = scored.groupBy(col(truthCol).as("class"))
      .agg(count(lit(1)).as("n_truth"))
    val p = scored.groupBy(col(predCol).as("class"))
      .agg(count(lit(1)).as("n_pred"))
    val c = scored.filter(col(truthCol) === col(predCol))
      .groupBy(col(truthCol).as("class"))
      .agg(count(lit(1)).as("n_correct"))
    t.join(p, Seq("class"), "full_outer")
      .join(c, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .select(col("class"), col("n_truth"), col("n_pred"),
        col("n_correct"),
        when(col("n_pred") === 0, lit(null))
          .otherwise(round(col("n_correct").cast("double") /
            col("n_pred"), 6)).as("precision"),
        when(col("n_truth") === 0, lit(null))
          .otherwise(round(col("n_correct").cast("double") /
            col("n_truth"), 6)).as("recall"),
        when(col("n_pred") + col("n_truth") === 0, lit(null))
          .otherwise(round(lit(2.0) * col("n_correct") /
            (col("n_pred") + col("n_truth")), 6)).as("f1"))
  }

  /** Held-out evaluation: confusion counts + accuracy of the model on
   *  a labeled frame. One groupBy over (truth, predicted) — the grid
   *  is label² rows, metadata scale. */
  def evaluate(
      model: NBModel,
      labeled: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val truth = labeled.select(col(idCol),
      col(model.labelCol).as("truth"))
    scoreNaiveBayes(model, labeled, idCol, textCol)
      .join(truth, idCol)
      .groupBy(col("truth"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
