package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The full corpus-curation pipeline in one composition — what the
 * individual operators exist FOR. Order matters and is the cheap-first
 * order a 100 TB run wants:
 *
 *   1. quality gate   — map-only text metrics (languageId, qualityScore,
 *                       token count); drops the bulk of junk before any
 *                       shuffle touches it
 *   2. decontaminate  — broadcast n-gram overlap vs the benchmark set;
 *                       one pass over the survivors
 *   3. dedup          — exact + MinHash-LSH near-dup → connected
 *                       components → one canonical doc per cluster
 *                       (the only shuffling stage, run on the smallest
 *                       possible corpus)
 *   4. split          — deterministic md5 train/val/test assignment
 *
 * Output: the surviving docs with their text metrics and a `split`
 * column, ready to write partitioned by split.
 */
object Curation {

  final case class CurationConfig(
      minQualityScore: Double = 0.5,
      minTokens: Int = 10,
      allowedLangs: Seq[String] = Nil, // empty = any language
      // language gate detector: false = the 4-language heuristic baked
      // into profileText's lang_detected; true = the two-tier
      // multilingual detector (9 scripts + 11 stopword profiles) —
      // required when allowedLangs names non-Latin languages
      multilingualId: Boolean = false,
      // decontamination: max fraction of a doc's distinct n-grams found
      // in the benchmark set; None or no benchmark = skip the gate
      maxContamination: Option[Double] = Some(0.2),
      contaminationNgram: Int = 2,
      jaccardThreshold: Double = 0.9,
      trainFraction: Double = 0.8,
      valFraction: Double = 0.1)

  def curateCorpus(
      docs: DataFrame,
      benchmark: Option[DataFrame] = None,
      config: CurationConfig = CurationConfig(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    curateCorpusStaged(docs, benchmark, config, idCol, textCol,
      checkpointStages = false).curated

  /** The per-stage frames of one [[curateCorpus]] cascade — what a
   *  pipeline with per-stage observability (funnel accounting, gate
   *  audits, drop-rate alerts) consumes. Semantics are IDENTICAL to
   *  [[curateCorpus]]: `curated` is literally what it returns.
   *
   *  `afterQuality`/`afterDecontamination` keep the full profiled
   *  schema, so stage audits need no re-profiling pass. */
  final case class CurationStages(
      afterQuality: DataFrame,
      afterDecontamination: DataFrame,
      curated: DataFrame)

  /** [[curateCorpus]] with every stage boundary exposed. With
   *  `checkpointStages = true` each boundary frame is
   *  `localCheckpoint`ed — the right call when the CALLER also reads
   *  the intermediate frames (each then has ≥ 2 consumers, and without
   *  the cut every consumer would recompute the whole upstream
   *  cascade); leave it false when only `curated` is consumed and the
   *  stages exist for inspection-on-demand, where lazy frames cost
   *  nothing unless read. */
  def curateCorpusStaged(
      docs: DataFrame,
      benchmark: Option[DataFrame] = None,
      config: CurationConfig = CurationConfig(),
      idCol: String = "doc_id",
      textCol: String = "text",
      checkpointStages: Boolean = true,
      // per-stage wall-clock observer (graft.FunnelSoak's hook): each
      // eager checkpoint is a stage boundary, so timing it times the
      // stage. When set, the dedup boundary gets its OWN checkpoint so
      // dedup and split report separately; product callers (onStage
      // unset) keep the exact two-checkpoint plan they always had.
      onStage: Option[(String, Double) => Unit] = None): CurationStages = {
    def cut(df: DataFrame): DataFrame =
      if (checkpointStages) df.localCheckpoint() else df
    // boundary-to-boundary walls: a stage is billed everything since
    // the PREVIOUS boundary, because operators like dedupCorpus run
    // eager internal actions (pointer-jumping checkpoints) during
    // CONSTRUCTION — timing only the final checkpoint would leave that
    // work between stages, unaccounted
    var lastMark = System.nanoTime()
    def cutTimed(stage: String)(df: DataFrame): DataFrame =
      onStage match {
        case Some(cb) if checkpointStages =>
          val out = df.localCheckpoint()
          val now = System.nanoTime()
          cb(stage, (now - lastMark) / 1e9)
          lastMark = now
          out
        case _ => cut(df)
      }
    // 1. quality gate (map-only; composes into the scan)
    var kept = TextAnalysis.profileText(docs, textCol)
      .filter(col("quality_score") >= config.minQualityScore)
      .filter(col("n_tokens") >= config.minTokens)
    if (config.allowedLangs.nonEmpty) {
      val langCol =
        if (config.multilingualId) TextAnalysis.detectLanguage(col(textCol))
        else col("lang_detected")
      kept = kept.filter(langCol.isInCollection(config.allowedLangs))
    }
    val afterQuality = cutTimed("quality_gate")(kept)

    // 2. decontamination (broadcast benchmark, one pass)
    val afterDecon = (benchmark, config.maxContamination) match {
      case (Some(bench), Some(maxC)) =>
        val leaky = TextAnalysis.contamination(afterQuality, bench,
          idCol, textCol, config.contaminationNgram)
          .filter(col("contamination") > maxC)
          .select(col(idCol))
        cutTimed("decontamination")(
          afterQuality.join(leaky, Seq(idCol), "left_anti"))
      case _ => afterQuality
    }

    // 3. dedup (exact + near-dup clusters → canonical survivors);
    // boundary checkpointed only under a timer (see onStage above)
    val deduped0 = Dedup.dedupCorpus(afterDecon, idCol, textCol,
      config.jaccardThreshold)
    val deduped =
      if (onStage.isDefined) cutTimed("dedup")(deduped0) else deduped0

    // 4. deterministic split
    CurationStages(afterQuality, afterDecon,
      Sampling.hashSplit(deduped, idCol,
        config.trainFraction, config.valFraction))
  }

  /** Per-stage accounting for one [[incrementalIngest]] turn. */
  final case class IngestReport(
      arrived: Long,
      afterQuality: Long,
      droppedExactWithin: Long,
      droppedNearDup: Long,
      kept: Long)

  /** One daily-ingest turn against the PERSISTED stores — the
   *  incremental twin of [[curateCorpus]], composing the verified
   *  parts into the shape a 100 TB pipeline actually runs every day:
   *
   *   1. quality gate (map-only, same knobs as curateCorpus);
   *   2. exact dedup WITHIN the slice (first id per content hash);
   *   3. near-dup screen: the slice signs at O(slice) with the store's
   *      own MinHash parameters and matches against the persisted
   *      signatures PLUS earlier slice docs — a slice doc drops if it
   *      matches the store or a smaller-id slice doc (cross-slice
   *      exact copies land here too, at signature agreement 1.0);
   *   4. survivors' signatures APPEND to the store (old text never
   *      re-read, old signatures never recomputed);
   *   5. optionally, the survivors record as a profile slice in a
   *      [[graft.profiler.SliceStateStore]] — so profile/quantile/
   *      top-K ranges cover the new day with no rescan.
   *
   *  Returns (kept docs, per-stage report). Caller contract follows
   *  `minhashStoreAppend`: slice ids must be new to the store. Chain
   *  convention within a slice is greedy min-id (A~B~C keeps A),
   *  matching `dedupCorpus`'s canonical-min outcome. */
  def incrementalIngest(
      newDocs: DataFrame,
      minhashStorePath: String,
      stateStore: Option[(graft.profiler.SliceStateStore, String)] = None,
      config: CurationConfig = CurationConfig(),
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, IngestReport) = {
    val spark = newDocs.sparkSession
    val store = Dedup.minhashStoreLoad(spark, minhashStorePath)
    val turn = ingestSliceCore(newDocs, store, config, idCol, textCol)
    try {
      turn.keptSigs
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$minhashStorePath/signatures")
      stateStore.foreach { case (st, sliceId) =>
        st.record(turn.kept, sliceId) }
      (turn.kept, turn.finishReport())
    } finally turn.release()
  }

  /** One slice turn's outputs: `kept` docs, their already-computed
   *  `keptSigs` signatures (backed by the turn's caches until
   *  [[release]] — append them BEFORE releasing), the report thunk
   *  (call AFTER an action has executed the turn's frames — it reads
   *  the observed metrics), and the cache releaser. */
  private[graft] final case class SliceTurn(
      kept: DataFrame,
      keptSigs: DataFrame,
      finishReport: () => IngestReport,
      release: () => Unit)

  /** The slice turn WITHOUT store IO and WITHOUT its own action —
   *  shared by [[incrementalIngest]] (load store, turn, append) and
   *  [[graft.scheduler.IngestScheduler]]'s multi-slice tick (load
   *  ONCE, carry signatures in memory across the tick's slices, ONE
   *  append). EVERY count — the quality gate, the exact-dedup
   *  survivor count, the near-dup drop count — rides the returned
   *  frames as `observe` metrics, so the whole turn materializes in
   *  whatever single action the caller runs (normally the signature
   *  append: it pulls the cached drops through the anti-join, which
   *  pulls the cached signatures, which pulls the gated scan — one
   *  pass fires every metric). */
  private[graft] def ingestSliceCore(
      newDocs: DataFrame,
      store: Dedup.MinhashStore,
      config: CurationConfig = CurationConfig(),
      idCol: String = "doc_id",
      textCol: String = "text"): SliceTurn = {
    import org.apache.spark.sql.Observation
    val pass = col("quality_score") >= config.minQualityScore &&
      col("n_tokens") >= config.minTokens
    val gateObs = Observation()
    val exactObs = Observation()
    // qualityGate, not profileText: the gate reads only n_tokens +
    // quality_score (identical arithmetic) and skips the
    // language-marker / subword lanes. No cache here — the scan is
    // consumed once, by exactKept's window.
    val prof = TextAnalysis.qualityGate(newDocs, textCol, spread = false)
      .observe(gateObs, count(lit(1)).as("arrived"),
        count(when(pass, lit(1))).as("after_quality"))
    // exact dedup in ONE exchange: first id per content hash via a
    // hash-partitioned row_number (the groupBy-min + semi-join form
    // costs two). Cached: the sign kernel, the caller's kept uses,
    // and any state record all read this frame.
    val exactKept = prof.filter(pass)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col(textCol).cast("binary")))
          .orderBy(col(idCol))))
      .filter(col("__rn") === 1).drop("__rn")
      .observe(exactObs, count(lit(1)).as("after_exact"))
      .cache()
    // sign ONCE with the store's parameters and reuse the cached
    // signatures for BOTH the near-dup match and the store append —
    // the per-doc shingle+128-hash kernel is the slice's dominant
    // compute and the old flow (incrementalNearDuplicates, then
    // minhashStoreAppend) ran it twice
    val sliceSigs = Dedup.minhashSignatures(exactKept, store.idCol,
      textCol, store.shingleK, store.numHashes, store.numBands,
      store.seed, spread = false).cache()
    val matches = Dedup.incrementalNearDuplicatesFromSignatures(
      store, sliceSigs, config.jaccardThreshold)
    // matches mix two pair shapes — (slice, store): drop the slice
    // side id_a; (slice, slice) with id_a < id_b: drop the later
    // id_b — distinguished by the within_slice flag the band match
    // already carries (no membership join).
    // cached: drops feeds the count AND the kept anti-join — without
    // it the whole band-match DAG re-executes for the store append
    val drops = matches
      .select(when(col("within_slice"), col("id_b"))
        .otherwise(col("id_a")).as(idCol))
      .distinct()
      .cache()
    val kept = exactKept.join(drops, Seq(idCol), "left_anti")
    // the survivors' ALREADY-computed signatures (same deterministic
    // UDF ⇒ bit-identical to re-signing kept); anti-join on the tiny
    // cached drops, not a semi-join through kept's DAG.
    // COUNT SURVIVORS, NOT DROPS: an Observation on the `drops` branch
    // is silently PRUNED when the slice is clean — AQE rewrites a
    // left-anti join whose right side turns out empty to just its left
    // side, the CollectMetrics node vanishes with it, and the report
    // threw `key not found: dropped` on exactly the happy path (found
    // by the r13 sf0.001 sweep: tiny slices have no near-dups). The
    // root of the materialized frame always executes, so the kept
    // count is observed THERE and dropped derives arithmetically.
    val keptObs = Observation()
    val keptSigs = sliceSigs.join(drops, Seq(idCol), "left_anti")
      .observe(keptObs, count(lit(1)).as("kept_sigs"))
    SliceTurn(kept, keptSigs,
      () => {
        // Observations can come back PARTIAL on degenerate slices:
        // once any intermediate frame turns out empty, AQE's
        // empty-relation propagation can prune the plan subtree a
        // CollectMetrics node lives in, and its keys never arrive
        // (r13: an all-garbage slice lost `arrived`, a clean slice
        // lost `dropped`). Read each metric tolerantly and REPAIR a
        // missing one with a direct count — the fallback only runs on
        // the degenerate path, where the recount is the honest price
        // of a correct ledger row.
        def metric(map: Map[String, Any], k: String,
            recount: => Long): Long =
          map.get(k).map(_.asInstanceOf[Long]).getOrElse(recount)
        val g = gateObs.get
        val arrived = metric(g, "arrived", newDocs.count())
        val afterQuality = metric(g, "after_quality",
          TextAnalysis.qualityGate(newDocs, textCol, spread = false)
            .filter(pass).count())
        val afterExact =
          metric(exactObs.get, "after_exact", exactKept.count())
        val keptN =
          metric(keptObs.get, "kept_sigs", keptSigs.count())
        // drops ⊆ exactKept ids and distinct: dropped = afterExact − kept
        IngestReport(arrived, afterQuality,
          afterQuality - afterExact, afterExact - keptN, keptN)
      },
      () => { exactKept.unpersist(); sliceSigs.unpersist()
        drops.unpersist() })
  }

  /** Dataset card — the per-source datasheet a corpus release ships
   *  with (Gebru et al.'s "Datasheets for Datasets", reduced to the
   *  lanes this engine can attest mechanically): docs, token volume,
   *  mean quality, the dominant language with its share, and the
   *  exact-duplicate rate INSIDE the source. ONE source-keyed
   *  aggregation pass (plus a source×lang count for the dominant-lang
   *  argmax — max_by with a lexicographic tiebreak so the pick is
   *  deterministic on count ties); output is sources-sized. Ratios
   *  quantize to ppm from exact integer counts; mean quality to ppm
   *  from the 6-decimal scores. */
  def datasetCard(
      docs: DataFrame,
      sourceCol: String = "source",
      langCol: String = "lang",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val base = TextAnalysis.profileText(docs, textCol)
    val perSource = base.groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        // exact-integer mean: scores are 6-decimal, so Σ(score·1e6) is
        // an integer sum (order-independent, engine-exact) and the
        // mean is ONE double division at the end
        sum(round(col("quality_score") * 1e6, 0).cast("long"))
          .as("__q_micro"),
        countDistinct(md5(col(textCol).cast("binary")))
          .as("__distinct_texts"))
      .withColumn("mean_quality_ppm",
        round(col("__q_micro").cast("double") / col("n_docs"), 0)
          .cast("long"))
      .withColumn("exact_dup_ppm",
        round(lit(1e6) * (col("n_docs") - col("__distinct_texts"))
          / col("n_docs"), 0).cast("long"))
    val langTop = docs.groupBy(col(sourceCol).as("source"),
        col(langCol).as("lang"))
      .agg(count(lit(1)).as("__c"))
      .groupBy("source")
      // deterministic argmax: highest count, then LOWEST lang string —
      // max_by on (count, reversed-lang) would need a string inverse,
      // so order the struct by (count desc, lang asc) via min_by on
      // (-count, lang)
      .agg(min_by(struct(col("lang"), col("__c")),
        struct((-col("__c")).as("nc"), col("lang"))).as("__t"))
      .select(col("source"), col("__t.lang").as("top_lang"),
        col("__t.__c").as("top_lang_docs"))
    perSource.join(langTop, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("mean_quality_ppm"), col("exact_dup_ppm"),
        col("top_lang"), col("top_lang_docs"),
        round(lit(1e6) * col("top_lang_docs") / col("n_docs"), 0)
          .cast("long").as("top_lang_ppm"))
  }

  /** One slice's [[datasetCard]] sufficient statistics — the mergeable
   *  twin: per source, exact integer sums (docs, tokens, Σ quality
   *  micro) plus ONE DataSketches HLL sketch of the content hashes.
   *  Sums add and sketches union losslessly, so the card over ANY
   *  slice range merges from states without re-reading text — the
   *  daily-ingest shape for the release datasheet. */
  def cardSliceState(
      docs: DataFrame,
      sliceId: String,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    TextAnalysis.profileText(docs, textCol)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(round(col("quality_score") * 1e6, 0).cast("long"))
          .as("q_micro"),
        expr(s"hll_sketch_agg(md5(`$textCol`), 12)").as("text_sketch"))
      .withColumn("slice_id", lit(sliceId))

  /** Merge [[cardSliceState]] rows over any slice union back to card
   *  lanes: exact sums, one double division for the mean, and the
   *  distinct-content estimate from the lossless sketch union (exact
   *  while a source's cardinality stays in the sketch's sparse mode,
   *  ≈2.5% at 3σ beyond it). */
  def cardFromStates(states: DataFrame): DataFrame =
    states.groupBy("source")
      .agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"),
        sum("q_micro").as("__q"),
        expr("hll_sketch_estimate(hll_union_agg(text_sketch))")
          .as("approx_distinct_texts"))
      .withColumn("mean_quality_ppm",
        round(col("__q").cast("double") / col("n_docs"), 0).cast("long"))
      .select("source", "n_docs", "total_tokens", "mean_quality_ppm",
        "approx_distinct_texts")

  /** Corpus version diff — what changed between two snapshots of the
   *  same corpus: every doc is `added` (new only), `removed` (old
   *  only), `changed` (both, different content hash) or `unchanged`.
   *  Content equality is md5-of-text, so the wide full-outer join
   *  carries (id, 16-byte hash) — never document bodies — and the
   *  shuffle is id-keyed (co-partitioned if both snapshots are
   *  bucketed by id). The per-status rollup is the release-note /
   *  reprocessing-trigger signal: re-embed `changed`+`added`, expire
   *  `removed`. */
  def corpusDiff(
      oldCorpus: DataFrame,
      newCorpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // presence is the join side, not the hash — a null-text doc hashes
    // to null but was still PRESENT, so carry explicit presence flags
    // and compare hashes null-safely
    val o = oldCorpus.select(col(idCol), md5(col(textCol)).as("__oh"))
      .withColumn("__inOld", lit(true))
    val n = newCorpus.select(col(idCol), md5(col(textCol)).as("__nh"))
      .withColumn("__inNew", lit(true))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__inOld").isNull, "added")
          .when(col("__inNew").isNull, "removed")
          .when(col("__oh") <=> col("__nh"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
  }
}
