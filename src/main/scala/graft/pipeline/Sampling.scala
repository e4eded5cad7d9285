package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling and dataset splitting for training pipelines.
 *
 * Everything keys off a stable md5 hash of the row id — NOT `rand()`
 * (irreproducible across runs) and NOT `xxhash64` (engine-specific):
 * md5 of the same id string yields the same bucket on every run, every
 * cluster size, and every engine, so a train/val/test split is stable
 * across reprocessing and auditable from outside Spark. All operators
 * are map-only codegen'd expressions appended to the scan — no shuffle,
 * no driver state, trivially correct at 100 TB.
 */
object Sampling {

  /** Stable bucket in [0, buckets) from the id's md5 (first 8 hex chars
   *  → uniform 32-bit int → mod). */
  def hashBucket(id: Column, buckets: Int = 1000): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong)).cast("int")

  /** Append a `split` column: 'train' / 'val' / 'test' by stable hash
   *  bucket. Fractions are exact over the bucket space (80/10/10 at the
   *  default 1000 buckets ⇒ buckets 0-799 / 800-899 / 900-999). */
  def hashSplit(
      df: DataFrame,
      idCol: String = "doc_id",
      trainFraction: Double = 0.8,
      valFraction: Double = 0.1,
      buckets: Int = 1000,
      splitCol: String = "split"): DataFrame = {
    require(trainFraction + valFraction <= 1.0, "fractions exceed 1.0")
    val b = hashBucket(col(idCol), buckets)
    val trainEnd = (trainFraction * buckets).toInt
    val valEnd = ((trainFraction + valFraction) * buckets).toInt
    df.withColumn(splitCol,
      when(b < trainEnd, "train").when(b < valEnd, "val").otherwise("test"))
  }

  /** Deterministic epoch-shuffled training shards: every row gets a
   *  (shard, pos) address for one training epoch — shard from the
   *  first md5-hex byte of the seeded key, pos = rank under the md5
   *  order WITHIN the shard. Same seed ⇒ identical shards on every
   *  run/engine (md5 is the order, not a RNG); a new epoch string
   *  reshuffles everything. The within-shard window partitions by
   *  shard, so parallelism = numShards and no global sort ever runs —
   *  writing the result partitioned by shard IS the shuffled epoch
   *  layout a trainer streams. numShards that divides 256 gets exactly
   *  uniform hash buckets (the hex byte is the bucket). */
  def trainingShards(
      df: DataFrame,
      numShards: Int = 8,
      epoch: String = "0",
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0 && numShards <= 256,
      "numShards must be in [1, 256] (sharded on the first hex byte)")
    val h = md5(concat(lit(epoch), lit(":"),
      col(idCol).cast("string")).cast("binary"))
    val hex = "0123456789abcdef"
    val byte0 = (instr(lit(hex), substring(col("__h"), 1, 1)) - 1) * 16 +
      (instr(lit(hex), substring(col("__h"), 2, 1)) - 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("__h")
    df.withColumn("__h", h)
      .withColumn("shard", (byte0 % numShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Dedup-aware sampling weights: instead of DROPPING duplicates, a
   *  training sampler can DOWN-WEIGHT them — each member of a
   *  duplicate cluster of size s weighs s^(−α), so a cluster
   *  contributes s^(1−α) total (α = 1 → every cluster counts once,
   *  exact-dedup-equivalent; α = 0.5 → partial dedup, the middle
   *  ground corpus ablations actually sweep). `assignments` is a
   *  (idCol, clusterCol) frame (e.g. [[Dedup.duplicateClusters]]
   *  output); docs it omits are singletons with weight 1. Weights
   *  quantize to ppm. One cluster-keyed aggregation + one join —
   *  nothing touches text. */
  def dedupWeights(
      docs: DataFrame,
      assignments: DataFrame,
      idCol: String = "doc_id",
      clusterCol: String = "cluster_id"): DataFrame = {
    val assigned = docs.select(col(idCol))
      .join(assignments.select(col(idCol), col(clusterCol)),
        Seq(idCol), "left")
      .withColumn(clusterCol, coalesce(col(clusterCol), col(idCol)))
    val sizes = assigned.groupBy(clusterCol)
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, clusterCol)
      .withColumn("weight_ppm",
        round(lit(1e6) / col("cluster_size"), 0).cast("long"))
      .withColumn("weight_sqrt_ppm",
        round(lit(1e6) / sqrt(col("cluster_size").cast("double")), 0)
          .cast("long"))
      .select(col(idCol), col(clusterCol), col("cluster_size"),
        col("weight_ppm"), col("weight_sqrt_ppm"))
  }

  /** Curriculum phase assignment (easy→hard training order): docs bin
   *  into `phases` score bands at the EXACT score percentiles (the p08
   *  interpolation both engines share), lowest band = phase 1. The
   *  cutoffs are one exact-percentile aggregate (a k-element array on
   *  the driver → broadcast literal comparisons); the assignment is
   *  map-only — NO global sort, which is what a naive NTILE-over-
   *  everything costs. Ties at a cutoff land in the lower phase on
   *  every engine. `order_key` is a deterministic md5 over
   *  (phase, id), so the within-phase read order is shuffled but
   *  reproducible — sort by (phase, order_key) to stream the
   *  curriculum. */
  def curriculumPhases(
      df: DataFrame,
      scoreCol: String,
      phases: Int = 4,
      idCol: String = "doc_id"): DataFrame = {
    require(phases >= 2 && phases <= 100, "phases must be in [2, 100]")
    val fracs = (1 until phases)
      .map(i => i.toDouble / phases).mkString(", ")
    // cutoffs quantize to 6 decimals so the phase boundaries are
    // engine-exact: two engines' percentile interpolations can differ
    // in the last ulp, which would flip the phase of a doc whose score
    // sits exactly on a cutoff
    val cuts = df.selectExpr(
      s"transform(percentile(`$scoreCol`, array($fracs)), " +
        "c -> round(c, 6)) as c")
      .head().getSeq[Double](0)
    val phaseCol = cuts.zipWithIndex.foldLeft(lit(1)) {
      case (acc, (c, _)) =>
        acc + when(col(scoreCol) > c, 1).otherwise(0)
    }
    df.withColumn("phase", phaseCol)
      .withColumn("order_key",
        md5(concat(col("phase").cast("string"), lit(":"),
          col(idCol).cast("string"))))
  }

  /** Mergeable deterministic uniform sample: the k rows with the
   *  SMALLEST md5(id) — an order statistic, so bottom-k(A ∪ B) =
   *  bottom-k(bottom-k(A) ∪ bottom-k(B)). That closure is the whole
   *  point: profile each daily slice once into a k-row sample state,
   *  and the uniform sample of ANY slice union merges from states
   *  without rescanning (the KMV idea, keeping the rows). Hash-order
   *  selection is uniform over ids and reproducible everywhere md5
   *  is. orderBy+limit = TakeOrdered: each partition keeps k rows,
   *  no global sort materializes. */
  def bottomKSample(
      df: DataFrame,
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("rank_key", md5(col(idCol).cast("string")))
      .orderBy("rank_key")
      .limit(k)
  }

  /** Merge sample states (the union of per-slice [[bottomKSample]]
   *  outputs) back to one k-row sample — identical to sampling the
   *  union directly. */
  def mergeBottomK(states: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    states.orderBy("rank_key").limit(k)
  }

  /** Keep a deterministic `fraction` of rows: the SAME rows survive on
   *  every run (bucket < fraction·buckets). */
  def deterministicSample(
      df: DataFrame,
      idCol: String = "doc_id",
      fraction: Double,
      buckets: Int = 1000): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < (fraction * buckets).toInt)

  /** Stratified deterministic sample: an independent per-stratum hash
   *  keeps `fraction` of each stratum (the hash mixes the stratum value
   *  into the key, so strata don't share bucket assignments). */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fraction: Double,
      buckets: Int = 1000): DataFrame =
    df.filter(
      hashBucket(concat_ws("|", col(stratumCol).cast("string"),
        col(idCol).cast("string")), buckets) < (fraction * buckets).toInt)

  /** Per-stratum-fraction sample — the corpus REBALANCING primitive
   *  (downsample the dominant language/source, keep the rest): a
   *  deterministic `DataFrame.stat.sampleBy` whose survivors are stable
   *  across runs, cluster sizes and engines. `fractions` is driver-small
   *  and compiles to one CASE threshold expression; strata absent from
   *  the map keep `defaultFraction` (1.0 = pass through). Map-only —
   *  the filter rides the scan, nothing shuffles. */
  def stratifiedSampleBy(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
      buckets: Int = 1000): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit((defaultFraction * buckets).toInt): Column) {
        case ((stratum, frac), acc) =>
          when(col(stratumCol) === stratum, (frac * buckets).toInt)
            .otherwise(acc)
      }
    df.filter(
      hashBucket(concat_ws("|", col(stratumCol).cast("string"),
        col(idCol).cast("string")), buckets) < threshold)
  }

  /** Temperature-based corpus rebalancing — the standard multilingual /
   *  multi-source pretraining mix: a stratum with share p_s of the corpus
   *  gets sampling weight w_s ∝ p_s^alpha (alpha<1 flattens the mix,
   *  upweighting rare sources; alpha=1 is proportional; alpha=0 uniform).
   *  Per-stratum keep rate r_s = min(1, w_s·N/n_s) targets a resampled
   *  corpus of ~N docs, realized deterministically via the same md5
   *  bucket threshold as [[stratifiedSampleBy]] (stable across runs,
   *  cluster sizes and engines).
   *
   *  Returns the per-stratum mix plan + realized counts: (stratum,
   *  n_docs, share, weight, keep_rate, n_sampled). ONE scan: rows
   *  collapse to (stratum, bucket) cells with map-side combine — at most
   *  strata×`buckets` cells ever shuffle; shares/weights/thresholds are
   *  computed on a per-stratum frame with 1-row broadcast totals, and
   *  n_sampled is the sum of cells under the threshold. The
   *  nano-quantized Σ p^alpha keeps the weight normalization
   *  order-independent and engine-portable.
   *
   *  To materialize the resampled corpus itself, feed the returned
   *  keep_threshold map to [[stratifiedSampleByThreshold]] — same hash,
   *  same buckets, exactly the plan's rows (keep_rate is display-rounded
   *  and can land one bucket off if re-floored).
   *
   *  NULL-stratum contract: rows with a NULL stratum are excluded from
   *  the plan entirely — they get no output row AND are excluded from
   *  the grand total `N`, so every emitted share/weight is relative to
   *  the non-NULL corpus. Callers wanting NULLs resampled should
   *  coalesce the stratum to a sentinel value first. */
  def temperatureResample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      alpha: Double,
      buckets: Int = 1000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val cells = df
      .filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"),
        hashBucket(concat_ws("|", col(stratumCol).cast("string"),
          col(idCol).cast("string")), buckets).as("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
    // stratum-level stats on a per-stratum frame (≤ #strata rows) with
    // 1-row broadcast totals — no global windows over the cell frame
    // (empty-partition windows single-thread the frame AND log the
    // WindowExec warning). The duplicated aggregates below all hang off
    // the same cells shuffle, which exchange reuse dedupes.
    def nano(c: Column): Column = round(c * 1e9, 0).cast("long")
    val strata = cells.groupBy("stratum").agg(sum(col("__cnt")).as("__ns"))
    val total = strata.agg(sum(col("__ns")).as("__n"))
    val strataP = strata.crossJoin(broadcast(total))
      .withColumn("__p", col("__ns").cast("double") / col("__n"))
      .withColumn("__pow", pow(col("__p"), lit(alpha)))
    // order-independent Σ p^alpha: nano-quantized terms over the
    // stratum frame (one term per stratum, exactly as before)
    val sumPow = strataP.agg(sum(nano(col("__pow"))).as("__spn"))
    val perStratum = strataP.crossJoin(broadcast(sumPow))
      .withColumn("__sum_pow", col("__spn").cast("double") / 1e9)
      .withColumn("__w", col("__pow") / col("__sum_pow"))
      .withColumn("__r",
        least(lit(1.0), col("__w") * col("__n") / col("__ns")))
      .withColumn("__thr", floor(col("__r") * buckets).cast("int"))
    val sampled = cells
      .join(perStratum.select(col("stratum"), col("__thr")), Seq("stratum"))
      .groupBy(col("stratum"))
      .agg(sum(when(col("__bucket") < col("__thr"), col("__cnt"))
        .otherwise(0L)).as("n_sampled"))
    perStratum.join(sampled, Seq("stratum"))
      .select(
        col("stratum"),
        col("__ns").as("n_docs"),
        round(col("__p"), 6).as("share"),
        round(col("__w"), 6).as("weight"),
        round(col("__r"), 6).as("keep_rate"),
        // the EXACT integer threshold the plan realized — feed this to
        // [[stratifiedSampleByThreshold]] to materialize the identical
        // row set. (keep_rate is display-rounded to 6 dp; recomputing a
        // threshold from it can land one bucket off at a boundary.)
        col("__thr").as("keep_threshold"),
        col("n_sampled"))
  }

  /** Materialize a mix plan: keep rows whose per-stratum md5 bucket is
   *  below the stratum's integer threshold — the exact realization of
   *  [[temperatureResample]]'s `keep_threshold` column (same hash, same
   *  buckets, same rows; no float round-trip). Strata absent from the
   *  map keep `defaultThreshold` (= `buckets` ⇒ pass through). */
  def stratifiedSampleByThreshold(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      thresholds: Map[String, Int],
      defaultThreshold: Int = 1000,
      buckets: Int = 1000): DataFrame = {
    require((thresholds.values ++ Seq(defaultThreshold))
      .forall(t => t >= 0 && t <= buckets), "thresholds must be in [0, buckets]")
    val threshold = thresholds.toSeq.sortBy(_._1)
      .foldRight(lit(defaultThreshold): Column) {
        case ((stratum, t), acc) =>
          when(col(stratumCol) === stratum, t).otherwise(acc)
      }
    df.filter(
      hashBucket(concat_ws("|", col(stratumCol).cast("string"),
        col(idCol).cast("string")), buckets) < threshold)
  }

  /** Per-stratum cap — the web-corpus "per-domain cap" (keep at most
   *  `maxPerStratum` documents from any one source/domain so a single
   *  crawl host can't dominate the training mix). Survivors are chosen
   *  by stable md5 order within the stratum, so the SAME rows survive
   *  on every run, cluster size and engine — an auditable random-like
   *  sample, not `rand()`.
   *
   *  Scale shape: `row_number() <= k` over a stratum window is exactly
   *  the pattern Spark's WindowGroupLimit rewrite turns into a
   *  map-side per-stratum top-k BEFORE the shuffle — each task forwards
   *  at most k rows per stratum it sees, so the shuffle carries
   *  O(strata × k × tasks) rows, not the corpus. A mega-stratum never
   *  sorts fully. */
  def capPerStratum(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      maxPerStratum: Int): DataFrame = {
    require(maxPerStratum > 0, "maxPerStratum must be positive")
    val w = Window.partitionBy(col(stratumCol)).orderBy(
      md5(concat_ws("|", col(stratumCol).cast("string"),
        col(idCol).cast("string"))))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerStratum)
      .drop("__rk")
  }

  /** Leakage-safe train/val/test split: near-duplicate documents MUST
   *  land in the same split, or the eval set silently contains copies
   *  of training rows. The split key is the duplicate CLUSTER id (from
   *  [[graft.pipeline.Dedup.duplicateClusters]]) instead of the doc id
   *  — every member of a cluster hashes identically, singletons fall
   *  back to their own id. One broadcast-size join (the cluster frame
   *  is dup-members only, a small fraction of the corpus) plus the
   *  same stable md5 bucketing as [[hashSplit]]. */
  def leakSafeSplit(
      df: DataFrame,
      clusters: DataFrame,
      idCol: String = "doc_id",
      trainFraction: Double = 0.8,
      valFraction: Double = 0.1,
      buckets: Int = 1000,
      splitCol: String = "split"): DataFrame = {
    require(trainFraction + valFraction <= 1.0, "fractions exceed 1.0")
    val joined = df.join(
      clusters.select(col("doc_id").as(idCol),
        col("cluster_id").as("__cluster")),
      Seq(idCol), "left")
      .withColumn("__splitKey", coalesce(col("__cluster"), col(idCol)))
    val b = hashBucket(col("__splitKey"), buckets)
    val trainEnd = (trainFraction * buckets).toInt
    val valEnd = ((trainFraction + valFraction) * buckets).toInt
    joined
      .withColumn(splitCol,
        when(b < trainEnd, "train").when(b < valEnd, "val")
          .otherwise("test"))
      .drop("__cluster", "__splitKey")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
   *  Spirakis A-ES): each row gets key = ln(u)/w where u ∈ (0,1] comes
   *  from the row's stable md5 (same hash family as [[hashBucket]],
   *  so the draw is reproducible across runs, cluster sizes and
   *  engines — no `rand()`), and the k LARGEST keys win. P(selected)
   *  rises with weight exactly as weighted sampling without
   *  replacement prescribes. The top-k is a TakeOrdered: every
   *  partition forwards at most k rows, no global sort — the 100 TB
   *  shape for "pick 10k docs by importance weight". */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / 4294967296.0
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wkey", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Sequence packing for pretraining: assign documents to consecutive
   *  fixed-budget training sequences. Documents are bucketed by stable
   *  hash (the parallelism unit — each bucket packs independently, so
   *  the sort is per-bucket, never global) and, in stable id order
   *  within the bucket, a sequence closes once its running size total
   *  reaches `budget`. A document is never split: the sequence a
   *  document OPENS in is `floor((cumsum − size) / budget)`, so a
   *  sequence can overflow the budget by less than one document — the
   *  contiguous-fill contract (truncation/padding is the trainer's
   *  concern, placement is the engine's).
   *
   *  Output: input columns + (pack_bucket, seq_id) — `seq_id` is unique
   *  within its bucket; (pack_bucket, seq_id) is the global sequence
   *  key. Deterministic across runs, cluster sizes and engines (hash
   *  bucket + id order, no rand, no partition-dependent state). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      budget: Long,
      numBuckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_bucket", hashBucket(col(idCol), numBuckets))
      .withColumn("__cum", sum(col(sizeCol).cast("long")).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col(sizeCol).cast("long")) / budget))
      .drop("__cum")
  }

  /** Packing-efficiency audit over a [[packSequences]] output — the
   *  training-batch utilization number: sequences formed, fill vs
   *  budget·seqs in ppm, and how many sequences OVERFLOW the budget
   *  (the cumulative first-fit pack keeps a document in the sequence
   *  where it started, so a boundary-crossing doc pushes its sequence
   *  past budget — callers either truncate or budget for it; this
   *  lane makes the choice visible). One (bucket, seq) aggregate then
   *  one global rollup; exact integer arithmetic throughout. */
  def packEfficiency(
      packed: DataFrame,
      sizeCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    packed.groupBy("pack_bucket", "seq_id")
      .agg(count(lit(1)).as("__docs"),
        sum(col(sizeCol).cast("long")).as("__fill"))
      .agg(count(lit(1)).as("n_seqs"),
        sum("__docs").as("n_docs"),
        sum("__fill").as("total_units"),
        sum(when(col("__fill") > budget, 1L).otherwise(0L))
          .as("n_overflow_seqs"),
        max("__fill").as("max_fill"))
      .withColumn("capacity", col("n_seqs") * budget)
      .withColumn("utilization_ppm",
        round(lit(1e6) * col("total_units") / col("capacity"), 0)
          .cast("long"))
  }

  /** Token-budgeted mixture plan — the data-mixing step of assembling a
   *  training run: given target mixture `weights` (source → relative
   *  weight, e.g. web 0.6 / code 0.25 / books 0.15) and a total
   *  `tokenBudget`, report per source what the corpus HAS (docs,
   *  tokens) and what the plan NEEDS: `target_tokens` (the budget split
   *  by normalized weight), `sample_rate` (fraction of the source to
   *  keep, capped at 1), and `epochs` (>1 = the source must repeat to
   *  fill its slot — the up-sampling signal). Weights are normalized
   *  driver-side so engines share the exact same double literals;
   *  unweighted sources report with rate 0 (the "you forgot a source"
   *  guard). One source-keyed agg over a map-side token count — a
   *  k-row result regardless of corpus size. */
  def mixturePlan(
      docs: DataFrame,
      weights: Map[String, Double],
      tokenBudget: Long,
      sourceCol: String = "source",
      textCol: String = "text",
      tokenCol: String = ""): DataFrame = {
    require(weights.nonEmpty, "mixturePlan needs at least one weight")
    require(tokenBudget > 0, "tokenBudget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val totalW = weights.values.sum
    val wDf = weights.toSeq.map { case (s, w) => (s, w / totalW) }
      .toDF(sourceCol, "weight")
    // a precomputed token-count column (e.g. BPE pieces from
    // TextAnalysis.bpeTokenCount) overrides the whitespace count, so
    // plans can budget in REAL tokenizer tokens, not word counts
    val tok =
      if (tokenCol.nonEmpty) col(tokenCol).cast("long")
      else TextAnalysis.tokenCount(col(textCol)).cast("long")
    docs.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(tok).as("tokens"))
      .join(broadcast(wDf), Seq(sourceCol), "left")
      .select(
        col(sourceCol),
        col("n_docs"),
        col("tokens"),
        round(coalesce(col("weight"), lit(0.0)), 6).as("weight"),
        round(lit(tokenBudget.toDouble) * coalesce(col("weight"), lit(0.0)), 0)
          .cast("long").as("target_tokens"),
        round(least(lit(1.0),
          round(lit(tokenBudget.toDouble) * coalesce(col("weight"), lit(0.0)), 0)
            / col("tokens")), 6).as("sample_rate"),
        round(
          round(lit(tokenBudget.toDouble) * coalesce(col("weight"), lit(0.0)), 0)
            / col("tokens"), 6).as("epochs"))
  }

  /** Budget-constrained mixture allocation with per-source epoch caps —
   *  the "how many tokens of each source, given B total and at most E
   *  epochs of any source" recipe question [[mixturePlan]] doesn't
   *  answer (its proportional targets silently lose the overflow when
   *  a small high-weight source saturates).
   *
   *  Water-filling in CLOSED FORM: sources sorted by saturation point
   *  cap/w; the first index where cap_j·Wsuf_j ≥ (B − Scap_j)·w_j
   *  splits saturated (alloc = cap) from unsaturated (alloc =
   *  ⌊w_i·(B − Scap)/Wsuf⌋) — no iteration, one pass of window sums
   *  over the per-source frame (metadata scale: |sources| rows).
   *  Everything after the corpus aggregate is EXACT integer
   *  arithmetic (nano-quantized weights, decimal products), so the
   *  allocation is engine-reproducible to the token.
   *
   *  Scale: one groupBy(source) scan of the corpus; the solve itself
   *  never touches data. Zero-weight sources pass through with
   *  alloc 0. */
  def budgetMixture(
      docs: DataFrame,
      weights: Map[String, Double],
      tokenBudget: Long,
      maxEpochs: Double = 1.0,
      epochCaps: Map[String, Double] = Map.empty,
      sourceCol: String = "source",
      textCol: String = "text",
      tokenCol: String = ""): DataFrame = {
    require(weights.nonEmpty, "budgetMixture needs at least one weight")
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val totalW = weights.values.sum
    val wDf = weights.toSeq
      .map { case (s, w) =>
        (s, w / totalW, epochCaps.getOrElse(s, maxEpochs))
      }
      .toDF(sourceCol, "weight", "__ecap")
    val tok =
      if (tokenCol.nonEmpty) col(tokenCol).cast("long")
      else TextAnalysis.tokenCount(col(textCol)).cast("long")
    val stats = docs.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(tok).as("tokens"))
      .join(broadcast(wDf), Seq(sourceCol), "left")
      .withColumn("weight", coalesce(col("weight"), lit(0.0)))
      // nano-quantized weight: suffix sums below must be exact and
      // order-independent (same discipline as temperatureResample)
      .withColumn("__wn", round(col("weight") * 1e9, 0).cast("long"))
      .withColumn("cap_tokens",
        floor(col("tokens") * coalesce(col("__ecap"), lit(maxEpochs)))
          .cast("long"))
    val active = stats.filter(col("__wn") > 0 && col("cap_tokens") > 0)
    val rest = stats.filter(!(col("__wn") > 0 && col("cap_tokens") > 0))
    // the solve runs on a |sources|-row frame: a constant partition key
    // keeps the window off the global-window warning path
    val w = Window.partitionBy(lit(1))
      .orderBy(
        (col("cap_tokens").cast("double") / col("__wn")).asc,
        col(sourceCol).asc)
    val dec = "decimal(38,0)"
    val ranked = active
      .withColumn("__rn", row_number().over(w))
      .withColumn("__scap_prev",
        coalesce(sum(col("cap_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__wsuf", sum(col("__wn")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    // first index that stays unsaturated at its own candidate level:
    // cap_j · Wsuf_j ≥ (B − Scap_prev_j) · w_j, all exact decimals
    val unsat = ranked.filter(
      col("cap_tokens").cast(dec) * col("__wsuf").cast(dec) >=
        (lit(tokenBudget).cast(dec) - col("__scap_prev").cast(dec)) *
          col("__wn").cast(dec))
      .agg(min(col("__rn")).as("__k"),
        min_by(col("__scap_prev"), col("__rn")).as("__scap_k"),
        min_by(col("__wsuf"), col("__rn")).as("__wsuf_k"))
    val solved = ranked.crossJoin(broadcast(unsat))
      .withColumn("alloc_tokens",
        when(col("__k").isNull || col("__rn") < col("__k"),
          col("cap_tokens")) // saturated (or the whole budget exceeds Σcap)
          .otherwise(greatest(lit(0L),
            floor((lit(tokenBudget).cast(dec) - col("__scap_k").cast(dec))
              * col("__wn").cast(dec) / col("__wsuf_k").cast(dec))
              .cast("long"))))
    solved
      .select(col(sourceCol), col("n_docs"), col("tokens"),
        round(col("weight"), 6).as("weight"), col("cap_tokens"),
        col("alloc_tokens"),
        (col("alloc_tokens") === col("cap_tokens")).as("saturated"))
      .unionByName(rest.select(col(sourceCol), col("n_docs"),
        col("tokens"), round(col("weight"), 6).as("weight"),
        col("cap_tokens"), lit(0L).as("alloc_tokens"),
        lit(false).as("saturated")))
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double") / col("tokens"), 6))
  }

  // ---- Rendezvous (highest-random-weight) sharding -----------------

  /** Rendezvous-hash shard assignment (Thaler & Ravishankar's HRW):
   *  each doc hashes once PER SHARD and lands on the shard with the
   *  lexicographically greatest md5(id # shard) — the property mod-N
   *  sharding lacks is STABILITY UNDER RESHARDING: going S → S+1
   *  moves only ~1/(S+1) of the keys, and every moved key moves TO
   *  the new shard (mod-N reshuffles ~all of them, invalidating every
   *  cached/materialized shard). Map-only: the per-shard hashes build
   *  inside one array expression and `array_max` picks the winner —
   *  no explode, no shuffle, O(S) work per row with S ≤ 64. */
  def rendezvousAssign(
      df: DataFrame,
      idCol: String = "doc_id",
      numShards: Int = 8,
      shardCol: String = "shard"): DataFrame = {
    require(numShards >= 1 && numShards <= 64,
      "numShards must be in [1, 64] (O(S) hashes per row)")
    val hashes = transform(
      sequence(lit(0), lit(numShards - 1)),
      s => struct(
        md5(concat(col(idCol).cast("string"), lit("#"),
          s.cast("string")).cast("binary")).as("h"),
        s.cast("int").as("s")))
    df.withColumn(shardCol,
      array_max(hashes).getField("s"))
  }

  /** Resharding churn audit: assign under `fromShards` and `toShards`
   *  and roll up the (shard_from, shard_to) movement matrix — the
   *  artifact that proves (or refutes) a sharding scheme's stability
   *  before a fleet re-partitions 100 TB of materialized shards. For
   *  rendezvous going S → S+1, every off-diagonal row must land on
   *  the NEW shard and carry ~1/(S+1) of the mass; mod-N under the
   *  same step moves almost everything. One map-only double
   *  assignment + one metadata-sized groupBy. */
  def rendezvousChurn(
      df: DataFrame,
      idCol: String = "doc_id",
      fromShards: Int = 8,
      toShards: Int = 9): DataFrame =
    rendezvousAssign(
        rendezvousAssign(df, idCol, fromShards, "shard_from"),
        idCol, toShards, "shard_to")
      .groupBy("shard_from", "shard_to")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("moved", col("shard_from") =!= col("shard_to"))
      .orderBy("shard_from", "shard_to")

  /** Temperature (α) mixture weights — the mT5/CC-100 rebalancing:
   *  per-source weight ∝ share^α, so α=1 keeps natural proportions and
   *  α→0 flattens toward uniform, up-sampling tail sources without the
   *  head drowning them. Complements [[budgetMixture]] (which solves a
   *  CAPPED water-filling given explicit weights): this DERIVES the
   *  weights from the corpus itself, and reports the repeat-exposure
   *  consequence — `implied_epochs` = weight·budget / source tokens,
   *  the number a data-constrained training run audits before
   *  committing to an α (tail epochs > ~4 means memorization risk, the
   *  signal to raise α or cap the source).
   *
   *  Scale: ONE corpus scan into a sources-sized frame
   *  (localCheckpoint'd — consumed by total, numerator, and denominator
   *  lanes), then sources × |α| ≤ tiny metadata arithmetic. */
  def temperatureMixture(
      docs: DataFrame,
      alphas: Seq[Double],
      tokenBudget: Long,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    mixtureFromPerSrc(perSourceTokens(docs, sourceCol, textCol),
      alphas, tokenBudget)

  /** [[temperatureMixture]] with the budget given as a FRACTION of the
   *  corpus (the usual spec: "10% of tokens") — derives the budget
   *  from the same sources-sized frame the weights use, so the corpus
   *  is scanned exactly once (a separate caller-side total would be a
   *  redundant second pass over 100 TB). */
  def temperatureMixtureAtFraction(
      docs: DataFrame,
      alphas: Seq[Double],
      budgetFraction: Double,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(budgetFraction > 0, "budgetFraction must be positive")
    val perSrc = perSourceTokens(docs, sourceCol, textCol)
    // 1-row agg over the checkpointed sources-sized frame — no rescan
    val totalRow = perSrc.agg(sum("n_tokens")).head()
    require(!totalRow.isNullAt(0),
      s"temperatureMixtureAtFraction: empty corpus — no non-null " +
        s"'$sourceCol' rows with countable '$textCol' tokens, so a " +
        "fractional budget has nothing to take a fraction of")
    mixtureFromPerSrc(perSrc, alphas,
      math.floor(budgetFraction * totalRow.getLong(0)).toLong)
  }

  private def perSourceTokens(
      docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
        .as("n_tokens"))
      .localCheckpoint() // sources-sized; cuts the corpus scan to one

  private def mixtureFromPerSrc(
      perSrc: DataFrame,
      alphas: Seq[Double],
      tokenBudget: Long): DataFrame = {
    require(alphas.nonEmpty, "need at least one alpha")
    val spark = perSrc.sparkSession
    import spark.implicits._
    val total = perSrc.agg(sum("n_tokens").as("__total"))
    val scored = perSrc.crossJoin(broadcast(total))
      .crossJoin(broadcast(alphas.toDF("alpha")))
      .withColumn("share", col("n_tokens").cast("double") / col("__total"))
      .withColumn("__num", pow(col("share"), col("alpha")))
    val denom = scored.groupBy("alpha").agg(sum(col("__num")).as("__den"))
    scored.join(broadcast(denom), "alpha")
      .withColumn("weight", col("__num") / col("__den"))
      .select(col("source"), col("alpha"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("weight"), 6).as("weight"),
        round(col("weight") * tokenBudget / col("n_tokens"), 6)
          .as("implied_epochs"))
  }
}
