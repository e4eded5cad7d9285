package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Large-scale document deduplication: exact, MinHash-LSH, SimHash and
 * n-gram-Jaccard near-dup detection over a corpus DataFrame
 * (id, text).
 *
 * Scale design (the 100 TB contract):
 *  - NOTHING here is all-pairs. Exact dedup shuffles 16-byte md5 keys;
 *    MinHash/SimHash shuffle O(rows × bands) small keys and only compare
 *    within an LSH bucket; buckets above `maxBucketSize` are dropped
 *    (and counted) instead of exploding quadratically.
 *  - Signatures are computed map-side in one pass (deterministic seeded
 *    hash families), so the heavy text column is dropped before any
 *    shuffle: candidate generation moves (id, signature) pairs only.
 */
object Dedup {

  // ---- deterministic hashing ------------------------------------------

  /** FNV-1a 64-bit — stable across JVMs/runs, no seed material needed. */
  private[graft] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val MersennePrime = (1L << 61) - 1

  /** Seeded universal-hash family for MinHash permutations. abs() has a
   *  NEGATIVE fixed point at Long.MinValue that would violate permute's
   *  a < 2^61 precondition (~2^-63 of draws under arbitrary seeds) —
   *  absSafe folds only that one value and keeps every other draw
   *  bit-identical, so existing persisted signatures are unchanged. */
  private[graft] def hashFamily(n: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    def absSafe(x: Long): Long = if (x == Long.MinValue) 0L else math.abs(x)
    Array.fill(n) {
      val a = absSafe(rnd.nextLong()) % (MersennePrime - 1) + 1
      val b = absSafe(rnd.nextLong()) % MersennePrime
      (a, b)
    }
  }

  /** (a·x + b) mod 2^61−1 without BigInteger: 128-bit product via
   *  multiplyHigh, folded with 2^61 ≡ 1 and 2^64 ≡ 8 (mod M61). The
   *  signature loop runs hashes × shingles times per document — this
   *  must be a handful of ALU ops, not object allocation. */
  private def permute(x: Long, a: Long, b: Long): Long = {
    val xp = x & 0x1fffffffffffffffL
    val hi = Math.multiplyHigh(a, xp) // a, xp < 2^61 → signed == unsigned
    val lo = a * xp
    var r = hi * 8 + (lo >>> 61) + (lo & MersennePrime) + b
    while (r >= MersennePrime) r -= MersennePrime
    r
  }

  /** Word k-gram shingle hashes of a text (distinct).
   *
   *  ONE normalization across the whole dedup stack: ROOT-locale
   *  lowercase, then \s+ split dropping empties — identical to
   *  [[shingleUdf]] (inverted-index path) and the span-dedup
   *  tokenizer, so a case-variant pair gets the same near-dup verdict
   *  from MinHash/SimHash as from d06/d08 (the dedup literature
   *  case-folds; a divergence here let the same pair be a dup on one
   *  pipeline and not the other). NOTE: this changes MinHash/SimHash
   *  signature values for mixed-case corpora — persisted signature
   *  stores built before the unification must be recomputed. */
  private[graft] def shingleHashes(text: String, k: Int): Array[Long] = {
    // null-tolerant: callers filter nulls out, but Spark's predicate
    // collapse + common-subexpression elimination can evaluate a UDF
    // built on this BEFORE the isNotNull guard in the same Filter —
    // an NPE here would kill the stage on a row the plan was about to
    // drop anyway
    if (text == null) return Array.empty
    val words = text.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+").filter(_.nonEmpty)
    if (words.length < k) {
      if (words.isEmpty) Array.empty
      else Array(fnv64(words.mkString(" ")))
    } else
      (0 to words.length - k)
        .map(i => fnv64(words.slice(i, i + k).mkString(" ")))
        .distinct.toArray
  }

  /** MinHash signature (numHashes values) of a shingle-hash set. */
  private[graft] def minhashSignature(
      shingles: Array[Long],
      family: Array[(Long, Long)]): Array[Long] =
    if (shingles.isEmpty) Array.fill(family.length)(Long.MaxValue)
    else family.map { case (a, b) =>
      var m = Long.MaxValue
      var i = 0
      while (i < shingles.length) {
        val h = permute(shingles(i), a, b)
        if (h < m) m = h
        i += 1
      }
      m
    }

  /** 64-bit SimHash of a token multiset (same ROOT-locale lowercase
   *  normalization as [[shingleHashes]] — see the note there). */
  private[graft] def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    text.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+").filter(_.nonEmpty).foreach { w =>
      val h = fnv64(w)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // ---- exact dedup -----------------------------------------------------

  /** Exact duplicate groups: md5 of the raw text (16-byte shuffle key, not
   *  the document body). Returns (text_hash, count, doc_ids) for groups
   *  with count > 1. NULL text is absent content, not duplicate content
   *  — those rows are excluded (md5(NULL)=NULL would otherwise group
   *  every null-text doc into one bogus duplicate group, contradicting
   *  [[exactDuplicateCount]], whose count/countDistinct skip nulls). */
  def exactDuplicates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol).cast("binary")).as("text_hash"))
      .groupBy("text_hash")
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("doc_ids"))
      .filter(col("cnt") > 1)

  /** Exact duplicate row count over the text column (total − distinct). */
  def exactDuplicateCount(
      docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.agg(
      (count(col(textCol)) - countDistinct(col(textCol))).as("duplicate_count"))

  /** Exact duplicate-SPAN removal (the substring-level dedup of
   *  "Deduplicating Training Data Makes Language Models Better", Lee et
   *  al. 2022, re-expressed at span granularity): any `spanLen`-token
   *  window whose exact text occurs more than once in the corpus is
   *  removed everywhere except its first occurrence (ordered by
   *  (id, position)); a document keeps the tokens not covered by any
   *  removed span. Catches copied boilerplate/quotes INSIDE otherwise
   *  unique documents, which document-level dedup (exact or near) never
   *  sees. Tokens are the lowercased whitespace split — the returned
   *  `cleaned_text` is that normalized stream re-joined.
   *
   *  Scale shape: spans shuffle once keyed by md5(span) (16-byte keys,
   *  never the span text); duplicate occurrences explode to covered
   *  (id, position) pairs — O(duplicate occurrences × spanLen), linear
   *  in corpus duplication, not corpus size²; the rebuild is one
   *  per-document aggregate.
   *
   *  Returns (idCol, n_tokens, removed_tokens, cleaned_text), one row
   *  per input document. */
  def duplicateSpanRemoval(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      spanLen: Int = 9): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    // three consumers re-tokenize the corpus (spans / token stream /
    // n_tokens); spread the projected input once so the tokenize +
    // span-hash map chain parallelizes even on a single-row-group
    // input (Par.spread is a no-op at production partition counts)
    val docsIn = Par.spread(docs.select(col(idCol), col(textCol)))
    def toks(df: DataFrame) = df.select(col(idCol),
      expr(s"filter(split(lower(trim($textCol)), '\\\\s+'), w -> length(w) > 0)")
        .as("w"))
    val spans = toks(docsIn).filter(size(col("w")) >= spanLen)
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, size(w) - $spanLen),
           |  i -> md5(cast(array_join(slice(w, i + 1, $spanLen), ' ') as binary)))"""
          .stripMargin)).as(Seq("spos", "span_key")))
    // canonical pick is an AGGREGATE (min struct + count, map-side
    // combined), not a row_number window: a boilerplate span occurring
    // 1M times folds to one (first, occ) row per partition before the
    // shuffle, and the join back is AQE-skew-splittable — a window
    // partition with 1M rows would sort in a single task and can't be
    // split
    val firsts = spans.groupBy("span_key")
      .agg(min(struct(col(idCol), col("spos"))).as("first"),
        count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col("span_key"), col(s"first.$idCol").as("__fid"),
        col("first.spos").as("__fpos"))
    val covered = spans.join(firsts, "span_key")
      .filter(!(col(idCol) === col("__fid") && col("spos") === col("__fpos")))
      .select(col(idCol),
        explode(expr(s"sequence(spos, spos + ${spanLen - 1})")).as("tpos"))
      .distinct()
    val tokens = toks(docsIn)
      .select(col(idCol), posexplode(col("w")).as(Seq("tpos", "tok")))
    val rebuilt = tokens
      .join(covered, Seq(idCol, "tpos"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(tpos, tok))), x -> x.tok)"),
          " ").as("cleaned"))
    // coalesce: size(NULL array) is NULL for null-text docs — report 0
    // tokens (consistent with cleaned_text's "" coalesce below)
    toks(docsIn).select(col(idCol),
        coalesce(size(col("w")), lit(0)).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .cast("long").as("removed_tokens"),
        coalesce(col("cleaned"), lit("")).as("cleaned_text"))
  }

  // ---- MinHash-LSH near-dup -------------------------------------------

  /** Per-document MinHash signature + banded LSH keys.
   *  Output: (id, signature: array<long>, bands: array<long>). */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16,
      seed: Long = 42L,
      spread: Boolean = true): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / numBands
    val family = hashFamily(numHashes, seed)
    val sigUdf = udf { text: String =>
      val sig = minhashSignature(shingleHashes(text, shingleK), family)
      val bands = (0 until numBands).map { b =>
        // band key = FNV over the band's slice, so one long per band
        var h = 0xcbf29ce484222325L
        var i = b * rowsPerBand
        while (i < (b + 1) * rowsPerBand) {
          h ^= sig(i); h *= 0x100000001b3L; i += 1
        }
        h
      }.toArray
      (sig, bands)
    }
    // null text carries no shingles and cannot be a near-dup of
    // anything — filter BEFORE the UDF (shingleHashes would NPE).
    // Par.spread: the signature UDF is the heaviest per-row kernel in
    // the dedup stack (hashes × shingles permutes per doc) — spread the
    // projected input so it parallelizes on single-row-group fixtures
    // (no-op at production partition counts).
    val in = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol))
    (if (spread) Par.spread(in) else in)
      .withColumn("__s", sigUdf(col(textCol)))
      .select(col(idCol), col("__s._1").as("signature"), col("__s._2").as("bands"))
  }

  /** Candidate near-dup pairs from banded signatures: explode bands,
   *  group by (band_idx, band_key), pair up WITHIN buckets only.
   *  Buckets larger than `maxBucketSize` are skipped (degenerate shingles
   *  — think empty documents — would otherwise go quadratic). */
  def lshCandidatePairs(
      signatures: DataFrame,
      idCol: String = "doc_id",
      maxBucketSize: Int = 1000): DataFrame = {
    val exploded = signatures
      .select(col(idCol), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val buckets = exploded
      .groupBy("band_idx", "band_key")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    // pairs within bucket: explode twice with index ordering a < b
    buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x as a, y as b))))"""
          .stripMargin)).as("pair"))
      .select(col("pair.a").as("id_a"), col("pair.b").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
   *  verify by signature-agreement (estimated Jaccard) ≥ threshold.
   *  Shuffle volume is O(rows × bands) keys + O(candidates) signature
   *  joins — never all-pairs.
   *
   *  The signature projection is referenced three times (candidate keys
   *  + both sides of the verify join) and deliberately NOT cached: a
   *  leaked `.cache()` here degraded every later query in the round-3
   *  bench session. Recomputing costs two extra map-side scans; at a
   *  scale where that matters, persist `minhashSignatures` output to a
   *  table yourself and call [[nearDuplicatesFromSignatures]]. */
  def nearDuplicatesMinhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16,
      threshold: Double = 0.7,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame =
    nearDuplicatesFromSignatures(
      minhashSignatures(docs, idCol, textCol, shingleK, numHashes,
        numBands, seed),
      idCol, threshold, maxBucketSize)

  /** Verify stage over a precomputed (or persisted) signature frame —
   *  the explicit scale path: compute signatures once, write them out,
   *  and run candidate generation + verification against the stored
   *  table so the corpus text is never re-scanned. Three passes over
   *  the signature frame (banding + both verify sides); a semi-join
   *  "only candidate docs" restructure was tried and REJECTED — the
   *  optimizer duplicates the candidate-generation subplan into every
   *  semi-join branch and does not push the filter below the signature
   *  projection, multiplying corpus passes instead of removing them. */
  def nearDuplicatesFromSignatures(
      sigs: DataFrame,
      idCol: String = "doc_id",
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    val pairs = lshCandidatePairs(sigs, idCol, maxBucketSize)
    val sigA = sigs.select(col(idCol).as("id_a"), col("signature").as("sig_a"))
    val sigB = sigs.select(col(idCol).as("id_b"), col("signature").as("sig_b"))
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("est_jaccard",
        expr("""aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),
                |0, (acc, v) -> acc + v)""".stripMargin).cast("double")
          / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // ---- incremental MinHash (persisted signature store) ----------------

  /** A MinHash signature store: the signature frame plus the hash-family
   *  parameters that produced it. Persisting BOTH is what makes dedup
   *  incremental — a new ingest slice must be signed with the exact
   *  same (shingleK, numHashes, numBands, seed) or band keys and
   *  signature agreement are meaningless across the corpus boundary. */
  final case class MinhashStore(
      sigs: DataFrame,
      idCol: String,
      shingleK: Int,
      numHashes: Int,
      numBands: Int,
      seed: Long)

  /** Sign a corpus into a [[MinhashStore]] (see [[minhashSignatures]]). */
  def minhashStoreCreate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16,
      seed: Long = 42L): MinhashStore =
    MinhashStore(
      minhashSignatures(docs, idCol, textCol, shingleK, numHashes,
        numBands, seed),
      idCol, shingleK, numHashes, numBands, seed)

  /** Persist a store: signatures to `path`/signatures (append-friendly
   *  parquet — later ingests add files, never rewrite), parameters to a
   *  one-row meta sidecar so load needs only the path. */
  def minhashStoreSave(store: MinhashStore, path: String): Unit = {
    val spark = store.sigs.sparkSession
    store.sigs.write.mode("overwrite").parquet(s"$path/signatures")
    // driver-side properties meta (zero Spark jobs to write, zero to
    // load — the parquet form cost one write job + schema-inference +
    // head per load, r19); parquet fallback only for an id column name
    // a properties line cannot carry, and [[minhashStoreLoad]] keeps
    // reading legacy parquet metas forever
    val metaDir = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(metaDir, true)
    val wrote = graft.history.StoreIO.writeProps(fs, metaDir, Seq(
      "id_col" -> store.idCol,
      "shingle_k" -> store.shingleK.toString,
      "num_hashes" -> store.numHashes.toString,
      "num_bands" -> store.numBands.toString,
      "seed" -> store.seed.toString))
    if (!wrote) {
      import spark.implicits._
      Seq((store.idCol, store.shingleK, store.numHashes, store.numBands,
          store.seed))
        .toDF("id_col", "shingle_k", "num_hashes", "num_bands", "seed")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  /** Load a [[minhashStoreSave]]d store. The signature frame stays a
   *  lazy scan — nothing is collected — but the FILE LIST pins at load
   *  time (snapshot isolation): a concurrent or same-turn append to
   *  `path`/signatures must not leak into an already-loaded store.
   *  Without this, Spark's refresh-by-path after an append re-lists the
   *  directory under any cached plan that references it — and an ingest
   *  turn's own appended survivors would then self-match at agreement
   *  1.0 on any recompute. */
  def minhashStoreLoad(
      spark: org.apache.spark.sql.SparkSession,
      path: String): MinhashStore = {
    val sigDir = new org.apache.hadoop.fs.Path(s"$path/signatures")
    val fs = sigDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (idCol, shingleK, numHashes, numBands, seed) =
      graft.history.StoreIO.readProps(fs,
          new org.apache.hadoop.fs.Path(s"$path/meta")) match {
        case Some(p) => (p("id_col"), p("shingle_k").toInt,
          p("num_hashes").toInt, p("num_bands").toInt, p("seed").toLong)
        case None => // legacy parquet meta
          val m = spark.read.parquet(s"$path/meta").head()
          (m.getString(0), m.getInt(1), m.getInt(2), m.getInt(3),
            m.getLong(4))
      }
    val files = fs.listStatus(sigDir).toSeq
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(_.getPath.toString)
    MinhashStore(spark.read.parquet(files: _*),
      idCol, shingleK, numHashes, numBands, seed)
  }

  /** Sign a NEW ingest slice with the store's own parameters and append
   *  it to the persisted signature table — old documents are never
   *  re-read and old signatures never recomputed (the daily-ingest
   *  shape: the signing cost is O(slice), not O(corpus)). Caller
   *  contract: slice ids must be new to the store; appending an id
   *  twice leaves two signature rows for it. Returns the reloaded
   *  store covering old + new. */
  def minhashStoreAppend(
      path: String,
      newDocs: DataFrame,
      textCol: String = "text"): MinhashStore = {
    val spark = newDocs.sparkSession
    val store = minhashStoreLoad(spark, path)
    minhashSignatures(newDocs, store.idCol, textCol, store.shingleK,
        store.numHashes, store.numBands, store.seed, spread = false)
      .write.mode("append").parquet(s"$path/signatures")
    minhashStoreLoad(spark, path)
  }

  /** Near-duplicates of a NEW slice against a signature store, without
   *  recomputing old signatures: sign the slice with the store's
   *  parameters, then [[incrementalNearDuplicatesFromSignatures]].
   *  Run this BEFORE [[minhashStoreAppend]] (or pass disjoint frames),
   *  so the slice isn't matched against its own appended copy. */
  def incrementalNearDuplicates(
      store: MinhashStore,
      newDocs: DataFrame,
      textCol: String = "text",
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame =
    incrementalNearDuplicatesFromSignatures(store,
      minhashSignatures(newDocs, store.idCol, textCol, store.shingleK,
        store.numHashes, store.numBands, store.seed, spread = false),
      threshold, maxBucketSize)

  /** The incremental verify core: candidates are the band-keyed
   *  equi-join of the NEW slice's band keys against the store's (each
   *  side's degenerate buckets capped independently, as in
   *  [[crossCorpusNearDuplicates]]) plus LSH pairs WITHIN the slice;
   *  signature agreement ≥ `threshold` verifies. Old×old pairs are
   *  never formed — per ingest the pair volume is O(slice × matches),
   *  not O(corpus²). Returns (id_a = new doc, id_b = store doc or a
   *  later slice doc, est_jaccard).
   *
   *  Completeness note (mirrors d04's pigeonhole): at threshold t with
   *  b bands over h hashes, a pair with agreement ≥ t mismatches in at
   *  most (1−t)·h positions, which can spoil at most that many bands —
   *  if (1−t)·h < b, some band agrees fully and the banded candidate
   *  set EQUALS all-pairs at the threshold (e.g. t=0.9, h=128, b=32:
   *  12.8 < 32). Below that, banding is the usual recall trade. */
  def incrementalNearDuplicatesFromSignatures(
      store: MinhashStore,
      newSigs: DataFrame,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    val idCol = store.idCol
    // ONE band join covers both pair shapes — (slice, store) and
    // (slice, slice) with a < b — by joining the slice's bands against
    // store ∪ slice bands with a membership flag. The cap guard filters
    // each side's degenerate buckets with a WINDOW count over the same
    // (band_idx, band_key) keys the join hashes on, so the planner
    // reuses one exchange per side (the agg+semi-join form, and the
    // separate within-slice collect_list pass it replaced, cost ~2x
    // the exchanges for the same candidate set). Cap boundary note:
    // the right-side cap applies to the UNION bucket (store + slice
    // occupants together), which is the stricter — and more honest —
    // reading of "skip degenerate buckets".
    def bandsOf(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_key")
    def capped(e: DataFrame) = e
      .withColumn("__c", count(lit(1)).over(w))
      .filter(col("__c") <= maxBucketSize).drop("__c")
    val left = capped(bandsOf(newSigs, "id_a"))
    val right = capped(
      bandsOf(store.sigs, "id_b").withColumn("within_slice", lit(false))
        .unionByName(bandsOf(newSigs, "id_b")
          .withColumn("within_slice", lit(true))))
    // within_slice is functionally dependent on id_b (slice ids are new
    // to the store by contract), so carrying it through distinct() is
    // free — and [[Curation.incrementalIngest]] derives its drop side
    // from the flag with NO membership join
    val cands = left.join(right, Seq("band_idx", "band_key"))
      .filter(!col("within_slice") || col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("within_slice")).distinct()
    val sigA = newSigs
      .select(col(idCol).as("id_a"), col("signature").as("sig_a"))
    val sigB = store.sigs.select(col(idCol), col("signature"))
      .unionByName(newSigs.select(col(idCol), col("signature")))
      .select(col(idCol).as("id_b"), col("signature").as("sig_b"))
    cands.join(sigA, Seq("id_a")).join(sigB, Seq("id_b"))
      .withColumn("est_jaccard",
        expr("""aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),
                |0, (acc, v) -> acc + v)""".stripMargin).cast("double")
          / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "within_slice")
  }

  /** Exact n-gram Jaccard for a set of candidate pairs (verification
   *  stage; joins shingle arrays to candidates only — O(candidates)). */
  def ngramJaccard(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3): DataFrame = {
    val shUdf = udf((text: String) => shingleHashes(text, shingleK))
    val sh = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), shUdf(col(textCol)).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** [[ngramJaccard]] in exact integer parts-per-million:
   *  (|∩|·1 000 000) div |∪| over the same hashed-shingle arrays. The
   *  integer form exists for consumers that go on to do ARITHMETIC on
   *  the similarity (x105's MMR greedy): floor-divided ppm replays
   *  bit-for-bit on any engine, where a double ratio's last ulp
   *  depends on the engine's evaluation order. Pairs whose union is
   *  empty (either side under `shingleK` tokens) are dropped — no
   *  similarity evidence, not zero similarity. */
  def ngramJaccardPpm(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3): DataFrame = {
    val shUdf = udf((text: String) => shingleHashes(text, shingleK))
    val sh = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), shUdf(col(textCol)).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(size(array_union(col("sh_a"), col("sh_b"))) > 0)
      .withColumn("sim_ppm",
        expr("CAST(CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT)" +
          " * 1000000 DIV size(array_union(sh_a, sh_b)) AS BIGINT)"))
      .select("id_a", "id_b", "sim_ppm")
  }

  /** Cross-corpus near-duplicates: documents in `corpus` that are
   *  near-dups of ANY document in `reference` — document-level
   *  decontamination of training data against an eval/benchmark set
   *  (the doc-granularity complement of [[graft.pipeline.TextAnalysis
   *  .contamination]]'s n-gram overlap). Both corpora are MinHash-signed
   *  with the SAME hash family (same seed), candidates come from a
   *  band-keyed equi-join ACROSS the corpora only (never within — no
   *  wasted intra-corpus pairs), each side's degenerate band buckets
   *  are capped by `maxBucketSize`, and exact shingle-Jaccard verifies
   *  every candidate. Returns (corpus_id, ref_id, jaccard) ≥ threshold;
   *  `left_anti` the corpus against it to scrub. */
  def crossCorpusNearDuplicates(
      corpus: DataFrame,
      reference: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16,
      threshold: Double = 0.7,
      seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    def explodeBands(df: DataFrame, as: String) =
      minhashSignatures(df, idCol, textCol, shingleK, numHashes, numBands,
        seed)
        .select(col(idCol).as(as),
          posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    def capped(e: DataFrame) = {
      val counts = e.groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") <= maxBucketSize)
        .drop("__c")
      e.join(counts, Seq("band_idx", "band_key"), "left_semi")
    }
    val ec = capped(explodeBands(corpus, "corpus_id"))
    val er = capped(explodeBands(reference, "ref_id"))
    val cand = ec.join(er, Seq("band_idx", "band_key"))
      .select(col("corpus_id"), col("ref_id")).distinct()
    val shUdf = udf((text: String) => shingleHashes(text, shingleK))
    val shc = Par.spread(corpus.filter(col(textCol).isNotNull)
        .select(col(idCol), col(textCol)))
      .select(col(idCol).as("corpus_id"), shUdf(col(textCol)).as("__shc"))
    val shr = Par.spread(reference.filter(col(textCol).isNotNull)
        .select(col(idCol), col(textCol)))
      .select(col(idCol).as("ref_id"), shUdf(col(textCol)).as("__shr"))
    cand.join(shc, "corpus_id").join(shr, "ref_id")
      .withColumn("jaccard",
        size(array_intersect(col("__shc"), col("__shr"))).cast("double")
          / size(array_union(col("__shc"), col("__shr"))))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("ref_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram-Jaccard similar pairs over the WHOLE corpus via an
   *  inverted index (posting-list self-join) — the classic exact-dedup
   *  complement to the MinHash estimate: every pair of documents sharing
   *  at least one word `k`-gram is scored `|A∩B| / |A∪B|` on distinct
   *  shingle sets, keeping pairs at or above `threshold`.
   *
   *  Scale shape: tokenize and shingle map-side (staged projections so
   *  the split runs once), drop the text column, then ONE shuffle keyed
   *  by shingle builds each posting list and ordered pairs are emitted
   *  map-side within the list — never all-pairs, and no index self-join
   *  (which would shuffle the exploded index twice); the pair
   *  aggregation is one more shuffle on (id_a, id_b).
   *
   *  A shingle present in more than `maxShingleDocFreq` documents is a
   *  stop-phrase: it contributes f² pair rows but its pairs are far
   *  below any useful threshold. The DEFAULT caps it at 1000 — one
   *  boilerplate phrase shared by 1M docs would otherwise emit 10^12
   *  pairs and no real corpus survives that. The cap biases Jaccard
   *  DOWN only for pairs whose sole overlap is stop-phrases; pass
   *  `maxShingleDocFreq = Int.MaxValue` for the exact computation
   *  (what the d06 oracle pins, viable when the corpus is known small
   *  or pre-filtered). */
  def jaccardSimilarPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxShingleDocFreq: Int = 1000): DataFrame =
    shinglePairCounts(docs, idCol, textCol, shingleK, maxShingleDocFreq)
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("__sza") + col("__szb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("jaccard"))

  /** Asymmetric near-dup: containment = |A∩B| / min(|A|, |B|) — catches
   *  a short document QUOTED INSIDE a long one, which symmetric Jaccard
   *  misses (the union denominator drowns the small side). Same
   *  single-scan inverted-index plan as [[jaccardSimilarPairs]],
   *  including its default stop-phrase cap (pass Int.MaxValue for the
   *  exact form the x25 oracle pins); both scores are reported so
   *  callers can distinguish subset pairs (containment≈1, jaccard low)
   *  from true twins (both high). */
  def containmentPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: Int = 1000): DataFrame =
    shinglePairCounts(docs, idCol, textCol, shingleK, maxShingleDocFreq)
      .withColumn("containment",
        round(col("inter").cast("double")
          / least(col("__sza"), col("__szb")), 6))
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("__sza") + col("__szb") - col("inter")), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("containment"), col("jaccard"))

  /** Compiled distinct-word-k-gram shingler — a UDF, not transform/
   *  slice/filter expressions: Spark's higher-order functions evaluate
   *  interpreted per element, and the expression version benched 3.5×
   *  slower on this exact shape (same finding as the round-2 e03 fix).
   *  Tokenization parity with the SQL oracles: split on \s+ then drop
   *  empties (which subsumes trim), and ROOT-locale lowercase (Spark's
   *  lower() is locale-independent). */
  private[graft] def shingleUdf(
      shingleK: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      if (text == null) Array.empty[String]
      else {
        val ts = text.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
        if (ts.length < shingleK) Array.empty[String]
        else ts.sliding(shingleK).map(_.mkString(" ")).toArray.distinct
      }
    }

  /** Corpus-LEVEL shingle overlap — one row summarizing how much two
   *  corpora share (a training shard vs an eval benchmark, or two crawl
   *  snapshots): distinct-shingle counts per side, the common count,
   *  Jaccard, and containment against the smaller side. The
   *  corpus-granularity complement of [[jaccardSimilarPairs]] (which
   *  scores document pairs): answers "is snapshot B mostly a re-crawl
   *  of A?" / "what fraction of the benchmark leaks into training?"
   *  without materializing any pair.
   *
   *  Scale shape: shingle map-side with the compiled shingler, tag each
   *  side with presence flags, then ONE shuffle keyed by shingle whose
   *  map-side partial max collapses per-corpus duplicates before any
   *  row moves; the final reduce is a single k-cell aggregation. No
   *  posting lists, no pair emission — linear in distinct shingles. */
  def corpusShingleOverlap(
      docsA: DataFrame,
      docsB: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3): DataFrame = {
    val sh = shingleUdf(shingleK)
    def side(df: DataFrame, ia: Int, ib: Int): DataFrame =
      Par.spread(df.select(col(textCol)))
        .select(explode(sh(col(textCol))).as("shingle"))
        .select(col("shingle"), lit(ia).as("__ia"), lit(ib).as("__ib"))
    side(docsA, 1, 0).union(side(docsB, 0, 1))
      .groupBy(col("shingle"))
      .agg(max(col("__ia")).as("__a"), max(col("__ib")).as("__b"))
      .agg(
        sum(col("__a")).as("shingles_a"),
        sum(col("__b")).as("shingles_b"),
        sum(col("__a") * col("__b")).as("common"))
      .select(
        col("shingles_a"), col("shingles_b"), col("common"),
        round(col("common").cast("double")
          / (col("shingles_a") + col("shingles_b") - col("common")), 6)
          .as("jaccard"),
        round(col("common").cast("double")
          / least(col("shingles_a"), col("shingles_b")), 6)
          .as("containment"))
  }

  /** K-minimum-values (KMV) sketch of a corpus's distinct-shingle set
   *  (Beyer et al., "On synopses for distinct-value estimation under
   *  multiset operations", SIGMOD 2007): the k smallest md5 values over
   *  the distinct shingles. The 100 TB twin of
   *  [[corpusShingleOverlap]]: the exact form shuffles every distinct
   *  shingle of BOTH corpora each time two corpora are compared; a KMV
   *  sketch is computed per corpus ONCE (k tiny rows), persists, and
   *  any two sketches compare in milliseconds — n corpora need n
   *  sketch passes, not n² shuffles. md5 (not a seeded hash) keeps the
   *  sketch deterministic and engine-portable, so the whole estimator
   *  replays exactly in SQL.
   *
   *  Plan shape: map-side shingling → hash-distinct with partial
   *  aggregation → global k-smallest via sort+limit (Spark plans
   *  TakeOrdered: per-partition top-k, driver merges k rows). */
  def kmvShingleSketch(
      docs: DataFrame,
      textCol: String = "text",
      shingleK: Int = 3,
      k: Int = 256): DataFrame = {
    require(k > 0, "k must be positive")
    val sh = shingleUdf(shingleK)
    docs.select(explode(sh(col(textCol))).as("shingle"))
      .select(md5(col("shingle").cast("binary")).as("h"))
      .distinct()
      .orderBy("h").limit(k)
  }

  /** Merge KMV sketches — the sketch of the UNION of the sketched sets
   *  is exactly the k smallest of the combined sketches (closure under
   *  union is KMV's defining property; no rescan of any corpus). */
  def kmvMerge(sketches: Seq[DataFrame], k: Int): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _).distinct().orderBy("h").limit(k)
  }

  /** Overlap estimates between two KMV-sketched corpora, one row:
   *  sample sizes, Jaccard and containment (vs the smaller side)
   *  estimates. Estimator: within S = the k smallest of A∪B (a uniform
   *  size-k sample of the union under the hash order), the fraction
   *  present in both sketches estimates J(A,B); standard error
   *  ≈ sqrt(J(1−J)/k). When the union holds ≤ k distinct shingles the
   *  sample IS the population and the estimates are exact. Everything
   *  is broadcast k-row frames — no data motion. */
  /** The FULL pairwise overlap matrix across every value of
   *  `sourceCol` from per-source KMV sketches — the release-audit
   *  view ("which sources duplicate each other") at O(N·k) sketch
   *  rows instead of O(N²) corpus passes. One shingle pass builds all
   *  N sketches (per-source rank windows over ≤k rows each); every
   *  unordered source pair then estimates Jaccard from the bottom-k
   *  of its sketch UNION (KMV's closure property), via two equi-joins
   *  of a broadcast pair list — no data re-read, no quadratic term
   *  touches text. Estimates are md5-deterministic, so a second
   *  engine replays them exactly (the x48 contract, matrix-wide). */
  def kmvOverlapMatrix(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      shingleK: Int = 3,
      k: Int = 256): DataFrame = {
    require(k > 0, "k must be positive")
    val sh = shingleUdf(shingleK)
    val perSource = docs
      .select(col(sourceCol).as("src"), explode(sh(col(textCol)))
        .as("shingle"))
      .select(col("src"), md5(col("shingle").cast("binary")).as("h"))
      .distinct()
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy("h")
    val sketches = perSource
      .withColumn("__r", row_number().over(wSrc))
      .filter(col("__r") <= k).drop("__r")
    val srcs = sketches.select(col("src")).distinct()
    val pairs = broadcast(srcs.select(col("src").as("src_a"))
      .crossJoin(srcs.select(col("src").as("src_b")))
      .filter(col("src_a") < col("src_b")))
    val fromA = pairs.join(sketches, col("src") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1).as("ia"), lit(0).as("ib"))
    val fromB = pairs.join(sketches, col("src") === col("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0).as("ia"), lit(1).as("ib"))
    val union = fromA.unionByName(fromB)
      .groupBy("src_a", "src_b", "h")
      .agg(max("ia").as("ia"), max("ib").as("ib"))
    val wPair = org.apache.spark.sql.expressions.Window
      .partitionBy("src_a", "src_b").orderBy("h")
    union
      .withColumn("__r", row_number().over(wPair))
      .filter(col("__r") <= k)
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("sample_k"),
        sum(col("ia") * col("ib")).cast("long").as("sample_inter"))
      .withColumn("jaccard_est",
        round(col("sample_inter").cast("double") / col("sample_k"), 6))
  }

  def kmvOverlap(skA: DataFrame, skB: DataFrame, k: Int): DataFrame = {
    val inS = kmvMerge(Seq(skA, skB), k)
      .join(broadcast(skA.select(col("h"), lit(1).as("__a"))), Seq("h"), "left")
      .join(broadcast(skB.select(col("h"), lit(1).as("__b"))), Seq("h"), "left")
      .agg(
        count(lit(1)).as("sample_k"),
        sum(coalesce(col("__a"), lit(0)) * coalesce(col("__b"), lit(0)))
          .as("sample_inter"),
        sum(coalesce(col("__a"), lit(0))).as("sample_a"),
        sum(coalesce(col("__b"), lit(0))).as("sample_b"))
    inS.select(
      col("sample_k").cast("long").as("sample_k"),
      col("sample_inter").cast("long").as("sample_inter"),
      round(col("sample_inter").cast("double") / col("sample_k"), 6)
        .as("jaccard_est"),
      round(col("sample_inter").cast("double")
        / least(col("sample_a"), col("sample_b")), 6)
        .as("containment_est"))
  }

  /** Shared candidate machinery: (id_a, id_b, inter, __sza, __szb) for
   *  every ordered doc pair sharing ≥1 shingle (df-capped). */
  private def shinglePairCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      maxShingleDocFreq: Int): DataFrame = {
    val shUdf = shingleUdf(shingleK)
    // spread before the shingler: one serial scan task otherwise pays
    // the whole corpus tokenize+slide (no-op at production counts)
    val shingled = Par.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), shUdf(col(textCol)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    // group-and-combine: ONE shuffle keyed by shingle builds each posting
    // list, ordered pairs are generated map-side inside the list (no
    // self-join, which would shuffle the exploded index twice); the df
    // cap is a size filter on the list. Each posting entry carries the
    // document's distinct-shingle-set size, so the union size falls out
    // of the pair aggregation itself — no per-doc sizes join, and the
    // corpus is scanned exactly once
    val index = shingled
      .select(
        struct(col(idCol).as("id"), size(col("shingles")).as("sz")).as("ds"),
        explode(col("shingles")).as("shingle"))
    val ids = col("ids")
    val grouped = index.groupBy("shingle")
      .agg(sort_array(collect_list(col("ds"))).as("ids"))
      .filter(size(ids) >= 2 && size(ids) <= maxShingleDocFreq)
    grouped
      .select(explode(flatten(transform(
        sequence(lit(1), size(ids) - 1),
        i => transform(
          slice(ids, i + 1, size(ids) - i),
          b => struct(
            element_at(ids, i).getField("id").as("id_a"),
            element_at(ids, i).getField("sz").as("sz_a"),
            b.getField("id").as("id_b"),
            b.getField("sz").as("sz_b"))))))
        .as("p"))
      .select(col("p.*"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"),
        first(col("sz_a")).as("__sza"), first(col("sz_b")).as("__szb"))
  }

  // ---- SimHash near-dup -----------------------------------------------

  /** SimHash near-dup pairs: 64-bit fingerprints, candidates from 16-bit
   *  chunk equality (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 chunks
   *  equal), verified by exact hamming distance. */
  /** (id, simhash) signature frame — the hash-family output alone.
   *  Public so the d04 oracle can persist it and have DuckDB replay the
   *  SQL-expressible verification (xor + bit_count hamming ≤ k) over
   *  every pair. */
  def simhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val shUdf = udf((text: String) => simhash64(text))
    Par.spread(docs.filter(col(textCol).isNotNull)
        .select(col(idCol), col(textCol)))
      .select(col(idCol), shUdf(col(textCol)).as("simhash"))
  }

  def nearDuplicatesSimhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    hammingNearDuplicates(simhashSignatures(docs, idCol, textCol),
      idCol, "simhash", maxHamming, maxBucketSize)

  /** Generic 64-bit hamming near-dup over ANY signature frame
   *  (id, hash): candidates from 16-bit chunk equality, verified by
   *  exact xor+bit_count. The pigeonhole guarantee (hamming ≤ 3 ⇒ at
   *  least one of the 4 chunks equal) makes the bucketed candidate set
   *  complete for `maxHamming ≤ 3`; larger thresholds turn this into a
   *  recall-trading screen (same contract as banded MinHash). Shared by
   *  text SimHash (d04) and image perceptual hashes — the hash family
   *  differs, the scale shape (O(rows×4) bucket keys, capped buckets,
   *  no self-join) is identical. */
  def hammingNearDuplicates(
      signatures: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val fps = signatures.select(col(idCol), col(hashCol).as("__h64"))
    val chunks = fps.select(
      col(idCol), col("__h64"),
      explode(expr(
        """transform(sequence(0, 3), i ->
          |  struct(i as chunk_idx,
          |         cast(shiftright(__h64, i * 16) & 65535 as int) as chunk_key))"""
          .stripMargin)).as("c"))
      .select(col(idCol), col("__h64"),
        col("c.chunk_idx"), col("c.chunk_key"))
    val buckets = chunks
      .groupBy("chunk_idx", "chunk_key")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("__h64").as("sh")))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
    buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members) - i - 1),
          |            y -> struct(x.id as id_a, x.sh as sh_a,
          |                        y.id as id_b, y.sh as sh_b))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        bit_count(expr("p.sh_a ^ p.sh_b")).as("hamming"))
      // filter BEFORE distinct: most chunk-collision candidates fail
      // the exact hamming test, so dropping them first keeps them out
      // of the dedup shuffle entirely (same result, less volume)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental 64-bit hamming near-dup — the ingest shape of
   *  [[incrementalNearDuplicatesFromSignatures]] for the hamming
   *  family (text SimHash, image dHash): candidates are the 16-bit
   *  chunk-keyed equi-join of the NEW slice's signatures against the
   *  persisted store's (each side's degenerate chunk buckets capped
   *  independently) plus [[hammingNearDuplicates]] WITHIN the slice;
   *  exact xor+bit_count verifies. Old×old pairs are never formed, old
   *  media never re-decoded — per ingest the cost is O(slice ×
   *  matches). The pigeonhole guarantee carries over: at maxHamming ≤
   *  3 one of the 4 chunks must agree, so the candidate set equals
   *  all-pairs at the threshold. Returns (id_a = new doc, id_b = store
   *  doc or a later slice doc, hamming); caller contract as in
   *  [[minhashStoreAppend]]: slice ids are new to the store. */
  def incrementalHammingNearDuplicates(
      storeSigs: DataFrame,
      newSigs: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    def side(df: DataFrame, idAs: String, hAs: String) = {
      val e = df.select(col(idCol).as(idAs), col(hashCol).as(hAs))
        .select(col(idAs), col(hAs), explode(expr(
          s"""transform(sequence(0, 3), i ->
             |  struct(i as chunk_idx,
             |         cast(shiftright($hAs, i * 16) & 65535 as int)
             |           as chunk_key))""".stripMargin)).as("c"))
        .select(col(idAs), col(hAs), col("c.chunk_idx"), col("c.chunk_key"))
      val counts = e.groupBy("chunk_idx", "chunk_key")
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") <= maxBucketSize).drop("__c")
      e.join(counts, Seq("chunk_idx", "chunk_key"), "left_semi")
    }
    val cross = side(newSigs, "id_a", "__ha")
      .join(side(storeSigs, "id_b", "__hb"), Seq("chunk_idx", "chunk_key"))
      .select(col("id_a"), col("id_b"),
        bit_count(expr("__ha ^ __hb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val within = hammingNearDuplicates(newSigs, idCol, hashCol,
      maxHamming, maxBucketSize)
    // the pair spaces are disjoint (id_b < store ids vs slice ids), so
    // a plain union is already duplicate-free
    cross.unionByName(within)
  }

  // ---- duplicate clustering (pairs → components → keep-set) -----------

  /** Deterministic dense long ids for an arbitrary orderable id column —
   *  the dictionary-encode step that lets URL/UUID-keyed corpora use the
   *  long-keyed clustering stack. Returns (idCol, dense_id) with
   *  dense_id ∈ 1..N, assigned by (hash-bucket, id) order.
   *
   *  Scale shape: NO global sort and NO single-partition rank over the
   *  data. Ids bucket by xxhash64 mod `buckets`, rank within their
   *  bucket (a window whose partitions are ~N/buckets rows), and add a
   *  per-bucket offset computed on the `buckets`-row count frame — the
   *  only single-partition window runs over ≤ `buckets` rows, which is
   *  bounded by construction. Deterministic across runs and cluster
   *  layouts (hash + in-bucket order are both data-only functions);
   *  NULL ids carry no identity and are excluded. */
  def denseIdDictionary(
      df: DataFrame,
      idCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val distinct = df.select(col(idCol))
      .filter(col(idCol).isNotNull).distinct()
      .withColumn("__b",
        pmod(xxhash64(col(idCol)), lit(buckets.toLong)).cast("int"))
    val counts = distinct.groupBy("__b").agg(count(lit(1)).as("__c"))
    val offsets = counts
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    distinct
      .withColumn("__r",
        row_number().over(Window.partitionBy("__b").orderBy(col(idCol))))
      .join(broadcast(offsets), Seq("__b"))
      .select(col(idCol), (col("__off") + col("__r")).as("dense_id"))
  }

  /** Attach a dense long surrogate id to `df` (see
   *  [[denseIdDictionary]]) and return (df + `denseCol`, dictionary) —
   *  the dictionary is the decode join: (idCol, dense_id). Rows whose
   *  id is NULL are dropped (they carry no identity to encode). */
  def withDenseIds(
      df: DataFrame,
      idCol: String,
      denseCol: String = "dense_id",
      buckets: Int = 4096): (DataFrame, DataFrame) = {
    val dict = denseIdDictionary(df, idCol, buckets)
    (df.join(dict.withColumnRenamed("dense_id", denseCol), Seq(idCol)),
      dict)
  }

  /** Connected components over near-duplicate candidate pairs: each doc
   *  gets `cluster_id` = the minimum doc id reachable through the pair
   *  graph. This is the step that turns pairwise dedup output into
   *  actionable groups (transitive closure: A~B, B~C ⇒ one cluster even
   *  if A,C never collided in any band).
   *
   *  Algorithm: iterative min-label propagation PLUS pointer jumping
   *  (label ← label(label)) each round, so convergence is O(log
   *  diameter) shuffles, not O(diameter) — a million-doc near-dup chain
   *  resolves in ~20 rounds. Per round: one edge join + one self join
   *  over the (id, label) frame, which holds only docs that appear in
   *  some pair (≪ corpus). `localCheckpoint` cuts lineage so plans stay
   *  flat; convergence is detected by the (monotonically decreasing)
   *  label sum going stable — one tiny aggregate per round.
   *
   *  Output: (doc_id, cluster_id), one row per doc present in `pairs`,
   *  in the INPUT id type: integral ids cluster directly (as longs);
   *  string/UUID ids are dictionary-encoded via [[denseIdDictionary]],
   *  clustered dense, then decoded with cluster_id relabeled to the
   *  minimum member id under the id type's own ordering. */
  def duplicateClusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxRounds: Int = 25): DataFrame = {
    // the label-propagation loop needs integral ids (a silent
    // cast("long") on string/UUID ids yields NULL, drops every edge,
    // and exact duplicates silently survive dedup). Non-integral but
    // orderable ids — URLs, UUIDs — dictionary-encode through
    // [[denseIdDictionary]], cluster on the dense longs, then decode
    // and RELABEL so the output contract (cluster_id = minimum member
    // id) holds in the caller's own id space, independent of
    // dictionary assignment order.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType, StringType}
    val idTypes = Seq(idA, idB).map(c => pairs.schema(c).dataType)
    val integral = idTypes.forall(dt => dt == ByteType || dt == ShortType ||
      dt == IntegerType || dt == LongType)
    if (!integral) {
      require(idTypes.forall(_ == StringType),
        s"duplicateClusters needs integral or string ids; " +
          s"'$idA'/'$idB' are ${idTypes.map(_.simpleString).mkString("/")}" +
          " — cast other id types to string (or encode to long) first")
      // the pair frame is usually the END of an expensive pipeline
      // (minhash → LSH → exact-Jaccard verify); it feeds the
      // dictionary build AND the dense encode, so cache it for the
      // branch — without this it is recomputed once per consumer
      val p = pairs.cache()
      val ids = p.select(col(idA).as("id"))
        .unionByName(p.select(col(idB).as("id")))
      // eager checkpoint: the dictionary is re-joined on both pair
      // sides and again at decode — recomputing the rank window each
      // time would triple the encode cost and deepen the loop's lineage
      val dict = denseIdDictionary(ids, "id").localCheckpoint(true)
      val densePairs = p
        .join(dict.select(col("id").as(idA), col("dense_id").as("__da")),
          Seq(idA))
        .join(dict.select(col("id").as(idB), col("dense_id").as("__db")),
          Seq(idB))
        .select(col("__da").as("id_a"), col("__db").as("id_b"))
      // the recursion checkpoints every surviving frame (its edge
      // cache materializes from the cached pairs; its labels are
      // localCheckpoints), so the cached pairs can release here
      val dense = duplicateClusters(densePairs, "id_a", "id_b", maxRounds)
      p.unpersist(false)
      val decoded = dense.join(
        dict.select(col("dense_id").as("doc_id"), col("id").as("__orig")),
        Seq("doc_id"))
      val relabel = decoded.groupBy("cluster_id")
        .agg(min(col("__orig")).as("__cmin"))
      return decoded.join(relabel, Seq("cluster_id"))
        .select(col("__orig").as("doc_id"), col("__cmin").as("cluster_id"))
    }
    val e0 = pairs.select(col(idA).cast("long").as("src"),
      col(idB).cast("long").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // coalesce: SUM over an empty frame is NULL — a corpus with no
    // duplicate pairs at all must converge on round 1, not NPE
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var prev = labelSum(labels)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // 1. neighbor propagation: min over own + adjacent labels
      val viaNbr = labels
        .union(edges.join(labels.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), col("label")))
        .groupBy("id").agg(min("label").as("label"))
      // 2. pointer jumping: follow the label one hop (label of label)
      val next = viaNbr
        .join(viaNbr.select(col("id").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("label2"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      val cur = labelSum(next)
      done = cur.compareTo(prev) == 0
      prev = cur
      labels.unpersist(false) // drop the previous round's checkpoint blocks
      labels = next
      round += 1
    }
    edges.unpersist(false)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** End-to-end corpus dedup: exact duplicates AND MinHash near-dups
   *  feed ONE pair graph, connected components merge overlapping
   *  evidence (doc A exact-dups B while B near-dups C ⇒ one cluster),
   *  and the keep-set filter returns the surviving docs. The composition
   *  every stage was built for:
   *
   *    exactDuplicates ──┐
   *                      ├─ union → duplicateClusters → dedupByClusters
   *    minhash → LSH →   │
   *    ngramJaccard ─────┘
   *
   *  Every stage keeps its own scale shape (hash-key shuffles, banded
   *  LSH, bucket guards, id-only cluster frame, left-anti keep filter). */
  def dedupCorpus(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      jaccardThreshold: Double = 0.9,
      shingleK: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 32,
      maxBucketSize: Int = 1000,
      // slice-grain callers (a few hundred docs, e.g. d09's capped
      // string-id fixture) opt out of the signature spread — the added
      // exchange costs more than the serial sign at that size (the r18
      // slice-grain pattern; measured r19: d09 ran ~15-20% slower with
      // the corpus-default spread)
      spread: Boolean = true): DataFrame = {
    // exact groups → star pairs (every member ↔ the group head)
    val exactPairs = exactDuplicates(docs, idCol, textCol)
      .select(col("doc_ids")(0).as("id_a"),
        explode(expr("slice(doc_ids, 2, size(doc_ids) - 1)")).as("id_b"))
    val sigs = minhashSignatures(docs, idCol, textCol,
      shingleK = shingleK, numHashes = numHashes, numBands = numBands,
      spread = spread)
    val nearPairs = ngramJaccard(docs,
      lshCandidatePairs(sigs, idCol, maxBucketSize),
      idCol, textCol, shingleK)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val clusters = duplicateClusters(exactPairs.unionByName(nearPairs))
    dedupByClusters(docs, clusters, idCol)
  }

  /** Keep-set filter: drop every doc that belongs to a cluster but is
   *  not its canonical (minimum-id) member. Docs in no cluster pass
   *  through — the join is a left-anti against the (small) non-canonical
   *  id set, so the corpus is never shuffled. */
  def dedupByClusters(
      docs: DataFrame,
      clusters: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    docs.join(
      clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Cluster-size distribution — the dedup diagnostic read BEFORE
   *  committing a removal policy: is dedup about to cut 1% of the
   *  corpus or 40%? One row per cluster size with the cluster count,
   *  member count, and how many docs the keep-min policy would remove
   *  (size − 1 per cluster). Input is a [[duplicateClusters]]-shaped
   *  (doc_id, cluster_id) frame; two cluster-keyed aggregations, both
   *  output-sized — never touches text. */
  def clusterSizeProfile(
      clusters: DataFrame,
      clusterCol: String = "cluster_id"): DataFrame =
    clusters.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("cluster_size") - 1).as("n_removed_keep_min"))

  /** Quality-aware canonical selection: instead of keeping each dup
   *  cluster's minimum-id member, keep its BEST member by `scoreCol`
   *  (longest / highest quality score / freshest — ties break to the
   *  smallest id so the pick is total and engine-reproducible). Docs in
   *  no cluster are their own cluster and stay canonical. One shuffle,
   *  keyed by cluster id: the window ranks only within clusters, and at
   *  100 TB the frame carries (id, cluster, score) — never doc bodies.
   *  Returns (idCol, scoreCol, cluster_id, is_canonical); filter
   *  `is_canonical` for the keep set. */
  def canonicalPick(
      docs: DataFrame,
      clusters: DataFrame,
      scoreCol: String,
      idCol: String = "doc_id",
      clusterCol: String = "cluster_id"): DataFrame = {
    val joined = docs.select(col(idCol), col(scoreCol))
      .join(clusters.select(col("doc_id").as(idCol),
        col(clusterCol)), Seq(idCol), "left")
      .withColumn(clusterCol, coalesce(col(clusterCol), col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    joined
      .withColumn("__rk", row_number().over(w))
      .withColumn("is_canonical", col("__rk") === 1)
      .drop("__rk")
  }

  /** Incremental cluster maintenance: fold a NEW day's duplicate pairs
   *  into an existing (doc_id, cluster_id) assignment table without
   *  re-clustering history. The stored assignments collapse each old
   *  cluster to a star (member → min-id hub), so the incremental graph
   *  is |clustered docs| + |new pairs| edges — label propagation runs
   *  over THAT, not over every pair ever seen, which is what keeps
   *  daily dedup viable when the corpus is 100 TB and a day's delta is
   *  1%. New edges that bridge two old clusters merge them (both hubs
   *  join one component); the output labels equal a full re-cluster of
   *  the union pair set (cluster_id = min member id), proven by the
   *  d13 oracle's full-closure replay. Every doc present in
   *  `assignments` or touched by `newPairs` gets a row; untouched
   *  singletons keep themselves. */
  def incrementalClusters(
      assignments: DataFrame,
      newPairs: DataFrame): DataFrame = {
    val starEdges = assignments
      .select(col("doc_id").as("id_a"), col("cluster_id").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val edges = starEdges.unionByName(newPairs.select("id_a", "id_b"))
    val clustered = duplicateClusters(edges)
    val nodes = assignments.select("doc_id")
      .unionByName(newPairs.select(col("id_a").as("doc_id")))
      .unionByName(newPairs.select(col("id_b").as("doc_id")))
      .distinct()
    nodes.join(clustered, Seq("doc_id"), "left")
      .withColumn("cluster_id",
        coalesce(col("cluster_id"), col("doc_id")))
  }

  /** Dedup-pipeline quality evaluation: precision / recall / F1 of a
   *  candidate pair set against exact ground truth — the measurement
   *  loop that tunes bands/rows (the LSH S-curve) before a 100 TB
   *  dedup run commits, the text twin of
   *  [[Similarity.recallAtK]]. Both inputs are (id_a, id_b) pair
   *  frames with id_a < id_b; output is ONE row of counts +
   *  rounded metrics (F1 in its closed Dice form 2·hit/(pred+truth),
   *  no intermediate rounding). Joins are pair-keyed — work scales
   *  with the pair sets, never the corpus. */
  def nearDupEval(truth: DataFrame, predicted: DataFrame): DataFrame = {
    // dedupe both pair sets: a duplicated predicted pair must count
    // once in n_pred AND n_hit or precision/recall skew past 1.0
    val tp = truth.select("id_a", "id_b").distinct()
    val pp = predicted.select("id_a", "id_b").distinct()
    val hit = pp.join(tp, Seq("id_a", "id_b"))
    tp.agg(count(lit(1)).as("n_truth"))
      .crossJoin(pp.agg(count(lit(1)).as("n_pred")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_pred"), col("n_hit"),
        when(col("n_pred") === 0, lit(null))
          .otherwise(round(col("n_hit").cast("double") / col("n_pred"), 6))
          .as("precision"),
        when(col("n_truth") === 0, lit(null))
          .otherwise(round(col("n_hit").cast("double") / col("n_truth"), 6))
          .as("recall"),
        when(col("n_pred") + col("n_truth") === 0, lit(null))
          .otherwise(round(lit(2.0) * col("n_hit") /
            (col("n_pred") + col("n_truth")), 6))
          .as("f1"))
  }

  /** Takedown propagation — the copyright / right-to-be-forgotten
   *  operator a corpus actually needs: removing a listed document is
   *  not enough when its near-verbatim copies survive, so the removal
   *  must follow the duplicate graph. Given the corpus's dup-pair
   *  graph and a takedown id list, returns the full removal manifest:
   *  every listed doc PLUS every doc sharing a duplicate cluster with
   *  one, tagged with why it goes ("listed" vs "propagated") and the
   *  cluster that carried the propagation (listed docs outside any
   *  cluster are their own cluster).
   *
   *  Scale: clusters come from [[duplicateClusters]] (id-only pointer
   *  jumping); the takedown list is broadcast twice (it is small by
   *  nature — a legal notice, not a corpus); the flagged-cluster set
   *  is a semi-join on cluster_id. The corpus text is never touched —
   *  apply the manifest with [[applyTakedown]]'s left-anti join. */
  def takedownPropagate(
      pairs: DataFrame,
      takedownIds: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val listed = broadcast(takedownIds.select(col(idCol)).distinct())
    val clusters = duplicateClusters(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val flagged = clusters
      .join(listed, Seq(idCol), "left_semi")
      .select(col("cluster_id")).distinct()
    val viaClusters = clusters
      .join(broadcast(flagged), Seq("cluster_id"), "left_semi")
    // listed docs in no cluster: their own (singleton) cluster. No
    // cast: duplicateClusters labels integral ids as long and string
    // ids in the caller's own space, and the union widens int→long —
    // so this stays correct for BOTH id families
    val singletons = listed
      .join(clusters.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col(idCol).as("cluster_id"))
    viaClusters.select(col(idCol), col("cluster_id"))
      .unionByName(singletons)
      .join(listed.withColumn("__listed", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        when(col("__listed"), lit("listed")).otherwise(lit("propagated"))
          .as("reason"))
  }

  /** Apply a removal manifest: drop every manifest doc from the
   *  corpus. Left-anti on the id column only — the corpus rows are
   *  filtered in place, never reshaped or shuffled. */
  def applyTakedown(
      docs: DataFrame,
      manifest: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    docs.join(manifest.select(col(idCol)), Seq(idCol), "left_anti")

  /** Exact substring-SPAN detection — the span-grain exact dedup of
   *  training-data curation: find the character ranges of each
   *  document that also occur verbatim in at least one OTHER
   *  document, so removal can cut the copied span instead of the
   *  whole document (whole-doc dedup misses a unique article that
   *  embeds a wire-service paragraph; this doesn't). A Karp–Rabin
   *  rolling hash over the lowercased whitespace-collapsed text
   *  ([[TextAnalysis.krHashes]] — the x04 fingerprint family) marks
   *  every `gram`-char window whose hash occurs in 2..maxDf distinct
   *  docs; the union of their [pos, pos+gram) intervals — ONE
   *  running-max window chain per doc — is the covered span set.
   *  Spans shorter than `minSpan` (common phrasing, not copying)
   *  drop. Positions index the NORMALIZED text.
   *
   *  Scale: the only shuffles carry (hash, doc_id, pos) triples —
   *  never text; `maxDf` caps each posting list exactly like the
   *  MinHash band guard (a window occurring in half the corpus is
   *  boilerplate whose positions would explode the join, and
   *  boilerplate has its own operator); the interval union is one
   *  window per doc ordered by pos. Docs whose normalized text is
   *  shorter than `gram` carry no full window and are skipped. */
  def substringSpans(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gram: Int = 40,
      minSpan: Int = 60,
      maxDf: Int = 1000): DataFrame =
    substringSpansFromGrams(
      TextAnalysis.fingerprintHashes(
        docs.filter(length(
          regexp_replace(lower(col(textCol)), "\\s+", " ")) >= gram),
        idCol, textCol, gram),
      idCol, gram, minSpan, maxDf)

  /** [[substringSpans]] over a precomputed (idCol, pos, hash) gram
   *  stream — the incremental entry point: a standing corpus signs
   *  ONCE into a persisted stream, a new slice appends its own grams
   *  at O(slice), and the span pass re-runs over signatures without
   *  ever touching text again. Exactly two exchanges: the df count is
   *  a window over the hash partition (first-occurrence flags summed
   *  — no groupBy + join-back), then the interval union windows over
   *  the doc partition. */
  def substringSpansFromGrams(
      grams: DataFrame,
      idCol: String = "doc_id",
      gram: Int = 40,
      minSpan: Int = 60,
      maxDf: Int = 1000,
      minDf: Int = 2,
      unionGap: Int = 0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // df = distinct docs per window hash; minDf..maxDf = shared, sane
    // (minDf=1 is the cross-corpus mode: the gram stream was already
    // restricted to windows matching the OTHER corpus, so presence
    // alone qualifies). Both windows hash-partition on `hash` alone
    // (the (hash, doc) clustering is satisfied by it) — ONE exchange.
    val wHD = w.partitionBy(col("hash"), col(idCol)).orderBy("pos")
    val wH = w.partitionBy("hash")
    val shared = grams
      .withColumn("__first",
        when(row_number().over(wHD) === 1, 1).otherwise(0))
      .withColumn("__df", sum(col("__first")).over(wH))
      .filter(col("__df") >= minDf && col("__df") <= maxDf)
      .select(col(idCol), col("pos"))
    // interval union: a position starts a new span iff it clears the
    // running max end of everything before it. `unionGap` widens the
    // merge reach (sampled streams bridge expected sampling gaps);
    // reported span bounds stay the REAL covered extent.
    val prev = w.partitionBy(idCol).orderBy("pos")
      .rowsBetween(w.unboundedPreceding, -1)
    val run = w.partitionBy(idCol).orderBy("pos")
    val spans = shared
      .withColumn("cummax",
        max(col("pos") + lit(gram + unionGap)).over(prev))
      .withColumn("span_id",
        sum(when(col("cummax").isNull || col("pos") > col("cummax"), 1)
          .otherwise(0)).over(run))
      .groupBy(col(idCol), col("span_id"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + lit(gram)).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .withColumn("span_len", col("span_end") - col("span_start"))
    spans.filter(col("span_len") >= minSpan)
      .select(col(idCol), col("span_start"), col("span_end"),
        col("span_len"), col("n_grams"))
  }

  /** Per-source duplicated-text mass: what fraction of each source's
   *  normalized characters sit inside a cross-document shared span
   *  ([[substringSpans]]) — the curation dashboard number answering
   *  "which of my sources is mostly copies" before any mixture
   *  weight is chosen. Spans are disjoint per doc by construction
   *  (interval union), so covered mass is a plain sum; the ratio
   *  quantizes to ppm from integer character counts so it is
   *  engine-portable. One extra source-keyed aggregation on top of
   *  the span pass — the text column never moves. */
  def duplicatedMass(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      gram: Int = 40,
      minSpan: Int = 60,
      maxDf: Int = 1000): DataFrame =
    duplicatedMassFromSpans(docs,
      substringSpans(docs, idCol, textCol, gram, minSpan, maxDf),
      idCol, textCol, sourceCol)

  /** Span-grain EVAL decontamination: the character ranges of corpus
   *  docs that appear verbatim in a benchmark/eval set — the
   *  substring twin of the n-gram-overlap (x08) and semantic (e22)
   *  decontamination lanes, and the precise input [[removeSpans]]
   *  needs to cut leaked eval text without dropping whole documents.
   *  A corpus window qualifies by PRESENCE in the bench hash set
   *  (minDf=1), not by corpus-internal df; the maxDf cap still
   *  guards the one failure mode (a boilerplate window that also
   *  sits in the bench would explode the match).
   *
   *  Scale: benchmark sets are small and curated — their distinct
   *  window hashes BROADCAST; the corpus gram stream never shuffles
   *  until the matched (usually tiny) hit set reaches the span
   *  windows. */
  def contaminationSpans(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gram: Int = 40,
      minSpan: Int = 60,
      maxDf: Int = 1000): DataFrame = {
    def grams(df: DataFrame) = TextAnalysis.fingerprintHashes(
      df.filter(length(
        regexp_replace(lower(col(textCol)), "\\s+", " ")) >= gram),
      idCol, textCol, gram)
    contaminationSpansFromGrams(grams(corpus), grams(bench),
      idCol, gram, minSpan, maxDf)
  }

  /** [[contaminationSpans]] over precomputed gram streams — the
   *  incremental entry point (a standing benchmark registry signs
   *  once; each corpus slice's grams check at O(slice)). */
  def contaminationSpansFromGrams(
      corpusGrams: DataFrame,
      benchGrams: DataFrame,
      idCol: String = "doc_id",
      gram: Int = 40,
      minSpan: Int = 60,
      maxDf: Int = 1000): DataFrame =
    substringSpansFromGrams(
      corpusGrams.join(
        broadcast(benchGrams.select("hash").distinct()), Seq("hash")),
      idCol, gram, minSpan, maxDf, minDf = 1)

  /** The 100 TB scale path of [[substringSpans]]: content-defined
   *  1/`sampleMod` sampling of the gram stream (keep a window iff its
   *  hash ≡ 0 mod `sampleMod` — position-independent, so the SAME
   *  windows are kept in every document that contains them, exactly
   *  what offset-based winnowing blocks cannot guarantee across
   *  docs). The shuffle carries 1/sampleMod of the positions; span
   *  boundaries resolve to ±O(sampleMod) gram starts and
   *  `unionGap = 4·sampleMod` bridges expected sampling gaps inside
   *  one shared region (a gap that long occurs with probability
   *  (1−1/m)^(gram+4m) ≈ 10⁻³ per junction at m=16). n_grams counts
   *  SAMPLED windows. Exact [[substringSpans]] stays the default;
   *  this is the knob to reach corpus sizes where every-position
   *  signing cannot shuffle. */
  def substringSpansSampled(
      grams: DataFrame,
      idCol: String = "doc_id",
      gram: Int = 40,
      minSpan: Int = 60,
      maxDf: Int = 1000,
      minDf: Int = 2,
      sampleMod: Int = 16): DataFrame =
    substringSpansFromGrams(
      grams.filter(pmod(col("hash"), lit(sampleMod.toLong)) === 0L),
      idCol, gram, minSpan, maxDf, minDf,
      unionGap = 4 * sampleMod)

  /** Decontamination ATTRIBUTION — the report a leak investigation
   *  actually reads: for every (corpus doc, benchmark doc) pair
   *  sharing verbatim `gram`-char windows, how many windows and the
   *  covered extent on the corpus side. [[contaminationSpans]] says
   *  "this range leaked from somewhere in the eval set"; this names
   *  the eval doc, so the owning benchmark can be quarantined or the
   *  split rebuilt. Pairs with fewer than `minGrams` shared windows
   *  are single-window noise and drop.
   *
   *  Scale: BOTH sides are df-capped before the hash join (a window
   *  in >maxDf corpus docs — or >maxDf bench docs — is boilerplate
   *  whose pair product would explode); the bench side reduces to
   *  distinct (hash, bench doc) and broadcasts (benchmark registries
   *  are small by contract); the output aggregation keys on the pair. */
  def contaminationAttribution(
      corpusGrams: DataFrame,
      benchGrams: DataFrame,
      idCol: String = "doc_id",
      gram: Int = 40,
      minGrams: Int = 3,
      maxDf: Int = 1000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    def dfCapped(g: DataFrame): DataFrame = {
      val wHD = w.partitionBy(col("hash"), col(idCol)).orderBy("pos")
      val wH = w.partitionBy("hash")
      g.withColumn("__first",
          when(row_number().over(wHD) === 1, 1).otherwise(0))
        .withColumn("__df", sum(col("__first")).over(wH))
        .filter(col("__df") <= maxDf)
        .drop("__first", "__df")
    }
    val b = dfCapped(benchGrams)
      .select(col(idCol).as("bench_id"), col("hash")).distinct()
    dfCapped(corpusGrams).join(broadcast(b), Seq("hash"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_grams"),
        min("pos").cast("long").as("first_pos"),
        (max("pos") + lit(gram)).cast("long").as("last_end"))
      .filter(col("n_grams") >= minGrams)
  }

  /** [[contaminationSpans]] as a MAP-ONLY per-row gate — the form that
   *  runs unchanged on a document stream at ingest: the benchmark's
   *  distinct window hashes ride the closure (eval-registry-sized by
   *  contract, the st15 pattern) and every arriving doc derives its
   *  own shared spans in one pass over its Karp–Rabin stream — no
   *  shuffle, no state store, append mode. Same interval-union
   *  semantics as the batch window chain (one row per span, same
   *  columns); the corpus-df boilerplate cap does not apply — a
   *  per-row gate has no corpus-wide df to cap, each arrival is
   *  judged alone. Docs shorter than `gram` carry no full window and
   *  must be filtered by the caller (their degenerate whole-text
   *  hash is not a gram). */
  def substringGate(
      docs: DataFrame,
      benchHashes: scala.collection.Set[Long],
      idCol: String = "doc_id",
      textCol: String = "text",
      gram: Int = 40,
      minSpan: Int = 60): DataFrame = {
    val gateUdf = udf { text: String =>
      val hs = TextAnalysis.krHashes(text, gram)
      val spans = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      var curStart = -1L; var curEnd = -1L; var curN = 0L
      var i = 0
      while (i < hs.length) {
        if (benchHashes.contains(hs(i))) {
          val s0 = i.toLong; val e0 = i.toLong + gram
          if (curStart < 0) { curStart = s0; curEnd = e0; curN = 1 }
          else if (s0 <= curEnd) {
            if (e0 > curEnd) curEnd = e0
            curN += 1
          } else {
            spans += ((curStart, curEnd, curN))
            curStart = s0; curEnd = e0; curN = 1
          }
        }
        i += 1
      }
      if (curStart >= 0) spans += ((curStart, curEnd, curN))
      spans.filter(p => p._2 - p._1 >= minSpan).toSeq
    }
    docs
      .withColumn("__spans", gateUdf(col(textCol)))
      .select(col(idCol), explode(col("__spans")).as("__s"))
      .select(col(idCol),
        col("__s._1").as("span_start"),
        col("__s._2").as("span_end"),
        (col("__s._2") - col("__s._1")).as("span_len"),
        col("__s._3").as("n_grams"))
  }

  /** Span REMOVAL — the apply step of exact substring dedup: cut the
   *  shared character ranges ([[substringSpans]]) out of each doc's
   *  normalized text and return the surgery manifest (cleaned text +
   *  its length/md5, spans removed, chars removed) for EVERY corpus
   *  doc — span-free docs pass through with zero counts, so the
   *  output is the full cleaned corpus, not just the touched rows.
   *  Spans are disjoint and sorted per doc by construction, so the
   *  keep-set is the complement segments: one before each span (lag
   *  of the previous span end) plus the tail after the last.
   *
   *  Scale: this is the one operator in the family that MUST move
   *  text (it rewrites documents); segments cut map-side after one
   *  doc-keyed join, and the reassembly groups ~doc-sized segment
   *  text per doc — a single doc-keyed exchange of the corpus, the
   *  same cost as any rewrite-the-corpus materialization. */
  def removeSpans(
      docs: DataFrame,
      spans: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val norm = docs.select(col(idCol),
      regexp_replace(lower(col(textCol)), "\\s+", " ").as("__t"))
    val byStart = w.partitionBy(idCol).orderBy("span_start")
    // segment before each span: [prev span end (or 0), span start)
    val pre = spans
      .withColumn("seg_start",
        coalesce(lag(col("span_end"), 1).over(byStart), lit(0L)))
      .select(col(idCol), col("seg_start"),
        col("span_start").as("seg_end"))
    val perDoc = spans.groupBy(idCol)
      .agg(max("span_end").as("__tail_start"),
        sum("span_len").as("removed_chars"),
        count(lit(1)).as("n_spans_removed"))
    // tail segment after the last span: [max span end, len)
    val tail = perDoc.join(norm, Seq(idCol))
      .select(col(idCol), col("__tail_start").as("seg_start"),
        length(col("__t")).cast("long").as("seg_end"))
    val segs = pre.unionByName(tail)
      .join(norm, Seq(idCol))
      .select(col(idCol), col("seg_start"),
        col("__t").substr((col("seg_start") + 1).cast("int"),
          (col("seg_end") - col("seg_start")).cast("int"))
          .as("seg_text"))
    val rebuilt = segs.groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("seg_start"),
          col("seg_text")))),
        x => x.getField("seg_text")), "").as("__cleaned"))
    norm.join(rebuilt, Seq(idCol), "left")
      .join(perDoc.select(col(idCol), col("removed_chars"),
        col("n_spans_removed")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans_removed"), lit(0L))
          .as("n_spans_removed"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        length(coalesce(col("__cleaned"), col("__t"))).cast("long")
          .as("cleaned_len"),
        md5(coalesce(col("__cleaned"), col("__t")).cast("binary"))
          .as("cleaned_md5"))
  }

  // ---- Line-grain exact dedup (the C4 / RefinedWeb recipe) -----------

  /** Exploded (id, line_idx, line, __key, __enc) line stream: lines are
   *  the RAW newline-split segments (a line-grain operator must respect
   *  the author's line boundaries — the span family's whitespace
   *  normalization would destroy them); `__key` is md5 of the TRIMMED
   *  line, null for lines shorter than `minLineChars` (navigation
   *  stubs, blank lines — too short to be meaningful duplication);
   *  `__enc` is the order key doc*1e6+idx that makes "globally first
   *  occurrence" one integer MIN. The encoding's bound (doc ids in
   *  [0, (2^63-1-999999)/1e6] so the product cannot overflow Long,
   *  < 1e6 lines/doc) is ENFORCED with a raise_error branch — a doc
   *  outside it would silently corrupt canonical-occurrence selection,
   *  so it must fail the task instead. A NULL doc id degrades per-row
   *  (null `__enc`/`__key`): a row with no identity cannot anchor a
   *  canonical occurrence, and one malformed row must not kill a
   *  corpus-scale job. */
  private def lineKeyed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineChars: Int): DataFrame =
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_idx", "line")))
      .withColumn("__key",
        when(col(idCol).isNotNull &&
            length(trim(col("line"))) >= minLineChars,
          md5(trim(col("line")).cast("binary"))))
      .withColumn("__enc",
        when(col(idCol).isNull, lit(null).cast("long"))
          .when(col("line_idx") < lit(1000000) &&
            col(idCol).cast("long") >= lit(0L) &&
            // upper bound: doc*1e6 + 999999 must fit in a Long —
            // beyond it the product silently wraps and corrupts
            // canonical-occurrence MINs
            col(idCol).cast("long") <=
              lit((Long.MaxValue - 999999L) / 1000000L),
          col(idCol).cast("long") * lit(1000000L) + col("line_idx"))
          .otherwise(raise_error(concat(
            lit("lineKeyed: order-key bound violated "),
            lit("(need 0 <= doc_id <= (2^63-1-999999)/1e6 "),
            lit("and < 1e6 lines/doc): doc="),
            col(idCol).cast("string"),
            lit(" line_idx="), col("line_idx").cast("string")))))

  /** Line-grain duplicate dictionary — the diagnostic face of the C4 /
   *  RefinedWeb line-dedup recipe ("discard any line appearing more
   *  than once in the corpus"): every trimmed line of ≥ `minLineChars`
   *  occurring in ≥ `minDf` DISTINCT docs, with its doc frequency,
   *  total occurrences, char length, and the canonical (first by
   *  (doc, line_idx)) occurrence every other copy will defer to.
   *
   *  Scale: the (key, doc) pre-aggregation spreads a hot boilerplate
   *  line ("all rights reserved") across its doc values BEFORE the
   *  per-key rollup, so no single reducer sees a posting list — the
   *  two-phase hot-key GROUP BY pattern; shuffles carry (hash, doc,
   *  enc) triples, never line text. */
  def duplicateLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineChars: Int = 15,
      minDf: Int = 2): DataFrame = {
    val keyed = lineKeyed(docs, idCol, textCol, minLineChars)
    keyed.filter(col("__key").isNotNull)
      .groupBy(col("__key"), col(idCol))
      .agg(count(lit(1)).as("__occ"),
        min(col("__enc")).as("__docmin"),
        min(length(trim(col("line")))).as("__chars"))
      .groupBy(col("__key"))
      .agg(count(lit(1)).as("df"),
        sum(col("__occ")).as("n_occurrences"),
        min(col("__chars")).cast("long").as("line_chars"),
        min(col("__docmin")).as("__canon"))
      .filter(col("df") >= minDf)
      .select(col("__key").as("line_md5"), col("df"),
        col("n_occurrences"),
        col("line_chars"),
        // integer div, not `/` (double division loses exactness for
        // doc ids above ~2^53/1e6)
        expr("__canon div 1000000").as("canon_doc"),
        (col("__canon") % 1000000L).cast("long").as("canon_line_idx"))
  }

  /** Line-grain exact dedup, applied — C4/RefinedWeb's corpus-wide
   *  duplicate-line removal: every line whose trimmed form occurs in
   *  ≥ `minDf` distinct docs is cut EXCEPT its globally-first
   *  occurrence (min (doc, line_idx)); short lines always survive.
   *  Returns the full cleaned-corpus manifest (every doc, zero counts
   *  for untouched ones): n_lines, n_lines_removed, removed_chars
   *  (raw line chars, separators excluded), cleaned_len, cleaned_md5 —
   *  the [[removeSpans]] manifest shape at line grain. The two
   *  operators are complements: spans catch verbatim ranges that cross
   *  line boundaries, this respects the boundaries (a repeated nav
   *  header is ONE line duplicated, not a 40-char window).
   *
   *  Scale: dedup decisions ride (hash, doc, idx) triples through the
   *  same two-phase hot-key GROUP BY as [[duplicateLines]]; the only
   *  join that sees text is the final doc-keyed attach of each doc's
   *  (small) dropped-index list, after which the surgery is map-side
   *  array filtering — text shuffles at most once, and the drop-list
   *  side is output-manifest-sized. A boilerplate line in half the
   *  corpus makes that attach join skewed on the probe side — AQE
   *  skew-join splits it (build rows are one list per doc). */
  def lineDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineChars: Int = 15,
      minDf: Int = 2): DataFrame = {
    val keyed = lineKeyed(docs, idCol, textCol, minLineChars)
    val perDoc = keyed.filter(col("__key").isNotNull)
      .groupBy(col("__key"), col(idCol))
      .agg(min(col("__enc")).as("__docmin"))
    val dict = perDoc.groupBy(col("__key"))
      .agg(count(lit(1)).as("__df"), min(col("__docmin")).as("__canon"))
      .filter(col("__df") >= minDf)
      .select(col("__key"), col("__canon"))
    // skinny decision stream: every occurrence except the canonical
    val dropped = keyed.filter(col("__key").isNotNull)
      .select(col(idCol), col("line_idx"), col("__key"), col("__enc"))
      .join(dict, Seq("__key"))
      .filter(col("__enc") =!= col("__canon"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("line_idx"))).as("__dl"))
    val cleaned = array_join(
      filter(col("__lines"),
        (_: Column, i: Column) => not(array_contains(col("__dl"), i))),
      "\n")
    docs.withColumn("__lines", split(col(textCol), "\n", -1))
      .join(dropped, Seq(idCol), "left")
      .withColumn("__dl", coalesce(col("__dl"), array().cast("array<int>")))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__dl")).cast("long").as("n_lines_removed"),
        aggregate(transform(col("__dl"),
            i => length(element_at(col("__lines"), i + 1)).cast("long")),
          lit(0L), (a, x) => a + x).as("removed_chars"),
        length(cleaned).cast("long").as("cleaned_len"),
        md5(cleaned.cast("binary")).as("cleaned_md5"))
  }

  /** Line-grain gate at INGEST — the streaming twin of [[lineDedup]]:
   *  a standing corpus's duplicate-line dictionary ([[duplicateLines]]
   *  keys — dictionary-sized, so it rides the UDF closure like the
   *  substring/semantic gates) cuts known boilerplate lines from each
   *  arriving doc MAP-ONLY: no shuffle, no state store, append-mode
   *  safe. Returns the [[lineDedup]] manifest shape per arrival. The
   *  difference from the batch pass is inherent to per-row gating:
   *  arrivals are judged against the DICTIONARY only (no canonical
   *  keep — the standing corpus already holds the canonical copy),
   *  and new duplicates among arrivals themselves wait for the next
   *  batch fold. */
  def lineGate(
      docs: DataFrame,
      dupLineMd5: scala.collection.Set[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineChars: Int = 15): DataFrame = {
    val gateUdf = udf { raw: String =>
      // null text is reachable on degenerate rows (the batch twin's
      // split(null) stays null → doc untouched); treat as empty: one
      // empty line, nothing removed.
      val text = if (raw == null) "" else raw
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(s: String): String = {
        md.reset()
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val sb = new StringBuilder(32)
        var i = 0
        while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
        sb.toString
      }
      // trim SPACES only — Spark/DuckDB `trim` strips U+0020, while
      // Java String.trim strips every char <= U+0020 (tabs, CR); the
      // dictionary keys were built with SQL trim, so the gate's key
      // derivation must match or tab/CR-padded duplicates slip through.
      def trimSpaces(s: String): String = {
        var b = 0; var e = s.length
        while (b < e && s.charAt(b) == ' ') b += 1
        while (e > b && s.charAt(e - 1) == ' ') e -= 1
        if (b == 0 && e == s.length) s else s.substring(b, e)
      }
      val lines = text.split("\n", -1)
      var nRem = 0L; var remChars = 0L
      val kept = lines.filter { l =>
        val t = trimSpaces(l)
        val dup = t.length >= minLineChars && dupLineMd5.contains(hex(t))
        if (dup) { nRem += 1; remChars += l.length }
        !dup
      }
      (lines.length.toLong, nRem, remChars, kept.mkString("\n"))
    }
    docs.withColumn("__g", gateUdf(col(textCol)))
      .select(col(idCol),
        col("__g._1").as("n_lines"),
        col("__g._2").as("n_lines_removed"),
        col("__g._3").as("removed_chars"),
        length(col("__g._4")).cast("long").as("cleaned_len"),
        md5(col("__g._4").cast("binary")).as("cleaned_md5"))
  }

  // ---- Content-defined chunking (Gear/FastCDC recipe) ---------------

  /** One CDC chunk of a document: ordinal, byte offset, byte length,
   *  md5 of the chunk bytes. */
  final case class CdcChunk(
      chunk_idx: Int, start: Int, len: Int, chunk_md5: String)

  /** Deterministic 256-entry Gear table (splitmix64 of the byte value
   *  — no RNG state, so every engine/run derives the same table). */
  private[graft] val gearTable: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Content-defined chunk boundaries over a byte array (the
   *  Gear-hash/LBFS recipe storage dedup systems use): roll
   *  h = (h << 1) + gear(b); cut after a byte where (h & mask) == 0,
   *  subject to [minSize, maxSize]. The point of CONTENT-defined (vs
   *  fixed-width) cuts is shift resilience: inserting a byte near the
   *  start re-synchronizes within ~one chunk, so all later chunks
   *  keep their hashes — fixed-width chunking would shift every
   *  boundary and zero out dedup. maxSize forces progress through
   *  low-entropy runs the mask never cuts. */
  private[graft] def cdcChunkBytes(
      bytes: Array[Byte],
      minSize: Int,
      maxSize: Int,
      mask: Long): Seq[CdcChunk] = {
    val out = Seq.newBuilder[CdcChunk]
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    var idx = 0
    var h = 0L
    var i = 0
    def emit(end: Int): Unit = {
      val dig = md.digest(java.util.Arrays.copyOfRange(bytes, start, end))
      out += CdcChunk(idx, start,
        end - start, dig.map("%02x".format(_)).mkString)
      md.reset()
      idx += 1
      start = end
      h = 0L
    }
    while (i < bytes.length) {
      h = (h << 1) + gearTable(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if (len >= maxSize || (len >= minSize && (h & mask) == 0L)) emit(i)
    }
    if (start < bytes.length) emit(bytes.length)
    out.result()
  }

  /** Chunk-grain exact dedup manifest: every doc's content-defined
   *  chunks as (idCol, chunk_idx, start, len, chunk_md5) rows over the
   *  UTF-8 text bytes. This is the storage-dedup face of the family —
   *  line grain respects author boundaries ([[duplicateLines]]), span
   *  grain finds verbatim ranges ([[substringSpansFromGrams]]); chunk
   *  grain is what a content-addressed store dedups on, and the md5
   *  rollup over it prices the dedup BEFORE the store is built.
   *
   *  Scale: the chunker is a partition-local flatMap (map-only, no
   *  shuffle; one MessageDigest per row batch); downstream rollups
   *  shuffle (md5, len) pairs, never chunk bytes. Null text degrades
   *  to zero chunks. */
  def cdcChunks(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minSize: Int = 32,
      maxSize: Int = 256,
      maskBits: Int = 6): DataFrame = {
    require(minSize >= 1 && maxSize >= minSize,
      "need 1 <= minSize <= maxSize")
    require(maskBits >= 1 && maskBits <= 20,
      "maskBits in [1, 20] (expected chunk ~2^maskBits bytes)")
    val mask = (1L << maskBits) - 1L
    val chunkUdf = udf { text: String =>
      if (text == null) Seq.empty[CdcChunk]
      else cdcChunkBytes(text.getBytes("UTF-8"), minSize, maxSize, mask)
    }
    docs.select(col(idCol), explode(chunkUdf(col(textCol))).as("__c"))
      .select(col(idCol), col("__c.chunk_idx"), col("__c.start"),
        col("__c.len").cast("long").as("len"), col("__c.chunk_md5"))
  }

  /** Per-source dedup pricing over a [[cdcChunks]] frame: how many
   *  bytes a content-addressed chunk store would save. dup_bytes =
   *  Σ over repeated md5s of (occurrences − 1)·len — the bytes the
   *  store never writes twice. Two metadata-thin aggregations (the
   *  (source, md5) pre-rollup spreads hot boilerplate chunks before
   *  the per-source fold — the duplicateLines two-phase pattern). */
  def cdcDedupStats(
      docs: DataFrame,
      chunks: DataFrame,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame =
    chunks
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol), col("chunk_md5"))
      .agg(count(lit(1)).as("__occ"), min(col("len")).as("__len"))
      .groupBy(col(sourceCol))
      .agg(sum(col("__occ")).as("n_chunks"),
        count(lit(1)).as("n_unique_chunks"),
        sum(col("__occ") * col("__len")).as("total_bytes"),
        sum((col("__occ") - 1L) * col("__len")).as("dup_bytes"))
      .withColumn("dedup_savings_ppm",
        expr("CAST(dup_bytes * 1000000 DIV total_bytes AS BIGINT)"))
      .orderBy(sourceCol)

  /** [[duplicatedMass]] from an already-computed span set (e.g. the
   *  persisted-gram incremental path) — the rollup alone. */
  def duplicatedMassFromSpans(
      docs: DataFrame,
      spans: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val perDoc = spans
      .groupBy(idCol)
      .agg(sum("span_len").as("covered"), count(lit(1)).as("n_spans"))
    docs.select(col(idCol), col(sourceCol),
        length(regexp_replace(lower(col(textCol)), "\\s+", " "))
          .cast("long").as("n_norm"))
      .join(perDoc, Seq(idCol), "left")
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        count(col("covered")).as("n_docs_with_spans"),
        sum(coalesce(col("covered"), lit(0L))).as("covered_chars"),
        sum("n_norm").as("total_chars"))
      .withColumn("dup_mass_ppm",
        round(lit(1e6) * col("covered_chars") / col("total_chars"), 0)
          .cast("long"))
  }

  /** Character-level edit-distance verification of candidate pairs —
   *  the CHARACTER-grain confirm step the token-grain verifies
   *  (shingle Jaccard, SimHash hamming) can miss in both directions:
   *  token-identical docs with different whitespace/punctuation, and
   *  token-divergent docs that are one find-and-replace apart. Runs
   *  ONLY over a candidate pair frame (banded LSH output — never
   *  all-pairs); Levenshtein's per-pair O(len²) is capped by
   *  `maxChars` prefix truncation (the standard fuzzy-verify budget:
   *  a 100 KB doc pair would cost 10¹⁰ DP cells uncapped).
   *
   *  Returns (id_a, id_b, lev, max_len, edit_ratio_ppm, is_near_dup)
   *  with ratio = lev/max(len) in ppm by floor division; null text
   *  degrades to "" (the x95 contract). */
  def editDistanceVerify(
      docs: DataFrame,
      pairs: DataFrame,
      maxRatioPpm: Long = 300000,
      maxChars: Int = 2000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxChars > 0 && maxRatioPpm >= 0, "positive caps required")
    val txt = docs.select(col(idCol).cast("long").as("__id"),
      substring(coalesce(col(textCol), lit("")), 1, maxChars).as("__t"))
    // spread the joined candidate frame before the DP kernel: each
    // pair costs up to maxChars² cells, and a tiny-bytes candidate set
    // otherwise lands in one coalesced partition (serial verify)
    Par.spread(pairs
        .join(txt.select(col("__id").as("id_a"), col("__t").as("__ta")),
          "id_a")
        .join(txt.select(col("__id").as("id_b"), col("__t").as("__tb")),
          "id_b"))
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("max_len",
        greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
      .withColumn("edit_ratio_ppm",
        when(col("max_len") > 0, expr("lev * 1000000 div max_len"))
          .otherwise(lit(0L)))
      .withColumn("is_near_dup", col("edit_ratio_ppm") <= maxRatioPpm)
      .select("id_a", "id_b", "lev", "max_len", "edit_ratio_ppm",
        "is_near_dup")
      .orderBy("id_a", "id_b")
  }
}
