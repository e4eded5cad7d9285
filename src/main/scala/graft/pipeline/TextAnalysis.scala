package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: token counting, quality
 * scoring, language identification, document fingerprinting.
 *
 * Everything except the fingerprint is built from codegen'd built-in
 * expressions (length/regexp/split) — single-pass, no UDF, no shuffle:
 * at 100 TB these are map-only columns appended to the scan.
 */
object TextAnalysis {

  /** Whitespace token count (0 for blank text). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-unit count: word chunks of ≤4 chars plus standalone
   *  punctuation — a deterministic stand-in for a real tokenizer's piece
   *  count, implemented as one regexp scan. */
  def subwordCount(text: Column): Column =
    // regexp_count ≡ size(regexp_extract_all(.., 0)) but never
    // materializes the match array — pure counting in the regex loop
    regexp_count(text, lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"))

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise((length(text) -
        length(regexp_replace(text, "[A-Za-z]", ""))).cast("double") / length(text))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise((length(text) -
        length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("double")
        / length(text))

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be")

  /** Tokenize once; word-list scoring is a membership filter over the
   *  token array — ONE split per row instead of a regex scan per word
   *  (and, unlike `(^|\s)w(\s|$)` regexes, adjacent stopwords are all
   *  counted: non-overlapping matching dropped every other hit). */
  private def tokenArr(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  private def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokenArr(text), t => t.isInCollection(words)))

  /** Fraction of tokens that are English stopwords — a classic quality
   *  signal (natural prose has a stable stopword rate; word soup and
   *  boilerplate do not). */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) === 0, 0.0)
      .otherwise(wordHits(text, stopwords).cast("double") / tokenCount(text))

  /** Composite quality score ∈ [0, 1]: length sweet-spot, alphabetic
   *  density, not-too-much punctuation, nonzero stopword rate. */
  def qualityScore(text: Column): Column = {
    val lenScore = when(length(text) < 20, 0.0)
      .when(length(text) > 20000, 0.25)
      .otherwise(1.0)
    val alpha = alphaRatio(text)
    val punct = punctRatio(text)
    val stop = stopwordRatio(text)
    round(
      lenScore * 0.4
        + least(alpha * 1.25, lit(1.0)) * 0.3
        + (lit(1.0) - least(punct * 4.0, lit(1.0))) * 0.2
        + least(stop * 5.0, lit(1.0)) * 0.1,
      6)
  }

  /** Language-ID stopword tables (tiny n-gram/stopword heuristic —
   *  deterministic and SQL-expressible; not a trained model). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "una"))

  private def langScore(text: Column, words: Seq[String]): Column =
    wordHits(text, words)

  /** Heuristic language ID: the language whose marker stopwords hit most
   *  (ties broken by table order; no hits → "und" undetermined). CJK is
   *  detected first by codepoint range. */
  def languageId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val scores = langMarkers.map { case (l, ws) => (l, langScore(text, ws)) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val pick = scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, l).otherwise(acc)
    }
    // foldRight keeps FIRST matching language on ties (en before de …)
    when(cjk > 0, "zh").otherwise(pick)
  }

  // ---- Multilingual language ID (x44) -------------------------------
  //
  // Two-tier detector over public per-language profiles:
  //   tier 1: Unicode script blocks (decisive for non-Latin languages) —
  //           first script in priority order with any characters wins.
  //           Kana outranks Han because Japanese text mixes both;
  //           Hangul before Han for the same reason.
  //   tier 2: per-language stopword profiles (top distinctive function
  //           words from the public Snowball/NLTK lists) for
  //           Latin-script languages — most hits wins, ties break by
  //           profile order.
  // Everything is a deterministic codegen'd expression (regexp counts +
  // token-set membership): map-only at any scale, and the scores are
  // persistable so an external engine can replay the argmax (the x44
  // score-replay oracle).

  /** (lang, script char-class) in priority order. */
  val scriptProfiles: Seq[(String, String)] = Seq(
    "ja" -> "\\u3040-\\u30ff",                            // hiragana+katakana
    "ko" -> "\\uac00-\\ud7af\\u1100-\\u11ff\\u3130-\\u318f", // hangul
    "zh" -> "\\u4e00-\\u9fff",                            // han
    "ru" -> "\\u0400-\\u04ff",                            // cyrillic
    "ar" -> "\\u0600-\\u06ff",                            // arabic
    "he" -> "\\u0590-\\u05ff",                            // hebrew
    "el" -> "\\u0370-\\u03ff",                            // greek
    "th" -> "\\u0e00-\\u0e7f",                            // thai
    "hi" -> "\\u0900-\\u097f")                            // devanagari

  /** (lang, distinctive stopwords) in tie-break priority order —
   *  drawn from the public Snowball stopword lists, trimmed to words
   *  that separate the languages rather than the full lists. */
  val latinProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "was", "that", "this", "with",
      "have", "from"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein", "mit",
      "auf", "für"),
    "fr" -> Seq("le", "les", "est", "dans", "que", "pour", "une", "avec",
      "sur", "pas"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "con", "para",
      "como", "más"),
    "it" -> Seq("il", "che", "di", "per", "sono", "della", "anche",
      "come", "gli", "questo"),
    "pt" -> Seq("o", "os", "as", "um", "uma", "não", "para", "com",
      "por", "mais"),
    "nl" -> Seq("de", "het", "een", "van", "niet", "met", "voor", "zijn",
      "dat", "ook"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av",
      "för", "med"),
    "pl" -> Seq("nie", "się", "jest", "na", "do", "że", "po", "jak",
      "ale", "tym"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "gibi", "çok", "daha",
      "olarak", "ama"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
      "ini", "dari", "akan"))

  private def scriptCount(text: Column, range: String): Column =
    // regexp_count of the positive class: counts chars in the block
    // without materializing a stripped copy per script (9 scripts ×
    // 1 string alloc per row adds up at corpus scale)
    regexp_count(text, lit(s"[$range]"))

  private def lowerHits(text: Column, words: Seq[String]): Column =
    size(filter(tokenArr(lower(text)), t => t.isInCollection(words)))

  /** Multilingual pick as ONE map-only expression — the operator form
   *  a curation pipeline inlines next to quality scoring. Must stay in
   *  lock-step with the [[languageScores]] replay contract: tier-1
   *  scripts in order, then tier-2 stopword argmax (first profile wins
   *  ties), else "und". */
  def detectLanguage(text: Column): Column = {
    val latinScores = latinProfiles.map { case (l, ws) => (l, lowerHits(text, ws)) }
    val best = latinScores.map(_._2).reduce(greatest(_, _))
    val latinPick = latinScores.foldRight(lit("und"): Column) {
      case ((l, s), acc) => when(s === best && best > 0, l).otherwise(acc)
    }
    scriptProfiles.foldRight(latinPick) { case ((l, range), acc) =>
      when(scriptCount(text, range) > 0, l).otherwise(acc)
    }
  }

  /** Long score frame (id, lang, tier, prio, score) — one row per
   *  (document, candidate language) with a POSITIVE score; an absent
   *  row means score 0, so the frame stays ~languages-hit × docs, not
   *  20 × docs. Persisting this lets any SQL engine replay the
   *  [[detectLanguage]] argmax: tier-1 rows pick min prio; else tier-2
   *  rows pick (max score, min prio); else "und". */
  def languageScores(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val entries =
      scriptProfiles.zipWithIndex.map { case ((l, range), i) =>
        struct(lit(l).as("lang"), lit(1).as("tier"), lit(i).as("prio"),
          scriptCount(t, range).cast("long").as("score"))
      } ++
      latinProfiles.zipWithIndex.map { case ((l, ws), i) =>
        struct(lit(l).as("lang"), lit(2).as("tier"), lit(i).as("prio"),
          lowerHits(t, ws).cast("long").as("score"))
      }
    Par.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(array(entries: _*)).as("__s"))
      .select(col(idCol), col("__s.lang"), col("__s.tier"),
        col("__s.prio"), col("__s.score"))
      .filter(col("score") > 0)
  }

  /** Argmax picks over a [[languageScores]] frame: one (id, lang) row
   *  per document in `docs` — the frame-shaped twin of
   *  [[detectLanguage]] (LanguageIdSpec pins their equivalence). Use
   *  this when the scores are already materialized: it reads the
   *  (sparse) score frame instead of re-running 20 scoring expressions
   *  over the corpus text. */
  def languagePicks(
      scores: DataFrame,
      docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val t1 = scores.filter(col("tier") === 1)
      .groupBy(col(idCol))
      .agg(min_by(col("lang"), col("prio")).as("__l1"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("prio"))
    val t2 = scores.filter(col("tier") === 2)
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("lang").as("__l2"))
    docs.select(col(idCol))
      .join(t1, Seq(idCol), "left")
      .join(t2, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__l1"), col("__l2"), lit("und")).as("lang"))
  }

  /** Script-composition audit: the declared-language vs measured-script
   *  cross-tab a crawl ingest reads before trusting `lang` labels at
   *  all. Each doc counts its characters in four explicit Unicode
   *  blocks (latin / han / cyrillic / arabic — the same BMP ranges
   *  [[scriptProfiles]] keys language-ID on), picks the dominant
   *  script (argmax; ties break to the earlier profile, `none` when
   *  the text has no scripted characters), and flags mixed-script docs
   *  (>= 2 scripts present — the mojibake / spam / wrong-label
   *  signature). Rolled up by (declared lang, dominant script):
   *  a 'zh' row whose dominant script is `latin` is a mislabel bucket,
   *  and `id_sum` pins exactly WHICH docs landed in it.
   *
   *  Scale shape: the per-doc counts are map-only regexp_count
   *  expressions riding the scan; the rollup shuffles one skinny row
   *  per doc to at most |langs| x 5 cells. */
  def scriptMix(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val scripts = Seq(
      "latin" -> "A-Za-z",
      "han" -> "\\u4e00-\\u9fff",
      "cyrillic" -> "\\u0400-\\u04ff",
      "arabic" -> "\\u0600-\\u06ff")
    // null text degrades to '' (the x95 contract): a null would
    // otherwise poison the argmax into engine-specific CASE fallthrough
    val t = coalesce(col(textCol), lit(""))
    val counts = scripts.map { case (n, r) =>
      n -> scriptCount(t, r)
    }
    val best = counts.map(_._2).reduce(greatest(_, _))
    val dominant = counts.reverse.foldLeft(lit("none"): Column) {
      case (acc, (n, c)) => when(c === best && best > 0, lit(n))
        .otherwise(acc)
    }
    val nScripts = counts
      .map { case (_, c) => when(c > 0, 1).otherwise(0) }
      .reduce(_ + _)
    Par.spread(docs.select(col(idCol), col(langCol), col(textCol)))
      .select(col(idCol), col(langCol),
        counts.head._2.as("__latin"), counts(1)._2.as("__han"),
        dominant.as("dominant_script"),
        (nScripts >= 2).cast("long").as("__mixed"))
      .groupBy(col(langCol), col("dominant_script"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__mixed")).as("n_mixed"),
        sum(col("__latin")).cast("long").as("latin_chars"),
        sum(col("__han")).cast("long").as("han_chars"),
        sum(col(idCol)).cast("long").as("id_sum"))
  }

  // ---- Subword/BPE token counting (x46) -----------------------------
  //
  // Byte-pair encoding with a PLUGGABLE merges table — the standard
  // public algorithm (Sennrich et al. 2016; the GPT-2/RoBERTa vocab
  // format): a word starts as characters, and merge rules apply
  // greedily in rank order (lowest rank first) until none apply. The
  // merges table is data, not code — load a real tokenizer's
  // merges.txt lines into `merges` to reproduce its segmentation; the
  // built-in [[demoMerges]] (common English digraph/affix pairs) keeps
  // the op deterministic and self-contained where no vocab file ships.
  //
  // The tokenizer is genuinely iterative (rank-greedy pair reduction),
  // so it runs as a Scala UDF over the pre-tokenized words — the one
  // op class where a UDF beats expression contortions. At 100 TB it is
  // still map-only: no shuffle, no state, pure per-row compute.

  /** Parse a merges.txt-format table ("a b" per line, rank = line
   *  position; '#'-prefixed header/comment lines skipped) — the
   *  GPT-2/RoBERTa vocabulary file format, so a real tokenizer's
   *  merges table drops straight into [[bpeTokenCount]]. */
  def mergesFromLines(lines: Seq[String]): Seq[(String, String)] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(l => l.split("\\s+") match {
        case Array(a, b) => Some((a, b))
        case _ => None
      })

  /** Built-in demo merges (rank order): frequent English pairs. */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("in", "g"), ("o", "u"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "r"), ("t", "i"),
    ("s", "t"), ("a", "r"), ("te", "d"), ("o", "f"), ("i", "s"))

  /** BPE-encode one lowercase word into its pieces. */
  private[graft] def bpeWord(
      word: String, ranks: Map[(String, String), Int]): List[String] = {
    var pieces = word.map(_.toString).toList
    var done = pieces.lengthCompare(2) < 0
    while (!done) {
      // lowest-rank adjacent pair in the current segmentation
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      var it = pieces
      while (it.tail.nonEmpty) {
        val r = ranks.getOrElse((it.head, it.tail.head), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        it = it.tail
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        val (pre, rest) = pieces.splitAt(bestIdx)
        pieces = pre ::: (rest.head + rest.tail.head) :: rest.tail.tail
        if (pieces.lengthCompare(2) < 0) done = true
      }
    }
    pieces
  }

  /** Piece count per text under the given merges table — the size
   *  column for [[Sampling.packSequences]] / [[Sampling.mixturePlan]]
   *  token budgeting. Deterministic; blank text counts 0. */
  def bpeTokenCount(
      text: Column,
      merges: Seq[(String, String)] = demoMerges): Column = {
    val ranks = merges.zipWithIndex.toMap
    val count = udf { t: String =>
      if (t == null) 0L
      else t.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty)
        .map(w => bpeWord(w, ranks).length.toLong).sum
    }
    count(text)
  }

  /** Learn a BPE merges table FROM the corpus (Sennrich et al. 2016) —
   *  the training half of the pluggable-merges story ([[bpeTokenCount]]
   *  applies what this learns). The classic formulation trains on the
   *  word-frequency DICTIONARY, not raw text, which is exactly the
   *  100 TB shape: ONE distributed token-keyed count is the only data
   *  pass; the top-`vocabCap` words collect to the driver (bounded —
   *  a dictionary, not a corpus) and merges learn in memory by
   *  repeated most-frequent-adjacent-pair selection. Ties break to the
   *  lexicographically smallest (left, right), so the learned table is
   *  total and engine-reproducible; learning stops early when no pair
   *  remains. Feed the result straight back into [[bpeTokenCount]] /
   *  [[Sampling.mixturePlan]] token budgeting. */
  def trainBpeMerges(
      docs: DataFrame,
      numMerges: Int,
      vocabCap: Int = 100000,
      textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var dict: Array[(Array[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      dict.foreach { case (ps, f) =>
        var j = 0
        while (j < ps.length - 1) {
          val k = (ps(j), ps(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        dict = dict.map { case (ps, f) => (applyMerge(ps, best), f) }
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping pass of a single merge rule —
   *  the dictionary update between training iterations. */
  private def applyMerge(
      ps: Array[String], m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var j = 0
    while (j < ps.length) {
      if (j < ps.length - 1 && ps(j) == m._1 && ps(j + 1) == m._2) {
        out += ps(j) + ps(j + 1); j += 2
      } else { out += ps(j); j += 1 }
    }
    out.toArray
  }

  /** The pieces themselves (per-doc array) — spec/debug surface. */
  def bpeTokens(
      text: Column,
      merges: Seq[(String, String)] = demoMerges): Column = {
    val ranks = merges.zipWithIndex.toMap
    val toks = udf { t: String =>
      if (t == null) Array.empty[String]
      else t.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty)
        .flatMap(w => bpeWord(w, ranks))
    }
    toks(text)
  }

  /** Per-position Karp–Rabin w-gram hashes — the raw stream winnowing
   *  selects minima from. A text shorter than `gram` contributes its
   *  single fnv64 (same contract [[winnowedMins]] always had). Exposed
   *  so the x04 oracle can persist the hash-family output and have
   *  DuckDB replay the SQL-expressible selection (window minima + xor
   *  fold) over it. */
  private[graft] def krHashes(text: String, gram: Int): Array[Long] = {
    // null-tolerant for the same reason as Dedup.shingleHashes: a UDF
    // in a collapsed Filter can be CSE-evaluated before its isNotNull
    // guard
    if (text == null) return Array.empty
    val t = text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    if (t.length < gram) Array(Dedup.fnv64(t))
    else {
      val B = 1000003L
      var pow = 1L
      (1 until gram).foreach(_ => pow *= B)
      var h = 0L
      val hashes = new Array[Long](t.length - gram + 1)
      var i = 0
      while (i < t.length) {
        h = h * B + t.charAt(i)
        if (i >= gram) h -= pow * B * t.charAt(i - gram)
        if (i >= gram - 1) hashes(i - gram + 1) = h
        i += 1
      }
      hashes
    }
  }

  /** (id, pos, hash) frame of [[krHashes]] per document — the persisted
   *  fixture the x04 replay oracle verifies against. */
  def fingerprintHashes(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gram: Int = 8): DataFrame = {
    val hUdf = udf { text: String => krHashes(text, gram) }
    Par.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(hUdf(col(textCol))).as(Seq("pos", "hash")))
  }

  /** Winnowed Karp–Rabin window minima of a text: the classic winnowing
   *  fingerprint set (one min hash per non-overlapping window of w-gram
   *  hashes). A small local edit perturbs only the windows it touches —
   *  the rest of the set is unchanged. */
  private[graft] def winnowedMins(
      text: String, gram: Int, window: Int): Array[Long] = {
    val hashes = krHashes(text, gram)
    if (hashes.isEmpty) Array.empty
    else if (hashes.length < window) Array(hashes.min)
    else {
      val mins = Array.newBuilder[Long]
      var w0 = 0
      while (w0 <= hashes.length - window) {
        var m = Long.MaxValue
        var j = w0
        while (j < w0 + window) { if (hashes(j) < m) m = hashes(j); j += 1 }
        mins += m
        w0 += window
      }
      mins.result()
    }
  }

  /** Rolling-hash document fingerprint (winnowing): Karp–Rabin hashes of
   *  character w-grams, minimum per window, xor-folded into one long —
   *  robust to small edits. Map-side UDF, linear in text size. */
  def fingerprint(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gram: Int = 8,
      window: Int = 16): DataFrame = {
    val fpUdf = udf { text: String =>
      winnowedMins(text, gram, window).foldLeft(0L)(_ ^ _)
    }
    Par.spread(docs).withColumn("fingerprint", fpUdf(col(textCol)))
  }

  /** Vocabulary build over a corpus: one row per distinct token with its
   *  total occurrence count and document frequency (docs containing it) —
   *  the TF-IDF / tokenizer-training base. Map-side lower+split+explode,
   *  ONE token-keyed shuffle; `top` bounds the result under a total
   *  (count desc, token asc) order so the cut is deterministic. At scale
   *  the shuffle carries (token, doc_id) pairs only — never text — and
   *  partial aggregation collapses repeats map-side. */
  def vocabulary(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      top: Int = 1000): DataFrame =
    docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("total_count"),
        countDistinct(col(idCol)).as("doc_count"))
      .orderBy(col("total_count").desc, col("token"))
      .limit(top)

  /** Out-of-vocabulary rate against a vocabulary frame (e.g.
   *  [[vocabulary]]'s top-N, or a tokenizer's real vocab loaded from
   *  disk): per document, the fraction of token OCCURRENCES not in the
   *  vocab — the domain-shift signal that predicts tokenizer blowup
   *  (high OOV ⇒ long byte-fallback sequences ⇒ token-budget surprises).
   *  The vocab is broadcast (a tokenizer vocab is ≤ a few hundred k
   *  rows); the corpus makes one exploded pass and folds back to one
   *  row per doc. */
  def oovRate(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabCol: String = "token"): DataFrame = {
    val v = broadcast(vocab.select(col(vocabCol).as("token")).distinct()
      .withColumn("__inv", lit(1)))
    docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .join(v, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L))
          .cast("long").as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** Word n-gram frequencies over a corpus (the n-gram LM / contamination-
   *  check base): adjacent lowercased tokens joined by a single space,
   *  one (ngram)-keyed shuffle with map-side partial aggregation, top-N
   *  under a deterministic (count desc, ngram asc) cut. The explode emits
   *  (tokens − n + 1) rows per doc but each is a short string — text
   *  never shuffles whole. */
  def ngramCounts(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 2,
      top: Int = 1000): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // slide a window of n over the token array with a SQL transform —
    // codegen'd, no UDF
    val grams = expr(
      s"""filter(transform(sequence(0, size(__toks) - $n),
         |  i -> array_join(slice(__toks, i + 1, $n), ' ')),
         |  g -> g != '')""".stripMargin)
    Par.spread(docs.select(col(textCol)))
      .select(toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(explode(grams).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(top)
  }

  /** Within-document repetition: the fraction of a doc's word n-grams
   *  that are duplicates (1 − distinct/total) — the Gopher-style
   *  repetition quality signal (template spam and degenerate generations
   *  score high). Map-only, no explode, no shuffle; the token and gram
   *  arrays are STAGED projections so the regex split and the gram
   *  window each evaluate once per row (inlining them into one
   *  expression re-ran the split per reference — measured 10× slower). */
  def repetitionRatio(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 2,
      outCol: String = "repetition"): DataFrame =
    Par.spread(docs)
      .withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("__grams",
        when(size(col("__toks")) >= n,
          transform(sequence(lit(0), size(col("__toks")) - n),
            i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
          .otherwise(array().cast("array<string>")))
      .withColumn(outCol,
        when(size(col("__grams")) > 0,
          round(lit(1.0) - size(array_distinct(col("__grams")))
            .cast("double") / size(col("__grams")), 6))
          .otherwise(lit(0.0)))
      .drop("__toks", "__grams")

  /** Distinct word n-grams per document as (id, ngram) rows — the
   *  building block for contamination checks and n-gram set ops. Same
   *  codegen'd transform/slice window as [[ngramCounts]], deduplicated
   *  per document before the explode. */
  def wordNgrams(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = expr(
      s"""array_distinct(filter(transform(sequence(0, size(__toks) - $n),
         |  i -> array_join(slice(__toks, i + 1, $n), ' ')),
         |  g -> g != ''))""".stripMargin)
    Par.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(grams).as("ngram"))
  }

  /** Overlapping token-window chunking — the embedding/retrieval prep
   *  step (split long documents into `chunkTokens`-token windows every
   *  `strideTokens` tokens so no passage is lost at a boundary).
   *  Map-only codegen'd array expressions appended to the scan: split
   *  once, emit one row per window via transform+explode — no UDF, no
   *  shuffle, linear in corpus size at any scale. Output: (idCol,
   *  chunk_idx, chunk_text, n_tokens); whitespace inside a chunk is
   *  normalized to single spaces (the chunk is a token join). */
  def chunkDocuments(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 256,
      strideTokens: Int = 128): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1,
      "chunk and stride must be >= 1")
    val toks = split(trim(col(textCol)), "\\s+")
    val chunks = expr(
      s"""transform(sequence(0, size(__toks) - 1, $strideTokens),
         |  st -> struct(
         |    CAST(st / $strideTokens AS INT) AS chunk_idx,
         |    array_join(slice(__toks, st + 1, $chunkTokens), ' ')
         |      AS chunk_text,
         |    CAST(least($chunkTokens, size(__toks) - st) AS INT)
         |      AS n_tokens))""".stripMargin)
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0 &&
        !(size(col("__toks")) === 1 && element_at(col("__toks"), 1) === ""))
      .select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.chunk_text"),
        col("c.n_tokens"))
  }

  /** [[contamination]] at the scale where the benchmark n-gram set no
   *  longer broadcasts: a driver-built Bloom filter (a few MB for tens
   *  of millions of grams at 1% FPP) prefilters the corpus gram stream
   *  map-side, and only the surviving ~FPP fraction enters the exact
   *  shuffle join that removes false positives. Output is IDENTICAL to
   *  [[contamination]] — the bloom can only admit extras, never drop a
   *  true match, and the exact join removes the extras. Per-doc totals
   *  are counted before the prefilter so denominators are unchanged. */
  def contaminationBloom(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 2,
      benchCol: String = "ngram",
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bench = benchmark.select(col(benchCol).as("ngram")).distinct()
    val bloom = bench.stat.bloomFilter("ngram", expectedItems, fpp)
    val mightContain = udf { s: String => s != null && bloom.mightContain(s) }
    val grams = wordNgrams(docs, idCol, textCol, n)
    val totals = grams.groupBy(col(idCol))
      .agg(count(lit(1)).as("total_ngrams"))
    val matched = grams
      .filter(mightContain(col("ngram")))           // map-side, no shuffle
      .join(bench, Seq("ngram"))                    // exact verify, tiny side
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_ngrams"))
    totals.join(matched, Seq(idCol), "left")
      .withColumn("matched_ngrams",
        coalesce(col("matched_ngrams"), lit(0L)))
      .withColumn("contamination",
        round(col("matched_ngrams").cast("double") / col("total_ngrams"), 6))
  }

  /** Corpus boilerplate n-grams — the CCNet/RefinedWeb "duplicated line"
   *  analog for unstructured text: n-grams that appear in at least
   *  `minDocs` DISTINCT documents (navigation chrome, cookie banners,
   *  license headers). One corpus pass: distinct per-doc grams from
   *  [[wordNgrams]], one gram-keyed count. The df threshold bounds the
   *  result — high-document-frequency grams are by definition few. */
  def boilerplateNgrams(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      minDocs: Long = 10L): DataFrame =
    wordNgrams(docs, idCol, textCol, n)
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Per-document boilerplate share: the fraction of each document's
   *  distinct n-grams that are corpus boilerplate (df ≥ `minDocs`),
   *  the filter signal for "this page is mostly chrome". ONE pass and
   *  exactly two shuffles: grams carry their document frequency via a
   *  window over the gram key (no second corpus scan, no self-join
   *  against the boilerplate set), then fold back to one row per doc.
   *  At 100 TB the shuffled rows are (doc_id, gram-hash)-sized. */
  def boilerplateShare(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      minDocs: Long = 10L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ngram"))
    wordNgrams(docs, idCol, textCol, n)
      .withColumn("__df", count(lit(1)).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("total_ngrams"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L))
          .cast("long").as("boilerplate_ngrams"))
      .withColumn("boilerplate_share",
        round(col("boilerplate_ngrams").cast("double") / col("total_ngrams"), 6))
  }

  /** Benchmark decontamination: for every document, the fraction of its
   *  distinct word n-grams that appear in a benchmark n-gram set — the
   *  standard check that training text does not contain evaluation data.
   *  The benchmark set is driver-small and BROADCAST, so the corpus
   *  makes one pass: explode to (doc, gram), broadcast-hash-join against
   *  the benchmark, one doc-keyed aggregation. Filter the output on
   *  `contamination` to drop leaky documents. */
  def contamination(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 2,
      benchCol: String = "ngram"): DataFrame = {
    val bench = broadcast(
      benchmark.select(col(benchCol).as("ngram")).distinct()
        .withColumn("__hit", lit(1)))
    wordNgrams(docs, idCol, textCol, n)
      .join(bench, Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("total_ngrams"),
        coalesce(sum(col("__hit")), lit(0)).cast("long").as("matched_ngrams"))
      .withColumn("contamination",
        round(col("matched_ngrams").cast("double") / col("total_ngrams"), 6))
  }

  /** The un-folded winnowing output as a column (array<long> of window
   *  minima) — useful when downstream wants set overlap (shared windows
   *  between near-identical docs) rather than a single equality key. */
  def fingerprintWindows(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gram: Int = 8,
      window: Int = 16): DataFrame = {
    val fpUdf = udf { text: String => winnowedMins(text, gram, window) }
    Par.spread(docs).withColumn("fingerprint_windows", fpUdf(col(textCol)))
  }

  /** HTML → text extraction (raw-crawl onboarding, the trafilatura-
   *  lite step): script/style blocks drop WITH their content,
   *  comments drop, remaining tags drop, the five standard entities
   *  decode (`&amp;` LAST, so `&amp;lt;` correctly yields the literal
   *  `&lt;`), whitespace collapses. A fixed regexp_replace/replace
   *  chain — codegen'd column expressions, no UDF, and every step has
   *  an exact DuckDB mirror so the whole extractor oracle-replays.
   *  This is deliberately a lexical extractor, not a DOM parser:
   *  malformed HTML degrades to extra whitespace, never to a
   *  failure. */
  def extractHtmlText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?i)<script[^>]*>[\\s\\S]*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?i)<style[^>]*>[\\s\\S]*?</style>", " ")
    val noComment = regexp_replace(noStyle, "<!--[\\s\\S]*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from), to)
      }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** One-pass text profile of a corpus: per-document metrics as columns.
   *  Select + filter downstream compose into the same scan.
   *
   *  The token array, alpha/punct ratios, stopword rate and per-language
   *  marker scores are STAGED projections referenced by the derived
   *  columns — inlining them (the naive composition of the public
   *  column functions) re-evaluates the text split and the regex
   *  strips once per referencing expression: qualityScore alone
   *  re-inlines three of them, and languageId's tie-break references
   *  its `best` subtree once per language. Same trick as
   *  [[repetitionRatio]]; measured ~4× on the x01 bench query. */
  /** TF-IDF keyword extraction: the top-`top` highest-scoring terms per
   *  document, scored `tf * ln(N / df)`. The classic corpus-keyword /
   *  topic-signal op a curation pipeline runs after dedup. Shape at
   *  scale: both term frequency and document frequency are token-keyed
   *  partial aggregations (map-side combine, text never shuffles whole);
   *  the doc-frequency table is vocabulary-sized and joins back onto the
   *  (doc, token, tf) frame on the token key — co-partitioned after the
   *  aggregations, and AQE broadcasts it when the vocabulary is small.
   *  The idf term is rounded to 6 dp BEFORE scoring so ranking is
   *  reproducible across engines (libm `log` may differ in the last ulp
   *  between runtimes); ties break on token ascending. */
  def tfidfKeywords(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      top: Int = 3): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("__idf",
        round(log(col("__n").cast("double") / col("df")), 6))
      .withColumn("tfidf", round(col("tf") * col("__idf"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy((col("tf") * col("__idf")).desc, col("token"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= top)
      .select(col(idCol), col("rk"), col("token"), col("tfidf"))
  }

  /** Unigram language-model quality score (the CCNet-style perplexity
   *  proxy): fit corpus unigram probabilities in one token-keyed
   *  aggregation, then score each document by the average negative log
   *  probability of its tokens — fluent/typical docs score low, rare-token
   *  spam scores high. Weighted form: sum(tf * -ln p) / sum(tf), so the
   *  per-doc pass reuses the (doc, token, tf) aggregate and joins the
   *  vocabulary-sized model on the token key (same scale shape as
   *  [[tfidfKeywords]]). Per-token log terms round to 6 dp before the
   *  weighted sum for cross-engine reproducibility. */
  def unigramLogProb(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val model = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val total = model.agg(sum(col("cnt")).as("__t"))
    // per-token -ln p quantized to integer micro-nats BEFORE the weighted
    // sum: a double-precision sum is order-dependent in its last ulps and
    // partial-aggregation order is nondeterministic, which flipped a
    // 6-dp rounding boundary against the oracle; integer sums are exact
    tf.join(model, "token")
      .crossJoin(broadcast(total))
      .withColumn("__nlp_micro",
        round(-log(col("cnt").cast("double") / col("__t")) * 1e6, 0)
          .cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf") * col("__nlp_micro")).cast("double")
          / sum(col("tf")) / 1e6, 6).as("avg_neg_logprob"))
  }

  /** Bigram-LM quality score — the conditional upgrade of
   *  [[unigramLogProb]]: per document, the average −ln P(w₂|w₁) of its
   *  bigram OCCURRENCES under the corpus maximum-likelihood model
   *  P(w₂|w₁) = count(w₁ w₂) / count(w₁ as a bigram start). Word salad
   *  with plausible unigrams but improbable transitions scores high
   *  where the unigram LM is blind. Three token-keyed shuffles (doc
   *  bigram tf, corpus bigram model, corpus start-token model), all
   *  map-side combined; the per-bigram −ln p is quantized to integer
   *  micro-nats BEFORE the weighted sum so the result is exact and
   *  order-independent (same discipline as the unigram path). */
  def bigramLogProb(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = expr(
      """filter(transform(sequence(0, size(__toks) - 2),
        |  i -> array_join(slice(__toks, i + 1, 2), ' ')),
        |  g -> g != '')""".stripMargin)
    val occ = docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(grams).as("bigram"))
    val tf = occ.groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("tf"))
    val bigramModel = occ.groupBy(col("bigram"))
      .agg(count(lit(1)).as("big_cnt"))
    val startModel = occ
      .select(substring_index(col("bigram"), " ", 1).as("w1"))
      .groupBy(col("w1"))
      .agg(count(lit(1)).as("start_cnt"))
    tf
      .join(bigramModel, "bigram")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(startModel, "w1")
      .withColumn("__nlp_micro",
        round(-log(col("big_cnt").cast("double") / col("start_cnt")) * 1e6, 0)
          .cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * col("__nlp_micro")).cast("double")
          / sum(col("tf")) / 1e6, 6).as("avg_neg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
   *  smoothing every serious n-gram LM uses): absolute discount D off
   *  every observed bigram, the freed mass re-spent on the CONTINUATION
   *  unigram (how many distinct contexts a word follows — "francisco"
   *  is frequent but only ever follows "san", so its continuation
   *  probability is tiny where its raw unigram count lies).
   *
   *    P(w2|w1) = max(c12−D,0)/c1 + (D·N1+(w1,·)/c1) · (N1+(·,w2)/T)
   *
   *  with T = distinct bigram types. Next to [[bigramLogProb]]'s ML
   *  estimate this separates word salad with frequent-word bigrams
   *  from fluent text. Exactness discipline: all counts integer,
   *  −ln P quantizes to micro-nats per bigram TYPE before the
   *  integer per-doc sums (the x31 pattern), and the one double
   *  formula is parenthesized identically in the oracle. */
  def kneserNeyLogProb(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      discount: Double = 0.75): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = expr(
      """filter(transform(sequence(0, size(__toks) - 2),
        |  i -> array_join(slice(__toks, i + 1, 2), ' ')),
        |  g -> g != '')""".stripMargin)
    val occ = docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(grams).as("bigram"))
    val tf = occ.groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("tf"))
    val bm = occ.groupBy(col("bigram")).agg(count(lit(1)).as("big_cnt"))
    val sm = occ
      .select(substring_index(col("bigram"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("start_cnt"))
    val types = bm
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val n1p = types.groupBy("w1").agg(count(lit(1)).as("n1plus"))
    val cont = types.groupBy("w2").agg(count(lit(1)).as("cont_cnt"))
    val totalTypes = types.count().toDouble
    val p = (greatest(col("big_cnt").cast("double") - discount, lit(0.0))
        / col("start_cnt")) +
      ((lit(discount) * col("n1plus")) / col("start_cnt")) *
        (col("cont_cnt").cast("double") / lit(totalTypes))
    tf
      .join(bm, "bigram")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(sm, "w1")
      .join(n1p, "w1")
      .join(cont, "w2")
      .withColumn("__nlp_micro", round(-log(p) * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * col("__nlp_micro")).cast("double")
          / sum(col("tf")) / 1e6, 6).as("avg_kn_neg_logprob"))
  }

  /** Gopher-style quality-filter verdicts: the explicit per-rule
   *  keep/drop battery (Rae et al. 2021 §A1.1 shape — token-count
   *  bounds, mean-token-length bounds, minimum stopword evidence,
   *  alphabetic-token fraction) composed into a final `keep` flag.
   *  Where [[profileText]] emits continuous signals, this emits the
   *  filter DECISION a curation pipeline acts on. Pure map-side (one
   *  tokenize per row, staged so the split never re-runs); flags are
   *  0/1 ints so the cross-engine comparator sees plain integers.
   *  Rule comparisons run on the 6-dp-ROUNDED signals so boundary
   *  cases resolve identically on every engine. */
  def gopherFilter(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 30,
      maxTokens: Int = 10000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minStop: Int = 2,
      minAlphaFrac: Double = 0.8): DataFrame = {
    val t0 = lower(trim(col(textCol)))
    val staged = Par.spread(docs.select(col(idCol), col(textCol)))
      .withColumn("__toks",
        filter(split(t0, "\\s+"), x => length(x) > 0))
      .withColumn("__nws", length(regexp_replace(t0, "\\s", "")))
    val n = size(col("__toks"))
    staged
      .withColumn("n_tokens", n.cast("long"))
      .withColumn("mean_token_len",
        when(n === 0, 0.0)
          .otherwise(round(col("__nws").cast("double") / n, 6)))
      .withColumn("n_stop",
        size(filter(col("__toks"), x => x.isInCollection(stopwords)))
          .cast("long"))
      .withColumn("alpha_frac",
        when(n === 0, 0.0)
          .otherwise(round(
            size(filter(col("__toks"), x => x.rlike("[a-z]")))
              .cast("double") / n, 6)))
      .withColumn("wc_ok",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
          .cast("int"))
      .withColumn("mlen_ok",
        (col("mean_token_len") >= minMeanLen
          && col("mean_token_len") <= maxMeanLen).cast("int"))
      .withColumn("stop_ok", (col("n_stop") >= minStop).cast("int"))
      .withColumn("alpha_ok", (col("alpha_frac") >= minAlphaFrac).cast("int"))
      .withColumn("keep",
        (col("wc_ok") + col("mlen_ok") + col("stop_ok") + col("alpha_ok") === 4)
          .cast("int"))
      .select(col(idCol), col("n_tokens"), col("mean_token_len"),
        col("n_stop"), col("alpha_frac"), col("wc_ok"), col("mlen_ok"),
        col("stop_ok"), col("alpha_ok"), col("keep"))
  }

  /** Per-rule ablation of the [[gopherFilter]] gate — the tuning
   *  artifact a curation run reads before touching a threshold: for
   *  each rule, how many docs fail it at all (`n_failing`) and how
   *  many fail ONLY it (`n_sole_blocker` — exactly the docs that
   *  removing or relaxing the rule would rescue). A rule with large
   *  n_failing but tiny n_sole_blocker is redundant with the others;
   *  one with n_sole_blocker ≈ n_failing is doing unique work.
   *  `n_docs`/`n_kept` ride along so every row pins the whole gate.
   *
   *  Scale shape: the per-rule flags are [[gopherFilter]]'s map-only
   *  expressions; everything else is ONE global aggregate (map-side
   *  partials, a 1-row result) exploded to 4 rule rows. */
  def filterAblation(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val gf = gopherFilter(docs, idCol, textCol)
    val rules = Seq("wc", "mlen", "stop", "alpha")
    val fails = lit(4) - rules.map(r => col(s"${r}_ok")).reduce(_ + _)
    val aggs = rules.flatMap { r =>
      Seq(
        sum((lit(1) - col(s"${r}_ok")).cast("long")).as(s"__f_$r"),
        sum(when(col(s"${r}_ok") === 0 && fails === 1, 1L)
          .otherwise(0L)).as(s"__s_$r"))
    } ++ Seq(count(lit(1)).as("__n"),
      sum(col("keep").cast("long")).as("__k"))
    gf.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map(r =>
        struct(lit(r).as("rule"),
          col(s"__f_$r").as("n_failing"),
          col(s"__s_$r").as("n_sole_blocker"),
          col("__n").as("n_docs"),
          col("__k").as("n_kept"))): _*)).as("r"))
      .select(col("r.*"))
  }

  /** The 4 staged quality inputs (__toks/__alpha/__punct/__stop) —
   *  shared by [[profileText]] and [[qualityGate]] so the score
   *  arithmetic has ONE source of truth. */
  private def qualityStaged(
      docs: DataFrame, t: Column, spread: Boolean = true): DataFrame = {
    val nToks = size(col("__toks"))
    (if (spread) Par.spread(docs) else docs)
      .withColumn("__toks", tokenArr(t))
      .withColumn("__alpha", alphaRatio(t))
      .withColumn("__punct", punctRatio(t))
      .withColumn("__stop",
        when(nToks === 0, 0.0)
          .otherwise(size(filter(col("__toks"),
            x => x.isInCollection(stopwords))).cast("double") / nToks))
  }

  /** quality_score over the staged columns: length/alpha/punct/stopword
   *  blend, rounded to 6 dp (the engine-exact form the oracles replay). */
  private def qualityScoreCol(t: Column): Column = {
    val lenScore = when(length(t) < 20, 0.0)
      .when(length(t) > 20000, 0.25)
      .otherwise(1.0)
    round(
      lenScore * 0.4
        + least(col("__alpha") * 1.25, lit(1.0)) * 0.3
        + (lit(1.0) - least(col("__punct") * 4.0, lit(1.0))) * 0.2
        + least(col("__stop") * 5.0, lit(1.0)) * 0.1,
      6)
  }

  /** JUST the ingest-gate lanes — n_tokens + quality_score with
   *  arithmetic identical to [[profileText]] (both build on
   *  [[qualityStaged]]/[[qualityScoreCol]]) — skipping the
   *  language-marker array scans and subword regex a quality gate
   *  never reads; those lanes dominate profileText's per-row cost,
   *  which matters when the gate runs on every daily slice. */
  def qualityGate(
      docs: DataFrame,
      textCol: String = "text",
      spread: Boolean = true): DataFrame = {
    val t = col(textCol)
    qualityStaged(docs, t, spread)
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("quality_score", qualityScoreCol(t))
      .drop("__toks", "__alpha", "__punct", "__stop")
  }

  def profileText(
      docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nToks = size(col("__toks"))
    val langCols = langMarkers.map { case (l, _) => col(s"__lang_$l") }
    val best = langCols.reduce(greatest(_, _))
    val pick = langMarkers.map(_._1).zip(langCols)
      .foldRight(lit("und"): Column) { case ((l, s), acc) =>
        when(s === best && best > 0, l).otherwise(acc)
      }
    langMarkers.foldLeft(qualityStaged(docs, t)) { case (df, (l, ws)) =>
        df.withColumn(s"__lang_$l",
          size(filter(col("__toks"), x => x.isInCollection(ws))))
      }
      .withColumn("n_chars_computed", length(t))
      .withColumn("n_tokens", nToks)
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("alpha_ratio", round(col("__alpha"), 6))
      .withColumn("punct_ratio", round(col("__punct"), 6))
      .withColumn("stopword_ratio", round(col("__stop"), 6))
      .withColumn("quality_score", qualityScoreCol(t))
      .withColumn("lang_detected",
        when(length(regexp_replace(t, "[^\\u4e00-\\u9fff]", "")) > 0, "zh")
          .otherwise(pick))
      .drop(("__toks" +: "__alpha" +: "__punct" +: "__stop" +:
        langMarkers.map(m => s"__lang_${m._1}")): _*)
  }

  /** BM25 top-k document retrieval for a fixed bag of query terms — the
   *  lexical-retrieval op a RAG/eval pipeline runs next to the ANN
   *  path (e02/e03): score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 −
   *  b + b·dl/avgdl)), idf(t) = ln((N − df + ½)/(df + ½) + 1).
   *
   *  Shape at scale: the (doc, token, tf) postings and per-doc lengths
   *  are token-/doc-keyed partial aggregations (map-side combine, text
   *  never shuffles whole); postings are pruned to the query terms
   *  BEFORE document frequency is derived, so everything downstream of
   *  the corpus scan is |terms|-bounded — df comes from the pruned
   *  postings themselves (df(t) = #docs holding t), the df table and
   *  the (N, Σdl) corpus stats are broadcast, and the final top-k is a
   *  single window over docs that matched at least one term. Per-term
   *  scores are quantized to integer micro-units BEFORE the per-doc
   *  sum (the [[unigramLogProb]] discipline): integer sums are exact
   *  under any partial-aggregation order, so ranking and the emitted
   *  score are reproducible across engines. Ties break on doc id. */
  def bm25TopK(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    // null ids are meaningless retrieval results AND would split the
    // constant `idCol.isNull` rank partition below into two groups
    // with duplicate rank 1s — drop them at the source
    val toks = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__tl"))
    val qtf = toks
      .filter(col("token").isin(terms.map(_.toLowerCase): _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = qtf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val perTerm = qtf
      .join(broadcast(df), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      // arithmetic shape mirrors the oracle SQL exactly: idf and the
      // tf-normalization are evaluated in the same operation order on
      // both engines, then quantized — only libm-ulp noise is rounded
      // away, never a reordering difference
      .withColumn("__idf",
        log((col("__n").cast("double") - col("df") + 0.5)
          / (col("df") + 0.5) + 1.0))
      .withColumn("__avgdl", col("__tl").cast("double") / col("__n"))
      .withColumn("__micro",
        round(col("__idf") * (col("tf") * (k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b)
            * (col("dl").cast("double") / col("__avgdl")))) * 1e6, 0)
          .cast("long"))
    val perDoc = perTerm.groupBy(col(idCol))
      .agg(sum(col("__micro")).as("__score_micro"),
        count(lit(1)).as("n_terms"))
    // global top-k via orderBy+limit — Spark plans TakeOrderedAndProject
    // (per-partition top-k, then a k-row merge), unlike a global
    // row_number window which moves EVERY scored doc to one partition
    // (and logs the WindowExec warning). Ranks are then assigned with a
    // row_number over the k-row result only. The partition key
    // `idCol.isNull` is constant-false but NON-foldable: a literal
    // would be folded away by EliminateWindowPartitions and the warning
    // would return; a self-join alternative would recompute the whole
    // scoring pipeline (TakeOrdered is not a reusable exchange).
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol).isNull)
      .orderBy(col("__score_micro").desc, col(idCol))
    perDoc
      .orderBy(col("__score_micro").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(wTop))
      .select(col(idCol), col("rank"),
        round(col("__score_micro").cast("double") / 1e6, 6).as("bm25"),
        col("n_terms"))
  }

  /** Greedy MMR (maximal-marginal-relevance, Carbonell & Goldstein
   *  1998) selection over a BOUNDED candidate page — the
   *  diversification step between retrieval and context packing: pick
   *  the candidate maximizing λ·relevance − (1−λ)·max-similarity-to-
   *  already-selected, k times. Pure integer arithmetic end to end
   *  (rel and sim both in ppm, λ in tenths, floor division on
   *  non-negative terms, ties to the smaller id) so any engine
   *  replays the selection bit-for-bit.
   *
   *  This is DRIVER-side compute by design: a re-rank stage's input
   *  is a candidate PAGE (here ≤ 32 rows from bm25TopK's distributed
   *  top-k), never the corpus — the quadratic lives inside a bounded
   *  set, the same contract as the BPE vocab and the e24 probe seeds.
   *
   *  Returns (rank, doc_id, mmr_ppm, rel_ppm, max_sim_ppm) rows. */
  def mmrSelect(
      candidates: Seq[(Long, Long)],       // (doc_id, rel_ppm)
      sims: Map[(Long, Long), Long],       // symmetric (a,b) -> sim_ppm
      k: Int,
      lambdaTenths: Int = 7): Seq[(Int, Long, Long, Long, Long)] = {
    require(lambdaTenths >= 0 && lambdaTenths <= 10, "lambda in [0,1]")
    require(candidates.map(_._1).distinct.size == candidates.size,
      "duplicate candidate ids")
    val sel = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long)]
    var remaining = candidates
    while (sel.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, rel) =>
        val msim =
          if (sel.isEmpty) 0L
          else sel.map(s => sims.getOrElse((id, s._2),
            sims.getOrElse((s._2, id), 0L))).max
        val mmr = lambdaTenths * rel / 10 - (10 - lambdaTenths) * msim / 10
        (id, rel, msim, mmr)
      }
      val best = scored.minBy { case (id, _, _, mmr) => (-mmr, id) }
      sel += ((sel.size + 1, best._1, best._4, best._2, best._3))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    sel.toSeq
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid
   *  retrieval step that merges a lexical ranking (BM25) with a vector
   *  ranking (ANN): score(d) = Σ_arms 1/(k0 + rank_arm(d)), k0 = 60 by
   *  convention. Per-arm terms are nano-quantized before summing so the
   *  fusion is order-independent and engine-exact (the x13 discipline);
   *  the final top-k uses orderBy+limit (distributed TakeOrdered), so
   *  no single-partition funnel ever sees more than topK rows
   *  regardless of how many docs the arms cover.
   *
   *  Inputs are (idCol, rankCol) frames; a doc absent from an arm
   *  simply contributes nothing for it (standard RRF). */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String = "doc_id",
      rankCol: String = "rank",
      k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    // null ids dropped for the same reason as bm25TopK: they'd split
    // the constant rank partition and duplicate rank numbers
    val union = rankings.map(_.select(col(idCol), col(rankCol)))
      .reduce(_ unionByName _)
      .filter(col(idCol).isNotNull)
    val scored = union.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_arms"),
        sum(round(lit(1e9) / (lit(k0) + col(rankCol)), 0).cast("long"))
          .as("__nano"))
    // rank over the topK-row result only (same non-foldable constant
    // partition trick as bm25TopK — no warning, no upstream recompute)
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol).isNull)
      .orderBy(col("__nano").desc, col(idCol))
    scored.orderBy(col("__nano").desc, col(idCol)).limit(topK)
      .withColumn("rank", row_number().over(wTop))
      .select(col(idCol), col("rank"),
        round(col("__nano").cast("double") / 1e9, 6).as("rrf_score"),
        col("n_arms"))
  }

  /** Retrieval-quality evaluation of the BM25 lane — nDCG@k, MRR,
   *  precision@k and recall@k against graded relevance labels derived
   *  from the corpus itself (grade = number of distinct query terms a
   *  document contains, 0..|terms|, the standard term-coverage proxy
   *  when no human judgments exist). Completes the retrieval stack:
   *  bm25TopK → rrfFuse → mmrSelect → THIS, the number a retrieval
   *  tuning run actually optimizes.
   *
   *  Scale shape: labeling is a map-only projection over the scan; the
   *  ideal ranking is an orderBy+limit(k) (distributed TakeOrdered,
   *  never a full sort); the DCG sums run over ≤ k rows. Per-position
   *  gains are micro-quantized BEFORE summing (the x13 discipline) so
   *  nDCG is engine-exact; log2 is written as ln(r+1)/ln(2) to mirror
   *  the oracle's operation order.
   *
   *  Returns ONE row: (k, n_rel_total, n_rel_at_k, ndcg, mrr,
   *  precision, recall), ratios rounded to 6 dp. */
  def retrievalEval(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "retrievalEval needs at least one query term")
    val termsArr = array(terms.map(t => lit(t.toLowerCase)): _*)
    // graded label per doc: how many distinct query terms it contains;
    // null text degrades to grade 0 (the x95 null contract)
    // the label frame feeds THREE consumers (top-k join, ideal
    // ranking, totals): lineage-cut so the corpus tokenizes once for
    // labeling — the frame is doc-count-sized (id + one int)
    val labels = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        coalesce(size(array_intersect(
          array_distinct(split(lower(trim(col(textCol))), "\\s+")),
          termsArr)), lit(0)).as("rel"))
      .localCheckpoint()
    // gain 2^rel - 1, discounted by log2(position+1), micro-quantized
    def dcgMicro(rankCol: Column): Column =
      sum(round(expr("cast(shiftleft(1L, rel) as double) - 1")
        / (log(rankCol.cast("double") + 1.0) / log(lit(2.0))) * 1e6, 0)
        .cast("long"))
    val topk = bm25TopK(docs, terms, k, idCol = idCol, textCol = textCol)
      .join(labels, idCol)
    val got = topk.agg(
      dcgMicro(col("rank")).as("__dcg"),
      coalesce(sum(when(col("rel") > 0, 1L)), lit(0L)).as("__hits"),
      min(when(col("rel") > 0, col("rank"))).as("__first"))
    // ideal ranking: every doc by label desc — equal-rel ties give the
    // same positional gain multiset, so the id tiebreak is for
    // determinism only, not for the value
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol).isNull)
      .orderBy(col("rel").desc, col(idCol))
    val ideal = labels.orderBy(col("rel").desc, col(idCol)).limit(k)
      .withColumn("__r", row_number().over(wTop))
      .agg(dcgMicro(col("__r")).as("__idcg"))
    val totals = labels.agg(
      coalesce(sum(when(col("rel") > 0, 1L)), lit(0L)).as("n_rel_total"))
    got.crossJoin(ideal).crossJoin(totals)
      .select(
        lit(k).as("k"),
        col("n_rel_total"),
        col("__hits").as("n_rel_at_k"),
        when(col("__idcg") > 0,
          round(col("__dcg").cast("double") / col("__idcg"), 6))
          .otherwise(lit(0.0)).as("ndcg"),
        coalesce(round(lit(1.0) / col("__first"), 6), lit(0.0)).as("mrr"),
        round(col("__hits").cast("double") / k, 6).as("precision_at_k"),
        when(col("n_rel_total") > 0,
          round(col("__hits").cast("double") / col("n_rel_total"), 6))
          .otherwise(lit(0.0)).as("recall_at_k"))
  }

  /** PMI collocations — the word pairs that co-occur far more than
   *  chance (pmi = ln(p(w1,w2) / (p(w1)·p(w2)))), the classic corpus-
   *  analysis signal for multiword expressions and template artifacts
   *  (a training-data audit reads the top-PMI list to spot boilerplate
   *  the repetition gate misses because it is CROSS-doc, not within).
   *  A min-count floor kills the noise PMI is notorious for (hapax
   *  pairs max the score).
   *
   *  Scale shape: one gram-keyed agg + one token-keyed agg, then TWO
   *  keyed joins of the (already min-count-pruned) bigram frame against
   *  the unigram counts — keyed joins, not broadcasts, because a 100 TB
   *  corpus vocabulary does not fit a driver; the pruned bigram side is
   *  the small side after the floor. Totals ride a 1-row broadcast.
   *  PMI is micro-quantized before the top-N cut so ordering is
   *  engine-exact. */
  def pmiCollocations(
      docs: DataFrame,
      textCol: String = "text",
      minCount: Long = 5,
      top: Int = 50): DataFrame = {
    val toks = Par.spread(docs.select(col(textCol)))
      .select(split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .filter(size(col("__toks")) >= 1)
    val uniRows = toks
      .select(explode(col("__toks")).as("token"))
      .filter(length(col("token")) > 0)
    // the unigram frame feeds THREE consumers (both join sides + the
    // total) and the gram frame TWO (total + pruned joins); without a
    // lineage cut each consumer re-tokenizes the corpus — 5 scans
    // where 2 suffice (the x99/x101 Explain-audit move). Both frames
    // are KEYSPACE-sized (vocab / distinct bigrams), not corpus-sized.
    val uni = uniRows.groupBy("token").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val nu = uni.agg(sum(col("c")).as("__nu"))
    val grams = expr(
      """filter(transform(sequence(0, size(__toks) - 2),
        |  i -> array_join(slice(__toks, i + 1, 2), ' ')),
        |  g -> g != '')""".stripMargin)
    val biCounts = toks
      .filter(size(col("__toks")) >= 2)
      .select(explode(grams).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // total bigram mass from the counts frame, NOT a second corpus pass
    val nb = biCounts.agg(sum(col("cnt")).as("__nb"))
    val bi = biCounts
      .filter(col("cnt") >= minCount)
      .withColumn("__w1", split(col("ngram"), " ").getItem(0))
      .withColumn("__w2", split(col("ngram"), " ").getItem(1))
    val u1 = uni.select(col("token").as("__w1"), col("c").as("c1"))
    val u2 = uni.select(col("token").as("__w2"), col("c").as("c2"))
    bi
      .join(u1, "__w1")
      .join(u2, "__w2")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      // operation order mirrors the oracle exactly: numerator product
      // left-to-right, denominator product left-to-right, one divide,
      // one ln, then quantize — only libm ulp noise is rounded away
      .withColumn("__micro",
        round(log((col("cnt").cast("double") * col("__nu") * col("__nu"))
          / (col("__nb").cast("double") * col("c1") * col("c2"))) * 1e6, 0)
          .cast("long"))
      .select(col("ngram"), col("cnt"), col("c1"), col("c2"),
        round(col("__micro").cast("double") / 1e6, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("ngram"))
      .limit(top)
  }

  /** Per-document n-gram novelty — the fraction of a doc's distinct
   *  word n-grams that occur in NO other document. The inverse of the
   *  containment/duplication family: high novelty marks the unique
   *  long-tail a curation run wants to protect, near-zero novelty marks
   *  template mass even when no single pair crosses a near-dup
   *  threshold. Docs with fewer than n tokens are absent (no grams to
   *  score — the wordNgrams contract).
   *
   *  Scale shape: per-doc-distinct grams (map-side array_distinct
   *  BEFORE the explode), one gram-keyed document-frequency agg, one
   *  keyed join back, one doc-keyed agg — all shuffles are on the gram
   *  or doc key, nothing driver-side, linear in corpus size. */
  def ngramNovelty(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3): DataFrame = {
    val grams = wordNgrams(docs, idCol, textCol, n)
    val df = grams.groupBy("ngram").agg(count(lit(1)).as("__ndocs"))
    grams.join(df, "ngram")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum(when(col("__ndocs") === 1, 1L)), lit(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6)
          .as("novelty"))
  }

  // ---- URL / domain extraction (x47) --------------------------------
  //
  // The web-pipeline "domain cap" needs a registered domain per URL:
  // extract URLs from text (one codegen'd regexp pass), parse the host
  // with Spark's parse_url, and fold the host to its registered domain
  // with a public-suffix-list subset (the multi-label ccTLD registries
  // where "last two labels" is wrong). The domain column then feeds
  // [[Sampling.capPerStratum]] (per-domain caps) and source-mix stats.

  /** Multi-label public suffixes (subset of the public suffix list). */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "co.in", "co.kr",
    "com.mx", "com.tr", "co.za", "com.sg")

  /** All http(s) URLs in a text column (array). The host is matched as
   *  dot-SEPARATED labels (`[\w-]+(\.[\w-]+)*`), not a `[\w.-]+` run —
   *  a sentence-final period after the URL ("see https://example.com.")
   *  must not be captured into the host, or the registered domain
   *  degrades to garbage like "com.". */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text,
      lit("https?://[\\w-]+(?:\\.[\\w-]+)*(?::\\d+)?(?:/[^\\s]*)?"), lit(0))

  /** Lowercased hostname (no port, no path). */
  def urlHost(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Registered domain: last 2 host labels, or last 3 when the last 2
   *  are a multi-label public suffix (news.bbc.co.uk → bbc.co.uk). */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(size(labels) >= 3 && last2.isInCollection(multiLabelSuffixes), last3)
      .when(size(labels) >= 2, last2)
      .otherwise(host)
  }

  /** (id, url, host, registered_domain) — one row per URL occurrence;
   *  map-only + explode, no shuffle. */
  def urlDomains(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(extractUrls(col(textCol))).as("url"))
      .withColumn("host", urlHost(col("url")))
      .withColumn("registered_domain", registeredDomain(col("host")))

  /** Vocabulary-growth curve over ordered corpus slices (Heaps'-law
   *  empirics — the tokenizer-retraining signal): per slice, token
   *  occurrences, distinct types, types FIRST seen in that slice, and
   *  the occurrence mass those new types carry (ppm). A rising
   *  new-type mass on a daily feed means the tokenizer/vocab trained
   *  on the standing corpus is going stale. One (slice, token)
   *  aggregation + one token-keyed min-slice join — token-keyed
   *  shuffles, never all-pairs; `sliceCol` must sort in arrival order
   *  (dated slice ids do). */
  def vocabGrowth(
      docs: DataFrame,
      sliceCol: String,
      textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(col(sliceCol).as("slice_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val perSlice = tok.groupBy("slice_id", "token")
      .agg(count(lit(1)).as("occ"))
    val first = perSlice.groupBy("token")
      .agg(min("slice_id").as("first_slice"))
    perSlice.join(first, "token")
      .groupBy("slice_id")
      .agg(sum("occ").as("n_occurrences"),
        count(lit(1)).as("n_types"),
        sum(when(col("first_slice") === col("slice_id"), 1L)
          .otherwise(0L)).as("n_new_types"),
        sum(when(col("first_slice") === col("slice_id"), col("occ"))
          .otherwise(0L)).as("new_occ"))
      .withColumn("new_occ_ppm",
        round(lit(1e6) * col("new_occ") / col("n_occurrences"), 0)
          .cast("long"))
  }

  /** Zipf power-law fit over the token frequency distribution: the
   *  least-squares slope of ln(freq) against ln(rank) over the top
   *  `top` tokens — natural corpora sit near −1; a corpus of
   *  templated/synthetic text drifts shallow, truncation/dedup
   *  artifacts drift steep, so the exponent is a one-number corpus
   *  fingerprint. Exactness: the token count pass is corpus-bound;
   *  the fit runs over `top` rows with ln values QUANTIZED to
   *  micro-units before the integer moment sums (Σx, Σy, Σxy, Σx²),
   *  so both engines derive slope/intercept from identical integers
   *  and one closing double division. */
  def zipfFit(
      docs: DataFrame,
      top: Int = 100,
      textCol: String = "text"): DataFrame = {
    require(top >= 3, "need at least 3 rank points")
    val freqs = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(top)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
    val pts = freqs
      .withColumn("rank", row_number().over(w)) // ≤ `top` rows: tiny
      .withColumn("x", round(log(col("rank").cast("double")) * 1e6, 0)
        .cast("long"))
      .withColumn("y", round(log(col("cnt").cast("double")) * 1e6, 0)
        .cast("long"))
    val m = pts.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx")).head()
    val n = m.getAs[Long]("n")
    val (sx, sy, sxy, sxx) = (m.getAs[Long]("sx"), m.getAs[Long]("sy"),
      m.getAs[Long]("sxy"), m.getAs[Long]("sxx"))
    val slope = (n.toDouble * sxy - sx.toDouble * sy) /
      (n.toDouble * sxx - sx.toDouble * sx)
    val intercept = (sy - slope * sx) / n / 1e6
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((n,
      BigDecimal(slope).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(intercept).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_points", "zipf_slope", "ln_intercept")
  }

  /** Persisted vocabulary store — [[vocabGrowth]]'s incremental twin
   *  (the minhash-store shape for tokens): the standing corpus signs
   *  ONCE into a distinct-token table; each daily slice then measures
   *  its new-type mass against the store with one token-keyed
   *  anti-join and appends only its new tokens — old text is never
   *  re-read, and the store grows with the VOCABULARY (Heaps-sublinear),
   *  not the corpus. */
  def vocabStoreCreate(
      docs: DataFrame,
      path: String,
      textCol: String = "text"): Unit =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
      .write.mode("overwrite").parquet(path)

  /** One slice's growth report against (and into) the store: the
   *  x73 lanes — occurrences, types, new types, new-type occurrence
   *  mass — computed at O(slice), then the new tokens APPEND. Caller
   *  contract mirrors `minhashStoreAppend`: ingest each slice once. */
  def vocabStoreIngest(
      path: String,
      newDocs: DataFrame,
      sliceId: String,
      textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val perTok = newDocs
      .select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("occ"))
      .cache()
    try {
      val store = spark.read.parquet(path)
      val fresh = perTok.join(store, Seq("token"), "left_anti").cache()
      try {
        // the report COLLECTS before the append mutates the store: a
        // lazily-returned frame would re-run the anti-join against the
        // grown directory and report zero new types (and the append
        // must not re-scan the directory it is writing into, so the
        // cache materializes first)
        val totals = perTok.agg(
          coalesce(sum("occ"), lit(0L)).as("n_occurrences"),
          count(lit(1)).as("n_types")).head()
        val news = fresh.agg(
          count(lit(1)).as("n_new_types"),
          coalesce(sum("occ"), lit(0L)).as("new_occ")).head()
        fresh.select("token").write.mode("append").parquet(path)
        val nOcc = totals.getAs[Long]("n_occurrences")
        val newOcc = news.getAs[Long]("new_occ")
        Seq((sliceId, nOcc, totals.getAs[Long]("n_types"),
          news.getAs[Long]("n_new_types"), newOcc,
          if (nOcc == 0) 0L else math.round(1e6 * newOcc / nOcc.toDouble)))
          .toDF("slice_id", "n_occurrences", "n_types", "n_new_types",
            "new_occ", "new_occ_ppm")
      } finally fresh.unpersist()
    } finally perTok.unpersist()
  }

  /** Kendall rank correlation between two rankings — the number a
   *  retrieval tuning run reads to see whether a parameter change
   *  actually REORDERS results or just rescales scores (tau ≈ 1: the
   *  change is cosmetic; tau ≈ 0: a different ranking regime).
   *  Computed over the id INTERSECTION of the two pages (the standard
   *  treatment for arms returning different result sets) by pair
   *  counting: tau = (concordant − discordant) / pairs. Ranks are
   *  row_numbers so ties cannot occur and tau-a = tau-b.
   *
   *  Scale shape: the arms are whatever distributed rankings the
   *  caller built; everything HERE runs on the ≤ min(|A|,|B|)-row
   *  intersection — the pair self-join is page-bounded (k² pairs) by
   *  construction, never corpus-bounded. The intersection is
   *  lineage-cut because the pair join consumes it twice. */
  def rankCorrelation(
      a: DataFrame,
      b: DataFrame,
      idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    val ra = a.select(col(idCol).as("__id"),
      col(rankCol).cast("long").as("__ra"))
    val rb = b.select(col(idCol).as("__id"),
      col(rankCol).cast("long").as("__rb"))
    val j = ra.join(rb, "__id").localCheckpoint()
    val pairs = j.as("l").join(j.as("r"), col("l.__id") < col("r.__id"))
      .select(((col("l.__ra") < col("r.__ra")) ===
        (col("l.__rb") < col("r.__rb"))).as("__conc"))
    val stats = pairs.agg(
      coalesce(sum(when(col("__conc"), 1L).otherwise(0L)), lit(0L))
        .as("concordant"),
      coalesce(sum(when(!col("__conc"), 1L).otherwise(0L)), lit(0L))
        .as("discordant"))
    val nC = j.agg(count(lit(1)).as("n_common"))
    stats.crossJoin(nC).select(
      col("n_common"),
      (col("concordant") + col("discordant")).as("n_pairs"),
      col("concordant"),
      col("discordant"),
      when(col("concordant") + col("discordant") > 0,
        round((col("concordant") - col("discordant")).cast("double")
          / (col("concordant") + col("discordant")), 6))
        .otherwise(lit(0.0)).as("tau"))
  }

  /** Unicode-mess canonicalizer — the normalize-BEFORE-dedup step:
   *  curly quotes/dashes fold to ASCII, NBSP folds to space, runs of
   *  whitespace collapse, then trim + lowercase. Exact dedup on RAW
   *  text misses byte-different/visually-identical variants (the
   *  curly-quote repost, the double-spaced mirror); canonicalizing
   *  first is how real pipelines recover them. Pure codegen'd column
   *  expression (translate + one regex pass) — map-only at any scale.
   *  The FOLD→COLLAPSE→TRIM→LOWER order is part of the contract
   *  (NBSP must fold before the whitespace collapse can eat it). */
  def canonicalizeText(text: Column): Column =
    lower(trim(regexp_replace(
      translate(text,
        // ‘ ’ “ ” – — NBSP → ASCII
        "\u2018\u2019\u201C\u201D\u2013\u2014\u00A0", "''\"\"-- "),
      "\\s+", " ")))

  // ---- persisted BM25 index store (x117) -----------------------------

  private def bm25Projections(
      docs: DataFrame,
      idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val toks = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    (toks.groupBy("token", "id").agg(count(lit(1)).as("tf")),
      toks.groupBy("id").agg(count(lit(1)).as("dl")))
  }

  /** Persisted BM25 index — [[bm25TopK]]'s incremental twin (the
   *  minhash/IVF-store shape for lexical retrieval): the standing
   *  corpus signs ONCE into (token, id, tf) postings plus an
   *  (id, dl) length table; new slices APPEND their postings without
   *  re-reading old text, and queries touch only the query terms'
   *  postings plus the id-keyed metadata table — never the corpus.
   *  The store grows with the posting count (linear in corpus tokens
   *  but text-free); corpus-level stats (N, total length) aggregate
   *  from the metadata table at query time — a 1-row sidecar could
   *  cache them, kept derived here so appends stay one write. */
  def bm25StoreCreate(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val (postings, doclen) = bm25Projections(docs, idCol, textCol)
    postings.write.mode("overwrite").parquet(path + "/postings")
    doclen.write.mode("overwrite").parquet(path + "/doclen")
  }

  /** Append one slice's postings. Caller contract mirrors
   *  `minhashStoreAppend`: ingest each document exactly once — and
   *  because a double-ingest would silently duplicate postings and
   *  doclen rows (inflating tf/N/total-length and corrupting every
   *  subsequent [[bm25StoreQuery]] score with no error), the contract
   *  is ENFORCED, on both axes: duplicate ids WITHIN the slice (an
   *  upstream union glitch would merge their token counts into one
   *  inflated doc) and slice ids already IN the store both fail
   *  loudly BEFORE anything is written. The store check is a plain
   *  left-semi join (no broadcast hint — a backfill-sized slice must
   *  not be forced through the driver; the planner broadcasts
   *  whichever side is actually small). The whole check-then-append
   *  sequence runs under [[graft.history.StoreIO.appendLocked]] (the
   *  same per-path monitor every other store write takes), so two
   *  concurrent appends of overlapping slices can't both pass the
   *  store check, and the postings and doclen writes can't interleave
   *  with another append's. Single-JVM scope: the lock is a process
   *  monitor — cross-driver writers need an external coordinator,
   *  same as the other parquet stores. */
  def bm25StoreAppend(
      path: String,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit =
      graft.history.StoreIO.appendLocked(path) {
    val ids = newDocs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"))
    val intraDupes = ids.groupBy("id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(5).collect().map(_.getLong(0))
    require(intraDupes.isEmpty,
      "bm25StoreAppend: duplicate doc ids WITHIN the slice — their " +
        "token counts would merge into one inflated doc. First " +
        s"offenders: ${intraDupes.mkString(", ")}")
    val dupes = newDocs.sparkSession.read.parquet(path + "/doclen")
      .select("id")
      .join(ids.distinct(), Seq("id"), "left_semi")
      .limit(5).collect().map(_.getLong(0))
    require(dupes.isEmpty,
      "bm25StoreAppend: doc ids already in the store — a re-ingest " +
        "would double-count postings and corrupt every subsequent " +
        s"score. First offenders: ${dupes.mkString(", ")}")
    val (postings, doclen) = bm25Projections(newDocs, idCol, textCol)
    postings.write.mode("append").parquet(path + "/postings")
    doclen.write.mode("append").parquet(path + "/doclen")
  }

  /** BM25 top-k from the STORE — must equal [[bm25TopK]] over the
   *  same logical corpus (the incremental-path ≡ fresh-computation
   *  contract every store in this engine is held to). Scoring
   *  arithmetic and quantization are the exact bm25TopK expressions;
   *  the term filter prunes the postings scan before anything else. */
  def bm25StoreQuery(
      spark: SparkSession,
      path: String,
      terms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25StoreQuery needs at least one term")
    val qtf = spark.read.parquet(path + "/postings")
      .filter(col("token").isin(terms.map(_.toLowerCase): _*))
    val dl = spark.read.parquet(path + "/doclen")
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__tl"))
    val df = qtf.groupBy("token").agg(count(lit(1)).as("df"))
    val perTerm = qtf
      .join(broadcast(df), "token")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n").cast("double") - col("df") + 0.5)
          / (col("df") + 0.5) + 1.0))
      .withColumn("__avgdl", col("__tl").cast("double") / col("__n"))
      .withColumn("__micro",
        round(col("__idf") * (col("tf") * (k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b)
            * (col("dl").cast("double") / col("__avgdl")))) * 1e6, 0)
          .cast("long"))
    val perDoc = perTerm.groupBy(col("id"))
      .agg(sum(col("__micro")).as("__score_micro"),
        count(lit(1)).as("n_terms"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id").isNull)
      .orderBy(col("__score_micro").desc, col("id"))
    perDoc
      .orderBy(col("__score_micro").desc, col("id"))
      .limit(k)
      .withColumn("rank", row_number().over(wTop))
      .select(col("id").as("doc_id"), col("rank"),
        round(col("__score_micro").cast("double") / 1e6, 6).as("bm25"),
        col("n_terms"))
  }

  /** Canonical form of a URL — the crawl-dedup normalization run
   *  before URL-level dedup/frontier logic: scheme and host
   *  lowercase, default port stripped (scheme-appropriate), fragment
   *  dropped, tracking params (utm_*, fbclid, gclid) dropped,
   *  surviving query params SORTED, a bare "/" path normalized away.
   *  Pure column expressions over shared regexes (no parse_url — it
   *  has no SQL mirror), so the whole normalizer oracle-replays. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^(https?)://", 1))
    val hostPort = lower(regexp_extract(url, "^https?://([^/?#]+)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(url, "^https?://[^/?#]+([^?#]*)", 1)
    val path = regexp_replace(rawPath, "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(query, "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid)=") && p =!= "")), "&")
    concat(scheme, lit("://"), host, path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Per-registered-domain source-mix stats (URL count, distinct docs)
   *  — the before/after picture for a domain-cap pass. */
  def domainMix(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    urlDomains(docs, idCol, textCol)
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(idCol)).as("n_docs"))

  /** Tertile cut points over a per-doc quality score — the CCNet
   *  partitioning step (Wenzek et al. 2019: rank documents by LM score,
   *  split head/middle/tail). One row `(t1, t2)` = the 1/3 and 2/3
   *  exact interpolated percentiles (`exact=false` swaps in
   *  `percentile_approx`, the mergeable-sketch 100 TB path — cut
   *  points don't need exactness, only stability). */
  def perplexityThresholds(
      scored: DataFrame,
      scoreCol: String = "avg_neg_logprob",
      exact: Boolean = true): DataFrame = {
    // interpolate Scala doubles: "0.3333333333333333" round-trips to the
    // exact double 1.0/3 (SQL-side `1.0/3` would be 6-digit DECIMAL math)
    val probs = s"array(${1.0 / 3}, ${2.0 / 3})"
    val agg =
      if (exact) expr(s"percentile($scoreCol, $probs)")
      else expr(s"percentile_approx($scoreCol, $probs, 10000)")
    scored.agg(agg.as("__t"))
      .select(col("__t").getItem(0).as("t1"), col("__t").getItem(1).as("t2"))
  }

  /** CCNet-style perplexity bucketing: label each scored document
   *  `head` (score ≤ t1: most fluent third under the LM), `middle`, or
   *  `tail` (least fluent — the slice CCNet drops or down-samples).
   *  Takes the score frame ([[unigramLogProb]] output or a persisted
   *  copy) and a one-row `(t1, t2)` threshold frame so the expensive LM
   *  pass runs ONCE and thresholds can be frozen for drift-stable
   *  bucketing across corpus versions. Broadcast one-row join + a
   *  map-only CASE — nothing here shuffles the corpus. */
  def perplexityBuckets(
      scored: DataFrame,
      thresholds: DataFrame,
      scoreCol: String = "avg_neg_logprob"): DataFrame =
    scored.crossJoin(broadcast(thresholds))
      .withColumn("bucket",
        when(col(scoreCol) <= col("t1"), "head")
          .when(col(scoreCol) <= col("t2"), "middle")
          .otherwise("tail"))
      .drop("t1", "t2")

  /** Encoding-damage (mojibake) scan — the text-quality check that
   *  catches bytes decoded under the wrong charset, which every
   *  web-crawl corpus carries: U+FFFD replacement chars (decoder gave
   *  up), stray C1 controls U+0080–U+009F (cp1252 bytes read as
   *  Latin-1), `Ã`/`Â` + Latin-1-supplement pairs (UTF-8 accents read
   *  as Latin-1: `é` → `Ã©`), and `â€`-prefixed triples (UTF-8 curly
   *  punctuation read as cp1252: `’` → `â€™`). Pure codegen'd
   *  `regexp_count` columns — map-only, inlined into the scan; the
   *  character classes are shared RE2/Java syntax so an oracle can run
   *  the identical patterns. Returns per-doc artifact counts plus the
   *  total; filter `mojibake_chars > 0` to quarantine. */
  def mojibakeScan(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val repl = regexp_count(t, lit("�"))
    val c1 = regexp_count(t, lit("[\\x{80}-\\x{9F}]"))
    val latin1 = regexp_count(t, lit("[ÃÂ][\\x{A0}-\\x{BF}\\x{80}-\\x{9F}]"))
    val punct = regexp_count(t, lit("â€."))
    docs.select(
      col(idCol),
      repl.as("replacement_chars"),
      c1.as("c1_controls"),
      latin1.as("latin1_pairs"),
      punct.as("punct_triples"),
      (repl + c1 + latin1 + punct).as("mojibake_chars"))
  }

  /** Dedup-grade text normalization: Unicode NFD → strip combining
   *  marks (accents) → lowercase → every run of non-letter/non-digit
   *  (punctuation, whitespace, control) to ONE space → trim. The canonical
   *  key for "same text modulo typography" duplicate detection —
   *  `café`, `Cafe!` and `café` all map to `cafe`. A UDF because
   *  Spark SQL has no Unicode normalizer; java.text.Normalizer is
   *  allocation-light and the op stays map-only, inlined into the scan
   *  stage (no shuffle, no materialized intermediate). */
  def normalizeText(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val decomposed = java.text.Normalizer.normalize(
          s, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(decomposed.length)
        var i = 0
        var lastSpace = true // leading whitespace collapses to nothing
        while (i < decomposed.length) {
          val c = decomposed.charAt(i)
          val t = Character.getType(c)
          val isMark = t == Character.NON_SPACING_MARK ||
            t == Character.COMBINING_SPACING_MARK ||
            t == Character.ENCLOSING_MARK
          if (!isMark) {
            // kept classes are exactly RE2's \p{L} (isLetter) and
            // \p{Nd} (isDigit) so an oracle can replay this as
            // regexp_replace(..., '[^\p{L}\p{Nd}]+', ' ', 'g')
            if (Character.isLetter(c) || Character.isDigit(c)) {
              sb.append(Character.toLowerCase(c))
              lastSpace = false
            } else if (!lastSpace) { // punct/space/control run → one ' '
              sb.append(' ')
              lastSpace = true
            }
          }
          i += 1
        }
        var end = sb.length
        if (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
        sb.substring(0, end)
      }
    }
    f(text)
  }

  /** Normalized exact dedup: group documents by the md5 of their
   *  [[normalizeText]] form and report groups of typographic variants
   *  (≥ 2 docs) with the smallest doc id as canonical. The
   *  exact-dedup plan shape of `Dedup.duplicateGroups` — 16-byte keys
   *  shuffle, never the text — applied to the normalized key, so
   *  curly-quote/accent/case/punctuation variants that exact dedup
   *  misses collapse into one group. */
  def normalizedDupGroups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), md5(normalizeText(col(textCol))).as("norm_md5"))
      .filter(col("norm_md5").isNotNull)
      .groupBy(col("norm_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))
      .filter(col("n_docs") >= 2)

  // ------------------------------------------------------------------
  // canary scan (multi-pattern literal substring search)
  // ------------------------------------------------------------------

  /** Aho–Corasick automaton over a fixed literal pattern set. Goto
   *  edges in per-node hash maps, BFS-built failure links, output sets
   *  merged through the failure chain at build time — so the scan is a
   *  single pass over the text with O(1) amortized work per character,
   *  INDEPENDENT of the pattern count. Returns the distinct pattern
   *  indexes that occur as substrings. */
  private[graft] final class AhoCorasick(patterns: Seq[String])
      extends Serializable {
    require(patterns.forall(p => p != null && p.nonEmpty),
      "canary patterns must be non-empty")
    private val goto_ =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Char, Int]())
    private val out = scala.collection.mutable.ArrayBuffer(
      Set.empty[Int])
    private val fail = scala.collection.mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      p.foreach { ch =>
        val next = goto_(node).get(ch)
        node = if (goto_(node).containsKey(ch)) next else {
          goto_ += new java.util.HashMap[Char, Int]()
          out += Set.empty[Int]
          fail += 0
          goto_(node).put(ch, goto_.size - 1)
          goto_.size - 1
        }
      }
      out(node) = out(node) + idx
    }
    locally { // BFS failure links; merge output sets down the chain
      val queue = scala.collection.mutable.Queue[Int]()
      goto_(0).values().forEach(v => queue += v)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        goto_(u).forEach { (ch, v) =>
          queue += v
          var f = fail(u)
          while (f != 0 && !goto_(f).containsKey(ch)) f = fail(f)
          fail(v) = if (goto_(f).containsKey(ch) && goto_(f).get(ch) != v)
            goto_(f).get(ch) else 0
          out(v) = out(v) ++ out(fail(v))
        }
      }
    }
    /** Distinct pattern indexes occurring in `text`, ascending. */
    def matches(text: String): Array[Int] = {
      if (text == null) return Array.empty
      val hits = scala.collection.mutable.SortedSet[Int]()
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !goto_(node).containsKey(ch)) node = fail(node)
        if (goto_(node).containsKey(ch)) node = goto_(node).get(ch)
        if (out(node).nonEmpty) hits ++= out(node)
        i += 1
      }
      hits.toArray
    }
  }

  /** Contamination-canary scan: which of a fixed set of literal canary
   *  strings (BIG-bench-style canary GUIDs, eval answer keys, license
   *  sentinels) occur as RAW substrings anywhere in the corpus — no
   *  tokenization, no normalization, so a canary spanning punctuation
   *  or token boundaries still hits (the n-gram [[contamination]] path
   *  cannot see those).
   *
   *  Scale shape: the automaton is built once on the driver from the
   *  bounded canary list (`maxCanaries` guard — the structure
   *  broadcasts inside the UDF closure) and every document makes ONE
   *  pass, O(chars), regardless of how many canaries are loaded — the
   *  naive contains() plan is a broadcast nested loop whose cost
   *  multiplies by the canary count; this one's does not. Output is
   *  one row per canary: hit count + first hit, O(canaries). */
  /** Canary INJECTION — the write side of [[canaryScan]] (the
   *  secret-sharer membership probe): plant a unique, deterministic
   *  marker string in every `everyK`-th document so a later scan of a
   *  trained model's corpus (or a vendor's alleged copy) can prove
   *  membership. The canary derives from (id, salt) via md5, so the
   *  manifest is reproducible from the salt alone — no stored
   *  randomness — and injection is MAP-ONLY (a literal concat).
   *  Returns the corpus with markers planted; the manifest is
   *  [[canaryManifest]] over the same (docs, everyK, salt). */
  def injectCanaries(
      docs: DataFrame,
      everyK: Int = 37,
      salt: String = "graft",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.withColumn(textCol,
      when(col(idCol) % everyK === 0,
        concat(col(textCol), lit(" canary:"),
          md5(concat(col(idCol).cast("string"), lit(":" + salt))
            .cast("binary"))))
        .otherwise(col(textCol)))

  /** The (doc, canary) manifest [[injectCanaries]] plants — derived,
   *  not stored: same (everyK, salt) ⇒ same markers, any engine. */
  def canaryManifest(
      docs: DataFrame,
      everyK: Int = 37,
      salt: String = "graft",
      idCol: String = "doc_id"): DataFrame =
    docs.filter(col(idCol) % everyK === 0)
      .select(col(idCol).as("injected_doc"),
        concat(lit("canary:"),
          md5(concat(col(idCol).cast("string"), lit(":" + salt))
            .cast("binary"))).as("canary"))

  def canaryScan(
      docs: DataFrame,
      canaries: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      maxCanaries: Int = 100000): DataFrame = {
    require(canaries.nonEmpty, "canaryScan: empty canary list")
    require(canaries.size <= maxCanaries,
      s"canaryScan: ${canaries.size} canaries exceed maxCanaries=" +
        s"$maxCanaries — the automaton must stay driver/broadcast-sized")
    val distinctCanaries = canaries.distinct.toIndexedSeq
    val ac = new AhoCorasick(distinctCanaries)
    val hitUdf = udf { text: String => ac.matches(text) }
    val hits = docs
      .select(col(idCol).as("__id"),
        explode(hitUdf(col(textCol))).as("__c"))
    val labels = distinctCanaries.zipWithIndex
      .map { case (c, i) => (i, c) }
    val labelDf =
      docs.sparkSession.createDataFrame(labels).toDF("__c", "canary")
    val counts = hits.groupBy("__c")
      .agg(count(lit(1)).as("n_docs"), min(col("__id")).as("first_doc"))
    // LEFT outer from the label frame: a canary with ZERO hits still
    // gets its row (n_docs=0, first_doc null) — "scanned and clean"
    // must be distinguishable from "not scanned"
    labelDf.join(broadcast(counts), Seq("__c"), "left")
      .select(col("canary"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"), col("first_doc"))
  }

  /** Deflate compression ratio per doc — the cheap whole-document
   *  repetitiveness signal big corpus pipelines gate on (template
   *  spam and degenerate generations compress far below natural
   *  prose; already-compressed/binary junk barely compresses at all).
   *  Complements [[repetitionRatio]]: n-gram repetition sees local
   *  loops, Deflate's 32 KB window sees document-scale structure.
   *  ratio_ppm = compressed/raw bytes in ppm from integer counts.
   *  Map-only (one Deflater per partition, reset per row — allocation-
   *  free across a partition); byte-level codecs aren't SQL, so
   *  consumers persist the per-doc frame and replay rollups (the
   *  multimodal pattern). */
  def compressionRatio(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      level: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lvl = level
    Par.spread(docs.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(lvl)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset()
          defl.setInput(raw)
          defl.finish()
          var comp = 0L
          while (!defl.finished()) comp += defl.deflate(buf)
          val ratio =
            if (raw.length == 0) 0L else comp * 1000000L / raw.length
          (id, raw.length.toLong, comp, ratio)
        }
      }
      .toDF(idCol, "n_bytes", "n_compressed", "ratio_ppm")
  }

  /** Token-budget truncation — the max-sequence-length trim every
   *  training pipeline applies before packing: keep each document's
   *  first `maxTokens` whitespace tokens (re-serialized with single
   *  spaces — token-grain surgery defines away original spacing, the
   *  same normalization contract as the span family) and report the
   *  manifest: token count, whether the budget bit, kept tokens/chars,
   *  and the md5 of the truncated text for downstream exact dedup.
   *
   *  Scale: pure expression chain (split → slice → join), map-only —
   *  no shuffle, codegen'd, streams unchanged. */
  def truncateToTokenBudget(
      docs: DataFrame,
      maxTokens: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    // null text degrades to the empty document (0 tokens, empty
    // truncation) instead of null-propagating through size/md5
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => length(t) > 0)
    val kept = array_join(slice(toks, 1, maxTokens), " ")
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      (size(toks) > maxTokens).as("truncated"),
      least(size(toks), lit(maxTokens)).cast("long").as("kept_tokens"),
      length(kept).cast("long").as("kept_chars"),
      md5(kept.cast("binary")).as("trunc_md5"))
  }
}
