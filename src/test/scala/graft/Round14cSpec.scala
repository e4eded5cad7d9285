package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel
import graft.pipeline.{Curation, TextAnalysis}

/** Round-14 batch 3: the end-to-end curation funnel, script-mix
 *  label hygiene, and touch attribution. */
class Round14cSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("scriptMix: dominant argmax, profile-order ties, mixed flag") {
    val docs = Seq(
      (1L, "en", "pure latin text"),
      (2L, "zh", "世界你好"),         // pure han
      (3L, "en", "mixed 世界 here"),           // latin-dominant mix
      (4L, "ru", "привет"), // pure cyrillic
      (5L, "en", "12345 !!!"),                          // no scripted chars
      (6L, "zh", "ab世界")                      // tie 2-2: latin wins
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.scriptMix(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // (lang, dominant) -> (n_docs, n_mixed, latin_chars, han_chars)
    // "pure latin text" = 13 latin; "mixed 世界 here" = 9 latin + 2 han
    assert(got(("en", "latin")) == ((2L, 1L, 22L, 2L)))
    assert(got(("zh", "han")) == ((1L, 0L, 0L, 4L)))
    assert(got(("zh", "latin")) == ((1L, 1L, 2L, 2L))) // tie -> earlier profile
    assert(got(("ru", "cyrillic")) == ((1L, 0L, 0L, 0L)))
    assert(got(("en", "none")) == ((1L, 0L, 0L, 0L)))
    assert(got.size == 5)
  }

  test("scriptMix: null text degrades to '' (dominant 'none'), " +
      "never an engine-specific CASE fallthrough") {
    val docs = Seq((1L, "en", null: String), (2L, "en", "abc"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.scriptMix(docs).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("none" -> 1L, "latin" -> 1L))
  }

  test("touchAttribution: hand-computed journeys, both models") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: view -> click -> purchase(10): first=view last=click
      (1L, 1L, ts(1), "view", 0.0),
      (2L, 1L, ts(2), "click", 0.0),
      (3L, 1L, ts(3), "purchase", 10.0),
      // user 1 again: second purchase(5) after an error touch:
      // first=view (journey-wide), last=error
      (4L, 1L, ts(4), "error", 0.0),
      (5L, 1L, ts(5), "purchase", 5.0),
      // user 2: purchase with NO prior touch -> (direct)/(direct)
      (6L, 2L, ts(1), "purchase", 7.0),
      // user 3: same-ts tie broken by event_id: 7 before 8
      (7L, 3L, ts(1), "signup", 0.0),
      (8L, 3L, ts(1), "view", 0.0),
      (9L, 3L, ts(2), "purchase", 3.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Funnel.touchAttribution(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // channel -> (first_n, first_v, last_n, last_v)
    assert(got("view") == ((2L, 15.0, 1L, 3.0)))    // u1 firsts; u3 last
    assert(got("click") == ((0L, 0.0, 1L, 10.0)))   // u1 purchase 1 last
    assert(got("error") == ((0L, 0.0, 1L, 5.0)))    // u1 purchase 2 last
    // u3 first touch: signup (event 7 beats view 8 on the same-ts
    // event_id tie-break); u3 LAST touch is view for the same reason
    assert(got("signup") == ((1L, 3.0, 0L, 0.0)))
    assert(got("(direct)") == ((1L, 7.0, 1L, 7.0))) // u2, both models
    assert(got.size == 5)
    assert(got.values.map(_._1).sum == 4L) // every purchase counted once
    assert(got.values.map(_._3).sum == 4L)
  }

  test("conversionLag: journey-start lag per first-touch channel") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: view@1 -> purchase@3 (lag 120s), then purchase@5
      // (SAME journey start: lag 240s) -> channel view gets both
      (1L, 1L, ts(1), "view", 0.0),
      (2L, 1L, ts(3), "purchase", 1.0),
      (3L, 1L, ts(5), "purchase", 1.0),
      // user 2: direct purchase -> excluded (no journey start)
      (4L, 2L, ts(1), "purchase", 1.0),
      // user 3: click@2 -> purchase@4 (lag 120s)
      (5L, 3L, ts(2), "click", 0.0),
      (6L, 3L, ts(4), "purchase", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Funnel.conversionLag(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(5)))
      .toMap
    val us = 1000000L
    // channel -> (n, min, median, max)
    assert(got("view") == ((2L, 120L * us, 180.0 * us, 240L * us)))
    assert(got("click") == ((1L, 120L * us, 120.0 * us, 120L * us)))
    assert(got.size == 2) // the direct purchase is excluded
  }

  test("mmrSelect: hand-computed greedy — relevance vs redundancy") {
    // three near-identical top docs + two diverse ones. Pure relevance
    // would pick 1,2,3; MMR must interleave the diverse docs.
    val cand = Seq((1L, 1000000L), (2L, 990000L), (3L, 980000L),
      (4L, 600000L), (5L, 550000L))
    val sims = Map((1L, 2L) -> 900000L, (1L, 3L) -> 900000L,
      (2L, 3L) -> 900000L) // 4 and 5 are dissimilar to everything
    val got = TextAnalysis.mmrSelect(cand, sims, k = 4)
    assert(got.map(_._2) == Seq(1L, 2L, 4L, 3L))
    // pick 1: max rel, no penalty
    assert(got(0) == ((1, 1L, 700000L, 1000000L, 0L)))
    // pick 2: doc2 at 693000 - 270000 = 423000 still beats doc4's
    // 420000 by 3000 — the greedy is SENSITIVE to exactly this
    // margin, which is why integer arithmetic matters
    assert(got(1) == ((2, 2L, 423000L, 990000L, 900000L)))
    // pick 3: doc3 pays the same 270000 penalty (686000 - 270000 =
    // 416000) and LOSES to diverse doc4 (420000)
    assert(got(2) == ((3, 4L, 420000L, 600000L, 0L)))
    // pick 4: doc3's penalized 416000 still beats doc5's 385000 —
    // diversity reorders, it does not exile
    assert(got(3) == ((4, 3L, 416000L, 980000L, 900000L)))
  }

  test("filterAblation: sole-blocker vs raw bite on crafted failures") {
    val good = ("the and of is was that this with have from " * 5).trim
    val docs = Seq(
      (1L, good),                       // passes all 4
      (2L, "short text"),               // fails wc ONLY? no: stop too
      (3L, good + " " + good),          // passes (100 tokens)
      (4L, ("zz " * 50).trim)           // 50 tokens, no stopwords: stop+alpha? zz is alpha
    ).toDF("doc_id", "text")
    val got = TextAnalysis.filterAblation(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc2: 2 tokens (wc fail), stop hits 0 < 2 (stop fail), mean len
    // 4.5 ok, alpha ok -> fails wc+stop, sole-blocker for NEITHER
    // doc4: 50 'zz' tokens: wc ok, mlen 2.0 < 3.0 FAIL, stop 0 FAIL,
    // alpha ok -> fails mlen+stop, no sole blocker
    assert(got("wc") == ((1L, 0L, 4L, 2L)))
    assert(got("mlen") == ((1L, 0L, 4L, 2L)))
    assert(got("stop") == ((2L, 0L, 4L, 2L)))
    assert(got("alpha") == ((0L, 0L, 4L, 2L)))
  }

  test("curation funnel: stages are monotone and match curateCorpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val cfg = Curation.CurationConfig(minTokens = 30,
      maxContamination = Some(0.8))
    val bench = TextAnalysis.wordNgrams(
      docs.filter(col("doc_id") < 10)).select("ngram")
    val funnel = SparkEntry.queries("b03_curation_funnel")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // monotone: each gate only removes docs (counts AND id mass)
    val order = Seq("raw", "quality", "decontaminated", "deduped")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(funnel(a)._1 >= funnel(b)._1, s"$a -> $b grew")
      assert(funnel(a)._2 >= funnel(b)._2, s"$a -> $b id_sum grew")
    }
    // every stage bites on this fixture (the thresholds were chosen
    // against its distributions — a no-op stage would mask a broken
    // gate behind an unchanged count)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(funnel(a)._1 > funnel(b)._1, s"$a -> $b did not bite")
    }
    // the deduped row and the split rows both come from the REAL
    // curateCorpus output: splits partition it exactly
    val splits = funnel.filter { case (k, _) =>
      k.startsWith("split:") }.values
    assert(splits.map(_._1).sum == funnel("deduped")._1)
    assert(splits.map(_._2).sum == funnel("deduped")._2)
    // and the product call agrees with the staged twins end-to-end
    val curated = Curation.curateCorpus(docs, Some(bench), cfg)
    assert(curated.count() == funnel("deduped")._1)
  }
}
