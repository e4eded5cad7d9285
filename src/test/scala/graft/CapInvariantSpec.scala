package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal, TextAnalysis}

/** The scale guards in ONE place (BASELINE.md §7): every operator that
 *  could go quadratic or explode per-row is bounded by an explicit cap,
 *  and the cap actually bites. These are the invariants the 100×
 *  extrapolation memo leans on. */
class CapInvariantSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("lshCandidatePairs skips band buckets larger than maxBucketSize") {
    // 12 identical docs → one 12-member bucket in every band
    val docs = (1L to 12L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, numBands = 8)
    val capped = Dedup.lshCandidatePairs(sigs, maxBucketSize = 10)
    assert(capped.count() == 0, "over-cap bucket must be skipped")
    val open = Dedup.lshCandidatePairs(sigs, maxBucketSize = 12)
    assert(open.count() == 12L * 11 / 2, "within-cap bucket pairs up")
  }

  test("incremental near-dup match caps BOTH sides' buckets") {
    val store = Dedup.minhashStoreCreate(
      (1L to 8L).map(i => (i, "same text everywhere here ok fine"))
        .toDF("doc_id", "text"), numBands = 8)
    val slice = (101L to 104L)
      .map(i => (i, "same text everywhere here ok fine"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(slice, numBands = 8)
    // union bucket = 12 occupants > cap 10 → nothing matches
    assert(Dedup.incrementalNearDuplicatesFromSignatures(
      store, sigs, threshold = 0.5, maxBucketSize = 10).count() == 0)
    // raised cap: every slice doc matches the store AND earlier slice
    val open = Dedup.incrementalNearDuplicatesFromSignatures(
      store, sigs, threshold = 0.5, maxBucketSize = 100)
    assert(open.count() == 4 * 8 + 3 + 2 + 1,
      "4 slice docs x 8 store + within-slice a<b pairs")
  }

  test("jaccardSimilarPairs caps shingle posting lists (df cap)") {
    // every doc shares one stop-shingle; distinct tails keep them apart
    val docs = (1L to 9L).map(i =>
      (i, s"the common stop shingle tail$i x$i y$i z$i")).toDF("doc_id", "text")
    val capped = Dedup.jaccardSimilarPairs(docs, threshold = 0.1,
      maxShingleDocFreq = 5)
    assert(capped.count() == 0,
      "a shingle in 9 docs exceeds df cap 5 and feeds no pairs")
  }

  test("substringSpans caps window-hash posting lists (df cap)") {
    // one 120-char block shared by 7 docs: df 7 > cap 5 → boilerplate
    val block = ("w" * 119) + "q"
    val docs = (1L to 7L).map(i => (i, block + " tail" + i))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(docs, maxDf = 5).count() == 0,
      "a window in 7 docs exceeds df cap 5 and feeds no spans")
    assert(Dedup.substringSpans(docs, maxDf = 7).count() == 7)
    // the cross-corpus mode keeps the same cap on the corpus side
    assert(Dedup.contaminationSpans(
      docs, Seq((100L, block)).toDF("doc_id", "text"),
      maxDf = 5).count() == 0)
  }

  test("canaryScan refuses unbounded canary lists") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.canaryScan(docs, Seq("a", "b", "c"), maxCanaries = 2)
    }
  }

  test("gifAnimFrames bounds the per-row frame explosion") {
    def gray(v: Int) = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, 4, 4)
      g.dispose(); img
    }
    val gif = Multimodal.encodeAnimatedGif(
      (1 to 6).map(i => gray(i * 30)), delayMs = 100L)
    assert(Multimodal.gifAnimFrames(gif).length == 6)
    assert(Multimodal.gifAnimFrames(gif, maxFrames = 3).length == 3)
  }

  test("audioSamplesBytes bounds the materialized sample array") {
    // 1-second 8kHz mono s16 WAV = 8000 samples; cap at 1000
    val n = 8000
    val data = new Array[Byte](44 + n * 2)
    def put(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(data, i)
    def le32(i: Int, v: Int): Unit = {
      data(i) = (v & 0xff).toByte; data(i + 1) = ((v >> 8) & 0xff).toByte
      data(i + 2) = ((v >> 16) & 0xff).toByte
      data(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(i: Int, v: Int): Unit = {
      data(i) = (v & 0xff).toByte; data(i + 1) = ((v >> 8) & 0xff).toByte
    }
    put(0, "RIFF"); le32(4, 36 + n * 2); put(8, "WAVE")
    put(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    put(36, "data"); le32(40, n * 2)
    val full = Multimodal.audioSamplesBytes(data)
    assert(full.exists(_.length == n))
    val capped = Multimodal.audioSamplesBytes(data, maxSamples = 1000)
    assert(capped.exists(_.length == 1000))
  }
}
