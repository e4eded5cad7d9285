package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}

/** Round-12 session-2 operators: exact substring-span dedup, the
 *  per-source duplicated-mass rollup, and embedding outlier pruning. */
class Round12bSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // 120 normalized chars of shared prose (no double spaces — positions
  // must survive krHashes' whitespace collapse untouched)
  private val shared =
    "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm windowsill and the rain keeps falling down"
  private def pad(n: Int, seed: Char): String =
    Array.fill(n)(seed).mkString

  test("substringSpans finds the copied span, not the whole doc") {
    val docs = Seq(
      (1L, pad(50, 'a') + " " + shared + " " + pad(50, 'b')),
      (2L, pad(50, 'c') + " " + shared + " " + pad(50, 'd')),
      (3L, pad(200, 'e'))).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs)
      .orderBy("doc_id", "span_start").collect()
    // docs 1 and 2 share exactly `shared` (+ the single space on each
    // side joins differing pads, so boundary windows differ)
    assert(spans.length == 2, spans.mkString("; "))
    assert(spans.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    spans.foreach { r =>
      val len = r.getAs[Long]("span_len")
      // the span covers the shared text; windows touching at most the
      // flanking spaces can widen it by <= 2 chars total
      assert(len >= shared.length && len <= shared.length + 2,
        s"span_len=$len expected ~${shared.length}")
      assert(r.getAs[Long]("span_end") -
        r.getAs[Long]("span_start") == len)
    }
  }

  test("substringSpans drops shared runs shorter than minSpan") {
    val short = shared.take(50) // >= gram(40) but < minSpan(60)
    val docs = Seq(
      (1L, pad(80, 'a') + " " + short + " " + pad(80, 'b')),
      (2L, pad(80, 'c') + " " + short + " " + pad(80, 'd')))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(docs).count() == 0)
    // same corpus, minSpan lowered to the run length → both docs report
    assert(Dedup.substringSpans(docs, minSpan = 40).count() == 2)
  }

  test("substringSpans: distinct copied regions stay separate spans") {
    val s2 = "pack my box with five dozen liquor jugs and then take the " +
      "empty crate back to the cellar before anyone even notices it"
    val docs = Seq(
      (1L, shared + " " + pad(100, 'x') + " " + s2),
      (2L, s2 + " " + pad(100, 'y') + " " + shared))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs).collect()
    assert(spans.length == 4, spans.mkString("; "))
    assert(spans.groupBy(_.getLong(0)).forall(_._2.length == 2))
  }

  test("substringSpans maxDf cap drops boilerplate windows") {
    val docs = (1L to 6L).map(i => (i, shared + " " + pad(60, ('a' + i.toInt).toChar)))
      .toDF("doc_id", "text")
    // df of the shared windows is 6 > maxDf=5 → boilerplate, no spans
    assert(Dedup.substringSpans(docs, maxDf = 5).count() == 0)
    assert(Dedup.substringSpans(docs, maxDf = 6).count() == 6)
  }

  test("duplicatedMass: per-source ppm of covered characters") {
    val docs = Seq(
      (1L, pad(50, 'a') + " " + shared + " " + pad(50, 'b'), "web"),
      (2L, pad(50, 'c') + " " + shared + " " + pad(50, 'd'), "web"),
      (3L, pad(200, 'e'), "books"))
      .toDF("doc_id", "text", "source")
    val m = Dedup.duplicatedMass(docs).orderBy("source").collect()
    assert(m.length == 2)
    val books = m(0); val web = m(1)
    assert(books.getAs[String]("source") == "books")
    assert(books.getAs[Long]("n_docs_with_spans") == 0L)
    assert(books.getAs[Long]("covered_chars") == 0L)
    assert(books.getAs[Long]("dup_mass_ppm") == 0L)
    assert(web.getAs[Long]("n_docs") == 2L)
    assert(web.getAs[Long]("n_docs_with_spans") == 2L)
    val covered = web.getAs[Long]("covered_chars")
    val total = web.getAs[Long]("total_chars")
    assert(covered >= 2L * shared.length &&
      covered <= 2L * (shared.length + 2))
    assert(web.getAs[Long]("dup_mass_ppm") ==
      math.round(1e6 * covered / total.toDouble))
  }

  test("removeSpans performs char-exact surgery and passes clean docs through") {
    val d1 = pad(50, 'a') + " " + shared + " " + pad(50, 'b')
    val d2 = pad(50, 'c') + " " + shared + " " + pad(50, 'd')
    val d3 = pad(200, 'e')
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs)
    val out = Dedup.removeSpans(docs, spans).orderBy("doc_id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 3: untouched — md5 of its normalized text, zero counts
    assert(byId(3L).getAs[Long]("n_spans_removed") == 0L)
    assert(byId(3L).getAs[Long]("removed_chars") == 0L)
    assert(byId(3L).getAs[Long]("cleaned_len") == d3.length.toLong)
    val md5d3 = java.security.MessageDigest.getInstance("MD5")
      .digest(d3.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(3L).getAs[String]("cleaned_md5") == md5d3)
    // docs 1/2: the span (shared + both flanking spaces) is cut; the
    // cleaned text is exactly the two pads glued together
    Seq(1L -> ("a", "b"), 2L -> ("c", "d")).foreach { case (id, (l, r)) =>
      val row = byId(id)
      assert(row.getAs[Long]("n_spans_removed") == 1L)
      val expectCleaned = pad(50, l.head) + pad(50, r.head)
      assert(row.getAs[Long]("removed_chars") ==
        (shared.length + 2).toLong)
      assert(row.getAs[Long]("cleaned_len") == expectCleaned.length)
      val md5c = java.security.MessageDigest.getInstance("MD5")
        .digest(expectCleaned.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(row.getAs[String]("cleaned_md5") == md5c,
        s"doc $id cleaned text mismatch")
    }
  }

  test("removeSpans: a fully-covered doc cleans to the empty string") {
    // two identical docs — every window shared, the span is the doc
    val txt = shared + " " + shared // 241 chars, > gram
    val docs = Seq((1L, txt), (2L, txt)).toDF("doc_id", "text")
    val out = Dedup.removeSpans(docs, Dedup.substringSpans(docs))
      .orderBy("doc_id").collect()
    val md5empty = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    out.foreach { r =>
      assert(r.getAs[Long]("cleaned_len") == 0L)
      assert(r.getAs[Long]("removed_chars") == txt.length.toLong)
      assert(r.getAs[String]("cleaned_md5") == md5empty)
    }
  }

  test("contaminationSpans reports only corpus text shared WITH the bench") {
    val s2 = "pack my box with five dozen liquor jugs and then take the " +
      "empty crate back to the cellar before anyone even notices it"
    val bench = Seq((100L, pad(30, 'q') + " " + shared))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // embeds the bench text → span
      (1L, pad(50, 'a') + " " + shared + " " + pad(50, 'b')),
      // shares s2 with doc 3 but NOT with the bench → no span
      (2L, pad(50, 'c') + " " + s2),
      (3L, pad(50, 'd') + " " + s2),
      (4L, pad(200, 'e')))
      .toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(corpus, bench).collect()
    assert(spans.length == 1, spans.mkString("; "))
    assert(spans.head.getLong(0) == 1L)
    val len = spans.head.getAs[Long]("span_len")
    assert(len >= shared.length && len <= shared.length + 2)
  }

  test("substringGate (per-row kernel) ≡ contaminationSpans (window chain)") {
    val s2 = "pack my box with five dozen liquor jugs and then take the " +
      "empty crate back to the cellar before anyone even notices it"
    val bench = Seq(
      (100L, pad(30, 'q') + " " + shared),
      (101L, s2)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, pad(50, 'a') + " " + shared + " " + pad(50, 'b')),
      (2L, shared + " " + pad(30, 'c') + " " + s2),
      (3L, pad(200, 'e'))).toDF("doc_id", "text")
    val benchHashes = graft.pipeline.TextAnalysis
      .fingerprintHashes(bench, gram = 40)
      .select("hash").distinct().collect().map(_.getLong(0)).toSet
    val viaGate = Dedup.substringGate(corpus, benchHashes)
      .orderBy("doc_id", "span_start").collect().map(_.toSeq)
    val viaBatch = Dedup.contaminationSpans(corpus, bench)
      .orderBy("doc_id", "span_start").collect().map(_.toSeq)
    assert(viaGate.nonEmpty && viaGate.toSeq == viaBatch.toSeq,
      s"gate=${viaGate.mkString(";")} batch=${viaBatch.mkString(";")}")
  }

  test("contaminationAttribution names the leaking bench doc, drops noise") {
    val s2 = "pack my box with five dozen liquor jugs and then take the " +
      "empty crate back to the cellar before anyone even notices it"
    val bench = Seq(
      (100L, pad(30, 'q') + " " + shared),
      (101L, pad(30, 'r') + " " + s2)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, pad(50, 'a') + " " + shared + " " + pad(50, 'b')),
      // shares s2 AND shared → two attribution rows
      (2L, s2 + " " + pad(30, 'c') + " " + shared),
      // exactly ONE 40-char window shared with bench 100 → noise, cut
      (3L, pad(60, 'd') + " " + shared.take(40) + " " + pad(60, 'e')),
      (4L, pad(200, 'f'))).toDF("doc_id", "text")
    def grams(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextAnalysis.fingerprintHashes(df, gram = 40)
    val rows = Dedup.contaminationAttribution(grams(corpus), grams(bench))
      .orderBy("doc_id", "bench_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L), (2L, 100L), (2L, 101L)), rows.mkString("; "))
    // doc 3's single window IS found at minGrams=1
    val loose = Dedup.contaminationAttribution(grams(corpus),
      grams(bench), minGrams = 1)
    assert(loose.filter(col("doc_id") === 3L).count() == 1)
  }

  test("substringSpansSampled: content-defined samples find the copied span") {
    // a LONG shared block so the 1/4-sampled stream still lands
    // several windows inside it
    val long = (shared + " ") * 4 // ~480 normalized chars (trailing space)
    val docs = Seq(
      (1L, pad(50, 'a') + " " + long + pad(50, 'b')),
      (2L, pad(50, 'c') + " " + long + pad(50, 'd')))
      .toDF("doc_id", "text")
    val grams = graft.pipeline.TextAnalysis
      .fingerprintHashes(docs, gram = 40)
    val exactRows = Dedup.substringSpansFromGrams(grams)
      .orderBy("doc_id").collect()
    val sampled = Dedup.substringSpansSampled(grams, sampleMod = 4)
      .orderBy("doc_id").collect()
    assert(sampled.nonEmpty, "sampled stream must still find the copy")
    // every sampled span sits INSIDE its doc's exact span (samples are
    // a subset of the shared windows, so coverage can only shrink)
    sampled.foreach { srow =>
      val e = exactRows.find(_.getLong(0) == srow.getLong(0)).get
      assert(srow.getAs[Long]("span_start") >=
        e.getAs[Long]("span_start"))
      assert(srow.getAs[Long]("span_end") <= e.getAs[Long]("span_end"))
      // and covers most of it (the block is long; sampling loses only
      // the edges)
      assert(srow.getAs[Long]("span_len") >=
        e.getAs[Long]("span_len") / 2)
    }
    // the sampled stream really is ~1/4 of the positions
    val total = grams.count()
    val kept = grams.filter(pmod(col("hash"), lit(4L)) === 0L).count()
    assert(kept < total / 2 && kept > total / 8,
      s"sampling rate off: $kept of $total")
  }

  test("canary inject → scan loop closes; manifest is derived, not stored") {
    import graft.pipeline.TextAnalysis
    val docs = (1L to 20L).map(i => (i, s"plain text of document $i"))
      .toDF("doc_id", "text")
    val injected = TextAnalysis.injectCanaries(docs, everyK = 5)
    val manifest = TextAnalysis.canaryManifest(docs, everyK = 5)
    val canaries = manifest.select("canary").collect().map(_.getString(0))
    assert(canaries.length == 4 && canaries.distinct.length == 4)
    val scan = TextAnalysis.canaryScan(injected, canaries.toSeq)
      .collect()
    scan.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 1L, r.toString)
    }
    // found exactly in its own doc
    val joined = TextAnalysis.canaryScan(injected, canaries.toSeq)
      .join(manifest, Seq("canary"))
      .filter(col("first_doc") === col("injected_doc"))
    assert(joined.count() == 4)
    // same (everyK, salt) ⇒ identical manifest on a fresh call
    assert(TextAnalysis.canaryManifest(docs, everyK = 5)
      .collect().toSet == manifest.collect().toSet)
    // uninjected corpus: every canary reports clean (0 hits, null doc)
    val clean = TextAnalysis.canaryScan(docs, canaries.toSeq).collect()
    assert(clean.forall(_.getAs[Long]("n_docs") == 0L))
  }

  test("embeddingOutliers flags the bottom tail per cell, not globally") {
    // two orthogonal unit centroids; cell 0 gets 10 members with
    // descending alignment, cell 1 gets 5 tight members
    val c0 = Array(1.0, 0.0); val c1 = Array(0.0, 1.0)
    val rows =
      (0 until 10).map { i =>
        val theta = 0.05 * i // increasing angle off c0, all < pi/4
        (i.toLong, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat))
      } ++ (10 until 15).map { i =>
        (i.toLong, Seq(0.01f * (i - 10), 1.0f))
      }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.embeddingOutliers(df, Array(c0, c1))
      .orderBy("vec_id").collect()
    assert(out.length == 15)
    val byCell = out.groupBy(_.getAs[Int]("cell"))
    assert(byCell(0).length == 10 && byCell(1).length == 5)
    // cell 0: exactly floor(10*0.1)=1 outlier — the farthest (vec 9)
    val flagged0 = byCell(0).filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged0.map(_.getLong(0)).toSeq == Seq(9L))
    // cell 1: floor(5*0.1)=0 — a global cutoff would have flagged here
    assert(!byCell(1).exists(_.getAs[Boolean]("is_outlier")))
    // rank 1 = least aligned member of the cell
    assert(byCell(0).minBy(_.getAs[Int]("cell_rank")).getLong(0) == 9L)
  }

  test("embeddingOutliers: zero vector scores cosine 0 and ranks first") {
    val c0 = Array(1.0, 0.0)
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingOutliers(df, Array(c0))
      .orderBy("vec_id").collect()
    val zero = out.find(_.getLong(0) == 1L).get
    assert(zero.getAs[Double]("cos_centroid") == 0.0)
    assert(zero.getAs[Int]("cell_rank") == 1)
  }
}
