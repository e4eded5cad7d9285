package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Line-grain exact dedup (C4/RefinedWeb recipe): duplicate lines
 *  across docs drop except the globally-first occurrence; short lines
 *  and within-single-doc repeats survive; the manifest covers every
 *  doc with exact cleaned text hashes. */
class LineDedupSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val dupLine = "all rights reserved by the publisher"
  private val docs = Seq(
    // doc 0: unique body + the boilerplate line (canonical: first)
    (0L, s"alpha unique content line\n$dupLine\nbeta unique line"),
    // doc 1: boilerplate again (drops) + own text
    (1L, s"$dupLine\ngamma distinct content here"),
    // doc 2: boilerplate again with padding (trim-keyed: drops) and a
    // short dup line ("hi") that must survive the length gate
    (2L, s"  $dupLine  \nhi\ndelta content of doc two"),
    // doc 3: a line repeated WITHIN one doc only — df counts distinct
    // docs, so both copies survive
    (3L, "self repeated interior line\nself repeated interior line"),
    // doc 4: short "hi" again (short: survives), untouched otherwise
    (4L, "hi\nepsilon totally unique closing line")
  ).toDF("doc_id", "text")

  test("duplicateLines: dict has df, occurrences, canonical occurrence") {
    val dict = Dedup.duplicateLines(docs).collect()
    assert(dict.length == 1, "only the boilerplate line qualifies")
    val r = dict.head
    assert(r.getAs[Long]("df") == 3L)
    assert(r.getAs[Long]("n_occurrences") == 3L)
    assert(r.getAs[Long]("line_chars") == dupLine.length.toLong)
    assert(r.getAs[Long]("canon_doc") == 0L)
    assert(r.getAs[Long]("canon_line_idx") == 1L)
  }

  test("lineDedup: manifest covers all docs; only non-canonical dups cut") {
    val out = Dedup.lineDedup(docs).orderBy("doc_id").collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0 keeps its canonical copy
    assert(byId(0L).getAs[Long]("n_lines_removed") == 0L)
    assert(byId(0L).getAs[Long]("n_lines") == 3L)
    // doc 1 loses the boilerplate
    assert(byId(1L).getAs[Long]("n_lines_removed") == 1L)
    assert(byId(1L).getAs[Long]("removed_chars") == dupLine.length.toLong)
    // doc 2 loses the PADDED copy — removed_chars counts raw chars
    assert(byId(2L).getAs[Long]("n_lines_removed") == 1L)
    assert(byId(2L).getAs[Long]("removed_chars") ==
      dupLine.length.toLong + 4L)
    // docs 3 and 4 untouched (within-doc repeat, short lines)
    assert(byId(3L).getAs[Long]("n_lines_removed") == 0L)
    assert(byId(4L).getAs[Long]("n_lines_removed") == 0L)
    // cleaned text is exact: doc 1's surgery result hand-checked
    val expected1 = "gamma distinct content here"
    assert(byId(1L).getAs[Long]("cleaned_len") == expected1.length.toLong)
    assert(byId(1L).getAs[String]("cleaned_md5") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(expected1))
    // untouched docs hash to their original text
    val t3 = "self repeated interior line\nself repeated interior line"
    assert(byId(3L).getAs[String]("cleaned_md5") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t3))
  }

  test("minDf raises the bar; minLineChars gates what counts as a line") {
    // at minDf=4 nothing reaches the threshold → nothing removed
    val out = Dedup.lineDedup(docs, minDf = 4).agg(
      sum("n_lines_removed")).as[Long].head()
    assert(out == 0L)
    // at minLineChars=2 the duplicated "hi" becomes fair game: docs 2
    // and 4 share it → one of the two copies drops
    val hi = Dedup.lineDedup(docs, minLineChars = 2)
      .filter(col("doc_id").isin(2L, 4L))
      .agg(sum("n_lines_removed")).as[Long].head()
    assert(hi == 2L, "hi drops once + doc 2 boilerplate = 2 removals")
  }

  test("lineGate: dictionary cuts arrivals map-only, manifest exact") {
    val keys = Dedup.duplicateLines(docs).collect()
      .map(_.getAs[String]("line_md5")).toSet
    assert(keys.size == 1)
    val arrivals = Seq(
      (100L, s"fresh opening line of text\n$dupLine"), // one cut
      (101L, s"   $dupLine   "),                       // all cut (trim key)
      (102L, "hi\nnothing duplicated here at all")     // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.lineGate(arrivals, keys).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_lines_removed") == 1L)
    assert(out(0).getAs[Long]("removed_chars") == dupLine.length.toLong)
    assert(out(0).getAs[String]("cleaned_md5") ==
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex("fresh opening line of text"))
    assert(out(1).getAs[Long]("n_lines") == 1L)
    assert(out(1).getAs[Long]("n_lines_removed") == 1L)
    assert(out(1).getAs[Long]("removed_chars") == dupLine.length.toLong + 6L)
    assert(out(1).getAs[Long]("cleaned_len") == 0L)
    assert(out(2).getAs[Long]("n_lines_removed") == 0L)
    assert(out(2).getAs[String]("cleaned_md5") ==
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex("hi\nnothing duplicated here at all"))
  }

  test("lineGate: SQL-trim key parity (tabs/CR survive) and null text") {
    val keys = Dedup.duplicateLines(docs).collect()
      .map(_.getAs[String]("line_md5")).toSet
    val arrivals = Seq(
      // tab-padded: SQL trim strips ONLY spaces, so the batch side
      // would key this line WITH the tab — not the dictionary key.
      // A Java .trim gate would wrongly strip it and cut the line.
      (200L, s"\t$dupLine"),
      (201L, s"$dupLine\r"),          // CR-padded: same story
      (202L, s" \t$dupLine"),         // space+tab: spaces strip, tab stays
      (203L, s"  $dupLine  "),        // spaces only: still cut
      (204L, null.asInstanceOf[String]) // degenerate row: no NPE
    ).toDF("doc_id", "text")
    val out = Dedup.lineGate(arrivals, keys).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_lines_removed") == 0L,
      "tab-padded line keys differently under SQL trim — must survive")
    assert(out(1).getAs[Long]("n_lines_removed") == 0L,
      "CR-padded line keys differently under SQL trim — must survive")
    assert(out(2).getAs[Long]("n_lines_removed") == 0L)
    assert(out(3).getAs[Long]("n_lines_removed") == 1L,
      "space-padded duplicate still cut")
    // null text: 1 empty line, nothing removed, empty cleaned hash
    assert(out(4).getAs[Long]("n_lines") == 1L)
    assert(out(4).getAs[Long]("n_lines_removed") == 0L)
    assert(out(4).getAs[Long]("cleaned_len") == 0L)
    assert(out(4).getAs[String]("cleaned_md5") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
  }

  test("order-key encoding bound is enforced, not assumed") {
    // a negative doc id would silently corrupt canonical-occurrence
    // selection under doc*1e6+idx — the encoder must fail the task
    val bad = Seq(
      (-1L, "a long enough duplicated line here"),
      (7L, "a long enough duplicated line here")).toDF("doc_id", "text")
    val ex = intercept[Exception] { Dedup.duplicateLines(bad).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("order-key bound violated")),
      s"expected the raise_error bound message, got: ${messages(ex)}")
  }

  test("all-lines-removed doc degrades to empty cleaned text") {
    val d2 = Seq(
      (10L, "the only line present here"),
      (11L, "the only line present here")).toDF("doc_id", "text")
    val r = Dedup.lineDedup(d2).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_lines_removed") == 0L)
    assert(r(1).getAs[Long]("n_lines_removed") == 1L)
    assert(r(1).getAs[Long]("cleaned_len") == 0L)
    assert(r(1).getAs[String]("cleaned_md5") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
  }
}

/** Randomized replay: the whole line-dedup family against a driver-side
 *  reference implementation on corpora with adversarial padding (spaces
 *  that SQL trim strips, tabs/CRs it must NOT strip). */
class LineDedupPropertySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def trimSpaces(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }
  private def md5(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  test("lineDedup manifest equals a driver-side replay on random corpora") {
    val rnd = new scala.util.Random(1313)
    val pool = Seq(
      "all rights reserved by the publisher",
      "subscribe to our newsletter today",
      "terms and conditions apply everywhere",
      "short", "hi", "",
      "cookie policy applies to this site",
      "unique filler sentence number one",
      "unique filler sentence number two")
    def pad(s: String): String = rnd.nextInt(5) match {
      case 0 => "  " + s
      case 1 => s + "  "
      case 2 => "\t" + s     // survives SQL trim: distinct key
      case 3 => s + "\r"     // survives SQL trim: distinct key
      case _ => s
    }
    val docs = (0 until 40).map { id =>
      val n = 1 + rnd.nextInt(6)
      (id.toLong, Seq.fill(n)(pad(pool(rnd.nextInt(pool.size))))
        .mkString("\n"))
    }
    val minChars = 15; val minDf = 2
    // driver-side reference
    val keyed = docs.flatMap { case (id, text) =>
      text.split("\n", -1).zipWithIndex.map { case (l, i) =>
        val t = trimSpaces(l)
        val key = if (t.length >= minChars) Some(md5(t)) else None
        (id, i, l, key, id * 1000000L + i)
      }
    }
    val byKey = keyed.collect { case (id, i, l, Some(k), enc) =>
      (k, id, i, l, enc) }.groupBy(_._1)
    val dict = byKey.filter { case (_, occ) =>
      occ.map(_._2).distinct.size >= minDf }
    val canon = dict.map { case (k, occ) => k -> occ.map(_._5).min }
    val expected = docs.map { case (id, text) =>
      val lines = text.split("\n", -1)
      val drops = lines.zipWithIndex.filter { case (l, i) =>
        val t = trimSpaces(l)
        t.length >= minChars && canon.get(md5(t))
          .exists(_ != id * 1000000L + i)
      }.map(_._2).toSet
      val cleaned = lines.zipWithIndex
        .filterNot(p => drops(p._2)).map(_._1).mkString("\n")
      (id, lines.length.toLong, drops.size.toLong,
        drops.toSeq.map(i => lines(i).length.toLong).sum,
        cleaned.length.toLong, md5(cleaned))
    }.sortBy(_._1)
    val got = Dedup.lineDedup(docs.toDF("doc_id", "text"),
        minLineChars = minChars, minDf = minDf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.toSeq == expected,
      "Spark lineDedup must equal the driver-side replay")
    // and the dictionary's df/canon agree
    val gotDict = Dedup.duplicateLines(docs.toDF("doc_id", "text"),
        minLineChars = minChars, minDf = minDf).collect()
      .map(r => r.getAs[String]("line_md5") ->
        (r.getAs[Long]("df"),
          r.getAs[Long]("canon_doc") * 1000000L +
            r.getAs[Long]("canon_line_idx"))).toMap
    assert(gotDict.keySet == dict.keySet)
    dict.foreach { case (k, occ) =>
      assert(gotDict(k)._1 == occ.map(_._2).distinct.size.toLong)
      assert(gotDict(k)._2 == canon(k))
    }
    // the gate judged against the batch dictionary replays exactly too
    val gateGot = Dedup.lineGate(docs.toDF("doc_id", "text"),
        gotDict.keySet, minLineChars = minChars)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gateExp = docs.map { case (id, text) =>
      val lines = text.split("\n", -1)
      val cut = lines.filter { l =>
        val t = trimSpaces(l)
        t.length >= minChars && dict.contains(md5(t))
      }
      (id, lines.length.toLong, cut.length.toLong,
        cut.map(_.length.toLong).sum)
    }.sortBy(_._1)
    assert(gateGot.toSeq == gateExp)
  }
}
