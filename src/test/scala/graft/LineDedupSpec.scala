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
