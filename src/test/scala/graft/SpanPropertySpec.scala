package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Randomized equality harness for the substring-span family: the
 *  Karp–Rabin + window-chain pipeline must agree with an INDEPENDENT
 *  brute-force oracle that never hashes — it marks a gram start as
 *  shared iff the literal 40-char window occurs in another doc's
 *  normalized text (string scan), then interval-unions in plain
 *  Scala. Catches hash-pipeline bugs AND (by construction) any KR
 *  collision that changes an answer. */
class SpanPropertySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val gram = 40
  private val minSpan = 60

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ")

  /** Brute-force spans: literal substring containment, no hashing. */
  private def bruteSpans(
      docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long)]] = {
    val normed = docs.map { case (id, t) => id -> norm(t) }
    normed.flatMap { case (id, t) =>
      if (t.length < gram) None
      else {
        val others = normed.filter(_._1 != id).map(_._2)
        val sharedStarts = (0 to t.length - gram).filter { p =>
          val w = t.substring(p, p + gram)
          others.exists(_.contains(w))
        }
        // interval union of [p, p+gram)
        val spans = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long)]
        var curS = -1L; var curE = -1L
        sharedStarts.foreach { p =>
          if (curS < 0) { curS = p; curE = p + gram }
          else if (p <= curE) { curE = math.max(curE, p + gram) }
          else { spans += ((curS, curE)); curS = p; curE = p + gram }
        }
        if (curS >= 0) spans += ((curS, curE))
        val kept = spans.filter(s => s._2 - s._1 >= minSpan).toSeq
        if (kept.isEmpty) None else Some(id -> kept)
      }
    }.toMap
  }

  test("substringSpans ≡ literal-containment brute force on random corpora") {
    val rnd = new scala.util.Random(20260815L)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    (1 to 5).foreach { round =>
      // a few shared blocks planted into random positions of random docs
      val blocks = Seq.fill(3)(sentence(25 + rnd.nextInt(15)))
      val docs = (1L to 12L).map { id =>
        val base = sentence(30 + rnd.nextInt(30))
        // ~half the docs embed 1-2 shared blocks at random word joints
        val t =
          if (rnd.nextBoolean()) {
            val b = blocks(rnd.nextInt(blocks.size))
            val extra = if (rnd.nextInt(3) == 0)
              " " + blocks(rnd.nextInt(blocks.size)) else ""
            base + " " + b + extra + " " + sentence(5 + rnd.nextInt(10))
          } else base
        (id, t)
      }
      val expected = bruteSpans(docs)
      val got = Dedup.substringSpans(docs.toDF("doc_id", "text"))
        .orderBy("doc_id", "span_start").collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) =>
          id -> rows.map(r => (r.getAs[Long]("span_start"),
            r.getAs[Long]("span_end"))).toSeq }
      assert(got == expected,
        s"round $round mismatch:\n got=$got\n exp=$expected\n docs=$docs")
    }
  }

  test("removeSpans surgery ≡ brute-force string surgery") {
    val rnd = new scala.util.Random(77L)
    val words = Vector("mercury", "venus", "terra", "mars", "ceres",
      "jupiter", "saturn", "uranus", "neptune", "pluto")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val block = sentence(30)
    val docs = (1L to 8L).map { id =>
      val t =
        if (id % 2 == 0) sentence(20) + " " + block + " " + sentence(8)
        else sentence(35)
      (id, t)
    }
    val df = docs.toDF("doc_id", "text")
    val expectedSpans = bruteSpans(docs)
    val out = Dedup.removeSpans(df, Dedup.substringSpans(df))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val t = norm(docs.find(_._1 == id).get._2)
      val spans = expectedSpans.getOrElse(id, Seq.empty)
      val sb = new StringBuilder
      var cursor = 0L
      spans.foreach { case (s, e) =>
        sb.append(t.substring(cursor.toInt, s.toInt)); cursor = e }
      sb.append(t.substring(cursor.toInt))
      val cleaned = sb.toString
      assert(r.getAs[Long]("cleaned_len") == cleaned.length.toLong)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("cleaned_md5") == md5, s"doc $id surgery")
      assert(r.getAs[Long]("removed_chars") ==
        spans.map(s => s._2 - s._1).sum)
    }
  }
}
