package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Privacy, Sampling}

/** Round-14 additions: rendezvous sharding, t-closeness, and
 *  content-defined chunking. */
class Round14Spec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // ---- rendezvous sharding ----------------------------------------

  test("rendezvousChurn: movers all land on the new shard, ~1/(S+1) mass") {
    val docs = spark.range(2000).toDF("doc_id")
    val churn = Sampling.rendezvousChurn(docs, "doc_id",
      fromShards = 8, toShards = 9).collect()
    val moved = churn.filter(_.getAs[Boolean]("moved"))
    // the HRW invariant: adding shard 8 only ever WINS keys — no key
    // changes its winner among the original 8 (their hashes didn't
    // change), so every off-diagonal row has shard_to = 8
    assert(moved.nonEmpty)
    assert(moved.forall(_.getAs[Int]("shard_to") == 8))
    val movedN = moved.map(_.getAs[Long]("n_docs")).sum
    val total = churn.map(_.getAs[Long]("n_docs")).sum
    assert(total == 2000L)
    // expected 1/9 ≈ 222 of 2000; allow generous binomial slack
    assert(movedN > 120 && movedN < 340,
      s"moved $movedN of $total — expected ~1/9")
  }

  test("rendezvousAssign: deterministic and balanced; mod-N contrast") {
    val docs = spark.range(2000).toDF("doc_id")
    val a1 = Sampling.rendezvousAssign(docs, "doc_id", 8)
      .groupBy("shard").count().orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val a2 = Sampling.rendezvousAssign(docs, "doc_id", 8)
      .groupBy("shard").count().orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(a1.toSeq == a2.toSeq) // same hashes every evaluation
    assert(a1.length == 8)
    // balance: each shard within 2x of the 250 mean (md5 is uniform)
    assert(a1.forall { case (_, n) => n > 125 && n < 500 })
    // the contrast that motivates HRW: mod-N resharding 8 -> 9 moves
    // the overwhelming majority of keys (~8/9), not 1/9
    val modMoved = docs
      .withColumn("from", pmod(col("doc_id"), lit(8)))
      .withColumn("to", pmod(col("doc_id"), lit(9)))
      .filter(col("from") =!= col("to")).count()
    assert(modMoved > 1500L, s"mod-N moved only $modMoved of 2000")
  }

  // ---- t-closeness ------------------------------------------------

  test("tClosenessViolations: hand-computed EMD on a crafted skew") {
    // 2 buckets, class A all-bucket-0 (4 rows), class B mirrors the
    // global mix (4 rows of each) -> global: 8x b0, 4x b1, G=12
    val rows = Seq.fill(4)(("A", 0)) ++
      Seq.fill(4)(("B", 0)) ++ Seq.fill(4)(("B", 1))
    val df = rows.toDF("grp", "bk")
    val out = Privacy.tClosenessViolations(
      df, Seq("grp"), "bk", numBuckets = 2, tPpm = 100000L)
    val got = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    // class A (C=4, cum c0=4, global cum g0=8, G=12, m-1=1):
    //   num = |4*12 - 8*4| = 16 -> 16e6 div 48 = 333333 ppm
    // class B (C=8, cum c0=4):
    //   num = |4*12 - 8*8| = 16 -> 16e6 div 96 = 166666 ppm
    // both above the 100000 floor; ordered emd desc
    assert(got.toSeq == Seq(
      ("A", 4L, 333333L),
      ("B", 8L, 166666L)))
  }

  test("tClosenessViolations: a mirrored table has zero violations") {
    // every class carries exactly the global mix -> EMD 0 everywhere
    val rows = for {
      g <- Seq("A", "B", "C"); b <- 0 until 3; _ <- 0 until 5
    } yield (g, b)
    val df = rows.toDF("grp", "bk")
    assert(Privacy.tClosenessViolations(
      df, Seq("grp"), "bk", numBuckets = 3, tPpm = 0L).count() == 0L)
  }

  // ---- content-defined chunking -----------------------------------

  private def chunksOf(s: String) =
    Dedup.cdcChunkBytes(s.getBytes("UTF-8"), 8, 64, 15L)

  test("cdcChunkBytes: bounds, reconstruction, byte-exact md5") {
    val text = (1 to 40).map(i => s"word$i segment$i").mkString(" ")
    val cs = chunksOf(text)
    val bytes = text.getBytes("UTF-8")
    assert(cs.nonEmpty)
    // chunks tile the byte range exactly, in order
    assert(cs.head.start == 0)
    assert(cs.map(c => (c.start, c.len)).sliding(2).forall {
      case Seq((s1, l1), (s2, _)) => s1 + l1 == s2
      case _                      => true
    })
    assert(cs.last.start + cs.last.len == bytes.length)
    // every chunk except the final one respects [min, max]
    assert(cs.init.forall(c => c.len >= 8 && c.len <= 64))
    assert(cs.last.len <= 64)
    // md5s are the md5 of the actual chunk bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    cs.foreach { c =>
      val dig = md.digest(
        java.util.Arrays.copyOfRange(bytes, c.start, c.start + c.len))
      assert(dig.map("%02x".format(_)).mkString == c.chunk_md5)
      md.reset()
    }
  }

  test("cdcChunkBytes: insertion re-synchronizes within ~one chunk") {
    val text = (1 to 60).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val orig = chunksOf(text).map(_.chunk_md5)
    val shifted = chunksOf("XYZ " + text).map(_.chunk_md5)
    // fixed-width chunking would share ZERO chunks after a 4-byte
    // shift; content-defined cuts re-sync, so most survive
    val shared = orig.toSet.intersect(shifted.toSet).size
    assert(shared >= orig.size / 2,
      s"only $shared of ${orig.size} chunks survived a prefix insert")
  }

  test("cdcChunks + cdcDedupStats: dup pricing on a planted duplicate") {
    val common = (1 to 30).map(i => s"shared$i boiler$i").mkString(" ")
    val docs = Seq(
      (1L, common + " tail one", "s1"),
      (2L, common + " tail two", "s1"),
      (3L, "totally different content here " * 10, "s2"),
      (4L, null.asInstanceOf[String], "s2") // degrades to 0 chunks
    ).toDF("doc_id", "text", "source")
    val chunks = Dedup.cdcChunks(docs, minSize = 8, maxSize = 64,
      maskBits = 4)
    val stats = Dedup.cdcDedupStats(docs, chunks).collect()
      .map(r => r.getString(0) -> r).toMap
    // s1's two docs share the long common prefix -> real dup bytes
    val s1 = stats("s1")
    assert(s1.getAs[Long]("dup_bytes") > 0L)
    assert(s1.getAs[Long]("n_chunks") > s1.getAs[Long]("n_unique_chunks"))
    // s2: one unique doc (the null doc contributes nothing)
    val s2 = stats("s2")
    assert(s2.getAs[Long]("dup_bytes") >= 0L)
    assert(chunks.filter(col("doc_id") === 4L).count() == 0L)
    // total bytes accounting: sum of chunk lens = utf-8 lengths
    val total = chunks.agg(sum("len")).head.getLong(0)
    val expected = docs.filter(col("text").isNotNull)
      .select(sum(length(col("text")))).head.getLong(0)
    assert(total == expected) // ASCII fixtures: chars == bytes
  }
}
