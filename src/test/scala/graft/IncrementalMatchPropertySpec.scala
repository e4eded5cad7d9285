package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Randomized equality harness for the round-12 single-join rewrite of
 *  the incremental near-dup match: across random corpora with planted
 *  duplicate structure, (store ∪ slice) incremental matching must
 *  surface EXACTLY the full-recompute pairs that touch the slice —
 *  same ids, same est_jaccard values. */
class IncrementalMatchPropertySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Array.tabulate(300)(i => s"w$i")
    def doc(): String =
      (0 until 30 + rnd.nextInt(20)).map(_ =>
        vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0L until n.toLong).map(i => (i, doc()))
    // plant near-dups: every 5th doc gets a one-word-swapped clone of
    // an earlier doc (high jaccard), ids interleave store/slice sides
    base.map { case (i, t) =>
      if (i % 5 == 4) {
        val src = base((i - 4).toInt)._2.split(" ")
        (i, (src.dropRight(1) :+ s"swap$i").mkString(" "))
      } else (i, t)
    }
  }

  test("incremental match == full recompute restricted to slice pairs") {
    for (seed <- Seq(1, 7, 23)) {
      val docs = corpus(seed, 60).toDF("doc_id", "text")
      val cut = 45L
      val store = Dedup.minhashStoreCreate(
        docs.filter(col("doc_id") < cut), numBands = 32)
      val sliceSigs = Dedup.minhashSignatures(
        docs.filter(col("doc_id") >= cut), numBands = 32)
      val inc = Dedup.incrementalNearDuplicatesFromSignatures(
          store, sliceSigs, threshold = 0.7,
          maxBucketSize = Int.MaxValue)
        .select("id_a", "id_b", "est_jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // ground truth: full-corpus signature pairs, kept when touching
      // the slice; orientation normalized to (slice, other) with the
      // within-slice pairs ascending — the incremental contract
      val full = Dedup.nearDuplicatesMinhash(docs, numBands = 32,
          threshold = 0.7, maxBucketSize = Int.MaxValue)
        .select("id_a", "id_b", "est_jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => a >= cut || b >= cut }
        .map { case (a, b, j) =>
          if (a >= cut && b >= cut) (math.min(a, b), math.max(a, b), j)
          else if (a >= cut) (a, b, j)
          else (b, a, j)
        }
        .toSet
      assert(inc == full, s"seed=$seed inc=${inc.size} full=${full.size}")
      assert(inc.nonEmpty, s"seed=$seed fixture must plant slice dups")
    }
  }
}
