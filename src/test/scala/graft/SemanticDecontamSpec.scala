package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** Semantic decontamination: the embedding-space leg that catches
 *  paraphrase-shaped eval leaks the n-gram legs cannot see. */
class SemanticDecontamSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    // independent gaussian directions: cross-seed cosine ~ N(0, 1/64),
    // so unrelated vectors never approach the 0.95 gate (a sin-wave
    // fixture correlated across seeds and false-flagged)
    val rnd = new java.util.Random(seed)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }

  test("flags corpus items near a benchmark item; misses the far ones") {
    val corpus = (0 until 40).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    // bench = derivative of corpus #7 (identical → cosine 1.0) plus a
    // vector unrelated to everything
    val bench = Seq(
      (1000007L, vec(7)),
      (1999999L, vec(4242))).toDF("vec_id", "embedding")
    val hits = Similarity.semanticDecontaminate(corpus, bench,
        threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((7L, 1000007L)), "the leaked item must surface")
    assert(hits.forall(_._1 == 7L),
      s"unrelated corpus items must not flag: $hits")
  }

  test("candidates are cross-corpus only: a duplicated corpus never " +
      "pairs with itself") {
    val corpus = (0 until 10).map(i => (i.toLong, vec(1)))
      .toDF("vec_id", "embedding") // 10 identical corpus vectors
    val bench = Seq((5000L, vec(9999))).toDF("vec_id", "embedding")
    // identical corpus vectors would explode a self-join; the
    // cross-corpus contract returns nothing here
    assert(Similarity.semanticDecontaminate(corpus, bench,
      threshold = 0.5).count() == 0)
  }

  test("null embeddings on either side are ignored, not NPE") {
    val corpus = Seq((1L, vec(3)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val bench = Seq((900L, vec(3)),
      (901L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val hits = Similarity.semanticDecontaminate(corpus, bench, 0.99)
      .collect()
    assert(hits.length == 1 && hits.head.getLong(0) == 1L)
  }
}

/** The streaming gate must be the JOIN form's exact twin. */
class SemanticGateSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.pipeline.Similarity

  private def vec(seed: Int): Array[Float] = {
    val rnd = new java.util.Random(seed)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }

  test("semanticGate == semanticDecontaminate on the same inputs") {
    val corpus = (0 until 60).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val bench = Seq((1000011L, vec(11)), (1000042L, vec(42)),
      (1999999L, vec(777777))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col(df.columns.head), col("bench_id"),
        round(col("cosine"), 6))
      .collect().map(_.toString).toSeq.sorted
    val joinForm = Similarity.semanticDecontaminate(corpus, bench, 0.9)
    val gateForm = Similarity.semanticGate(corpus, bench, 0.9)
    assert(rows(joinForm) == rows(gateForm))
    assert(joinForm.count() == 2) // exactly the two planted leaks
  }

  test("semanticGate refuses an unbounded benchmark") {
    val corpus = Seq((1L, vec(1))).toDF("vec_id", "embedding")
    val bench = (0 until 5).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.semanticGate(corpus, bench, maxBench = 3)
    }
  }
}
