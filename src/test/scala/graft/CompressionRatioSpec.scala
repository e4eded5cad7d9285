package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Deflate compression ratio as a repetitiveness signal: templated
 *  text compresses far below varied prose; the ppm arithmetic is
 *  integer-exact from byte counts. */
class CompressionRatioSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("templated text compresses far below varied text; ppm exact") {
    val template = ("all rights reserved " * 200).trim
    val varied = (0 until 200)
      .map(i => s"sentence $i speaks of topic ${i * 37 % 91} uniquely")
      .mkString(" ")
    val docs = Seq((1L, template), (2L, varied), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(docs)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val tRatio = byId(1L).getAs[Long]("ratio_ppm")
    val vRatio = byId(2L).getAs[Long]("ratio_ppm")
    assert(tRatio < vRatio / 2,
      s"template $tRatio ppm should be far below varied $vRatio ppm")
    assert(tRatio < 150000L, "template trips the suspect threshold")
    // ppm is exactly compressed*1e6/raw from the row's own counts
    out.filter(_.getAs[Long]("n_bytes") > 0).foreach { r =>
      assert(r.getAs[Long]("ratio_ppm") ==
        r.getAs[Long]("n_compressed") * 1000000L / r.getAs[Long]("n_bytes"))
    }
    // empty and null texts degrade to zeros, not failures
    Seq(3L, 4L).foreach { id =>
      assert(byId(id).getAs[Long]("n_bytes") == 0L)
      assert(byId(id).getAs[Long]("ratio_ppm") == 0L)
    }
  }

  test("deterministic across runs and partitionings") {
    val docs = (0 until 64)
      .map(i => (i.toLong, s"doc $i " + ("na " * (i % 7 + 1))))
      .toDF("doc_id", "text")
    val a = TextAnalysis.compressionRatio(docs.repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.compressionRatio(docs.repartition(8))
      .orderBy("doc_id").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
