package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, TextAnalysis}

/** Round-13 additions: dedup cluster-size distribution and
 *  token-budget truncation. */
class Round13Spec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("clusterSizeProfile: exact histogram over hand-built clusters") {
    // clusters: {1,2} {3,4} {5,6,7} {8} -> sizes 1x1, 2x2, 3x1
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L),
      (5L, 5L), (6L, 5L), (7L, 5L), (8L, 8L)
    ).toDF("doc_id", "cluster_id")
    val got = Dedup.clusterSizeProfile(clusters)
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 0L),   // one singleton: nothing removed
      (2L, 2L, 4L, 2L),   // two pairs: one removed each
      (3L, 1L, 3L, 2L)))  // one triple: two removed
    // removal mass identity: sum(n_removed) = docs - clusters
    assert(got.map(_._4).sum == 8L - 4L)
  }

  test("truncateToTokenBudget: exact-fit, over, under, empty") {
    val docs = Seq(
      (1L, "a b c d"),          // one over budget: bites
      (2L, "a b c"),            // exact fit: no bite
      (3L, "a b c d e f"),      // well over: bites
      (4L, ""),                 // empty: 0 tokens, md5("")
      (5L, "  x \t y\nz  ")     // messy whitespace collapses
    ).toDF("doc_id", "text")
    val out = TextAnalysis.truncateToTokenBudget(docs, maxTokens = 3)
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getBoolean(2),
      out(i).getLong(3), out(i).getLong(4), out(i).getString(5))
    assert(row(0) == ((4L, true, 3L, 5L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("a b c"))))
    assert(row(1) == ((3L, false, 3L, 5L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("a b c"))))
    assert(row(2)._1 == 6L && row(2)._2 && row(2)._3 == 3L)
    assert(row(3) == ((0L, false, 0L, 0L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(""))))
    // tabs/newlines/multi-spaces all split; re-serialized single-space
    assert(row(4) == ((3L, false, 3L, 5L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("x y z"))))
  }

  test("truncateToTokenBudget properties over random corpora") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(20)
      val toks = Seq.fill(n)(
        ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5)))
      (i.toLong, toks.mkString(if (rnd.nextBoolean()) " " else "\t"))
    }.toDF("doc_id", "text")
    val budget = 8
    // driver-side recomputation of the exact expected manifest
    val source = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.truncateToTokenBudget(docs, budget).collect()
    out.foreach { r =>
      val (id, n, bit, kept, chars) = (r.getLong(0), r.getLong(1),
        r.getBoolean(2), r.getLong(3), r.getLong(4))
      val toks = source(id).split("\\s+").filter(_.nonEmpty)
      val keptToks = toks.take(budget)
      assert(n == toks.length.toLong)
      assert(kept == math.min(n, budget.toLong))
      assert(bit == (n > budget))
      assert(chars == keptToks.mkString(" ").length.toLong,
        "kept_chars = token lengths + single-space separators, exactly")
      assert(r.getString(5) == org.apache.commons.codec.digest
        .DigestUtils.md5Hex(keptToks.mkString(" ")))
    }
    // idempotence: truncating the truncated text changes nothing
    val trunc = docs.select(col("doc_id"),
      array_join(slice(filter(split(col("text"), "\\s+"),
        t => length(t) > 0), 1, budget), " ").as("text"))
    val again = TextAnalysis.truncateToTokenBudget(trunc, budget)
      .select("doc_id", "trunc_md5").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r =>
      assert(again(r.getLong(0)) == r.getString(5), "idempotent"))
  }

  test("ingest of a perfectly clean slice reports zero drops, no crash") {
    // regression (found by the r13 sf0.001 sweep): a slice with ZERO
    // near-dup drops made AQE rewrite the left-anti join to its left
    // side, pruning the Observation the report read — the happy path
    // threw `key not found`. The count now rides the materialized root.
    import graft.pipeline.{Curation, Dedup}
    val dir = java.nio.file.Files.createTempDirectory("r13clean").toString
    val standing = (0 until 20).map(i =>
      (i.toLong, s"standing corpus document number $i with plenty of " +
        s"distinct filler words alpha$i beta$i gamma$i delta$i " +
        s"epsilon$i zeta$i eta$i theta$i")).toDF("doc_id", "text")
    Dedup.minhashStoreSave(Dedup.minhashStoreCreate(standing),
      s"$dir/mh")
    // arrivals are entirely novel: no exact dups, no near dups
    val arrivals = (100 until 110).map(i =>
      (i.toLong, s"completely novel arrival text $i about different " +
        s"topics entirely omega$i psi$i chi$i phi$i upsilon$i tau$i " +
        s"sigma$i rho$i")).toDF("doc_id", "text")
    val (kept, rep) = Curation.incrementalIngest(arrivals, s"$dir/mh")
    assert(rep.arrived == 10L)
    assert(rep.droppedNearDup == 0L, "clean slice: zero near-dup drops")
    assert(rep.kept == rep.afterQuality - rep.droppedExactWithin)
    assert(kept.count() == rep.kept)
  }

  test("ingest of an all-garbage slice (nothing passes the gate) survives") {
    import graft.pipeline.{Curation, Dedup}
    val dir = java.nio.file.Files.createTempDirectory("r13junk").toString
    val standing = (0 until 10).map(i =>
      (i.toLong, s"standing corpus document number $i with plenty of " +
        s"distinct filler words alpha$i beta$i gamma$i")).toDF(
      "doc_id", "text")
    Dedup.minhashStoreSave(Dedup.minhashStoreCreate(standing),
      s"$dir/mh")
    // every arrival fails the quality gate (too short)
    val junk = (100 until 105).map(i => (i.toLong, "tiny"))
      .toDF("doc_id", "text")
    val (kept, rep) = Curation.incrementalIngest(junk, s"$dir/mh")
    assert(rep.arrived == 5L)
    assert(rep.afterQuality == 0L)
    assert(rep.kept == 0L && rep.droppedNearDup == 0L)
    assert(kept.count() == 0L)
  }

  test("degenerate inputs: null-text truncation, empty corpora, tiny IVF") {
    import graft.pipeline.{Dedup, Similarity}
    // null text truncates to the empty document, no null propagation
    val nullRow = TextAnalysis.truncateToTokenBudget(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), 4)
      .collect()(0)
    assert(nullRow.getLong(1) == 0L && !nullRow.getBoolean(2))
    assert(nullRow.getString(5) ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
    // the full dedup stack on an empty and a 1-doc corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.dedupCorpus(empty).count() == 0L)
    val one = Seq((1L, "a single lonely document with words"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupCorpus(one).count() == 1L)
    assert(Dedup.clusterSizeProfile(
      empty.select(col("doc_id"), col("doc_id").as("cluster_id")))
      .count() == 0L)
    // near-dup embeddings over an empty frame
    val eEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.nearDuplicateEmbeddings(eEmb).count() == 0L)
    // IVF with fewer vectors than centroids must still build and probe
    val rnd = new scala.util.Random(7)
    val tiny = (0L until 5L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val idx = Similarity.ivfBuild(tiny, k = 16)
    val res = Similarity.ivfTopK(idx, tiny.filter(col("vec_id") === 0L),
      k = 3, nprobe = 4)
    assert(res.count() > 0L, "tiny corpus still answers queries")
  }

  test("truncateToTokenBudget plan shape: pruned scan, no shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = TextAnalysis.truncateToTokenBudget(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("doc_id") && plan.contains("text"))
    // the documents table carries more columns (source, lang,
    // n_chars...) — none may reach the scan
    assert(!plan.contains("ReadSchema: struct<doc_id:bigint,text:string,"),
      "scan schema must stop at doc_id+text")
    assert(plan.contains("struct<doc_id:bigint,text:string>"),
      s"scan must prune to exactly (doc_id, text): $plan")
    assert(!plan.contains("Exchange"),
      "token truncation is map-only — a shuffle is a plan bug")
  }

  test("clusterSizeProfile: removal-mass identity on random clusterings") {
    val rnd = new scala.util.Random(131)
    val rows = (0 until 500).map(i => (i.toLong, rnd.nextInt(120).toLong))
    val clusters = rows.toDF("doc_id", "cluster_id")
    val prof = Dedup.clusterSizeProfile(clusters).collect()
    val nClusters = rows.map(_._2).distinct.size.toLong
    assert(prof.map(_.getLong(2)).sum == 500L, "every doc counted once")
    assert(prof.map(_.getLong(1)).sum == nClusters)
    assert(prof.map(_.getLong(3)).sum == 500L - nClusters,
      "keep-min removes docs - clusters")
  }
}
