package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusDiff

/** Round-14 batch 2: bucketed co-located joins and the corpus
 *  snapshot diff. */
class Round14bSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("bucketed co-located join plans with ZERO exchanges") {
    val dir = java.nio.file.Files
      .createTempDirectory("r14b_bucket").toString
    val li = spark.range(1000)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    val ord = spark.range(500)
      .select(col("id").as("k2"), (col("id") % 3).as("p"))
    li.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/a").saveAsTable("r14b_bucket_a")
    ord.write.mode("overwrite").bucketBy(4, "k2").sortBy("k2")
      .option("path", s"$dir/b").saveAsTable("r14b_bucket_b")
    // merge hint: at this fixture size the planner would broadcast the
    // 500-row side (disabling bucketed reads); the shape under test is
    // the big-big join, where sort-merge is the only choice
    val j = spark.table("r14b_bucket_a").hint("merge")
      .join(spark.table("r14b_bucket_b"), col("k") === col("k2"))
    val plan = j.queryExecution.executedPlan.toString
    // the whole point of bucketing: both scans are already hash-
    // distributed on the join key, so EnsureRequirements inserts NO
    // shuffle on either side — at 100 TB this is the difference
    // between a free join and exchanging the fact table every query
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("MergeJoin"),
      s"expected a merge join over bucketed scans:\n$plan")
    assert(j.count() == 500L)
  }

  test("corpusDiff: classes + rename pairing on a crafted churn") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "dup"),
      (5L, "dup")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "bX"), (6L, "c"), (7L, "dup"),
      (8L, "fresh")).toDF("doc_id", "text")
    val got = CorpusDiff.diffSummary(v1, v2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // raw: removed {3"c", 4"dup", 5"dup"}, added {6"c", 7"dup",
    // 8"fresh"}; pairing: "c" 1x, "dup" min(2,1)=1 -> renamed 2
    // (chars 1 + 3 = 4); what remains is honest churn
    assert(got == Seq(
      ("added_new", 1L, 5L),    // "fresh"
      ("modified", 1L, 2L),     // "bX" (v2-side chars)
      ("removed_gone", 1L, 3L), // one unpaired "dup"
      ("renamed", 2L, 4L),
      ("unchanged", 1L, 1L)))
  }

  test("corpusDiff: identical snapshots are all-unchanged") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val got = CorpusDiff.diffSummary(v, v).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("renamed", 0L), ("unchanged", 2L)))
  }

  test("keySkew: hand-computed shares and salt on a crafted skew") {
    // 60 hot + 20 + 20 rows over 3 keys: mean ~33.3; salt(hot) =
    // ceil(60*3/100) = 2; salt(cold) = ceil(20*3/100) = 1
    val df = (Seq.fill(60)("hot") ++ Seq.fill(20)("a") ++
      Seq.fill(20)("b")).toDF("k")
    val got = graft.operators.SkewAudit.keySkew(df, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("hot", 60L, 600000L, 2L),
      ("a", 20L, 200000L, 1L),
      ("b", 20L, 200000L, 1L)))
  }

  test("linkageFieldWeights: exact m/u from a labeled pair set") {
    // 4 matches (field1 agrees 3/4, field2 1/4), 2 non-matches
    // (field1 agrees 1/2, field2 0/2)
    val pairs = Seq(
      (true, true, true), (true, true, false), (true, true, false),
      (true, false, false),
      (false, true, false), (false, false, false)
    ).toDF("is_match", "f1", "f2")
    val got = graft.pipeline.EntityResolution.linkageFieldWeights(
        pairs, "is_match", Seq("f1", "f2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("f1", 4L, 2L, 750000L, 500000L),
      ("f2", 4L, 2L, 250000L, 0L)))
  }

  test("linkagePatterns: evidence table with exact match rates") {
    val pairs = Seq(
      (true, true), (true, true), (false, true), (false, false)
    ).toDF("is_match", "f1")
    val got = graft.pipeline.EntityResolution.linkagePatterns(
        pairs, "is_match", Seq("f1"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (false, 1L, 0L, 0L),        // disagree: 1 pair, no matches
      (true, 3L, 2L, 666666L)))   // agree: 3 pairs, 2 matches
  }

  test("labelPropagation: cliques survive a thin bridge; components merge") {
    // two 4-cliques {0..3} and {10..13} joined by ONE bridge 3-10
    val cliqueEdges = for {
      base <- Seq(0L, 10L); i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i, base + j)
    val edges = (cliqueEdges :+ (3L, 10L)).toDF("src", "dst")
    val lpa = graft.pipeline.LinkGraph.labelPropagation(edges,
        iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // density wins: each clique keeps one community, and they differ
    assert(Seq(0L, 1L, 2L, 3L).map(lpa).distinct.size == 1)
    assert(Seq(10L, 11L, 12L, 13L).map(lpa).distinct.size == 1)
    assert(lpa(0L) != lpa(10L))
    // the contrast: connected components merge the whole thing
    val cc = graft.pipeline.Dedup.duplicateClusters(
        edges.select(col("src").as("id_a"), col("dst").as("id_b")),
        "id_a", "id_b")
      .select("cluster_id").distinct().count()
    assert(cc == 1L)
  }

  test("corpusDiff: null text degrades to the empty doc") {
    val v1 = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((1L, "")).toDF("doc_id", "text")
    val got = CorpusDiff.diffSummary(v1, v2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("renamed", 0L), ("unchanged", 1L)))
  }
}
