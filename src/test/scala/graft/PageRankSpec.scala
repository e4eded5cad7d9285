package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.LinkGraph

/** PageRank in integer nanos: exact vs a brute-force reference of the
 *  same recurrence, structural sanity (cycle symmetry, hub dominance),
 *  and dedup/self-loop handling. */
class PageRankSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  /** The identical integer recurrence, driver-side. */
  private def reference(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 150000000L / n
    var r = nodes.map(_ -> 1000000000L / n).toMap
    (1 to iterations).foreach { _ =>
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v -> (base + 85L * inflow.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("matches the integer reference exactly on an asymmetric graph") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L),
      (3L, 0L), (1L, 1L)) // includes a self-loop
    val got = LinkGraph.pageRank(edges.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(edges, 3))
    // the node everyone links to outranks the one nobody links to
    assert(got(2L) > got(3L))
  }

  test("personalized: mass concentrates near the seed, zero teleport elsewhere") {
    // chain 0 -> 1 -> 2 -> 3 -> 0 plus a shortcut 0 -> 2
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val ppr = LinkGraph.personalizedPageRank(
      edges.toDF("src", "dst"), seeds = Seq(0L), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the seed keeps its teleport floor and holds the most mass
    assert(ppr(0L) >= 150000000L)
    assert(ppr(0L) == ppr.values.max,
      s"the seed dominates a seed-teleport walk: $ppr")
    // driver-side reference of the same seeded recurrence
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> (if (v == 0L) 1000000000L else 0L)).toMap
    (1 to 3).foreach { _ =>
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v ->
        ((if (v == 0L) 150000000L else 0L) +
          85L * inflow.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(ppr == r)
  }

  test("HITS: the pointed-at node tops authority, the pointer tops hub") {
    // 1,2,3 all point at 0; 0 points at 4. 0 is the authority;
    // 1,2,3 are (equal) top hubs after the mutual recursion.
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 4L))
    val got = LinkGraph.hits(edges.toDF("src", "dst"), iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(0L)._2 == 1000000L, "node 0 is the max authority")
    assert(got(1L)._1 == 1000000L && got(2L)._1 == 1000000L &&
      got(3L)._1 == 1000000L, "its pointers are the max hubs")
    assert(got(1L)._2 == 0L, "nothing points at node 1")
    // hand-check node 0's hub lane: it points only at 4, whose
    // authority stays below the shared-endorsement node 0's
    assert(got(0L)._1 < 1000000L && got(0L)._1 > 0L)
    // self-loops are dropped: a self-endorsing isolate scores zero
    val self = Seq((9L, 9L), (1L, 2L))
    val s2 = LinkGraph.hits(self.toDF("src", "dst"), iterations = 2)
      .collect().map(_.getLong(0)).toSet
    assert(!s2.contains(9L), "self-loop-only node leaves the graph")
  }

  test("triangles: K4 counts, direction/duplicates collapse, cc exact") {
    // K4 has 4 triangles, 3 per node, cc = 1; edges given with mixed
    // direction and a duplicate + self-loop that must collapse
    val k4 = Seq((0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (2L, 1L),
      (1L, 3L), (2L, 3L), (3L, 3L))
    val got = LinkGraph.triangleCounts(k4.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.length == 4)
    got.foreach { case (_, deg, tri, cc) =>
      assert(deg == 3L); assert(tri == 3L); assert(cc == 1000000L)
    }
    // a star closes no triangles: cc 0 everywhere, hub degree 3
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val s2 = LinkGraph.triangleCounts(star.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(s2(0L) == ((3L, 0L, 0L)))
    assert(s2(1L) == ((1L, 0L, 0L)))
  }

  /** The redistribution recurrence, driver-side: dangling mass shared
   *  equally inside the damped term. */
  private def referenceDangling(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 150000000L / n
    var r = nodes.map(_ -> 1000000000L / n).toMap
    (1 to iterations).foreach { _ =>
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      val dm = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map(v => v ->
        (base + 85L * (inflow.getOrElse(v, 0L) + dm / n) / 100L)).toMap
    }
    r
  }

  test("dangling-mass redistribution conserves total rank") {
    // node 2 is dangling (no out-edges): by default its mass leaks
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 0L), (1L, 0L))
    val df = edges.toDF("src", "dst")
    val leaky = LinkGraph.pageRank(df, iterations = 5)
      .collect().map(_.getLong(1)).sum
    val kept = LinkGraph.pageRank(df, iterations = 5,
      redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == referenceDangling(edges, 5),
      "redistribution recurrence matches the driver-side reference")
    assert(kept.values.sum > leaky,
      s"redistribution holds more mass (${kept.values.sum} vs $leaky)")
    assert(kept.values.sum >= 990000000L,
      s"total stays ~1e9 minus floor losses: ${kept.values.sum}")
    assert(leaky < 900000000L,
      s"the leaky default visibly shrinks on a dangling-heavy graph: $leaky")
  }

  test("deep iteration counts stay exact with bounded plan depth") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L),
      (3L, 0L))
    val df = edges.toDF("src", "dst")
    val deep = LinkGraph.pageRank(df, iterations = 12)
    assert(deep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      reference(edges, 12), "lineage cuts don't change the recurrence")
    // with cuts at rounds 5 and 10, the final plan holds only the
    // tail ~2 iterations above a LogicalRDD leaf — not 12 joins deep
    val lines = deep.queryExecution.optimizedPlan.treeString.linesIterator.size
    val unchecked = LinkGraph.pageRank(df, iterations = 12,
      checkpointEvery = 100).queryExecution.optimizedPlan
      .treeString.linesIterator.size
    assert(lines < unchecked / 2,
      s"checkpointed plan ($lines lines) far shallower than unchecked ($unchecked)")
    // personalized walk: same cut, same exactness at depth
    val ppr10 = LinkGraph.personalizedPageRank(df, Seq(0L), iterations = 10)
    assert(ppr10.agg(org.apache.spark.sql.functions.sum("rank_nanos"))
      .head().getLong(0) > 0L)
  }

  test("empty edge set fails fast instead of dividing by zero") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      LinkGraph.pageRank(empty)
    }
    assert(ex.getMessage.contains("no nodes"))
  }

  test("cycle symmetry: equal ranks; duplicates don't double-count") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (0L, 1L)) // duplicate edge must collapse
    val got = LinkGraph.pageRank(cyc.toDF("src", "dst"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet.size == 1, s"cycle ranks equal: $got")
    // conservation: total rank stays <= 1e9 (floor losses only)
    assert(got.values.sum <= 1000000000L)
    assert(got.values.forall(_ > 0L))
  }
}
