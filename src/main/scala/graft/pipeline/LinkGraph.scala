package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for crawl curation: PageRank over a (src, dst)
 * edge table — the classic crawl-frontier/seed-quality prior a
 * web-scale corpus pipeline ranks domains and pages with before
 * deciding what to fetch, keep, or up-weight.
 *
 * Scale design: one iteration is one src-keyed equi-join (edges ×
 * ranks — co-partitionable; at real scale pre-partition the edge
 * table by src so every iteration reuses the layout) plus one
 * dst-keyed aggregation; the rank state is nodes-sized, never
 * edges-sized. Iterations are a fixed unrolled count — rank deltas
 * converge geometrically (damping 0.85), and a fixed-depth plan keeps
 * the whole computation a static DAG (no driver-side convergence
 * loop). Long runs don't build long plans: the iteration loops cut
 * lineage with a nodes-sized localCheckpoint every `checkpointEvery`
 * rounds (the same shape as HITS's per-half-step cut and Dedup's
 * label propagation), so `iterations = 30` costs 30 joins, not a
 * 30-join-deep recompute cascade.
 *
 * Exactness: ranks live in integer NANOS with floor division at every
 * step (share = rank // out_degree, damped = 85*inflow // 100, base =
 * 150_000_000 // n). Every operation is integer and order-independent
 * (sums), so any engine replays the exact same longs — the same
 * micro-quantization contract as the LM/curation families.
 */
object LinkGraph {

  /** PageRank in integer nanos. `edges` must be distinct (src, dst)
   *  pairs; nodes = distinct src ∪ dst (isolated docs that never link
   *  and are never linked don't participate).
   *
   *  Dangling nodes (dst-only, no out-edges): by default their mass
   *  leaks — the curated-slice simplification, fine when dangling
   *  pages are rare. On a full crawl graph (~30% dangling) that
   *  visibly shrinks total mass per iteration, so
   *  `redistributeDangling = true` adds the standard correction: each
   *  iteration sums the dangling nodes' rank (a 1-row aggregate,
   *  broadcast — the P15 pattern) and shares it equally across all
   *  nodes inside the damped term, keeping Σ rank_nanos ≈ 1e9 minus
   *  floor losses. Default false preserves the published x88 oracle
   *  recurrence. Returns (node, rank_nanos). */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      redistributeDangling: Boolean = false,
      checkpointEvery: Int = 5): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // n is the rank vector's length — metadata-sized driver value
    val n = nodes.count()
    require(n > 0, "pageRank: edge set yields no nodes " +
      "(empty or null-only src/dst)")
    val r0 = lit(1000000000L / n)
    val base = lit(150000000L / n)
    var ranks = nodes.withColumn("rank", r0)
    (1 to iterations).foreach { i =>
      val inflow = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          expr("rank div deg").as("share"))
        .groupBy("node")
        .agg(sum("share").as("inflow"))
      val next =
        if (redistributeDangling) {
          // dangling mass = rank held by nodes with no out-edges;
          // 1-row frame, broadcast into the update like P15's stats
          val dangling = ranks
            .join(deg.withColumnRenamed("src", "node"),
              Seq("node"), "left_anti")
            .agg(coalesce(sum("rank"), lit(0L)).as("__dm"))
          nodes.join(inflow, Seq("node"), "left")
            .crossJoin(broadcast(dangling))
            .select(col("node"),
              (base + expr(
                s"(85 * (coalesce(inflow, 0) + __dm div $n)) div 100"))
                .as("rank"))
        } else {
          nodes.join(inflow, Seq("node"), "left")
            .select(col("node"),
              (base + expr("(85 * coalesce(inflow, 0)) div 100"))
                .as("rank"))
        }
      // nodes-sized lineage cut every few rounds: without it the
      // rank frame's plan deepens by one join per iteration and any
      // re-evaluation (the dangling aggregate reads `ranks` too)
      // recomputes the whole cascade.
      ranks = if (i % checkpointEvery == 0 && i < iterations)
        next.localCheckpoint() else next
    }
    ranks.select(col("node"), col("rank").as("rank_nanos"))
  }

  /** Personalized PageRank — seed-set expansion, the graph-side
   *  "find more like my trusted sources" curation move: teleport mass
   *  returns ONLY to the seed set (split equally among seeds), so rank
   *  concentrates in the seeds' link neighborhood instead of spreading
   *  globally — the prior for up-weighting pages near known-good
   *  domains. Same integer-nanos floor-division recurrence, same
   *  per-iteration join+aggregate shape as [[pageRank]]; initial mass
   *  sits entirely on the seeds. `seeds` is curated-list-sized and
   *  broadcasts. */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: Seq[Long],
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointEvery: Int = 5): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs >= 1 seed")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val seedDf = broadcast(
      seeds.distinct.toDF("node")
        .withColumn("seed_share", lit(1000000000L / seeds.distinct.size)))
    val teleport = lit(150000000L / seeds.distinct.size)
    var ranks = nodes.join(seedDf, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("seed_share"), lit(0L)).as("rank"))
    (1 to iterations).foreach { i =>
      val inflow = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          expr("rank div deg").as("share"))
        .groupBy("node")
        .agg(sum("share").as("inflow"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .join(seedDf.select(col("node"), lit(true).as("__is_seed")),
          Seq("node"), "left")
        .select(col("node"),
          (when(col("__is_seed"), teleport).otherwise(lit(0L)) +
            expr("(85 * coalesce(inflow, 0)) div 100")).as("rank"))
      ranks = if (i % checkpointEvery == 0 && i < iterations)
        next.localCheckpoint() else next
    }
    ranks.select(col("node"), col("rank").as("rank_nanos"))
  }

  /** HITS hubs & authorities — the DIRECTED complement of PageRank:
   *  an authority is pointed at by good hubs, a hub points at good
   *  authorities (Kleinberg's mutual recursion). For corpus curation
   *  the two lanes separate content pages (high authority) from
   *  index/directory pages (high hub) — different keep policies.
   *
   *  Integer form: scores live in MICRO units; each half-step is one
   *  edge join + aggregate, then a max-normalize (score·1e6 //
   *  max) against the 1-row max frame — broadcast, the P15 pattern —
   *  so every value stays an exact integer and any engine replays the
   *  recurrence. Self-loops are dropped (a page endorsing itself is
   *  not a signal); duplicate edges collapse. */
  def hits(
      edges: DataFrame,
      iterations: Int = 2,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    def normalize(scores: DataFrame, c: String): DataFrame = {
      // each half-step reads its input TWICE (the max aggregate and
      // the scaling join); without a lineage cut the upstream edge
      // joins recompute 2^(half-steps) times. The score frame is
      // nodes-sized — checkpointing it is cheap and bounds every
      // half-step to one evaluation of its input.
      val snap = scores.localCheckpoint()
      val mx = snap.agg(max(col(c)).as("__mx"))
      snap.crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"($c * 1000000) div greatest(__mx, 1)").as(c))
    }
    var hubs = nodes.withColumn("hub", lit(1000000L))
    var auth = nodes.withColumn("auth", lit(0L))
    (1 to iterations).foreach { _ =>
      auth = normalize(
        nodes.join(
          e.join(hubs.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node"))
            .agg(sum("hub").as("auth")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("auth"), lit(0L)).as("auth")),
        "auth")
      hubs = normalize(
        nodes.join(
          e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
            .groupBy(col("src").as("node"))
            .agg(sum("auth").as("hub")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub")),
        "hub")
    }
    nodes.join(hubs, Seq("node")).join(auth, Seq("node"))
      .select(col("node"), col("hub").as("hub_micro"),
        col("auth").as("auth_micro"))
  }

  /** Synchronous label-propagation community detection (Raghavan et
   *  al.) — the DENSITY-aware complement of connected components:
   *  components merge anything reachable, LPA lets tightly-knit
   *  regions keep their own label across a thin bridge (two cliques
   *  joined by one edge stay two communities), the structure that
   *  separates organic topic clusters from link chains. Every node
   *  starts as its own label; each round it adopts its neighbors'
   *  MOST FREQUENT label (ties to the smallest — fully deterministic,
   *  so any engine replays the fixed-iteration run exactly; no
   *  RNG tie-breaks).
   *
   *  Scale: per round one |E|-row join of the undirected edge frame
   *  to the label vector + a (node, label)-keyed count + a per-node
   *  argmax — the PageRank iteration shape carrying (long, long)
   *  pairs; `checkpointEvery` cuts lineage on deep runs like every
   *  other iterative operator here. Returns (node, community). */
  def labelPropagation(
      edges: DataFrame,
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    // every iteration joins the undirected frame — cut its lineage
    // ONCE so rounds re-read an edges-sized materialization instead
    // of re-running the distinct/union (and whatever derivation
    // produced `edges`) per round
    val und = e.union(e.select(col("dst").as("src"),
      col("src").as("dst"))).distinct().localCheckpoint()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iterations) {
      val picked = und
        .join(labels.select(col("node").as("dst"), col("label")),
          Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        // max over (cnt, -label): max count, ties to the SMALLEST label
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("src").as("node"), (-col("m.nl")).as("label"))
      labels =
        if (i % checkpointEvery == 0) picked.localCheckpoint()
        else picked
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Per-node triangle count + local clustering coefficient over the
   *  UNDIRECTED simple graph (self-loops dropped, direction and
   *  duplicates collapsed) — the graph-motif signal for link-spam and
   *  community structure: organic neighborhoods close triangles, link
   *  farms are near-bipartite (cc ≈ 0 at high degree).
   *
   *  Scale: the standard oriented-join algorithm — orient every edge
   *  low→high, then a triangle (a<b<c) is found EXACTLY once by
   *  joining (a,b)⋈(b,c) on the middle vertex and verifying (a,c);
   *  orientation bounds the join by the smaller endpoint's forward
   *  degree (Σ d_fwd² work, the published bound), never degree².
   *  cc_ppm = 2·triangles·1e6 // (deg·(deg−1)) from exact integers. */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val nodes = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node"))).distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // wedges a-b-c (a<b<c) closed by the (a,c) edge
    val wedges = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("w_a"), col("e1.b").as("w_b"),
        col("e2.b").as("w_c"))
    val tri = wedges
      .join(und.as("e3"),
        col("w_a") === col("e3.a") && col("w_c") === col("e3.b"))
      .select(col("w_a").as("a"), col("w_b").as("b"),
        col("w_c").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    nodes.join(deg, Seq("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          expr("(2 * coalesce(n_triangles, 0) * 1000000) " +
            "div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): score every
   *  non-adjacent pair (u, v) by Σ over common neighbors w of
   *  1/ln(deg(w)) — the standard "which links are missing" prior a
   *  crawl planner or graph-cleanup pass ranks candidate edges with.
   *  Rare shared neighbors count more than hubs.
   *
   *  Scale shape: the pair space is generated ONLY through shared
   *  centers (adjacency self-join on the center key, x < x'), never
   *  all-pairs, so cost is Σ_w deg(w)² — and `maxDegree` excludes
   *  super-hub centers from the middle role (the d06 posting-list
   *  df-cap move: a 10⁶-degree hub would mint 10¹² pairs, each worth
   *  a near-zero 1/ln(deg) anyway). Per-center weights are
   *  nano-quantized before the pair aggregation so the scores and the
   *  top-N cut are engine-exact. Degree-1 centers cannot be common
   *  neighbors and are dropped before the self-join. */
  def adamicAdar(
      edges: DataFrame,
      topN: Int = 20,
      maxDegree: Long = 1000,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(topN > 0, "topN must be positive")
    require(maxDegree >= 2, "maxDegree must be >= 2")
    // und feeds three consumers (both adjacency directions + the
    // anti-join) and centers two (both self-join sides): lineage cuts
    // keep the source edge scan to ONE pass — both frames are
    // edges-sized, the op's own working set
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val adj = und.select(col("a").as("w"), col("b").as("x"))
      .union(und.select(col("b").as("w"), col("a").as("x")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("degw"))
    val centers = adj
      .join(deg.filter(col("degw").between(2L, maxDegree)), "w")
      .withColumn("aa_nano",
        round(lit(1e9) / log(col("degw").cast("double")), 0).cast("long"))
      .localCheckpoint()
    val pairs = centers.as("l")
      .join(centers.as("r"),
        col("l.w") === col("r.w") && col("l.x") < col("r.x"))
      .select(col("l.x").as("u"), col("r.x").as("v"),
        col("l.aa_nano").as("aa_nano"))
    // predicted links only: drop pairs that are already edges
    val cand = pairs.join(und,
      pairs("u") === und("a") && pairs("v") === und("b"), "left_anti")
    cand.groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"), sum(col("aa_nano")).as("__nano"))
      .select(col("u"), col("v"), col("n_common"),
        round(col("__nano").cast("double") / 1e9, 6).as("aa_score"))
      .orderBy(col("aa_score").desc, col("u"), col("v"))
      .limit(topN)
  }

  /** Newman modularity of a GIVEN node partition — the quality score
   *  that tells a curation run whether the communities x101's label
   *  propagation (or any other assignment) found are real structure
   *  or noise: Q = Σ_c [ e_c/m − (d_c/2m)² ], per-community
   *  contributions reported so the weak communities are visible, not
   *  just the total (Q = sum of q_contrib; near-zero or negative
   *  contributions mark communities no denser than chance).
   *
   *  Scale shape: one canonical-edge distinct, one m count, two
   *  node-keyed joins to label edge endpoints, one community-keyed
   *  aggregate each for within-edges and degree mass — every shuffle
   *  on the node or community key. The (d/2m) ratio is STAGED so the
   *  oracle replays the identical operation order; contributions
   *  nano-quantize before the report. */
  def modularity(
      edges: DataFrame,
      communities: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      nodeCol: String = "node",
      communityCol: String = "community"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val m = und.count()
    require(m > 0, "modularity needs at least one edge")
    val cs = communities.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).cast("long").as("community"))
    val ca = cs.select(col("node").as("a"), col("community").as("__ca"))
    val cb = cs.select(col("node").as("b"), col("community").as("__cb"))
    val eIn = und.join(ca, "a").join(cb, "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("e_in"))
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("__deg"))
    val byC = cs.join(deg, Seq("node"), "left")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("__deg")), lit(0L)).as("d_tot"))
    byC.join(eIn, Seq("community"), "left")
      .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
      .withColumn("__r", col("d_tot").cast("double") / (2.0 * m))
      .select(col("community"), col("n_nodes"), col("e_in"), col("d_tot"),
        round(round((col("e_in").cast("double") / m
          - col("__r") * col("__r")) * 1e9, 0).cast("long")
          .cast("double") / 1e9, 6).as("q_contrib"))
      .orderBy("community")
  }
}
