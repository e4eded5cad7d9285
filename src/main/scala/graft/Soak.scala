package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale soak: build a deterministic `mult`× corpus from an existing SF
 * dir under /tmp and run the iterative/dedup family at BOTH scales, so
 * the scaling curve (not just one point) is recorded. The point is to
 * show the posting-list caps, banded candidate generation, and the
 * O(log diameter) connected-components rounds actually bend the curve —
 * a super-linear query here is a 100 TB bug even if sf0.1 looks fine.
 *
 * Replica construction keeps DUPLICATE DENSITY LINEAR in corpus size,
 * like a real larger crawl, instead of quadratic:
 *  - ids shift by a per-replica offset (chain/cluster topology repeats
 *    per replica, so d05/x24/x35's component structure scales linearly);
 *  - every 4th word is rekeyed per replica, so every 3-gram shingle
 *    containing it changes and a replica is NOT a near-dup of its
 *    source (within-replica near-dup pairs survive: similar docs get
 *    similar replacements). Without this, every doc sits in a
 *    mult-clique and pair output grows mult² — a different workload,
 *    not a bigger one.
 *
 * Usage: graft.Soak [mult] [queryName ...]
 *   SPARK_GRAFT_SF_DIR  source dir (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS    local parallelism (default 32)
 * Prints one JSON line: per-query base/scaled seconds + ratio vs mult.
 */
object Soak {

  val DefaultQueries: Seq[String] = Seq(
    // the iterative/dedup family (documents-keyed)
    "d05_dup_clusters", "d06_ngram_jaccard", "d07_cross_dedup",
    "x24_canonical_pick", "x25_containment", "x35_leak_safe_split",
    // profile battery (lineitem-keyed)
    "p01_row_count", "p03_distinct_counts", "p05_numeric_stats",
    "p08_median_quantiles", "p14_top_values", "p15_outliers_3sigma",
    // round-9 text/retrieval family (documents-keyed): language-ID
    // scoring+argmax, BPE piece counting, BM25+ANN fusion, URL/domain
    // extraction — all map-only or token-keyed; must stay ~linear
    "x44_language_id", "x45_hybrid_rrf", "x46_bpe_token_stats",
    "x47_url_domains",
    // event-time family (events-keyed, TsNorm-normalized): gap
    // sessionization (one user_id shuffle) and the bucketed band/
    // interval joins (co-partitioned (key, bucket) equi-joins — the
    // whole point is that they NEVER go quadratic in events)
    "x16_sessionize", "j02_range_join", "j03_interval_join",
    // key-integrity (lineitem-keyed anti-joins; 10× lineitem against
    // unscaled orders also stresses the orphan-count path) and the
    // events-keyed refresh suggestion
    "s06_key_integrity", "t06_refresh_suggestion",
    // round-10 dedup additions: string-id dictionary-encode clustering
    // and the incremental signature-store ingest trio
    "d09_string_id_dedup", "d10_incremental_minhash",
    "e12_incremental_embedding_dedup",
    // round-10 sketch family: mergeable quantiles (log-binned groupBy —
    // must stay scan-bound), mergeable heavy hitters (O(k) states),
    // KMV corpus overlap (distinct-shingle shuffle + TakeOrdered k),
    // and the store-bootstrapped streaming near-dup (state load is
    // O(store), per-batch work O(slice×bucket))
    "p37_mergeable_quantiles", "p38_mergeable_topk", "x48_kmv_overlap",
    "st08_stream_neardup_bootstrap", "p39_state_store_profile",
    "st09_stream_quantiles", "e13_incremental_ivf",
    "e14_incremental_pq", "x50_contrastive_mine", "p40_state_drift",
    "x51_training_shards",
    // round-10 session-3 additions: NB classifier (token-keyed
    // train + score joins — must stay ~linear in corpus tokens),
    // its merged-slice-state twin, takedown propagation (cluster
    // closure + broadcast list), and JSONL parse+flatten (map-only)
    "x52_nb_classifier", "x53_nb_incremental", "d11_takedown",
    "s14_json_flatten",
    // budget mixture (one source-keyed scan + metadata solve) and
    // margin mining (broadcast brute-force arm — linear in the right
    // corpus by construction)
    "x54_budget_mixture", "e15_margin_mining",
    // round-11 doc-pin fixes: streaming NB serving (map-only score of
    // every arrival against a broadcast capped model — must stay
    // linear in arrivals), slice-vs-slice embedding drift (two scans,
    // metadata output), and BPE training (one word-count shuffle +
    // bounded driver loop — the count pass dominates and must scale
    // like any token-keyed groupBy)
    "st10_stream_classify", "e16_embedding_drift", "x55_bpe_train",
    // round-11: DSIR selection is the one new op keyed on a table this
    // corpus blow-up actually scales (documents) — token-keyed feature
    // shuffle + broadcast model grid, must stay ~linear in corpus
    // tokens. The other r11 ops key on events/customer/supplier, which
    // buildCorpus mirrors verbatim, so soaking them would only measure
    // a flat line.
    "x56_dsir_selection",
    // batch 2 documents-keyed additions: dedup eval (shingle inverted
    // index + LSH over the doubled eval corpus — the heaviest dedup
    // shape) and the CSV write+read round-trip (scan-bound both ways)
    "d12_dedup_eval", "s15_csv_roundtrip",
    // batch 5 documents/embeddings-keyed additions: dedup-aware
    // sampling weights (one cluster-keyed agg + join — must stay
    // ~linear in docs) and truncated-dimension ANN recall (broadcast
    // brute-force arms — linear in candidates at fixed query count).
    // a19_slo_burn_rate keys on events, which buildCorpus mirrors
    // verbatim, so soaking it would measure a flat line.
    "x61_dedup_weights", "e18_truncated_ann",
    // the scheduled three-slice ingest cascade (documents-keyed): each
    // per-slice turn is O(slice) against the banded store — the whole
    // cascade must scale like three d10 ingests, not like a rescan
    "b02_scheduled_ingest",
    // batch 6: IVF balance audit (embeddings-keyed cell aggregate),
    // curriculum phases (one percentile aggregate + map-only assign)
    // and the dataset card (source-keyed rollup) — all must ride
    // their single corpus scan
    "e19_ivf_balance", "x62_curriculum", "x63_dataset_card",
    // batch 7: the mergeable sampler (documents-keyed TakeOrdered —
    // must stay flat). x65/c09 key on customer, which buildCorpus
    // mirrors verbatim, so soaking them would measure a flat line.
    "x64_mergeable_sample",
    // batch 8: join-cardinality audit (events-keyed count join),
    // pack-efficiency rollup (documents-keyed) and the mergeable HLL
    // states (lineitem-keyed sketch aggregate) — all single-scan
    "x66_join_blowup", "x67_pack_efficiency", "p41_mergeable_hll",
    // batch 9: the mergeable dataset card (documents-keyed state
    // build + merge — must ride one scan). m07 runs on a synthetic
    // in-memory audio corpus the blow-up doesn't scale, so soaking it
    // would measure a flat line.
    "x68_mergeable_card",
    // batch 10: HTML extraction (documents-keyed map-only regex
    // chain) and the streaming SLO (events-keyed watermarked rollup —
    // state is hours-sized, so 10× events must ride the scan)
    "x69_html_extract", "st13_stream_slo",
    // batch 11: URL canonicalization (documents-keyed derive+normalize
    // chain) and the star-join rollup (lineitem-keyed fact shuffle
    // with broadcast dims — the join AQE must keep flat)
    "x70_url_canonicalize", "x71_star_join",
    // batch 12: the CMS slice states (lineitem-keyed hash groupBys)
    // and the bloom-reduced join (lineitem scan + driver bloom build
    // — the pre-filter must keep the whole thing scan-bound)
    "p42_mergeable_cms", "j05_bloom_join",
    // batch 13: KN scoring (token-keyed count joins), the evolution
    // reader (two scans + map-only casts), and leading-edge alerts
    // (events-keyed series window)
    "x72_kneser_ney", "s17_schema_merge", "a20_leading_edge_alerts",
    // batch 14: the threshold curve (the d03 LSH+verify shape + a
    // 5-row sweep) and row quarantine (orders-keyed map-only pass)
    "d14_threshold_curve", "v06_row_quarantine",
    // batch 15: JL projection recall (embeddings-keyed broadcast
    // brute-force arms). m08 runs on a synthetic in-memory video
    // corpus the blow-up doesn't scale.
    "e20_random_projection",
    // batch 16: the vocab-growth curve (token-keyed shuffles) and
    // streaming quarantine (map-only rules on arrivals)
    "x73_vocab_growth", "st14_stream_quarantine",
    // batch 17: the forecast backtest (events-keyed series folds) and
    // the partition-pruned write+read (events-keyed — the pruned scan
    // must stay 7-directories-bound as the log grows)
    "a21_forecast_backtest", "s18_partition_pruning",
    // batch 18: incremental vocab ingest (token-keyed anti-join — the
    // O(slice) contract must hold as the corpus grows)
    "x74_incremental_vocab",
    // batch 19: the Zipf fit (one token-count shuffle + a 100-row
    // fit) and the PQ distortion audit (embeddings-keyed code join)
    "x75_zipf_fit", "e21_pq_distortion",
    // batch 20/21: the KMV overlap matrix (one shingle pass + O(N·k)
    // sketch-row pair work — must never touch text quadratically).
    // m09 runs on a synthetic in-memory audio corpus.
    "x76_overlap_matrix",
    // batch 22: the estimator calibration (the d03 LSH+verify shape
    // plus a decile rollup — pair-count-bound like d14)
    "x77_sketch_calibration",
    // round 13: dangling-mass PageRank (per-iteration 1-row dangling
    // aggregate must ride the same join shape as x88), the cluster-size
    // rollup, map-only token truncation, and the streaming language
    // gate (fixed stream machinery must dominate, not the corpus)
    "x94_pagerank_dangling", "d16_cluster_sizes", "x95_token_truncate",
    "st20_stream_langid_gate",
    // round 14: the two cell/block-local-quadratic families that had
    // no scaling rows (r13 verdict ask #6) — SemDeDup's per-cell
    // pairs and entity resolution's per-block levenshtein (the
    // latter via the documents-keyed x58_docs arm; the registry
    // fixture is supplier-keyed, which this corpus mirrors verbatim)
    "e07_semantic_dedup", "x58_docs",
    // round-14 additions (x97 keys on customer, which this corpus
    // mirrors verbatim — soaking it would measure a flat line):
    // rendezvous churn (map-only double assignment — must ride the
    // scan), CDC chunking (partition-local chunker + (md5, len)
    // rollup), and the streaming PII gate (fixed stream machinery
    // must dominate, the st20 contract)
    "x96_rendezvous_shards", "x98_cdc_chunks", "st21_stream_pii_gate",
    // corpus diff (documents-keyed full-outer join on (id, md5, len))
    // and the bucketed-join lane (lineitem-keyed: the bucketed WRITE
    // scales with the fact table, the join stays exchange-free)
    "x99_corpus_diff", "s20_bucketed_join",
    // the skew audit (documents-keyed single aggregate — must ride
    // the scan). x100 keys on supplier, mirrored verbatim.
    "p44_key_skew",
    // LPA (documents-keyed clique graph; per-round |E| join like x88)
    "x101_label_propagation",
    // the nprobe curve (embeddings-keyed: 4 celled probes + one
    // broadcast brute-force eval arm — linear in corpus at fixed k)
    "e24_ivf_nprobe_curve",
    // round-14 session 2: the composed curation funnel (documents-
    // keyed; the near-dup posting-list join dominates, the d03/d06
    // shape), script mix (map-only regexp counts + one rollup) and
    // touch attribution (events-keyed ONE window sort; events mirror
    // verbatim in the blow-up so its soak line is flat by design —
    // the documents-keyed pair prove the data terms)
    "b03_curation_funnel", "x102_script_mix",
    // MMR re-rank: the data term is the bm25 corpus scan; the greedy
    // is bounded by the 32-candidate page at any corpus size.
    // x106 is the map-only + 1-row-aggregate floor (sub-1 at 10x)
    "x105_mmr_rerank", "x106_filter_ablation",
    // round-14 session 3: PMI (gram/token-keyed aggs; cost tracks the
    // distinct-bigram keyspace), novelty (gram-df shuffle), Adamic-
    // Adar (degree-capped center join — Σ deg² bound), basket lift
    // (basket-keyed pair join; Σ basket² bound)
    "x108_pmi_collocations", "x109_ngram_novelty", "x110_adamic_adar",
    "x113_basket_lift",
    // round-15: temperature mixture (one corpus tokenCount scan into a
    // checkpointed sources-sized frame) and canonicalize-before-dedup
    // (map-only expression chain + one groupBy with two countDistincts
    // — must ride the scan). j06/j07/st23/a23/p48 key on events, which
    // buildCorpus mirrors verbatim, so soaking them would measure a
    // flat line; x118/x119 carry pinned-protocol rows in BASELINE §17.
    "x120_temperature_mix", "x121_canonical_dedup")

  /** Deterministic mult× blow-up of documents/embeddings/lineitem into
   *  `out`; every other table is mirrored verbatim so any registry
   *  query can run against the soak dir. */
  def buildCorpus(spark: SparkSession, src: String, out: String,
      mult: Int): Unit = {
    val outP = new org.apache.hadoop.fs.Path(out)
    val fs = outP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outP, true)

    val reps = spark.range(mult).toDF("__rep")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    // id span rounded to a multiple of 10 so each replica repeats the
    // d05 chain topology (pairs form at doc_id % 10 < 4) exactly
    val docSpan = {
      val m = docs.agg(max("doc_id")).head.getLong(0) + 1
      (m + 9) / 10 * 10
    }
    docs.crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("__rep") * docSpan)
      .withColumn("text",
        when(col("__rep") === 0, col("text")).otherwise(
          array_join(
            expr("""transform(
                filter(split(lower(trim(text)), '\\s+'), w -> length(w) > 0),
                (w, i) -> IF(i % 4 = 3,
                  substring(md5(concat(w, 'r', cast(__rep as string))), 1, 6),
                  w))"""),
            " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__rep")
      .repartition(32)
      .write.parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embSpan = emb.agg(max("vec_id")).head.getLong(0) + 1
    emb.crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("__rep") * embSpan)
      // per-replica deterministic jitter (~±0.2) so replicas are not
      // cosine near-dups of their source
      .withColumn("embedding",
        when(col("__rep") === 0, col("embedding")).otherwise(
          expr("""transform(embedding, (x, i) -> cast(
              x + (pmod(hash(vec_id, i, __rep), 1000) - 500) / 2500.0
              as float))""")))
      .drop("__rep")
      .repartition(32)
      .write.parquet(s"$out/embeddings.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val liSpan = li.agg(max("l_orderkey")).head.getLong(0) + 1
    li.crossJoin(broadcast(reps))
      .withColumn("l_orderkey", col("l_orderkey") + col("__rep") * liSpan)
      .drop("__rep")
      .repartition(32)
      .write.parquet(s"$out/lineitem.parquet")

    // events: each replica is a fresh user cohort with identical
    // behavior — per-user session/funnel structure repeats, total users
    // scale linearly (ts reads as long under nanosAsLong and is written
    // back as long; SparkEntry.eventsTable converts either way)
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evSpans = ev.agg(max("event_id"), max("user_id")).head
    val (evSpan, userSpan) = (evSpans.getLong(0) + 1, evSpans.getLong(1) + 1)
    ev.crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("__rep") * evSpan)
      .withColumn("user_id", col("user_id") + col("__rep") * userSpan)
      .drop("__rep")
      .repartition(32)
      .write.parquet(s"$out/events.parquet")

    val scaled = Set("documents", "embeddings", "lineitem", "events")
    fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).filterNot(scaled)
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.parquet(s"$out/$t.parquet")
      }
  }

  // Locale.ROOT: a comma-decimal default locale would print "1,23" and
  // corrupt the JSON artifact
  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = s"/tmp/graft_soak/x$mult"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // run-scoped replay state (same isolation as Bench)
    SparkEntry.stateRoot =
      s"/tmp/graft_qstate_s${ProcessHandle.current().pid()}_" +
        s"${System.currentTimeMillis()}"

    System.err.println(s"[soak] building ${mult}x corpus at $out from $src")
    val tb0 = System.nanoTime()
    buildCorpus(spark, src, out, mult)
    System.err.println(f"[soak] corpus built in ${(System.nanoTime() - tb0) / 1e9}%.1f s")

    // same measurement contract as Bench: noop sink (materializes every
    // column), per-query persistent-RDD sweep, cache clear
    // soak-only arms: the CAPPED public-default forms of the exact
    // pair operators (the registry pins the UNCAPPED oracle forms in
    // d06/x25; BASELINE.md needs the df-capped production path's
    // 10x ratio on the record too)
    val extraArms: Map[String, (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame] = Map(
      "d06_capped" -> ((s, d) =>
        graft.pipeline.Dedup.jaccardSimilarPairs(
          s.read.parquet(d + "/documents.parquet"))
          .orderBy("id_a", "id_b")),
      "x25_capped" -> ((s, d) =>
        graft.pipeline.Dedup.containmentPairs(
          s.read.parquet(d + "/documents.parquet"), threshold = 0.2)
          .orderBy("id_a", "id_b")),
      // x58's registry fixture is supplier-keyed, which buildCorpus
      // mirrors verbatim — soaking it measures a flat line. This arm
      // runs the SAME EntityResolution.resolve (block equi-join →
      // per-block levenshtein → transitive closure, the Σ block²
      // worst case the r13 verdict asked to curve) over a documents-
      // derived record set the blow-up actually scales: md5-salted
      // names (blocks stay ~uniform as the corpus grows) + an ' inc'
      // variant per record so true pairs exist at every scale.
      // e07's registry fixture pins k=8 cells so DuckDB can replay the
      // assignment — which makes Σ|cell|² grow as (N/8)² and the soak
      // curve bend up past ~10×. The SCALE PATH SemDeDup actually
      // prescribes is k ∝ N (constant cell size); this arm derives
      // k = N/250 (the fixture's base cell size) from the corpus so
      // the soak can show the same operator going ~linear when the
      // caller scales cells the way a 100 TB run would.
      "e07_cellscaled" -> ((s, d) => {
        val emb = s.read.parquet(d + "/embeddings.parquet")
        val k = math.max(8L, emb.count() / 250L).toInt
        val cents = emb.filter(col("vec_id") < k).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          .map { v =>
            val n = math.sqrt(v.map(x => x * x).sum)
            if (n == 0) v else v.map(_ / n)
          }
        graft.pipeline.Similarity.semanticDedup(emb, cents, tau = 0.3)
          .orderBy("vec_id")
      }),
      "x58_docs" -> ((s, d) => {
        val docs = s.read.parquet(d + "/documents.parquet")
        val base = docs.select(col("doc_id"),
          concat(substring(md5(col("doc_id").cast("string")), 1, 12),
            lit(" "), substring(col("text"), 1, 24)).as("name"))
        val recs = base
          .select((col("doc_id") * 2).as("record_id"), col("name"))
          .unionByName(base.select(
            (col("doc_id") * 2 + 1).as("record_id"),
            concat(col("name"), lit(" inc")).as("name")))
        graft.pipeline.EntityResolution.resolve(recs,
            "record_id", "name", blockChars = 4, maxDistance = 4)
          .orderBy("record_id")
      }))
    val unknown = names.filterNot(n =>
      SparkEntry.queries.contains(n) || extraArms.contains(n))
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    def runOne(name: String, dir: String): Double = {
      val fn = SparkEntry.queries.getOrElse(name, extraArms(name))
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[soak] $name @ $dir failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      if (ok) elapsed else -1.0
    }

    // untimed warmup at base scale
    runOne(names.head, src)

    val rows = names.map { n =>
      val base = runOne(n, src)
      val scaled = runOne(n, out)
      System.err.println(f"[soak] $n%-22s base=${base}%7.2f s  ${mult}x=${scaled}%7.2f s  ratio=${scaled / base}%5.2f")
      (n, base, scaled)
    }
    val qs = rows.map { case (n, b, sc) =>
      // -1 is the failure sentinel: a ratio over it is nonsense
      val ratio = if (b > 0 && sc >= 0) f2(sc / b) else "null"
      s""""$n":{"base":${f2(b)},"scaled":${f2(sc)},"ratio":$ratio}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"soak","mult":$mult,"src":"$src","queries":$qs}"""
    try {
      val fw = new java.io.FileWriter("SOAK_LOCAL.json")
      fw.write(line); fw.close()
    } catch { case _: Throwable => () }
    println(line)
    try {
      val root = new org.apache.hadoop.fs.Path(SparkEntry.stateRoot)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
