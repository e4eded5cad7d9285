package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: dump formatted physical plans for representative
  * queries (scan pruning / pushdown / join strategy / codegen spans).
  * Usage: runMain graft.Explain <sfDir> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("p01_row_count", "s07_preview", "p20_pattern_match",
        "p14_top_values", "a01_zscore_global", "e02_knn_brute_force",
        "e03_knn_lsh", "e05_knn_ivf", "d03_minhash_neardup",
        "d05_dup_clusters", "p15_outliers_3sigma", "p28_histogram",
        "s09_usage_patterns", "x06_hash_split", "x10_stratified_sample",
        "x11_sequence_packing", "d06_ngram_jaccard", "x12_tfidf_keywords",
        "x13_unigram_logprob", "x14_pii_scan", "x15_quality_filter",
        "j02_range_join", "x16_sessionize", "p30_correlations",
        "x17_distribution_drift", "x18_numeric_psi",
        "x22_domain_cap", "x23_boilerplate", "e07_semantic_dedup",
        "e08_quantize_int8", "x24_canonical_pick", "x25_containment",
        "x26_zorder_value", "x27_corpus_diff", "x28_weighted_sample",
        "x29_chunk_windows", "x30_event_rollup", "x31_bigram_logprob",
        "j03_interval_join", "p33_percentile_rank", "a11_ewma",
        "x32_oov_rate", "x33_group_profile", "x34_fd_check", "p34_entropy",
        // b01 deliberately absent: its summary frame is pre-computed
        // driver-side, so the printed plan would be a LocalTableScan —
        // nothing to audit
        "d08_span_dedup", "a13_anomaly_summary", "t11_anomaly_dashboard",
        // st01–st05 absent for the same reason: the streaming sink is
        // drained into a memory table, so the audited plan would be a
        // LocalTableScan; StreamingSpec pins their operator shapes
        "e09_knn_pq", "s12_bloom_pruned_lookup", "a14_seasonal_zscore",
        // round-10 sketch/maintenance family (st08/st09 absent: memory-
        // sink drains, LocalTableScan plans; StreamingSpec pins them)
        "p37_mergeable_quantiles", "p38_mergeable_topk",
        "p39_state_store_profile", "x48_kmv_overlap",
        "x50_contrastive_mine", "e13_incremental_ivf",
        "e14_incremental_pq",
        // round-11 session-2 additions (b02/m07/m08 absent: scheduler
        // orchestration and synthetic-media corpora — their audited
        // stages are the operators above; st13's sink is a memory
        // drain). The BNLJ hits in d14/p41/x66 are the sanctioned
        // 5-row/1-row broadcast stats arms.
        "a19_slo_burn_rate", "a20_leading_edge_alerts",
        "x61_dedup_weights", "e18_truncated_ann", "e19_ivf_balance",
        "e20_random_projection", "x62_curriculum", "x63_dataset_card",
        "x64_mergeable_sample", "x65_l_diversity", "c09_reconcile",
        "x66_join_blowup", "x67_pack_efficiency", "p41_mergeable_hll",
        "p42_mergeable_cms", "x68_mergeable_card", "x69_html_extract",
        "x70_url_canonicalize", "x71_star_join", "j05_bloom_join",
        "x72_kneser_ney", "s17_schema_merge", "d14_threshold_curve",
        "v06_row_quarantine",
        // round 13 (st20 absent: memory-sink drain, LocalTableScan)
        "x94_pagerank_dangling", "d16_cluster_sizes",
        "x95_token_truncate",
        // round 14 (st21 absent for the memory-sink reason)
        "x96_rendezvous_shards", "x97_t_closeness", "x98_cdc_chunks",
        "x99_corpus_diff", "s20_bucketed_join", "p44_key_skew",
        "x100_linkage_weights", "x101_label_propagation",
        "e24_ivf_nprobe_curve",
        // round 14 session 2
        "b03_curation_funnel", "x102_script_mix",
        "x103_touch_attribution", "x104_conversion_lag",
        "x105_mmr_rerank", "x106_filter_ablation",
        // round 14 session 3
        "x107_retrieval_eval", "x108_pmi_collocations",
        "x109_ngram_novelty", "x110_adamic_adar", "x111_modularity",
        "x112_rfm_segments", "x113_basket_lift",
        "x114_event_transitions", "x115_dp_counts",
        "x116_edit_distance_verify", "p45_robust_stats",
        "p46_fd_discovery")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // query bodies run their state writes eagerly — isolate them from
    // any pending Verify artifact's replay state
    SparkEntry.stateRoot =
      s"/tmp/graft_qstate_e${ProcessHandle.current().pid()}_" +
        s"${System.currentTimeMillis()}"
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      qs.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
