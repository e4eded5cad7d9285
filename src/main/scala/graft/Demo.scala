package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.api.GraftEngine

/** End-to-end demo of the engine facade: profile → validate → schema
  * baseline → metric history → anomaly scan → trends, against a testdata
  * directory. Usage: runMain graft.Demo [sfDir] [stateDir] */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val stateDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val engine = new GraftEngine(spark, sfDir, stateDir)
    def ts(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 00:00:00")

    (1 to 8).foreach { d =>
      val p = engine.profileTable("orders", ts(d))
      if (d == 1) println(
        s"[demo] profiled orders: rows=${p.rowCount} cols=${p.columnCount} " +
          s"health=${p.healthScore} dupes=${p.duplicateCount}")
    }
    val results = engine.runValidations("orders", ts(1))
    println(s"[demo] validations: ${results.count(_.isValid)}/${results.size} passed")
    val changes = engine.detectSchemaChanges(ts(1))
    println(s"[demo] schema baseline bootstrapped, changes=${changes.size}")
    println("[demo] metric trends:")
    engine.metricTrends("orders").show(5, false)
    val anomalies = engine.runAnomalyScan("row_count", now = Some(ts(9)))
    println(s"[demo] anomalies on flat row_count series: ${anomalies.count()}")
    println("[demo] validation daily trend:")
    engine.validationTrends("orders", results.size, "2026-01-01", "2026-01-03")
      .show(3, false)

    // round-4 surface: persisted rule suite, stored anomaly configs with
    // a one-job batch scan, and the durable event feed
    val seeded = engine.seedDefaultRules("orders", ts(10))
    println(s"[demo] seeded ${seeded.size} default rules into the store " +
      s"(re-seed adds ${engine.seedDefaultRules("orders", ts(11)).size})")
    val stored = engine.runStoredValidations("orders", ts(12))
    println(s"[demo] stored suite: ${stored.count(_.isValid)}/${stored.size} passed")
    engine.anomalyConfigs.createConfig(
      graft.types.AnomalyConfig("row_count", "orders",
        detectionMethod = "zscore"), ts(12))
    val batch = engine.runAnomalyScanAll(ts(12), persist = true)
    println(s"[demo] batch scan over stored configs: ${batch.count()} anomalies")
    println(s"[demo] event feed rows: ${engine.events.feed().count()}")

    val resp = engine.profileTableWithTrends("orders", ts(13))
    println(s"[demo] profile+trends in one call: history rows=" +
      s"${resp.history.count()}, trend series=${resp.trends.count()}")

    // round-6 surface: the training-data pipeline end to end — chunk,
    // dedup semantically, quantize, cap per source, weighted-sample
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Sampling, Similarity, TextAnalysis}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val chunks = TextAnalysis.chunkDocuments(docs,
      chunkTokens = 20, strideTokens = 10)
    println(s"[demo] chunked ${docs.count()} docs into ${chunks.count()} " +
      "overlapping 20-token windows")
    val sem = Similarity.semanticDedupAuto(emb, k = 8, tau = 0.3)
    println(s"[demo] SemDeDup kept ${sem.filter(!col("is_dup")).count()}/" +
      s"${sem.count()} vectors at tau=0.3")
    val q = Similarity.quantizeEmbeddings(emb)
    println(s"[demo] int8-quantized ${q.count()} embeddings " +
      "(64 B codes + 1 scale each)")
    val capped = Sampling.capPerStratum(docs, "doc_id", "source", 10)
    val picked = Sampling.weightedSample(docs, "doc_id", "n_chars", 50)
    println(s"[demo] per-source cap kept ${capped.count()} docs; " +
      s"length-weighted sample picked ${picked.count()}")

    // round-10 surface: the incremental layer — persisted stores take a
    // daily slice end to end, then answer profile/drift from states
    import graft.pipeline.{Curation, Dedup}
    val half = docs.agg(max("doc_id")).head.getLong(0) / 2
    val standing = docs.filter(col("doc_id") <= half)
    Dedup.minhashStoreSave(Dedup.minhashStoreCreate(standing),
      s"$stateDir/mh")
    val pstore = engine.sliceStates("documents")
    engine.recordProfileSlice("documents", "day0", col("doc_id") <= half,
      quantileCols = Seq("n_chars"))
    val (keptDocs, rep) = Curation.incrementalIngest(
      docs.filter(col("doc_id") > half), s"$stateDir/mh",
      stateStore = Some((pstore, "day1")))
    println(s"[demo] daily ingest: ${rep.arrived} arrived, " +
      s"${rep.kept} kept (${rep.droppedExactWithin} exact / " +
      s"${rep.droppedNearDup} near dups dropped), store appended")
    val ranged = pstore.profile(Seq("day0", "day1"))
    println(s"[demo] two-day profile from persisted states only: " +
      s"${ranged.count()} column rows, no rescan")
    val drift = graft.profiler.Drift.driftFromStates(
      spark.read.parquet(s"$stateDir/slice_states/documents/quantiles")
        .filter(col("slice_id") === "day0"),
      graft.profiler.LogSketch.sliceState(keptDocs, "n_chars", 0.01, "d1"))
    println(s"[demo] day0-vs-ingested n_chars drift (PSI from states): " +
      s"${drift.head.getAs[Double]("psi")}")

    // round-11 surface: the ingest turn as a PERSISTED scheduled job
    // (landing zone → catch-up → ledger → event), the versioned model
    // registry, the mergeable dataset card, and the SLO monitor
    import graft.scheduler.{Automation, IngestScheduler, JobStore, Scheduler}
    val mid = docs.agg(max("doc_id")).head.getLong(0) * 3 / 4
    docs.filter(col("doc_id") > half && col("doc_id") <= mid)
      .write.mode("overwrite").parquet(s"$stateDir/landing/2026-01-01")
    docs.filter(col("doc_id") > mid)
      .write.mode("overwrite").parquet(s"$stateDir/landing/2026-01-02")
    Dedup.minhashStoreSave(Dedup.minhashStoreCreate(standing),
      s"$stateDir/mh2")
    val jobs = new JobStore(spark, s"$stateDir/jobs")
    jobs.save(Scheduler.Job("daily_ingest", "ingest_automation",
        Scheduler.Daily(java.time.LocalTime.of(2, 0))),
      java.time.Instant.parse("2026-01-01T00:00:00Z"))
    val auto = new Automation(engine, Nil, jobStore = Some(jobs),
      ingest = Some(IngestScheduler.IngestConfig(s"$stateDir/landing",
        s"$stateDir/mh2", s"$stateDir/ledger")))
    try {
      // both slices landed "while down": one tick catches up both
      auto.tick(java.time.Instant.parse("2026-01-02T03:00:00Z"))
      auto.drain()
    } finally auto.shutdown()
    val ledger = new IngestScheduler.IngestLedger(spark,
      s"$stateDir/ledger")
    println("[demo] scheduled ingest ledger (one tick caught up both " +
      "slices):")
    ledger.frame.orderBy("slice_id").show(5, false)

    import graft.pipeline.{Classify, Curation, ModelStore}
    val store = new ModelStore(spark, s"$stateDir/models")
    store.save("gate", Classify.compactModel(
      Classify.nbState(docs.limit(50), "text", "source"), 64))
    val v2 = store.save("gate", Classify.compactModel(
      Classify.nbState(docs, "text", "source"), 256))
    println(s"[demo] model registry: 'gate' hot-reloads at v$v2; " +
      s"scored ${Classify.scoreBroadcast(store.load("gate"),
        docs.limit(20)).count()} docs through the stored model")

    val card = Curation.cardFromStates(
      Curation.cardSliceState(standing, "day0").unionByName(
        Curation.cardSliceState(docs.filter(col("doc_id") > half),
          "day1")))
    println(s"[demo] mergeable dataset card covers " +
      s"${card.count()} sources from 2 slice states (no text re-read)")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val pages = graft.anomalies.Slo.burnRate(ev)
      .filter(col("page")).count()
    println(s"[demo] SLO burn-rate monitor: $pages paged hours " +
      "(short AND long windows hot)")

    // round-12 session-3 surface: line-grain dedup + its ingest gate,
    // the link-analysis family, and the cheap whole-doc quality priors
    val lineDict = Dedup.duplicateLines(
      docs.select(col("doc_id"),
        regexp_replace(col("text"), "\n", " ").as("text")))
    println(s"[demo] duplicate-line dictionary: ${lineDict.count()} " +
      "corpus-repeated lines (C4/RefinedWeb grain)")
    val n = docs.count()
    val links = docs.select(col("doc_id").as("src"),
      explode(array((col("doc_id") * 2 + 1) % n,
        (col("doc_id") * 3 + 7) % n)).as("dst"))
    val topRank = graft.pipeline.LinkGraph.pageRank(links, 3)
      .orderBy(col("rank_nanos").desc).limit(1).head
    println(s"[demo] pagerank over the derived link graph: top node " +
      s"${topRank.getLong(0)} at ${topRank.getLong(1)} nanos; " +
      s"triangles=${graft.pipeline.LinkGraph.triangleCounts(links)
        .agg(sum("n_triangles")).head.getLong(0) / 3}")
    val ratios = graft.pipeline.TextAnalysis.compressionRatio(docs)
    println(s"[demo] compression-ratio quality gate: " +
      s"${ratios.filter(col("ratio_ppm") < 150000).count()} " +
      "template-suspect docs")

    // round-13 surface: full-crawl PageRank (dangling mass kept),
    // the dedup cluster-size diagnostic, context-window truncation,
    // and the ingest-side language gate
    val fullRank = graft.pipeline.LinkGraph.pageRank(
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 2 + 1) % n).as("dst")),
      iterations = 3, redistributeDangling = true)
    println(s"[demo] full-crawl pagerank conserves " +
      s"${fullRank.agg(sum("rank_nanos")).head.getLong(0)} of 1e9 nanos " +
      "across a half-dangling graph")
    val ids = docs.select(col("doc_id"))
    val chains = ids.filter(expr("doc_id % 10 < 1 + (doc_id div 10) % 4"))
      .join(ids.select(col("doc_id").as("next_id")),
        col("doc_id") + 1 === col("next_id"))
      .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
    println("[demo] dedup pre-commit diagnostic — cluster sizes:")
    Dedup.clusterSizeProfile(Dedup.duplicateClusters(chains))
      .orderBy("cluster_size").show(5, false)
    val trimmed = TextAnalysis.truncateToTokenBudget(docs, maxTokens = 32)
    println(s"[demo] 32-token context budget bites " +
      s"${trimmed.filter(col("truncated")).count()}/${trimmed.count()} docs")
    val langs = docs.select(
      TextAnalysis.detectLanguage(col("text")).as("lang"))
      .groupBy("lang").count().orderBy(col("count").desc)
    println("[demo] ingest language gate would keep:")
    langs.show(3, false)
    spark.stop()
  }
}
