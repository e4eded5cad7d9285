package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/**
 * Product-path cost of the streaming ingest gates (st15–st17,
 * st19–st20). The registry bodies of these queries deliberately do
 * EXTRA work the product never pays: they persist an oracle-replay
 * frame — which for st19/st20 means scoring the whole corpus a second
 * time in batch, and for st15/st16 means signing/fingerprinting the
 * whole corpus when the gate itself only needs the benchmark-sized
 * index. The bench artifact therefore OVERSTATES the gates' real
 * ingest cost. This harness times each gate's registry body and its
 * product-path twin (same stream pass, same closure-borne index,
 * no oracle persist) in one JVM and prints both, so BASELINE.md can
 * carry the real number next to the gate-contract number.
 *
 * Usage: graft.ProductBench   (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
 * Prints one JSON line: {"st15":{"registry":s,"product":s}, ...}
 */
object ProductBench {

  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  /** The five gates' product-path twins: the stream pass + the
   *  closure-borne index build, WITHOUT the oracle-replay persist.
   *  Index builds that the product genuinely pays (benchmark signing,
   *  the standing line dictionary) stay in; corpus-wide batch passes
   *  that exist only so DuckDB can replay the answer are dropped. */
  def productArms: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "st15" -> ((s, d) => {
      val emb = SparkEntry.t(s, d, "embeddings")
      // benchmark build is product cost (the eval set IS the gate's
      // input); the corpus-wide + benchmark signature persists are not
      val bench = emb.filter(col("vec_id") % 83 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(slice(col("embedding"), 1, 56),
            array_repeat(lit(0.0f), 8)).as("embedding"))
      val stream = SparkEntry.streamOf(s, s"$d/embeddings.parquet")
      val gated = Similarity.semanticGate(stream, bench, threshold = 0.9)
      SparkEntry.runBoundedStream(s, gated, "st15_product_sink", "append")
        .select(col("vec_id").as("corpus_id"), col("bench_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("corpus_id", "bench_id")
    }),
    "st16" -> ((s, d) => {
      val docs = SparkEntry.t(s, d, "documents")
      // the product fingerprints only the BENCHMARK docs (eval-
      // registry-sized); the registry body fingerprints the whole
      // corpus because the oracle must replay non-benchmark spans
      val benchHashes = TextAnalysis.fingerprintHashes(
          docs.filter(col("doc_id") % 50 === 0 &&
            length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
          gram = 40)
        .select("hash").distinct()
        .collect().map(_.getLong(0)).toSet
      val stream = SparkEntry.streamOf(s, s"$d/documents.parquet")
        .filter(col("doc_id") % 50 =!= 0 &&
          length(regexp_replace(lower(col("text")), "\\s+", " ")) >= 40)
      val gated = Dedup.substringGate(stream, benchHashes)
      SparkEntry.runBoundedStream(s, gated, "st16_product_sink", "append")
        .orderBy("doc_id", "span_start")
    }),
    "st17" -> ((s, d) => {
      // the standing dictionary build IS product cost (though in
      // production it is a standing artifact, amortized across ticks,
      // not rebuilt per arrival slice); only the parquet round-trip
      // of the dictionary is oracle plumbing — keys collect directly
      val base = SparkEntry.t(s, d, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id").cast("long").as("bid"),
          regexp_replace(col("text"), "\n", " ").as("text"))
      val n = base.count()
      val m = math.max(n * 3 / 10, 10L)
      val grid = s.range(m).select(col("id").as("cid"))
        .select(col("cid"), explode(sequence(lit(0), lit(4))).as("j"))
        .withColumn("bid", (col("cid") * 7 + col("j") * 13) % n)
      val composed = grid.join(base, Seq("bid"))
        .groupBy("cid")
        .agg(array_join(transform(array_sort(collect_list(
          struct(col("j"), col("text")))),
          x => x.getField("text")), "\n").as("text"))
      val keys = Dedup.duplicateLines(composed, "cid", "text")
        .select("line_md5").collect().map(_.getString(0)).toSet
      val stream = SparkEntry.streamOf(s, s"$d/documents.parquet")
        .select(col("doc_id"),
          regexp_replace(col("text"), "\n", " ").as("text"))
      val gated = Dedup.lineGate(stream, keys)
      SparkEntry.runBoundedStream(s, gated, "st17_product_sink", "append")
        .orderBy("doc_id")
    }),
    "st19" -> ((s, d) => {
      // product = the stream pass alone; the registry body's batch
      // compressionRatio over the same corpus exists only for replay
      val stream = TextAnalysis.compressionRatio(
        SparkEntry.streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id"), col("text")))
      val sink = SparkEntry.runBoundedStream(
        s, stream, "st19_product_sink", "append")
      sink.withColumn("bucket",
          when(col("ratio_ppm") < 150000L, "template_suspect")
            .when(col("ratio_ppm") < 500000L, "normal")
            .otherwise("incompressible"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("total_bytes"),
          min("ratio_ppm").as("min_ratio_ppm"),
          max("ratio_ppm").as("max_ratio_ppm"))
        .orderBy("bucket")
    }),
    "st20" -> ((s, d) => {
      // product = the stream scoring pass alone; the registry body
      // scores the corpus twice by design (batch pass = oracle frame)
      val stream = SparkEntry.streamOf(s, s"$d/documents.parquet")
        .select(col("doc_id"),
          TextAnalysis.detectLanguage(col("text")).as("lang"),
          length(col("text")).cast("long").as("n_chars"))
        .withColumn("kept", col("lang").isin("en", "de", "fr"))
      val sink = SparkEntry.runBoundedStream(
        s, stream, "st20_product_sink", "append")
      sink.groupBy("lang", "kept")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"))
        .orderBy("lang")
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.stateRoot =
      s"/tmp/graft_qstate_pb${ProcessHandle.current().pid()}_" +
        s"${System.currentTimeMillis()}"

    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      secs
    }
    // untimed warmup: one full product arm absorbs JVM/codegen/stream-
    // machinery startup so st15 (first measured) isn't billed for it
    time(productArms.last._2)

    val registryNames = Map(
      "st15" -> "st15_stream_decontam",
      "st16" -> "st16_stream_substring_gate",
      "st17" -> "st17_stream_line_gate",
      "st19" -> "st19_stream_compression_gate",
      "st20" -> "st20_stream_langid_gate")
    val rows = productArms.map { case (id, arm) =>
      val reg = time(SparkEntry.queries(registryNames(id)))
      val prod = time(arm)
      System.err.println(
        f"[product] $id  registry=${reg}%6.2f s  product=${prod}%6.2f s")
      s""""$id":{"registry":${f2(reg)},"product":${f2(prod)}}"""
    }
    println(rows.mkString("{", ",", s""","sf":"$sfDir"}"""))
    try {
      val root = new org.apache.hadoop.fs.Path(SparkEntry.stateRoot)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
