package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Pii, Sampling, TextAnalysis}
import graft.sources.JsonSource

/**
 * The whole curation story, end to end, on the shipped fixtures — a
 * raw JSONL crawl dump becoming sharded training data:
 *
 *   1. crawl dump     — the documents fixture serialized to JSONL (the
 *                       shape raw crawls actually arrive in)
 *   2. onboard        — JsonSource: schema inference + typed parse,
 *                       corrupt rows → NULLs
 *   3. PII redact     — map-only scrub BEFORE anything else persists
 *   4. curate         — Curation.curateCorpus: quality gate →
 *                       benchmark decontamination → exact+near dedup →
 *                       leak-safe deterministic split (one call)
 *   5. mixture        — budget-constrained source mixture (water-fill)
 *                       over the surviving train split
 *   6. shards         — deterministic epoch-shuffled training shards
 *
 * Every stage is the SAME operator the oracle suite verifies; this
 * main only composes them and prints the per-stage funnel. The whole
 * run is deterministic — md5 splits, seeded hashes, no RNG.
 *
 * Usage: runMain graft.Curate [sfDir] [outDir]
 */
object Curate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curate").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import spark.implicits._

    // 1. the "crawl": fixture docs as JSONL lines, one corrupt row
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val crawl = docs
      .select(to_json(struct(col("doc_id"), col("text"), col("source"),
        col("lang"))).as("line"))
      .unionByName(Seq("{not json at all").toDF("line"))
    crawl.write.mode("overwrite").text(s"$outDir/crawl_jsonl")
    val raw = spark.read.text(s"$outDir/crawl_jsonl")
      .withColumnRenamed("value", "line")
    println(s"[curate] crawl dump: ${raw.count()} JSONL lines " +
      "(1 corrupt by construction)")

    // 2. onboard: infer + typed parse; corrupt lines become all-NULL
    val typed = JsonSource.parseJson(raw, "line")
      .filter(col("doc_id").isNotNull)
    println(s"[curate] onboarded ${typed.count()} typed docs " +
      s"(schema: ${typed.columns.mkString(", ")})")

    // 3. PII scrub before anything persists downstream
    val scrubbed = typed.withColumn("text", Pii.redact(col("text")))

    // 4. one-call curation: quality → decontaminate → dedup → split.
    //    Benchmark = the first 5 docs' bigrams (playing the eval set)
    val bench = TextAnalysis.wordNgrams(
      docs.filter(col("doc_id") < 5)).select("ngram")
    val curated = Curation.curateCorpus(scrubbed, Some(bench),
      Curation.CurationConfig(minQualityScore = 0.3, minTokens = 10,
        maxContamination = Some(0.5), jaccardThreshold = 0.9))
      .cache()
    val funnel = curated.groupBy("split").count()
      .orderBy("split").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(s"[curate] curated survivors by split: $funnel " +
      s"(from ${scrubbed.count()} scrubbed docs)")

    // 5. budget mixture over the train split: equal-weight sources,
    //    20k-token budget, ≤1 epoch per source (water-fill overflow)
    val train = curated.filter(col("split") === "train")
    val sources = train.select("source").distinct()
      .collect().map(_.getString(0))
    val mix = Sampling.budgetMixture(train,
      sources.map(_ -> 1.0).toMap, tokenBudget = 20000L)
    mix.show(sources.length, false)

    // 6. deterministic epoch shards, ready to write partitioned
    val shards = Sampling.trainingShards(train, numShards = 4,
      epoch = "0")
    shards.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards/epoch0")
    val perShard = spark.read.parquet(s"$outDir/shards/epoch0")
      .groupBy("shard").count().orderBy("shard").collect()
      .map(r => r.get(0).toString + ":" + r.getLong(1)).mkString(" ")
    println(s"[curate] epoch-0 shards written to $outDir/shards: " +
      perShard)

    // 7. pre-flight scale audits on the artifact (round 14): is any
    //    shuffle key hot enough to need salting, and how stable is the
    //    shard layout if the fleet ever grows a shard?
    val skew = graft.operators.SkewAudit.keySkew(train, Seq("lang"),
      topK = 3).collect()
      .map(r => s"${r.getString(0)}:salt=${r.getLong(3)}").mkString(" ")
    println(s"[curate] hot-key audit on lang: $skew")
    val churn = Sampling.rendezvousChurn(train, "doc_id",
        fromShards = 4, toShards = 5)
      .agg(sum(when(col("moved"), col("n_docs")).otherwise(0L)),
        sum(col("n_docs"))).head()
    println(s"[curate] resharding 4 -> 5 would move " +
      s"${churn.getLong(0)} of ${churn.getLong(1)} docs " +
      "(rendezvous: all onto the new shard)")

    // 8. next crawl's delta: diff this curated snapshot against a
    //    simulated re-crawl (every 9th doc re-crawled under a new id)
    val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val recrawl = train.filter(col("doc_id") % 9 =!= 0)
      .unionByName(train.filter(col("doc_id") % 9 === 0)
        .withColumn("doc_id", col("doc_id") + off))
    val diff = graft.pipeline.CorpusDiff.diffSummary(train, recrawl)
      .collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(s"[curate] re-crawl diff (renames must not read as churn): " +
      s"$diff")

    // 9. retrieval QA on the curated corpus (round-14 session 3): the
    //    bm25 lane the serving side will use, scored with nDCG/MRR
    //    against term-coverage grades — the number a tuning run reads
    val evalRow = TextAnalysis.retrievalEval(train,
      Seq("spark", "merge", "vector"), k = 10).head()
    println(f"[curate] retrieval QA: ndcg@10=${
      evalRow.getAs[Double]("ndcg")}%.4f mrr=${
      evalRow.getAs[Double]("mrr")}%.4f p@10=${
      evalRow.getAs[Double]("precision_at_k")}%.4f (${
      evalRow.getAs[Long]("n_rel_at_k")}/${
      evalRow.getAs[Long]("n_rel_total")} relevant retrieved)")

    // 10. cross-doc template audit: top-PMI pair + the novelty floor —
    //     the corpus-level signals the within-doc repetition gate
    //     cannot see
    val pmiTop = TextAnalysis.pmiCollocations(train, minCount = 5,
        top = 1).collect().headOption
      .map(r => s"'${r.getString(0)}' pmi=${r.getDouble(4)}")
      .getOrElse("none above floor")
    val nov = TextAnalysis.ngramNovelty(train)
      .agg(min(col("novelty")), avg(col("novelty"))).head()
    println(f"[curate] template audit: top-PMI $pmiTop; novelty " +
      f"min=${nov.getDouble(0)}%.3f mean=${nov.getDouble(1)}%.4f")

    println(s"[curate] done — artifacts under $outDir")
    spark.stop()
  }
}
