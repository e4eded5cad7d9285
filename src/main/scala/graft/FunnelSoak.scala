package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, TextAnalysis}

/** Composed-funnel scale proof (the r15 verdict ask): the production
 *  path is ONE `Curation.curateCorpus` run, so the piecewise per-
 *  operator soaks don't name which STAGE of the composed cascade
 *  breaks first at scale. This main runs the b03 cascade (same config,
 *  same benchmark construction) over the Soak-built N× corpus and
 *  records per-stage wall — quality gate → decontamination → dedup →
 *  split — via the `onStage` checkpoint-boundary hook, one JSON line
 *  per multiplier for BASELINE.md.
 *
 *  Invoke like Bench/Soak (plain JVM, pinned heap per the soak
 *  protocol: -Xmx8g -Xms8g -XX:G1HeapRegionSize=16m):
 *    graft.FunnelSoak [mults...]    (default: 10 30)
 */
object FunnelSoak {

  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10, 30)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup cascade (Bench's discipline): absorb JVM/codegen/
    // committer one-time cost so the FIRST multiplier's row measures
    // the funnel, not initialization — without this the 1x row reads
    // HIGHER than the 10x row
    try {
      val wdocs = spark.read.parquet(s"$src/documents.parquet")
      Curation.curateCorpus(wdocs,
        Some(TextAnalysis.wordNgrams(wdocs.filter(col("doc_id") < 10))
          .select("ngram")),
        Curation.CurationConfig(minTokens = 30,
          maxContamination = Some(0.8)))
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[funnelsoak] warmup failed: ${e.getMessage}")
    }
    // sweep the warmup's leftover checkpoint blocks (dedupCorpus cuts
    // lineage internally) BEFORE the first timed multiplier — resident
    // storage blocks inside the pinned heap would inflate its walls
    // (the round-3 contamination mode Bench sweeps per query)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()

    mults.foreach { mult =>
      val out = s"/tmp/graft_soak/x$mult"
      System.err.println(s"[funnelsoak] building ${mult}x corpus at $out")
      Soak.buildCorpus(spark, src, out, mult)
      val docs = spark.read.parquet(s"$out/documents.parquet")
      // b03's exact config + benchmark construction
      val cfg = Curation.CurationConfig(minTokens = 30,
        maxContamination = Some(0.8))
      val bench = TextAnalysis.wordNgrams(
        docs.filter(col("doc_id") < 10)).select("ngram")
      val stageWall = scala.collection.mutable.LinkedHashMap
        .empty[String, Double]
      val t0 = System.nanoTime()
      val stages = Curation.curateCorpusStaged(docs, Some(bench), cfg,
        onStage = Some((st, sec) => stageWall(st) = sec))
      // split is lazy past the dedup checkpoint: its materialization
      // IS the stage wall. Noop sink, not count() — count() lets
      // Catalyst prune the hashSplit projection and time an empty
      // cached-block count (the exact pitfall Bench.runOne documents)
      val ts = System.nanoTime()
      stages.curated.write.format("noop").mode("overwrite").save()
      stageWall("split") = (System.nanoTime() - ts) / 1e9
      // total closes HERE so it equals the sum of stage walls; the
      // row-count read below is bookkeeping, not funnel work
      val total = (System.nanoTime() - t0) / 1e9
      val nCurated = stages.curated.count() // cheap: checkpointed input
      val walls = stageWall.map { case (k, v) => s""""$k":${f2(v)}""" }
        .mkString(",")
      println(s"""{"metric":"funnel_soak","mult":$mult,""" +
        s""""stages":{$walls},"total":${f2(total)},""" +
        s""""n_curated":$nCurated}""")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
