package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.anomalies.Slo
import graft.pipeline.{Sampling, Similarity}

class SloSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def ev(hour: Int, errs: Int, oks: Int) = {
    val base = Timestamp.valueOf(f"2024-01-01 $hour%02d:15:00")
    Seq.fill(errs)((base, "error")) ++ Seq.fill(oks)((base, "view"))
  }

  test("pages only when BOTH the short and long windows burn hot") {
    // SLO 75% → budget 25%. alert 1.2× → err ratio ≥ 0.30.
    // hour 0-5: cold (0/10 errors). hour 6: one hot hour (5/10 = 50%)
    // but the 6 h trailing window is 5/70 ≈ 7% → NO page.
    // hours 7-11 stay hot → by hour 11 the long window is hot too.
    val rows = (0 to 5).flatMap(h => ev(h, 0, 10)) ++
      (6 to 11).flatMap(h => ev(h, 5, 5))
    val out = Slo.burnRate(rows.toDF("ts", "event_type"),
        sloPpm = 750000L, alertPpm = 1200000L, longWindowHours = 6)
      .orderBy("hour").collect()
    assert(out.length == 12)
    val page = out.map(r => r.getAs[Boolean]("page"))
    assert(!page(6), "one hot hour must not page (long window cold)")
    assert(page(11), "sustained burn must page")
    // hour 6 short-window burn: 0.5/0.25 = 2× = 2,000,000 ppm
    assert(out(6).getAs[Long]("burn_short_ppm") == 2000000L)
    // cold hours burn 0
    assert(out(0).getAs[Long]("burn_short_ppm") == 0L)
    assert(!page(0))
  }

  test("alert decision is integer-exact at the threshold boundary") {
    // budget 25%, alert 1.2× → threshold ratio exactly 0.30.
    // 3 errors / 10 total = exactly AT the boundary → ≥ fires.
    val rows = ev(0, 3, 7)
    val out = Slo.burnRate(rows.toDF("ts", "event_type"),
        sloPpm = 750000L, alertPpm = 1200000L, longWindowHours = 6)
      .collect()
    assert(out.head.getAs[Boolean]("page"),
      "err/total == threshold·budget must page (≥, integer-exact)")
  }

  test("alert decision survives 100M-event hours (the Long form overflows)") {
    import java.sql.Timestamp
    // 1e8 events/hour: total · alertPpm · budgetPpm ≈ 3e19 > 2^63
    val hourly = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 40000000L, 100000000L),
      (Timestamp.valueOf("2024-01-01 01:00:00"), 1000000L, 100000000L))
      .toDF("hour", "err_1h", "total_1h")
    val out = Slo.burnFromHourly(hourly, sloPpm = 750000L,
        alertPpm = 1200000L, longWindowHours = 6)
      .orderBy("hour").collect()
    assert(out(0).getAs[Boolean]("page"), "40% errors at 1e8/h must page")
    assert(!out(1).getAs[Boolean]("page"))
  }

  test("rejects a degenerate SLO") {
    intercept[IllegalArgumentException] {
      Slo.burnRate(ev(0, 1, 1).toDF("ts", "event_type"), sloPpm = 0L)
    }
  }
}

class DedupWeightsSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("cluster members weigh 1/s; unassigned docs are singletons") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // {1,2,3} one cluster; {4} assigned alone; 5 absent from assignments
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.dedupWeights(docs, asg).orderBy("doc_id").collect()
    assert(out.length == 5, "weights frame must be total over docs")
    val bySize = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size")).toMap
    assert(bySize(1L) == 3 && bySize(2L) == 3 && bySize(3L) == 3)
    assert(bySize(4L) == 1 && bySize(5L) == 1)
    val w = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_ppm")).toMap
    assert(w(1L) == 333333L && w(4L) == 1000000L && w(5L) == 1000000L)
    // sqrt arm: 1e6/sqrt(3) = 577350
    val ws = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_sqrt_ppm")).toMap
    assert(ws(1L) == 577350L && ws(5L) == 1000000L)
  }

  test("alpha=1 weights sum to the cluster count (exact-dedup mass)") {
    val docs = (1L to 12L).toDF("doc_id")
    val asg = (1L to 12L).map(i => (i, i % 4)).toDF("doc_id", "cluster_id")
    val total = Sampling.dedupWeights(docs, asg)
      .agg(sum("weight_ppm")).head.getLong(0)
    // 4 clusters of 3 → 3·333333 each → 999999 per cluster
    assert(total == 4L * 999999L)
  }
}

class ScheduledIngestSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import java.time.{Instant, LocalTime}

  import graft.pipeline.{Curation, Dedup}
  import graft.scheduler.{Automation, IngestScheduler, JobStore, Scheduler}

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ingestsched").toString

  private def doc(id: Long, words: String) = (id, words)

  test("daily job: catch-up, restart-persisted lastRun, ledger idempotence") {
    val root = tmp()
    val base = Seq(
      doc(1L, "alpha bravo charlie delta echo foxtrot golf"),
      doc(2L, "hotel india juliet kilo lima mike november"),
      doc(3L, "oscar papa quebec romeo sierra tango uniform"))
      .toDF("doc_id", "text")
    Dedup.minhashStoreSave(Dedup.minhashStoreCreate(base, numBands = 32),
      s"$root/store")
    // day1: 10 = exact copy of base doc 1 (near-dup drop vs store),
    // 11 new, 12 = exact copy of 11 (exact-within drop)
    Seq(doc(10L, "alpha bravo charlie delta echo foxtrot golf"),
        doc(11L, "victor whiskey xray yankee zulu one two"),
        doc(12L, "victor whiskey xray yankee zulu one two"))
      .toDF("doc_id", "text")
      .write.parquet(s"$root/landing/2024-01-01")
    val cfg = IngestScheduler.IngestConfig(
      s"$root/landing", s"$root/store", s"$root/ledger",
      curation = Curation.CurationConfig(
        minQualityScore = 0.0, minTokens = 1, jaccardThreshold = 0.9))
    val engine = new graft.api.GraftEngine(spark, root, s"$root/engine")
    val jobs = new JobStore(spark, s"$root/jobs")
    jobs.save(Scheduler.Job("daily_ingest", "ingest_automation",
      Scheduler.Daily(LocalTime.of(2, 0))),
      Instant.parse("2024-01-01T00:00:00Z"))

    val auto1 = new Automation(engine, Nil, jobStore = Some(jobs),
      ingest = Some(cfg))
    auto1.tick(Instant.parse("2024-01-02T03:00:00Z"))
    auto1.drain()
    auto1.shutdown() // the "crash": a fresh Automation must resume

    val ledger = new IngestScheduler.IngestLedger(spark, s"$root/ledger")
    val day1 = ledger.frame.filter($"slice_id" === "2024-01-01").head()
    assert(day1.getAs[Long]("arrived") == 3)
    assert(day1.getAs[Long]("dropped_exact_within") == 1)
    assert(day1.getAs[Long]("dropped_near_dup") == 1)
    assert(day1.getAs[Long]("kept") == 1)

    // day2 lands while "down": 20 = copy of kept doc 11 (near-dup vs
    // the APPENDED store), 21 new
    Seq(doc(20L, "victor whiskey xray yankee zulu one two"),
        doc(21L, "three four five six seven eight nine"))
      .toDF("doc_id", "text")
      .write.parquet(s"$root/landing/2024-01-02")

    val auto2 = new Automation(engine, Nil, jobStore = Some(jobs),
      ingest = Some(cfg))
    try {
      // same day, job already ran at 03:00 — persisted lastRun must
      // suppress a re-fire even in a fresh process
      auto2.tick(Instant.parse("2024-01-02T04:00:00Z"))
      auto2.drain()
      assert(ledger.frame.count() == 1, "re-fire before next due must no-op")

      auto2.tick(Instant.parse("2024-01-03T03:00:00Z"))
      auto2.drain()
      val day2 = ledger.frame.filter($"slice_id" === "2024-01-02").head()
      assert(day2.getAs[Long]("arrived") == 2)
      assert(day2.getAs[Long]("dropped_near_dup") == 1)
      assert(day2.getAs[Long]("kept") == 1)

      // due again with nothing landed: ledger unchanged
      auto2.tick(Instant.parse("2024-01-04T03:00:00Z"))
      auto2.drain()
      assert(ledger.frame.count() == 2)
    } finally auto2.shutdown()

    // store holds base + the two survivors only
    val sigIds = spark.read.parquet(s"$root/store/signatures")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds == Set(1L, 2L, 3L, 11L, 21L))
    // each processed slice published a durable automation event
    val events = engine.events.feed()
    assert(events.filter($"subtype" === "ingest_slice_processed")
      .count() == 2)
  }
}

class SketchCalibrationSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Dedup

  test("identical docs: estimator and exact both 1.0, zero error") {
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs,
      numHashes = 128, numBands = 32)
    val cands = Dedup.lshCandidatePairs(sigs)
    assert(cands.count() == 1)
    val exact = Dedup.ngramJaccard(docs, cands).head()
    assert(exact.getAs[Double]("jaccard") == 1.0)
    // full signature agreement on identical shingle sets
    val pair = sigs.collect()
      .map(_.getAs[scala.collection.Seq[Long]]("signature").toSeq)
    assert(pair(0) == pair(1), "identical docs must sign identically")
  }
}

class OverlapMatrixSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("identical sources estimate 1; disjoint estimate 0; totality") {
    def words(seed: Int) = (0 until 40)
      .map(i => s"tok${seed}_$i").mkString(" ")
    val docs = Seq(
      ("a", words(1)), ("b", words(1)), // identical shingle sets
      ("c", words(2))) // disjoint from both
      .toDF("source", "text")
    val m = graft.pipeline.Dedup.kmvOverlapMatrix(docs, k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jaccard_est")).toMap
    assert(m.size == 3, "all unordered pairs present")
    assert(m(("a", "b")) == 1.0)
    assert(m(("a", "c")) == 0.0)
    assert(m(("b", "c")) == 0.0)
  }

  test("matrix pair estimate matches the pairwise kmvOverlap result") {
    val docs = Seq(
      ("x", "one two three four five six seven eight nine ten"),
      ("y", "one two three four five sixx sevenn eightt ninee tenn"))
      .toDF("source", "text")
    val matrix = graft.pipeline.Dedup.kmvOverlapMatrix(docs, k = 64)
      .head()
    val pair = graft.pipeline.Dedup.kmvOverlap(
      graft.pipeline.Dedup.kmvShingleSketch(
        docs.filter($"source" === "x"), k = 64),
      graft.pipeline.Dedup.kmvShingleSketch(
        docs.filter($"source" === "y"), k = 64), 64).head()
    assert(matrix.getAs[Long]("sample_inter") ==
      pair.getAs[Long]("sample_inter"))
    assert(matrix.getAs[Double]("jaccard_est") ==
      pair.getAs[Double]("jaccard_est"))
  }
}

class ZipfFitSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("a 1/rank corpus fits slope ≈ −1; a uniform corpus fits ≈ 0") {
    // token w_r appears ⌈1000/r⌉ times, r = 1..20
    val zipfText = (1 to 20)
      .flatMap(r => Seq.fill(math.ceil(1000.0 / r).toInt)(s"w$r"))
      .mkString(" ")
    val z = graft.pipeline.TextAnalysis.zipfFit(
      Seq((1L, zipfText)).toDF("doc_id", "text"), top = 20).head()
    assert(math.abs(z.getAs[Double]("zipf_slope") + 1.0) < 0.02,
      s"zipfian corpus slope ${z.getAs[Double]("zipf_slope")}")
    val uniText = (1 to 20).flatMap(r => Seq.fill(50)(s"u$r"))
      .mkString(" ")
    val u = graft.pipeline.TextAnalysis.zipfFit(
      Seq((1L, uniText)).toDF("doc_id", "text"), top = 20).head()
    assert(math.abs(u.getAs[Double]("zipf_slope")) < 0.01,
      s"uniform corpus slope ${u.getAs[Double]("zipf_slope")}")
  }
}

class PqDistortionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Similarity

  test("ks >= corpus size drives reconstruction distortion to zero") {
    // 16 vectors, ks=16 → every vector becomes its own centroid
    val vecs = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(16)(j => (i * 16 + j).toFloat / 10f)))
      .toDF("vec_id", "embedding")
    val pq = Similarity.pqBuild(vecs, m = 2, ks = 16, lloydIters = 5)
    val dir = java.nio.file.Files
      .createTempDirectory("pqdist").toString
    Similarity.pqSave(pq, dir)
    val cb = spark.read.parquet(s"$dir/codebooks")
      .select(col("sub").as("cb_sub"), col("code").as("cb_code"),
        col("centroid"))
    val dist = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), posexplode(col("code")).as(Seq("sub", "cd")))
      .join(vecs, "vec_id")
      .join(cb, col("sub") === col("cb_sub") && col("cd") === col("cb_code"))
      .withColumn("d", expr(
        """aggregate(zip_with(slice(embedding, sub * 8 + 1, 8), centroid,
          |(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
          |0D, (acc, x) -> acc + x)""".stripMargin))
      .agg(max("d")).head().getDouble(0)
    assert(dist < 1e-9, s"max distortion $dist should be ~0 at ks=n")
  }
}

class HoltBacktestSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("perfect-trend series: Holt beats naive; flat series: at worst ties") {
    import java.sql.Date
    def day(d: Int) = Date.valueOf(f"2024-01-$d%02d")
    // linear series 10,20,...: Holt extrapolates exactly, naive lags
    val lin = (1 to 14).map(d => ("lin", day(d), d * 10.0))
    // flat series: both predict perfectly
    val flat = (1 to 14).map(d => ("flat", day(d), 5.0))
    val out = graft.anomalies.Forecast.holtBacktest(
        (lin ++ flat).toDF("series", "day", "value"),
        Seq("series"), "day", "value",
        cutoff = org.apache.spark.sql.functions.lit(day(11)))
      .orderBy("series").collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    assert(byName("lin").getAs[Boolean]("holt_beats_naive"))
    assert(byName("lin").getAs[Double]("mae_holt") < 1.0)
    assert(byName("lin").getAs[Double]("mae_naive") > 10.0)
    assert(byName("flat").getAs[Double]("mae_holt") == 0.0)
    assert(byName("flat").getAs[Double]("mae_naive") == 0.0)
    assert(out.forall(_.getAs[Long]("n_holdout") == 4))
  }
}

class PartitionPruningSpec extends AnyFunSuite {
  import SharedSpark._

  import org.apache.spark.sql.functions._

  test("day filter reaches the scan as a PartitionFilter") {
    val dir = java.nio.file.Files
      .createTempDirectory("partprune").toString
    SparkEntry.eventsTable(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .select("day", "event_type")
      .write.partitionBy("day").parquet(s"$dir/by_day")
    val pruned = spark.read.parquet(s"$dir/by_day")
      .filter(col("day") === lit("2024-01-05"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      plan.take(1500))
    // and the pruned read equals the plain filter
    val full = SparkEntry.eventsTable(spark, sfDir)
      .filter(to_date(col("ts")) === lit("2024-01-05")).count()
    assert(pruned.count() == full)
  }
}

class VocabGrowthSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("incremental store ingest equals the from-scratch growth lanes") {
    val store = java.nio.file.Files
      .createTempDirectory("vocabstore").toString + "/v"
    val s0 = Seq((1L, "a b a")).toDF("doc_id", "text")
    val s1 = Seq((2L, "a b c c")).toDF("doc_id", "text")
    val s2 = Seq((3L, "a c")).toDF("doc_id", "text")
    graft.pipeline.TextAnalysis.vocabStoreCreate(s0, store)
    val r1 = graft.pipeline.TextAnalysis
      .vocabStoreIngest(store, s1, "s1").head()
    assert(r1.getAs[Long]("n_occurrences") == 4)
    assert(r1.getAs[Long]("n_new_types") == 1) // c
    assert(r1.getAs[Long]("new_occ") == 2)
    assert(r1.getAs[Long]("new_occ_ppm") == 500000L)
    val r2 = graft.pipeline.TextAnalysis
      .vocabStoreIngest(store, s2, "s2").head()
    assert(r2.getAs[Long]("n_new_types") == 0,
      "c entered the store in s1 — s2 must see nothing new")
    // store now holds exactly the union vocabulary
    assert(spark.read.parquet(store).distinct().count() == 3)
  }

  test("new types attribute to their first slice; mass adds up") {
    val docs = Seq(
      ("s0", "a b a"), // s0: tokens a,b — all new
      ("s1", "a b c c"), // s1: c new (2 occ of 4)
      ("s2", "a c")) // s2: nothing new
      .toDF("slice_id", "text")
    val out = graft.pipeline.TextAnalysis
      .vocabGrowth(docs, "slice_id").orderBy("slice_id").collect()
    assert(out.map(_.getAs[Long]("n_new_types")).toSeq == Seq(2L, 1L, 0L))
    assert(out.map(_.getAs[Long]("new_occ")).toSeq == Seq(3L, 2L, 0L))
    assert(out.map(_.getAs[Long]("n_occurrences")).toSeq ==
      Seq(3L, 4L, 2L))
    assert(out(1).getAs[Long]("new_occ_ppm") == 500000L)
    assert(out(2).getAs[Long]("new_occ_ppm") == 0L)
  }
}

class RandomProjectionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Similarity

  test("same seed projects identically; different seed differs; null null") {
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 3 + j).toFloat)))
      .toDF("vec_id", "embedding")
    def proj(seed: Long) = Similarity
      .randomProjection(vecs, 8, 4, seed)
      .orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    val a = proj(7L); val b = proj(7L); val c = proj(8L)
    assert(a.toSeq == b.toSeq, "seeded projection must be deterministic")
    assert(a.toSeq != c.toSeq, "different seeds must differ")
    assert(a.forall(_.length == 4))
    val withNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    assert(Similarity.randomProjection(withNull, 8, 4)
      .head().isNullAt(1))
  }
}

class SceneCutSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Multimodal

  test("the declared cut frame is the only intensity jump per clip") {
    val vids = Multimodal.syntheticSceneCorpus(spark, 6)
    val media = vids.as[(Long, Array[Byte])].map { case (id, bytes) =>
      Multimodal.MediaRow(id, bytes,
        Multimodal.MediaMeta("video", "avi", 32, 32, 0L))
    }
    val feats = Multimodal.frameFeatures(
      Multimodal.sampleFrames(media, intervalMs = 250L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("frame_idx")
    import org.apache.spark.sql.functions._
    val cuts = feats
      .withColumn("delta",
        abs(col("mean_intensity") - lag(col("mean_intensity"), 1).over(w)))
      .filter(col("delta") > 0.1)
      .select("id", "frame_idx").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(cuts.length == 6, "exactly one cut per clip")
    cuts.foreach { case (id, f) =>
      assert(f == (4 + id % 3).toInt, s"clip $id cut at wrong frame $f")
    }
  }
}

class QuarantineSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.validations.Quarantine
  import graft.validations.Quarantine.RowRule
  import org.apache.spark.sql.functions.col

  private val rules = Seq(
    RowRule("v_pos", col("v") >= 0),
    RowRule("s_present", col("s").isNotNull))

  test("annotate names every failed rule; NULL predicates violate") {
    val df = Seq((1, Option("a")), (-2, Option("b")),
      (-3, Option.empty[String]), (4, Option.empty[String]))
      .toDF("v", "s")
    val a = Quarantine.annotate(df, rules).orderBy("v").collect()
    def viol(r: org.apache.spark.sql.Row) =
      r.getAs[scala.collection.Seq[String]]("violations").toSeq
    assert(viol(a(0)) == Seq("v_pos", "s_present")) // v=-3
    assert(viol(a(1)) == Seq("v_pos")) // v=-2
    assert(viol(a(2)).isEmpty) // v=1
    assert(viol(a(3)) == Seq("s_present")) // v=4, s null
  }

  test("split routes rows; summary lanes add up") {
    val df = Seq((1, Option("a")), (-2, Option("b")),
      (3, Option.empty[String])).toDF("v", "s")
    val (clean, bad) = Quarantine.split(df, rules)
    assert(clean.count() == 1 && bad.count() == 2)
    assert(clean.columns.toSeq == Seq("v", "s"))
    val sm = Quarantine.summary(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sm("v_pos") == 1 && sm("s_present") == 1)
    assert(sm("_rows_clean") == 1 && sm("_rows_total") == 3)
  }
}

class ThresholdCurveSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("curve is monotone non-increasing in the threshold") {
    val out = SparkEntry.queries("d14_threshold_curve")(spark, sfDir)
      .collect()
    val pairs = out.map(_.getAs[Long]("n_pairs")).toSeq
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    val docs = out.map(_.getAs[Long]("n_docs_dropped")).toSeq
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
  }
}

class KneserNeySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("hand-computed KN probabilities on a tiny corpus") {
    // corpus bigrams: "a b" x2, "b a" x1, "a c" x1  (docs: "a b a c", "a b")
    // types: {a b, b a, a c}; T=3
    // start counts: a→3 (a b,a b,a c), b→1
    // n1plus: a→2 (b,c), b→1 (a)
    // cont: b→1 (after a), a→1 (after b), c→1 (after a)
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.kneserNeyLogProb(docs)
      .orderBy("doc_id").collect()
    // P(b|a) = (2-.75)/3 + (.75*2/3)*(1/3) = 0.41667+0.16667 = 0.58333
    // P(a|b) = (1-.75)/1 + (.75*1/1)*(1/3) = 0.25+0.25 = 0.5
    // P(c|a) = (1-.75)/3 + (.75*2/3)*(1/3) = 0.08333+0.16667 = 0.25
    val d1 = out(0)
    assert(d1.getAs[Long]("n_bigrams") == 3)
    val pba = (2.0 - 0.75) / 3 + (0.75 * 2) / 3 * (1.0 / 3)
    val pab = (1.0 - 0.75) / 1 + (0.75 * 1) / 1 * (1.0 / 3)
    val pca = (1.0 - 0.75) / 3 + (0.75 * 2) / 3 * (1.0 / 3)
    def micro(p: Double) = math.rint(-math.log(p) * 1e6)
    val expect1 = BigDecimal((micro(pba) + micro(pab) + micro(pca))
      / 3 / 1e6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(d1.getAs[Double]("avg_kn_neg_logprob") - expect1)
      < 2e-6)
    // doc 2 = one bigram "a b"
    assert(out(1).getAs[Long]("n_bigrams") == 1)
    assert(math.abs(out(1).getAs[Double]("avg_kn_neg_logprob") -
      BigDecimal(micro(pba) / 1e6).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
  }
}

class EvolutionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.sources.Evolution
  import org.apache.spark.sql.types._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("evo").toString

  test("widens int->long, float+long->double, null-fills added columns") {
    val dir = tmp()
    Seq((1, 1.5f)).toDF("k", "v")
      .write.parquet(s"$dir/v1")
    Seq((2L, 9L, "x")).toDF("k", "v", "extra")
      .write.parquet(s"$dir/v2")
    val out = Evolution.readEvolved(spark, Seq(s"$dir/v1", s"$dir/v2"))
    assert(out.schema("k").dataType == LongType)
    assert(out.schema("v").dataType == DoubleType)
    assert(out.schema("extra").dataType == StringType)
    val rows = out.orderBy("k").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("v") == 1.5)
    assert(rows(0).getAs[String]("extra") == null)
    assert(rows(1).getAs[String]("extra") == "x")
  }

  test("incompatible drift fails loudly with both types named") {
    val dir = tmp()
    Seq((1, "s")).toDF("k", "v").write.parquet(s"$dir/a")
    Seq((2, 3.0)).toDF("k", "v").write.parquet(s"$dir/b")
    val e = intercept[RuntimeException] {
      Evolution.readEvolved(spark, Seq(s"$dir/a", s"$dir/b"))
    }
    assert(e.getMessage.contains("'v'") &&
      e.getMessage.contains("string") && e.getMessage.contains("double"))
  }

  test("decimal precision/scale widen to cover both") {
    val s = Evolution.widenedSchema(Seq(
      StructType(Seq(StructField("d", DecimalType(10, 2)))),
      StructType(Seq(StructField("d", DecimalType(12, 4))))))
    assert(s("d").dataType == DecimalType(12, 4))
    val s2 = Evolution.widenedSchema(Seq(
      StructType(Seq(StructField("d", DecimalType(18, 0)))),
      StructType(Seq(StructField("d", DecimalType(10, 6))))))
    assert(s2("d").dataType == DecimalType(24, 6))
  }
}

class LeadingEdgeSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("pages on run starts, re-pages every N, suppresses in between") {
    // one series, 10 days: anomalies on days 2-8 (one 7-day run), day 10
    val det = (1 to 10).map(d =>
      ("s", f"2024-01-$d%02d", (d >= 2 && d <= 8) || d == 10))
      .toDF("series", "day", "is_anomaly")
    val out = graft.anomalies.Anomalies.leadingEdgeAlerts(
        det, Seq("series"), "day", reAlertEvery = 3)
      .orderBy("day").collect()
    val alerts = out.filter(_.getAs[Boolean]("alert"))
      .map(_.getAs[String]("day")).toSeq
    // run 1 starts day 2; re-alerts at positions 1,4,7 → days 2,5,8;
    // run 2 starts day 10
    assert(alerts == Seq("2024-01-02", "2024-01-05", "2024-01-08",
      "2024-01-10"))
    val runLens = out.map(_.getAs[Long]("run_length")).toSeq
    assert(runLens == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 0L, 1L))
  }
}

class CountMinSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.profiler.CountMin

  test("merged slice states estimate within the CMS bound; never under") {
    val a = (1 to 300).map(i => (i % 10).toLong).toDF("v")
    val b = (1 to 200).map(i => (i % 5).toLong).toDF("v")
    val states = CountMin.sliceState(a, "v", "s1")
      .unionByName(CountMin.sliceState(b, "v", "s2"))
    val merged = CountMin.merge(states)
    val queries = (0L to 9L).toDF("value")
    val est = CountMin.estimate(merged, queries)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_count")).toMap
    // exact: values 0-4 appear 30+40=70, values 5-9 appear 30
    (0L to 4L).foreach(v => assert(est(v) >= 70L))
    (5L to 9L).foreach(v => assert(est(v) >= 30L))
    val n = 500.0
    val bound = math.ceil(math.E * n / 256.0).toLong
    (0L to 4L).foreach(v => assert(est(v) <= 70L + bound))
    (5L to 9L).foreach(v => assert(est(v) <= 30L + bound))
  }

  test("merge of states equals the state of the union") {
    val a = (1 to 50).map(i => (i % 7).toLong).toDF("v")
    val b = (1 to 30).map(i => (i % 3).toLong).toDF("v")
    val m1 = CountMin.merge(CountMin.sliceState(a, "v", "s1")
      .unionByName(CountMin.sliceState(b, "v", "s2")))
      .orderBy("row", "cell").collect().map(_.toString).toSeq
    val m2 = CountMin.merge(
      CountMin.sliceState(a.unionByName(b), "v", "all"))
      .orderBy("row", "cell").collect().map(_.toString).toSeq
    assert(m1 == m2)
  }
}

class BloomJoinSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("bloom-reduced join equals the plain join exactly") {
    val big = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "payload")
    val small = Seq((3L, "a"), (7L, "b"), (99L, "c")).toDF("k", "tag")
    val reduced = graft.pipeline.Skew
      .bloomReducedJoin(big, small, "k", expectedItems = 100L)
      .orderBy("k", "payload").collect().map(_.toString).toSeq
    val plain = big.join(small, Seq("k"))
      .orderBy("k", "payload").collect().map(_.toString).toSeq
    assert(reduced == plain)
    assert(reduced.size == 30)
  }

  test("non-long keys are rejected loudly") {
    val a = Seq(("x", 1)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Skew.bloomReducedJoin(a, a, "k")
    }
    assert(e.getMessage.contains("LongType"))
  }
}

class CanonicalizeUrlSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.TextAnalysis

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(TextAnalysis.canonicalizeUrl($"u").as("c"))
      .head().getString(0)

  test("case, default ports, fragments, tracking params, param order") {
    assert(canon("https://WWW.Example.com:443/a/") ==
      "https://www.example.com/a")
    assert(canon("http://host.example.com:80/x") ==
      "http://host.example.com/x")
    // non-default port survives
    assert(canon("http://host.example.com:8080/x") ==
      "http://host.example.com:8080/x")
    assert(canon("https://e.com/p?utm_source=a&z=2&a=1#frag") ==
      "https://e.com/p?a=1&z=2")
    assert(canon("https://e.com/p?utm_campaign=x&fbclid=y&gclid=z") ==
      "https://e.com/p")
    // bare root path normalizes away
    assert(canon("https://e.com/") == "https://e.com")
  }

  test("variants of the same resource collapse to one canonical") {
    val urls = Seq(
      "https://WWW.E.com:443/p/1/",
      "https://www.e.com/p/1?utm_source=feed#x",
      "https://www.e.com/p/1")
    assert(urls.map(canon).distinct.size == 1)
  }
}

class StarJoinPlanSpec extends AnyFunSuite {
  import SharedSpark._

  test("x71: dims broadcast, no nested-loop joins, facts hash-join") {
    val plan = SparkEntry.queries("x71_star_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"),
      "nation/region must broadcast")
  }
}

class HtmlExtractSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.TextAnalysis

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(TextAnalysis.extractHtmlText($"h").as("t"))
      .head().getString(0)

  test("scripts/styles drop with content; tags drop; entities decode") {
    val html = """<html><head><style>p{x:1}</style>
      <script>var a = "</b> not text"; if (1 < 2) go();</script></head>
      <body><h1>Title</h1><p>Hello &amp; welcome to &lt;graft&gt;.</p>
      <!-- note --><div>bye</div></body></html>"""
    assert(extract(html) ==
      "Title Hello & welcome to <graft>. bye")
  }

  test("&amp;lt; decodes to the literal entity, not a bracket") {
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
  }

  test("malformed html degrades to whitespace, never fails") {
    assert(extract("no tags at all") == "no tags at all")
    assert(extract("<unclosed <p>mixed</p>") == "mixed")
  }
}

class StreamingSloSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("streaming hourly rollup matches the batch rollup shape") {
    import java.sql.Timestamp
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "error"),
      (Timestamp.valueOf("2024-01-01 10:10:00"), "view"),
      (Timestamp.valueOf("2024-01-01 11:30:00"), "view"))
      .toDF("ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("stslo").toString
    rows.write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(rows.schema).parquet(s"$dir/in")
    val hourly = graft.streaming.StreamingDetect
      .streamingHourlyErrors(stream)
    val q = hourly.writeStream.format("memory")
      .queryName("stslo_sink").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination(120000)
    val out = graft.anomalies.Slo.burnFromHourly(
        spark.table("stslo_sink"))
      .orderBy("hour").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("hour") == "2024-01-01 10:00:00")
    assert(out(0).getAs[Long]("err_1h") == 1)
    assert(out(0).getAs[Long]("total_1h") == 2)
    assert(out(1).getAs[Long]("err_1h") == 0)
  }
}

class SilenceTrimSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Multimodal

  test("the id%5 silence prefixes are found exactly") {
    val clips = Multimodal.syntheticAudioCorpus(spark, 10,
      samplesPerClip = 400)
    val trims = clips.select(col("id"),
        posexplode(Multimodal.audioSamples(col("bytes")))
          .as(Seq("idx", "v")))
      .groupBy("id")
      .agg(min(when(abs(col("v")) > 0.001, col("idx")))
        .as("first_voiced"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("first_voiced"))
      .toMap
    (0L to 9L).foreach { id =>
      // the tone's own first sample is sin(0) = 0, so the first sample
      // past the gate is one AFTER the silence prefix ends
      val expected = ((id % 5) * 400 / 10).toInt + 1
      assert(trims(id) == expected,
        s"clip $id: first voiced ${trims(id)} != silence end $expected")
    }
  }
}

class AudioFingerprintSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Multimodal

  test("gain re-encode matches; different melodies separate; junk null") {
    val base = Multimodal.syntheticMelodyCorpus(spark, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val loud = Multimodal.syntheticMelodyCorpus(spark, 3, gain = 1.05)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    def fp(b: Array[Byte]) = Multimodal.audioFingerprintBytes(b).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0L to 2L).foreach { id =>
      assert(ham(fp(base(id)), fp(loud(id))) <= 3,
        s"gain-only re-encode of clip $id must fingerprint-match")
    }
    assert(ham(fp(base(0L)), fp(base(1L))) > 10,
      "different melodies must separate")
    assert(Multimodal.audioFingerprintBytes("junk".getBytes).isEmpty)
    assert(Multimodal.audioFingerprintBytes(null).isEmpty)
  }
}

class MergeableCardSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.pipeline.Curation

  test("states merged over slices reproduce the direct card's exact lanes") {
    val docs = Seq(
      (1L, "s1", "en", "the quick brown fox jumps over the lazy dog today"),
      (2L, "s1", "en", "the quick brown fox jumps over the lazy dog today"),
      (3L, "s1", "en", "an entirely different document with other words here"),
      (4L, "s2", "en", "short words make a tiny document for source two here"))
      .toDF("doc_id", "source", "lang", "text")
    val states = Curation.cardSliceState(docs.filter($"doc_id" <= 2), "a")
      .unionByName(Curation.cardSliceState(docs.filter($"doc_id" > 2), "b"))
    val merged = Curation.cardFromStates(states)
      .orderBy("source").collect()
    val direct = Curation.datasetCard(docs).orderBy("source").collect()
    assert(merged.length == 2)
    merged.zip(direct).foreach { case (m, dr) =>
      assert(m.getAs[String]("source") == dr.getAs[String]("source"))
      assert(m.getAs[Long]("n_docs") == dr.getAs[Long]("n_docs"))
      assert(m.getAs[Long]("total_tokens") == dr.getAs[Long]("total_tokens"))
      assert(m.getAs[Long]("mean_quality_ppm") ==
        dr.getAs[Long]("mean_quality_ppm"))
    }
    // sparse-mode HLL is exact at these cardinalities
    val s1 = merged.find(_.getAs[String]("source") == "s1").get
    assert(s1.getAs[Long]("approx_distinct_texts") == 2L)
  }
}

class JoinCardinalitySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("per-key products, totals, and top-k selection") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val right = Seq(1L, 1L, 2L, 4L).toDF("k")
    val out = graft.pipeline.Skew.joinCardinality(left, right, "k",
      topK = 10).orderBy($"est_rows".desc).collect()
    // keys in both: 1 (3×2=6), 2 (1×1=1); 3 and 4 one-sided
    assert(out.length == 2)
    assert(out(0).getAs[Long]("k") == 1L)
    assert(out(0).getAs[Long]("est_rows") == 6L)
    assert(out(0).getAs[Long]("total_est_rows") == 7L)
    assert(out(0).getAs[Long]("n_join_keys") == 2L)
    assert(out(0).getAs[Long]("share_ppm") == 857143L)
    // topK bounds the emitted rows
    val top1 = graft.pipeline.Skew.joinCardinality(left, right, "k",
      topK = 1).collect()
    assert(top1.length == 1 && top1.head.getAs[Long]("k") == 1L)
  }
}

class PackEfficiencySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("utilization and overflow lanes from a hand-packed frame") {
    // two sequences in one bucket: fills 90 and 120 vs budget 100
    val packed = Seq(
      (0, 0L, 90L), (0, 1L, 70L), (0, 1L, 50L))
      .toDF("pack_bucket", "seq_id", "sz")
    val out = graft.pipeline.Sampling
      .packEfficiency(packed, "sz", budget = 100L).head()
    assert(out.getAs[Long]("n_seqs") == 2)
    assert(out.getAs[Long]("n_docs") == 3)
    assert(out.getAs[Long]("total_units") == 210)
    assert(out.getAs[Long]("n_overflow_seqs") == 1)
    assert(out.getAs[Long]("max_fill") == 120)
    assert(out.getAs[Long]("capacity") == 200)
    assert(out.getAs[Long]("utilization_ppm") == 1050000L)
  }
}

class HllStatesSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import graft.profiler.HllStates

  test("merged slice states estimate the union's distinct count") {
    val a = (1L to 500L).toDF("v")
    val b = (301L to 900L).toDF("v") // overlap 301-500
    val states = HllStates.sliceState(a, Seq("v"), "s1")
      .unionByName(HllStates.sliceState(b, Seq("v"), "s2"))
    val est = HllStates.mergedDistinct(states)
      .head().getAs[Long]("approx_distinct").toDouble
    // exact = 900; 3σ at lgK=12 ≈ 5%
    assert(math.abs(est - 900.0) <= 45.0,
      s"estimate $est too far from 900")
  }

  test("states are one row per (slice, column)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val st = HllStates.sliceState(df, Seq("id", "s"), "day1")
    assert(st.count() == 2)
    assert(st.select("column").collect().map(_.getString(0)).toSet ==
      Set("id", "s"))
  }
}

class BottomKSampleSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("merge of slice states equals sampling the union directly") {
    val ids = (1L to 200L).toDF("doc_id")
    val a = ids.filter($"doc_id" <= 100)
    val b = ids.filter($"doc_id" > 100)
    val direct = graft.pipeline.Sampling.bottomKSample(ids, 20)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val merged = graft.pipeline.Sampling.mergeBottomK(
      graft.pipeline.Sampling.bottomKSample(a, 20)
        .unionByName(graft.pipeline.Sampling.bottomKSample(b, 20)), 20)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(merged == direct)
    assert(direct.size == 20)
  }

  test("sample is deterministic and k-bounded on a small frame") {
    val ids = (1L to 5L).toDF("doc_id")
    val s1 = graft.pipeline.Sampling.bottomKSample(ids, 10).count()
    assert(s1 == 5, "k larger than the frame keeps every row")
  }
}

class LDiversitySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("homogeneous classes flagged; diverse classes pass; summary mass") {
    val rows = Seq(
      // class (US, A): 3 rows, all "x" → l = 1, violates l = 2
      ("US", "A", "x"), ("US", "A", "x"), ("US", "A", "x"),
      // class (US, B): 2 rows, x and y → l = 2, passes
      ("US", "B", "x"), ("US", "B", "y"),
      // class (DE, A): 1 row → l = 1, violates
      ("DE", "A", "z"))
      .toDF("country", "group", "diag")
    val v = graft.pipeline.Privacy.lDiversityViolations(
      rows, Seq("country", "group"), "diag", l = 2).collect()
    assert(v.length == 2)
    assert(v.forall(_.getAs[Long]("l_distinct") == 1L))
    val s = graft.pipeline.Privacy.lDiversitySummary(
      rows, Seq("country", "group"), "diag", l = 2).head()
    assert(s.getAs[Long]("n_classes") == 3)
    assert(s.getAs[Long]("table_l") == 1)
    assert(s.getAs[Long]("n_classes_below_l") == 2)
    assert(s.getAs[Long]("n_rows_below_l") == 4)
  }
}

class ReconcileSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("per-column equal/diff counters; one-sided keys; null-safe cells") {
    val oldDf = Seq(
      (1L, Option("a"), Option(10)),
      (2L, Option("b"), None),
      (3L, Option("c"), Option(30)),
      (4L, Option("d"), Option(40)))
      .toDF("id", "s", "v")
    val newDf = Seq(
      (1L, Option("a"), Option(10)), // identical
      (2L, Option("B"), None), // s differs, v NULL==NULL equal
      (3L, None, Option(30)), // s value→NULL diff
      (5L, Option("e"), Option(50))) // new-only key
      .toDF("id", "s", "v")
    val out = graft.schemadiff.Reconcile
      .tableReconcile(oldDf, newDf, Seq("id"))
      .orderBy("column").collect()
    assert(out.length == 2)
    val s = out(0)
    assert(s.getAs[String]("column") == "s")
    assert(s.getAs[Long]("n_matched") == 3)
    assert(s.getAs[Long]("n_equal") == 1 && s.getAs[Long]("n_diff") == 2)
    assert(s.getAs[Long]("n_only_old") == 1)
    assert(s.getAs[Long]("n_only_new") == 1)
    val v = out(1)
    assert(v.getAs[Long]("n_equal") == 3, "NULL<=>NULL counts as equal")
    assert(v.getAs[Long]("n_diff") == 0)
  }

  test("explicit compare list restricts the audit") {
    val a = Seq((1L, "x", "y")).toDF("id", "p", "q")
    val out = graft.schemadiff.Reconcile
      .tableReconcile(a, a, Seq("id"), Seq("p")).collect()
    assert(out.map(_.getAs[String]("column")).toSeq == Seq("p"))
  }
}

class IvfBalanceSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("per-cell counts, empty cells surfaced, ppm lanes exact") {
    // 2 well-separated clusters + 1 stray centroid seed: with k=3 from
    // hash-ordered ids, cells form deterministically; we assert the
    // INVARIANTS (totality, empties counted, ppm arithmetic), not a
    // particular layout
    val vecs = (0 until 24).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.tabulate(4)(j =>
        base * (1.0f + 0.001f * (i + j))))
    }.toDF("vec_id", "embedding")
    val idx = graft.pipeline.Similarity.ivfBuild(vecs, k = 4)
    val out = graft.pipeline.Similarity.ivfBalance(idx)
      .orderBy("cell").collect()
    assert(out.length == 4, "one row per cell, empties included")
    assert(out.map(_.getAs[Long]("n")).sum == 24, "assignment is total")
    val empties = out.head.getAs[Long]("empty_cells")
    assert(out.count(_.getAs[Long]("n") == 0L) == empties)
    val maxN = out.map(_.getAs[Long]("n")).max
    assert(out.head.getAs[Long]("max_over_mean_ppm") ==
      math.round(1e6 * maxN * 4 / 24.0))
    assert(out.map(_.getAs[Long]("share_ppm")).sum > 990000L)
  }
}

class CurriculumSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("quartile phases: monotone in score, ties at a cutoff go lower") {
    // scores 1..8 → cutoffs at 2.75 / 4.5 / 6.25
    val df = (1 to 8).map(i => (i.toLong, i.toDouble))
      .toDF("doc_id", "score")
    val out = graft.pipeline.Sampling
      .curriculumPhases(df, "score", phases = 4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("phase")).toSeq ==
      Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // phase is monotone in score
    val byScore = out.sortBy(_.getAs[Double]("score"))
      .map(_.getAs[Int]("phase"))
    assert(byScore.zip(byScore.tail).forall { case (a, b) => a <= b })
    // order_key deterministic: same input → same keys
    val again = graft.pipeline.Sampling
      .curriculumPhases(df, "score", phases = 4)
      .orderBy("doc_id").collect().map(_.getAs[String]("order_key"))
    assert(out.map(_.getAs[String]("order_key")).toSeq == again.toSeq)
  }

  test("constant scores collapse to one phase") {
    val df = (1 to 6).map(i => (i.toLong, 0.5)).toDF("doc_id", "score")
    val out = graft.pipeline.Sampling
      .curriculumPhases(df, "score", phases = 4).collect()
    assert(out.forall(_.getAs[Int]("phase") == 1),
      "ties at every cutoff land in the lowest phase")
  }
}

class DatasetCardSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("per-source lanes: counts, dup rate, deterministic lang argmax") {
    val docs = Seq(
      (1L, "srcA", "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "srcA", "en", "the quick brown fox jumps over the lazy dog"),
      (3L, "srcA", "de", "der schnelle braune fuchs springt gern darüber"),
      (4L, "srcB", "fr", "le renard brun rapide saute par dessus tout"),
      (5L, "srcB", "en", "completely different text with its own words"))
      .toDF("doc_id", "source", "lang", "text")
    val out = graft.pipeline.Curation.datasetCard(docs)
      .orderBy("source").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getAs[String]("source") == "srcA")
    assert(a.getAs[Long]("n_docs") == 3)
    // docs 1+2 are exact dups → 1 of 3 redundant
    assert(a.getAs[Long]("exact_dup_ppm") == 333333L)
    assert(a.getAs[String]("top_lang") == "en")
    assert(a.getAs[Long]("top_lang_docs") == 2)
    val b = out(1)
    assert(b.getAs[Long]("exact_dup_ppm") == 0L)
    // count tie (fr=1, en=1) → lexicographically first lang wins
    assert(b.getAs[String]("top_lang") == "en")
  }
}

class ModelStoreSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  import java.time.Instant

  import graft.pipeline.{Classify, ModelStore}

  private def tmp() =
    java.nio.file.Files.createTempDirectory("modelstore").toString

  private def train(rows: (String, String)*) =
    Classify.compactModel(
      Classify.nbState(rows.toSeq.toDF("label", "text"), "text", "label"),
      maxVocab = 100)

  test("round-trip: a loaded model scores identically to the saved one") {
    val store = new ModelStore(spark, tmp())
    val m = train(("spam", "buy cheap pills now"),
      ("ham", "meeting notes attached here"))
    assert(store.save("gate", m, Instant.parse("2024-01-01T00:00:00Z")) == 1L)
    val docs = Seq((1L, "buy pills"), (2L, "meeting here"))
      .toDF("doc_id", "text")
    val a = Classify.scoreBroadcast(m, docs).orderBy("doc_id").collect()
    val b = Classify.scoreBroadcast(store.load("gate"), docs)
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("latest-version-wins; pinned loadVersion still reads the old one") {
    val store = new ModelStore(spark, tmp())
    val v1 = train(("a", "one two three"), ("b", "four five six"))
    val v2 = train(("a", "seven eight nine"), ("b", "ten eleven twelve"))
    assert(store.save("m", v1, Instant.parse("2024-01-01T00:00:00Z")) == 1L)
    assert(store.save("m", v2, Instant.parse("2024-01-02T00:00:00Z")) == 2L)
    val cur = store.load("m")
    val curToks = cur.tokenScores.select("token")
      .collect().map(_.getString(0)).toSet
    assert(curToks.contains("seven") && !curToks.contains("one"))
    val old = store.loadVersion("m", 1L)
    val oldToks = old.tokenScores.select("token")
      .collect().map(_.getString(0)).toSet
    assert(oldToks.contains("one") && !oldToks.contains("seven"))
  }

  test("tombstone hides the name; history stays; unknown names fail loudly") {
    val store = new ModelStore(spark, tmp())
    store.save("dead", train(("x", "alpha beta")),
      Instant.parse("2024-01-01T00:00:00Z"))
    store.save("alive", train(("y", "gamma delta")),
      Instant.parse("2024-01-01T00:00:00Z"))
    store.delete("dead", Instant.parse("2024-01-02T00:00:00Z"))
    assert(store.list().select("model_name")
      .collect().map(_.getString(0)).toSeq == Seq("alive"))
    val e = intercept[IllegalArgumentException](store.load("dead"))
    assert(e.getMessage.contains("tombstoned"))
    intercept[RuntimeException](store.load("never_saved"))
    // audit lane: the tombstoned model's last live version still loads
    assert(store.loadVersion("dead", 1L).tokenScores.count() > 0)
  }
}

class TruncatedAnnSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("full-dimension arm reproduces ground truth exactly (recall 1)") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
    val same = exact.select(lit("full").as("method"),
      col("query_id"), col("neighbor_id"))
    val rec = Similarity.recallAtK(exact, same).collect()
    assert(rec.length == 3)
    assert(rec.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("broadcast/collect arms fail loudly past maxQueries") {
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(4)(j => (i + j).toFloat))
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(vecs, vecs, k = 3, maxQueries = 5L)
    }
    assert(e.getMessage.contains("maxQueries"))
    // at the cap: fine
    assert(Similarity.bruteForceTopK(vecs,
      vecs.filter(col("vec_id") < 5), k = 3, maxQueries = 5L)
      .count() > 0)
  }

  test("truncated arm degrades but stays within [0,1]") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.cos(i * 13 + j * 5).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    def trunc(df: org.apache.spark.sql.DataFrame, n: Int) =
      df.withColumn("embedding", slice(col("embedding"), 1, n))
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
    val approx = Similarity.bruteForceTopK(trunc(vecs, 2),
        trunc(queries, 2), k = 5)
      .select(lit("dim2").as("method"), col("query_id"),
        col("neighbor_id"))
    val rec = Similarity.recallAtK(exact, approx).collect()
    assert(rec.length == 4)
    assert(rec.forall { r =>
      val x = r.getAs[Double]("recall"); x >= 0.0 && x <= 1.0 })
  }
}
