package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.anomalies.Changepoint
import graft.pipeline.Dedup
import graft.sources.CsvSource
import graft.streaming.StreamingDetect

class CsvSourceSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("csvsrc").toString

  test("round-trips separators, quotes, and unicode losslessly") {
    val rows = Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "mixed, \"both\", of them"),
      (5L, "unicode 你好 héllo"))
    val dir = tmp()
    CsvSource.write(rows.toDF("id", "text"), dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = CsvSource.read(spark, dir, schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == rows)
  }

  test("pinned schema: malformed numeric rows become NULLs, not failures") {
    val dir = tmp()
    Seq(("1", "ok"), ("not_a_number", "bad"), ("3", "ok2"))
      .toDF("id", "text").write.mode("overwrite")
      .option("header", "true").csv(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = CsvSource.read(spark, dir, schema)
    assert(back.count() == 3)
    assert(back.filter(col("id").isNull).count() == 1)
  }

  test("inferSchema finds the numeric column") {
    val dir = tmp()
    CsvSource.write(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val inferred = CsvSource.inferSchema(spark, dir)
    assert(inferred.fieldNames.toSeq == Seq("id", "text"))
    assert(inferred("id").dataType ==
      org.apache.spark.sql.types.IntegerType ||
      inferred("id").dataType == org.apache.spark.sql.types.LongType)
  }
}

class DedupEvalSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("nearDupEval counts hits and derives P/R/F1") {
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("id_a", "id_b")
    val pred = Seq((1L, 2L), (3L, 4L), (9L, 10L))
      .toDF("id_a", "id_b")
    val r = Dedup.nearDupEval(truth, pred).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 2L)))
    assert(r.getDouble(3) == 0.666667) // precision 2/3
    assert(r.getDouble(4) == 0.5)      // recall 2/4
    assert(r.getDouble(5) == 0.571429) // dice 4/7
  }

  test("nearDupEval: empty prediction set yields NULL precision") {
    val truth = Seq((1L, 2L)).toDF("id_a", "id_b")
    val pred = truth.filter(lit(false))
    val r = Dedup.nearDupEval(truth, pred).collect()(0)
    assert(r.getLong(1) == 0L && r.isNullAt(3))
    assert(r.getDouble(4) == 0.0)
  }
}

class PrivacySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.Privacy

  private val tbl = Seq(
    ("US", "A"), ("US", "A"), ("US", "A"),  // class of 3
    ("US", "B"),                            // class of 1 (the k floor)
    ("DE", "A"), ("DE", "A")                // class of 2
  ).toDF("country", "segment")

  test("kAnonymityViolations lists sub-k classes with the table k") {
    val v = Privacy.kAnonymityViolations(tbl, Seq("country", "segment"),
        k = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(v == Seq(("US", "B", 1L, 1L), ("DE", "A", 2L, 1L)))
    assert(Privacy.kAnonymityViolations(tbl, Seq("country"), k = 2)
      .count() == 0) // country alone is 2-anonymous
  }

  test("kAnonymitySummary counts classes and exposed rows") {
    val s = Privacy.kAnonymitySummary(tbl, Seq("country", "segment"),
      k = 3).collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      ((3L, 1L, 2L, 3L)))
  }

  test("NULL quasi values form their own class") {
    val withNull = tbl.unionByName(
      Seq((null.asInstanceOf[String], "A")).toDF("country", "segment"))
    val v = Privacy.kAnonymityViolations(withNull,
      Seq("country", "segment"), k = 2)
    assert(v.filter(col("country").isNull).count() == 1)
  }
}

class AttributionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("anomalyContributors flags the spike day, ranks the mover") {
    // series "e": 4 quiet days of 10 events + one 50-event spike day;
    // user 7 contributes 30 of the spike's 50 but only 4 of the other
    // 40 — the clear mover. user 1 is steady background.
    def day(d: Int, user: Long, n: Int) = (1 to n).map(_ =>
      ("e", Timestamp.valueOf(f"2024-02-0$d%d 10:00:00"), user))
    val rows =
      (1 to 4).flatMap(d => day(d, 1L, 9) ++ day(d, 7L, 1)) ++
        day(5, 1L, 20) ++ day(5, 7L, 30)
    val ev = rows.toDF("event_type", "ts", "user_id")
    val out = graft.anomalies.Attribution
      .anomalyContributors(ev, k = 2)
      .orderBy("day", "rank").collect()
    assert(out.map(_.getDate(1).toString).distinct.toSeq ==
      Seq("2024-02-05"))
    val top = out(0)
    assert(top.getLong(2) == 7L)          // contributor
    assert(top.getLong(3) == 30L)         // day_count
    assert(top.getLong(4) == 50L)         // day_total
    // share delta: 30/50 − 4/40 = 0.5 → 500000 ppm
    assert(top.getLong(5) == 500000L)
    assert(out(1).getLong(2) == 1L && out(1).getLong(5) < 0L)
  }

  test("anomalyContributors: constant series flags every day (σ = 0) " +
      "and a 1-day series flags nothing") {
    val flat = (1 to 3).map(d =>
      ("f", Timestamp.valueOf(f"2024-02-0$d%d 10:00:00"), 1L))
      .toDF("event_type", "ts", "user_id")
    // σ=0 ⇒ every day is "≥ 2σ" under the integer test (0 ≥ 0): the
    // degenerate-but-consistent contract, and deltas are all 0
    val out = graft.anomalies.Attribution.anomalyContributors(flat)
    assert(out.count() == 3 &&
      out.filter(col("delta_ppm") =!= 0L).count() == 0)
    val single = Seq(("g", Timestamp.valueOf("2024-02-01 10:00:00"), 1L))
      .toDF("event_type", "ts", "user_id")
    assert(graft.anomalies.Attribution.anomalyContributors(single)
      .count() == 0)
  }
}

class IncrementalClustersSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.Dedup

  test("new edges bridge old clusters; untouched singletons survive") {
    // day 1: clusters {1,2} and {4,5}; 9 alone (self-assignment)
    val assignments = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L),
      (9L, 9L)).toDF("doc_id", "cluster_id")
    // day 2: 2-4 bridges the two clusters; 7-8 is brand new
    val newPairs = Seq((2L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.incrementalClusters(assignments, newPairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (4L, 1L), (5L, 1L),
      (7L, 7L), (8L, 7L), (9L, 9L)))
  }

  test("incremental result equals a from-scratch re-cluster") {
    val all = (1L to 40L).flatMap(i =>
      if (i % 3 != 0) Seq((i, i + 1)) else Nil).toDF("id_a", "id_b")
    val day1 = all.filter(col("id_a") < 20)
    val day2 = all.filter(col("id_a") >= 20)
    val inc = Dedup.incrementalClusters(
        Dedup.duplicateClusters(day1), day2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = Dedup.duplicateClusters(all)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(inc.toSeq == full.toSeq)
  }
}

class ClassificationReportSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("per-class counts and metrics; one-sided classes keep rows") {
    // truth:    a a a b b c
    // predicted:a a b b c d   (c never predicted right; d never true)
    val scored = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "c"), ("c", "d")).toDF("truth", "predicted")
    val r = graft.pipeline.Classify.classificationReport(scored)
      .orderBy("class").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSeq
    assert(r == Seq(
      ("a", 3L, 2L, 2L), ("b", 2L, 2L, 1L),
      ("c", 1L, 1L, 0L), ("d", 0L, 1L, 0L)))
    val m = graft.pipeline.Classify.classificationReport(scored)
      .filter(col("class") === "a").collect()(0)
    assert(m.getDouble(4) == 1.0)      // precision 2/2
    assert(m.getDouble(5) == 0.666667) // recall 2/3
    assert(m.getDouble(6) == 0.8)      // dice 4/5
    val d = graft.pipeline.Classify.classificationReport(scored)
      .filter(col("class") === "d").collect()(0)
    assert(d.isNullAt(5))              // never true -> recall NULL
  }
}

class ChangepointSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("binarySegmentation finds a clean level shift") {
    // 5 points at 10, then 5 at 20: split at t=6, means 10/20,
    // base SSE = 250 (two groups of 5, each 5*25 from the mean 15),
    // two-segment SSE = 0 -> reduction 250
    val s = ((1 to 5).map(t => ("a", t, 10.0)) ++
      (6 to 10).map(t => ("a", t, 20.0))).toDF("key", "t", "y")
    val r = Changepoint.binarySegmentation(s, Seq("key"), "t", "y")
      .collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getInt(2) == 6)
    assert(r.getDouble(3) == 10.0 && r.getDouble(4) == 20.0)
    assert(math.abs(r.getDouble(5) - 250.0) < 1e-9)
  }

  test("binarySegmentation: constant series, tie breaks earliest") {
    val s = (1 to 6).map(t => ("c", t, 7.0)).toDF("key", "t", "y")
    val r = Changepoint.binarySegmentation(s, Seq("key"), "t", "y")
      .collect()(0)
    assert(r.getInt(2) == 2) // every split costs 0 -> earliest wins
    assert(math.abs(r.getDouble(5)) < 1e-9)
  }

  test("binarySegmentation drops 1-point series") {
    val s = Seq(("a", 1, 5.0)).toDF("key", "t", "y")
    assert(Changepoint.binarySegmentation(s, Seq("key"), "t", "y")
      .count() == 0)
  }
}

class AssetManifestSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.Multimodal

  test("assetManifest: per-type metadata lanes + junk stays undecodable") {
    val blobs = Multimodal.syntheticImageCorpus(spark, groups = 1)
      .limit(1)
      .unionByName(Multimodal.syntheticAudioCorpus(spark, n = 1)
        .select((col("id") + 10L).as("id"), col("bytes")))
      .unionByName(Multimodal.syntheticVideoCorpus(spark, n = 1)
        .select((col("id") + 20L).as("id"), col("bytes")))
      .unionByName(Seq((30L, "junk".getBytes("UTF-8"))).toDF("id", "bytes"))
    val m = Multimodal.assetManifest(blobs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val img = m(0L)
    assert(img.getString(1) == "png" && img.getInt(3) == 32 &&
      img.getInt(4) == 32 && img.isNullAt(7) && img.getBoolean(8))
    val aud = m(10L)
    assert(aud.getString(1) == "wav" && aud.isNullAt(3) &&
      aud.getInt(6) >= 1 && aud.getInt(7) > 0 && aud.getBoolean(8))
    val vid = m(20L)
    assert(vid.getInt(3) == 32 && vid.getLong(5) > 0 && vid.getBoolean(8))
    val junk = m(30L)
    assert(junk.getString(1) == "unknown" && !junk.getBoolean(8) &&
      junk.isNullAt(3) && junk.isNullAt(5))
  }
}

class RetentionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.history.Retention

  test("expirePartitions drops strictly-older dirs, keeps cutoff and junk") {
    val dir = java.nio.file.Files.createTempDirectory("ret").toString
    Seq(("2024-01-01", 1), ("2024-01-14", 2), ("2024-01-15", 3),
      ("2024-02-01", 4)).toDF("date", "v")
      .write.mode("overwrite").partitionBy("date").parquet(dir)
    // a non-date partition dir must survive untouched
    val junk = new java.io.File(dir, "date=not-a-date")
    junk.mkdirs()
    val r = Retention.expirePartitions(spark, dir,
      java.time.LocalDate.parse("2024-01-15"))
    assert(r.dropped == Seq("date=2024-01-01", "date=2024-01-14"))
    assert(r.kept.contains("date=2024-01-15") &&
      r.kept.contains("date=2024-02-01") &&
      r.kept.contains("date=not-a-date"))
    assert(junk.exists())
    val back = spark.read.parquet(dir).select("v")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(back == Seq(3, 4))
  }

  test("expirePartitions on a missing path is a no-op") {
    val r = Retention.expirePartitions(spark, "/tmp/ret_does_not_exist",
      java.time.LocalDate.parse("2024-01-01"))
    assert(r.dropped.isEmpty && r.kept.isEmpty)
  }
}

class Round11PlanSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("dsirWeights scoring join broadcasts the model grid") {
    val docs = Seq((1L, "a b c", true), (2L, "b c d", false))
      .toDF("doc_id", "text", "t")
    val plan = graft.pipeline.Selection
      .dsirWeights(docs, col("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model-grid join must broadcast, got:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("entity-resolution pair generation is an equi-join, never a cross") {
    val recs = Seq((1L, "abcd x"), (2L, "abcd y")).toDF("record_id", "name")
    val plan = graft.pipeline.EntityResolution
      .candidatePairs(recs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"blocking must produce an equi-join, got:\n$plan")
  }

  test("scd2Merge joins on the key, no cartesian") {
    // Catalyst pushes each union branch's inDim/inSnap filter into the
    // full-outer join and SPECIALIZES it (left-outer / inner /
    // right-outer per branch) — assert the joins stay key-equi
    // (hashed), whatever outer-ness each branch resolves to
    val dim = graft.operators.Scd.scd2Init(
      Seq((1L, 1.0)).toDF("k", "v"), "2025-01-01 00:00:00")
    val plan = graft.operators.Scd.scd2Merge(dim,
        Seq((1L, 2.0)).toDF("k", "v"), Seq("k"), Seq("v"),
        "2026-01-01 00:00:00")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected key-equi joins:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}

class CdcHistorySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cdcHistoryStream closes versions across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[StreamingDetect.CdcEvent]
    val hist = StreamingDetect.cdcHistoryStream(ms.toDS())
    val q = hist.toDF().writeStream.outputMode("append")
      .format("memory").queryName("cdc_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    // batch 1: key 1 goes A -> B (A closes); key 2 stays open on X;
    // same-value repeat (B again) must NOT create a version
    ms.addData(
      StreamingDetect.CdcEvent(1L, 1L, ts("2024-01-01 00:00:00"), "A"),
      StreamingDetect.CdcEvent(1L, 2L, ts("2024-01-01 01:00:00"), "B"),
      StreamingDetect.CdcEvent(1L, 3L, ts("2024-01-01 02:00:00"), "B"),
      StreamingDetect.CdcEvent(2L, 4L, ts("2024-01-01 00:30:00"), "X"))
    q.processAllAvailable()
    val afterB1 = spark.table("cdc_sink").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(afterB1 == Seq((1L, "A")))
    // batch 2: key 2's X closes — the open version survived batch 1
    // in state; key 1's B closes too
    ms.addData(
      StreamingDetect.CdcEvent(2L, 5L, ts("2024-01-02 00:00:00"), "Y"),
      StreamingDetect.CdcEvent(1L, 6L, ts("2024-01-02 00:00:00"), "C"))
    q.processAllAvailable()
    val all = spark.table("cdc_sink").orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSeq
    q.stop()
    assert(all == Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (1L, "B", ts("2024-01-01 01:00:00"), ts("2024-01-02 00:00:00")),
      (2L, "X", ts("2024-01-01 00:30:00"), ts("2024-01-02 00:00:00"))))
  }

  test("cdcHistoryStream orders same-batch events by (ts, seq)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[StreamingDetect.CdcEvent]
    val hist = StreamingDetect.cdcHistoryStream(ms.toDS())
    val q = hist.toDF().writeStream.outputMode("append")
      .format("memory").queryName("cdc_sink2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // delivered out of order; ts order is C(00) -> A(01) -> B(02)
    ms.addData(
      StreamingDetect.CdcEvent(9L, 2L, ts("2024-01-01 01:00:00"), "A"),
      StreamingDetect.CdcEvent(9L, 1L, ts("2024-01-01 00:00:00"), "C"),
      StreamingDetect.CdcEvent(9L, 3L, ts("2024-01-01 02:00:00"), "B"))
    q.awaitTermination()
    val rows = spark.table("cdc_sink2").orderBy("valid_from").collect()
      .map(_.getString(1)).toSeq
    assert(rows == Seq("C", "A"))
  }
}
