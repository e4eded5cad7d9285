package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.anomalies.Forecast
import graft.operators.{Completeness, Scd}
import graft.pipeline.{EntityResolution, Multimodal, Selection, Similarity}

class CompletenessSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("deliveryGaps finds missing-hour runs and collapses them") {
    // series a: hours 00,01,02,05,06,09 — gaps [03-04] and [07-08]
    // series b: full coverage 00-02 — no gaps
    val ev = Seq(
      ("a", ts("2024-03-01 00:10:00")), ("a", ts("2024-03-01 01:20:00")),
      ("a", ts("2024-03-01 02:30:00")), ("a", ts("2024-03-01 05:59:00")),
      ("a", ts("2024-03-01 06:00:00")), ("a", ts("2024-03-01 09:01:00")),
      ("b", ts("2024-03-01 00:00:00")), ("b", ts("2024-03-01 01:00:00")),
      ("b", ts("2024-03-01 02:00:00"))).toDF("event_type", "ts")
    val gaps = Completeness.deliveryGaps(ev)
      .orderBy("series", "gap_start").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(gaps == Seq(
      ("a", "2024-03-01 03:00:00", "2024-03-01 04:00:00", 2L),
      ("a", "2024-03-01 07:00:00", "2024-03-01 08:00:00", 2L)))
  }

  test("deliveryGaps: duplicate arrivals within an hour count once") {
    val ev = Seq(
      ("x", ts("2024-03-01 00:00:00")), ("x", ts("2024-03-01 00:30:00")),
      ("x", ts("2024-03-01 02:00:00"))).toDF("event_type", "ts")
    val gaps = Completeness.deliveryGaps(ev).collect()
    assert(gaps.length == 1)
    assert(gaps(0).getString(1) == "2024-03-01 01:00:00")
    assert(gaps(0).getLong(3) == 1L)
  }
}

class ScdSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val t0 = "2025-01-01 00:00:00"
  private val t1 = "2025-02-01 00:00:00"
  private val t2 = "2025-03-01 00:00:00"

  test("scd2Merge: unchanged / changed / deleted / inserted") {
    val dim = Scd.scd2Init(
      Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
        .toDF("k", "bal", "seg"), t0)
    val snap = Seq((1L, 10.0, "A"), (2L, 25.0, "B"), (4L, 40.0, "D"))
      .toDF("k", "bal", "seg") // 3 deleted, 2 changed, 4 new
    val out = Scd.scd2Merge(dim, snap, Seq("k"), Seq("bal", "seg"), t1)
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3), r.getString(4), r.getBoolean(5))).toSeq
    assert(out == Seq(
      (1L, 10.0, "A", t0, Scd.OpenEnd, true),
      (2L, 20.0, "B", t0, t1, false),
      (2L, 25.0, "B", t1, Scd.OpenEnd, true),
      (3L, 30.0, "C", t0, t1, false),
      (4L, 40.0, "D", t1, Scd.OpenEnd, true)))
  }

  test("scd2Merge: closed history passes through a second merge") {
    val dim0 = Scd.scd2Init(Seq((1L, 10.0, "A")).toDF("k", "bal", "seg"), t0)
    val dim1 = Scd.scd2Merge(dim0,
      Seq((1L, 11.0, "A")).toDF("k", "bal", "seg"),
      Seq("k"), Seq("bal", "seg"), t1)
    val dim2 = Scd.scd2Merge(dim1,
      Seq((1L, 12.0, "A")).toDF("k", "bal", "seg"),
      Seq("k"), Seq("bal", "seg"), t2)
    val rows = dim2.orderBy("valid_from").collect()
      .map(r => (r.getDouble(1), r.getString(3), r.getString(4),
        r.getBoolean(5))).toSeq
    assert(rows == Seq(
      (10.0, t0, t1, false),
      (11.0, t1, t2, false),
      (12.0, t2, Scd.OpenEnd, true)))
  }

  test("scd2Merge: null-safe tracked compare (NULL→NULL is unchanged)") {
    val dim = Scd.scd2Init(
      Seq((1L, Option.empty[Double], "A"), (2L, Option.empty[Double], "B"))
        .toDF("k", "bal", "seg"), t0)
    val snap = Seq((1L, Option.empty[Double], "A"), (2L, Some(5.0), "B"))
      .toDF("k", "bal", "seg")
    val out = Scd.scd2Merge(dim, snap, Seq("k"), Seq("bal", "seg"), t1)
    assert(out.filter(col("k") === 1).count() == 1)     // unchanged
    assert(out.filter(col("k") === 2).count() == 2)     // NULL→5.0 change
  }
}

class EntityResolutionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val recs = Seq(
    (1L, "acme corp"),
    (2L, "acme corp."),         // distance 1 from 1
    (3L, "acme holdings ltd"),  // same block, far from both
    (4L, "zenith labs"),        // different block: singleton
    (5L, "acme corps")          // distance 1 from both 1 and 2
  ).toDF("record_id", "name")

  test("candidatePairs: within-block, threshold-bounded") {
    val pairs = EntityResolution
      .candidatePairs(recs, maxDistance = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 1), (1L, 5L, 1), (2L, 5L, 1)))
  }

  test("resolve: transitive closure + singleton self-clusters") {
    val out = EntityResolution.resolve(recs, maxDistance = 2)
      .orderBy("record_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 3L, 1L),
      (4L, 4L, 1L), (5L, 1L, 3L)))
  }
}

class SelectionSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", true),
    (2L, "the quick brown fox likes the lazy dog", true),
    (3L, "the quick brown fox jumps over a fence", false),
    (4L, "stock prices fell sharply on tuesday trading", false),
    (5L, "", false)).toDF("doc_id", "text", "is_target")

  test("dsirWeights: target-like docs outweigh unlike docs; empty = 0") {
    val w = Selection.dsirWeights(docs, col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(3L) > w(4L)) // shares target bigrams vs none
    assert(w(5L) == 0L)   // no bigrams -> zero weight, still present
    assert(w.size == 5)
  }

  test("dsirSelect: deterministic top-k cut") {
    val a = Selection.dsirSelect(docs, col("is_target"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    val b = Selection.dsirSelect(docs, col("is_target"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.length == 3)
  }
}

class ForecastSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("holtLinear reproduces the recurrence on a hand-worked series") {
    // y = [10, 12, 11, 15]; alpha=0.5, beta=0.3
    // l1=10, b1=2
    // t2: l=0.5*12+0.5*12=12,       b=0.3*2+0.7*2=2
    // t3: l=0.5*11+0.5*14=12.5,     b=0.3*0.5+0.7*2=1.55
    // t4: l=0.5*15+0.5*14.05=14.525 b=0.3*2.025+0.7*1.55=1.6925
    val s = Seq(("m", 1, 10.0), ("m", 2, 12.0), ("m", 3, 11.0),
      ("m", 4, 15.0)).toDF("key", "t", "y")
    val r = Forecast.holtLinear(s, Seq("key"), "t", "y").collect()(0)
    assert(r.getInt(1) == 4)
    assert(math.abs(r.getDouble(2) - 14.525) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.6925) < 1e-9)
    assert(math.abs(r.getDouble(4) - (14.525 + 1.6925)) < 1e-9)
    assert(math.abs(r.getDouble(6) - (14.525 + 3 * 1.6925)) < 1e-9)
  }

  test("holtLinear locks onto a linear series") {
    // y = 3t + 1: level rides the line, trend locks at 3
    val s = (1 to 20).map(t => ("lin", t, 3.0 * t + 1)).toDF("key", "t", "y")
    val r = Forecast.holtLinear(s, Seq("key"), "t", "y").collect()(0)
    assert(math.abs(r.getDouble(2) - 61.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 64.0) < 1e-9) // continues the line
  }

  test("holtLinear drops 1-point series") {
    val s = Seq(("a", 1, 5.0), ("b", 1, 1.0), ("b", 2, 2.0))
      .toDF("key", "t", "y")
    val out = Forecast.holtLinear(s, Seq("key"), "t", "y")
    assert(out.select("key").collect().map(_.getString(0)).toSeq == Seq("b"))
  }
}

class RecallSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("recallAtK: hits, misses, and absent-query rows") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq(
      ("m1", 1L, 10L), ("m1", 1L, 99L),  // 1/2 on q1
      ("m1", 2L, 20L), ("m1", 2L, 21L),  // 2/2 on q2
      ("m2", 1L, 10L), ("m2", 1L, 11L))  // m2 returned nothing for q2
      .toDF("method", "query_id", "neighbor_id")
    val out = Similarity.recallAtK(exact, approx)
      .orderBy("method", "query_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out == Seq(
      ("m1", 1L, 2L, 1L, 0.5), ("m1", 2L, 2L, 2L, 1.0),
      ("m2", 1L, 2L, 2L, 1.0), ("m2", 2L, 2L, 0L, 0.0)))
  }
}

class PHashSpec extends AnyFunSuite {
  import SharedSpark._

  private def corpus = Multimodal.syntheticImageCorpus(spark, groups = 4)

  test("pHash: intra-group variants are near, cross-group far") {
    val sigs = Multimodal.pHashSignatures(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 16)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0 until 4; v <- 1 until 4)
      assert(ham(sigs(g * 4L), sigs(g * 4L + v)) <= 4,
        s"group $g variant $v drifted")
    val far = for (g <- 0 until 3) yield ham(sigs(g * 4L), sigs((g + 1) * 4L))
    assert(far.forall(_ > 10), s"cross-group too close: $far")
  }

  test("pHash is invariant to a uniform brightness shift (DC-only)") {
    val side = 8
    def png(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new java.util.Random(7L)
      for (y <- 0 until side; x <- 0 until side) {
        val g = math.min(200, rnd.nextInt(150)) + shift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val h0 = Multimodal.pHashBytes(png(0)).get
    val h1 = Multimodal.pHashBytes(png(40)).get
    assert(h0 == h1)
  }

  test("pHash: undecodable bytes drop out") {
    assert(Multimodal.pHashBytes("not an image".getBytes).isEmpty)
  }
}

class StreamingTopKSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("streamingTopKStates ≡ batch per-window counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    ms.addData(
      (Timestamp.valueOf("2024-01-01 01:00:00"), "a"),
      (Timestamp.valueOf("2024-01-01 02:00:00"), "a"),
      (Timestamp.valueOf("2024-01-01 03:00:00"), "b"),
      (Timestamp.valueOf("2024-01-02 01:00:00"), "b"))
    val states = graft.streaming.StreamingDetect.streamingTopKStates(
      ms.toDF().toDF("ts", "v"), "ts", "v")
    val q = states.writeStream.outputMode("complete")
      .format("memory").queryName("tk_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("tk_sink")
      .orderBy("slice_id", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-02 00:00:00", "a", 2L),
      ("2024-01-02 00:00:00", "b", 1L),
      ("2024-01-03 00:00:00", "b", 1L)))
  }
}
