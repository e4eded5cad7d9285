package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup
import graft.profiler.LogSketch

/** LogSketch (mergeable log-binned quantiles) and the KMV overlap
  * sketch: merge exactness, error bounds, and estimator parity with
  * the exact forms. */
class LogSketchSpec extends AnyFunSuite {
  import SharedSpark._

  private val alpha = 0.01

  // deterministic mixed-sign data: log-uniform magnitudes, some zeros
  private def sample(n: Int, seed: Long): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val u = rnd.nextDouble()
      if (u < 0.05) 0.0
      else {
        val mag = math.exp(rnd.nextDouble() * 12 - 3) // e^-3 .. e^9
        if (u < 0.35) -mag else mag
      }
    }
  }

  test("merging arbitrary slice states equals the single-pass sketch") {
    import spark.implicits._
    val data = sample(5000, seed = 7)
    val df = data.toDF("v")
    val full = LogSketch.merge(LogSketch.sliceState(df, "v", alpha, "full"))
    // split into 3 arbitrary slices by position
    val slices = data.zipWithIndex.groupBy(_._2 % 3).values.toSeq
      .zipWithIndex.map { case (part, i) =>
        LogSketch.sliceState(part.map(_._1).toDF("v"), "v", alpha, s"s$i")
      }
    val merged = LogSketch.merge(slices.reduce(_ unionByName _))
    val a = full.orderBy("lane", "bucket").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val b = merged.orderBy("lane", "bucket").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(a.sameElements(b),
      "merged slice sketch differs from single-pass sketch")
  }

  test("quantile estimates are within the relative-error bound") {
    import spark.implicits._
    val data = sample(5000, seed = 11)
    val df = data.toDF("v")
    val merged = LogSketch.merge(LogSketch.sliceState(df, "v", alpha, "s"))
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.9, 0.99)
    val ests = LogSketch.quantiles(merged, alpha, qs).collect()
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val sorted = data.sorted
    qs.foreach { q =>
      val exact = sorted(math.max(0, math.ceil(q * data.size).toInt - 1))
      val est = ests(q)
      if (exact == 0.0) assert(est == 0.0, s"q=$q: zero lane must be exact")
      else assert(math.abs(est - exact) <= alpha * math.abs(exact) + 1e-12,
        s"q=$q: |$est - $exact| exceeds alpha=$alpha")
    }
  }

  test("state-based PSI: zero for identical slices, positive under shift") {
    import spark.implicits._
    import graft.profiler.Drift
    val base = sample(3000, seed = 21)
    val shifted = base.map(_ * 3.5) // scale shift moves log buckets
    val stA = LogSketch.sliceState(base.toDF("v"), "v", alpha, "a")
    val stB = LogSketch.sliceState(base.toDF("v"), "v", alpha, "b")
    val stC = LogSketch.sliceState(shifted.toDF("v"), "v", alpha, "c")
    val same = Drift.driftFromStates(stA, stB).head()
    assert(same.getAs[Double]("psi") == 0.0,
      "identical distributions must score zero drift")
    val moved = Drift.driftFromStates(stA, stC).head()
    assert(moved.getAs[Double]("psi") > 0.1,
      s"a 3.5x scale shift must register: ${moved.getAs[Double]("psi")}")
    // multi-slice (unmerged) input aggregates before scoring
    val split = Drift.driftFromStates(
      stA.unionByName(LogSketch.sliceState(
        Seq.empty[Double].toDF("v"), "v", alpha, "a2")),
      stB).head()
    assert(split.getAs[Double]("psi") == 0.0)
  }

  test("negative-heavy and all-zero lanes order correctly") {
    import spark.implicits._
    val data = Seq(-100.0, -10.0, -1.0, 0.0, 0.0, 1.0, 10.0)
    val merged = LogSketch.merge(
      LogSketch.sliceState(data.toDF("v"), "v", alpha, "s"))
    val est = LogSketch.quantiles(merged, alpha, Seq(1.0 / 7.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(est(1.0 / 7.0) < -90, "lowest rank must be the most negative")
    assert(est(0.5) == 0.0, "median of this data is the zero lane")
    assert(math.abs(est(1.0) - 10.0) <= alpha * 10.0, "top rank ~ max")
  }
}

class MergeableTopKSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.profiler.MergeableTopK

  // zipf-ish categorical draw: value i with weight ~ 1/(i+1)
  private def zipf(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val w = (1 to vocab).map(1.0 / _)
    val cum = w.scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    (1 to n).map { _ =>
      val u = rnd.nextDouble() * tot
      s"v${cum.indexWhere(_ >= u)}"
    }
  }

  test("coverage + bracketing hold under arbitrary random slicings") {
    import spark.implicits._
    val k = 10
    for (seed <- 1L to 3L) {
      val data = zipf(4000, vocab = 40, seed)
      val rnd = new scala.util.Random(seed * 31)
      val nSlices = 2 + rnd.nextInt(4)
      val sliced = data.map(v => (v, rnd.nextInt(nSlices)))
      val states = (0 until nSlices).map { i =>
        MergeableTopK.sliceState(
          sliced.filter(_._2 == i).map(_._1).toDF("value"), "value", k, s"s$i")
      }.reduce(_ unionByName _)
      val merged = MergeableTopK.merge(states, k).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = data.size.toLong
      // pigeonhole: every global heavy hitter must be a candidate
      exact.filter { case (_, f) => f * k > n }.keys.foreach { v =>
        assert(merged.contains(v), s"seed=$seed: heavy hitter $v missed")
      }
      // bracketing: true count inside [lower, upper] for every candidate
      merged.foreach { case (v, (lo, hi)) =>
        val f = exact(v)
        assert(lo <= f && f <= hi,
          s"seed=$seed: $v count $f outside [$lo, $hi]")
        assert(lo >= 1 && hi >= lo)
      }
    }
  }

  test("a slice with NO candidates still contributes its miss mass") {
    import spark.implicits._
    val k = 5
    // slice A: heavily skewed — "x" is a candidate (40*5 > 100)
    val a = Seq.fill(40)("x") ++ (1 to 60).map(i => s"a$i")
    // slice B: uniform over 50 values ⇒ no candidates at k=5, but "x"
    // appears 2 times there — upper must still cover them via ⌊100/5⌋
    val b = (1 to 49).map(i => s"b$i").flatMap(v => Seq(v, v)) ++ Seq("x", "x")
    val states = MergeableTopK.sliceState(a.toDF("value"), "value", k, "a")
      .unionByName(MergeableTopK.sliceState(b.toDF("value"), "value", k, "b"))
    val m = MergeableTopK.merge(states, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.map(_._1).toSeq == Seq("x"))
    val (_, lo, hi, present) = m.head
    assert(present == 1L, "x is a candidate only in slice A")
    assert(lo == 40L, "lower = slice-A exact count")
    assert(hi == 40L + 100L / k, "upper must include slice B's miss mass")
    assert(lo <= 42L && 42L <= hi, "true global count inside the bracket")
  }

  test("single-slice state is the exact top candidates, zero-width bounds") {
    import spark.implicits._
    val data = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ Seq.fill(15)("c")
    val st = MergeableTopK.sliceState(data.toDF("value"), "value", 4, "s0")
    val merged = MergeableTopK.merge(st, 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // candidates: count*4 > 100 → a(60), b(25 → 100 = not >), so just a
    assert(merged.toSeq == Seq(("a", 60L, 60L)).map(t => (t._1, t._2, t._3)))
  }
}

class StateStoreSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.profiler.{IncrementalProfile, LogSketch, MergeableTopK, SliceStateStore}

  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    (1 to 900).map { i =>
      (i.toLong, math.exp(rnd.nextDouble() * 6), s"v${rnd.nextInt(6)}")
    }.toDF("id", "x", "cat")
  }

  test("store round-trip: every lane answers like the direct computation") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_state_store").toString
    val store = new SliceStateStore(spark, dir)
    val df = fixture
    val slices = (0 until 3).map(i =>
      i -> df.filter(col("id") % 3 === i)).toMap
    slices.foreach { case (i, s) =>
      store.record(s, s"d$i", quantileCols = Seq("x"),
        topKCol = Some("cat"), k = 4)
    }
    // profile over a slice subset == direct incremental merge on it
    val got = store.profile(Seq("d1", "d2"))
      .select("column", "cnt", "nulls", "mn", "mx", "sm")
      .orderBy("column").collect().map(_.toSeq)
    val want = IncrementalProfile.merge(
      IncrementalProfile.sliceState(slices(1), "d1")
        .unionByName(IncrementalProfile.sliceState(slices(2), "d2")))
      .select("column", "cnt", "nulls", "mn", "mx", "sm")
      .orderBy("column").collect().map(_.toSeq)
    assert(got.sameElements(want))
    // quantiles from the store == direct sketch over the same subset
    val qGot = store.quantiles("x", Seq(0.5, 0.9), slices = Seq("d0", "d1"))
      .orderBy("q").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val qWant = LogSketch.quantiles(
      LogSketch.merge(
        LogSketch.sliceState(slices(0), "x", 0.01, "d0")
          .unionByName(LogSketch.sliceState(slices(1), "x", 0.01, "d1"))),
      0.01, Seq(0.5, 0.9))
      .orderBy("q").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(qGot.sameElements(qWant))
    // top-K brackets from the store == direct merge
    val tGot = store.topK(k = 4).collect().map(_.toSeq)
    val tWant = MergeableTopK.merge(
      (0 until 3).map(i =>
        MergeableTopK.sliceState(slices(i), "cat", 4, s"d$i"))
        .reduce(_ unionByName _), 4).collect().map(_.toSeq)
    assert(tGot.sameElements(tWant))
  }

  test("slice-subset reads prune at the partition level") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_state_store_prune").toString
    val store = new SliceStateStore(spark, dir)
    val df = fixture
    (0 until 3).foreach(i =>
      store.record(df.filter(col("id") % 3 === i), s"d$i"))
    val scan = spark.read.parquet(s"$dir/profile")
      .filter(col("slice_id").isin("d1", "d2"))
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("slice_id"),
      s"expected slice_id partition pruning in:\n$scan")
  }

  test("re-recording a slice replaces only that partition") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_state_store_rerec").toString
    val store = new SliceStateStore(spark, dir)
    val df = fixture
    store.record(df.filter(col("id") <= 300), "d0")
    store.record(df.filter(col("id") > 300), "d1")
    // d0 recorded again with different data must not disturb d1
    store.record(df.filter(col("id") <= 150), "d0")
    val merged = store.profile().filter(col("column") === "id").head()
    assert(merged.getAs[Long]("cnt") == 150L + 600L)
  }
}

class KmvSpec extends AnyFunSuite {
  import SharedSpark._

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("estimates are exact when the union fits inside k") {
    val a = corpus(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
    val b = corpus(3L -> "the quick brown fox jumps over a sleeping dog",
      4L -> "pack my box with five dozen liquor jugs")
    val k = 1000 // far above the distinct-shingle count
    val est = Dedup.kmvOverlap(
      Dedup.kmvShingleSketch(a, k = k),
      Dedup.kmvShingleSketch(b, k = k), k).head()
    val exact = Dedup.corpusShingleOverlap(a, b).head()
    assert(est.getAs[Double]("jaccard_est") ==
      exact.getAs[Double]("jaccard"))
    assert(est.getAs[Double]("containment_est") ==
      exact.getAs[Double]("containment"))
  }

  test("merged sketches equal the sketch of the concatenated corpus") {
    val a = corpus(1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six seven")
    val b = corpus(3L -> "alpha beta gamma delta epsilon eta",
      4L -> "eight nine ten eleven twelve thirteen")
    val k = 8
    val merged = Dedup.kmvMerge(
      Seq(Dedup.kmvShingleSketch(a, k = k), Dedup.kmvShingleSketch(b, k = k)),
      k).orderBy("h").collect().map(_.getString(0))
    val whole = Dedup.kmvShingleSketch(a.unionByName(b), k = k)
      .orderBy("h").collect().map(_.getString(0))
    assert(merged.sameElements(whole), "KMV not closed under union")
  }

  test("k=256 estimate tracks the exact overlap on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val k = 256
    val est = Dedup.kmvOverlap(
      Dedup.kmvShingleSketch(a, k = k),
      Dedup.kmvShingleSketch(b, k = k), k).head()
    val exact = Dedup.corpusShingleOverlap(a, b).head()
    assert(math.abs(est.getAs[Double]("jaccard_est") -
      exact.getAs[Double]("jaccard")) <= 0.2)
    assert(math.abs(est.getAs[Double]("containment_est") -
      exact.getAs[Double]("containment")) <= 0.2)
  }
}
