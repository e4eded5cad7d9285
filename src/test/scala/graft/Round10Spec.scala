package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Classify, Dedup}
import graft.sources.JsonSource

/** Round-10 session-3 additions: trainable NB classification, takedown
  * propagation, JSONL ingestion. */
class ClassifySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  /** The model's own quantization: micro-nats, half away from zero —
    * matches Spark's round() and DuckDB's ROUND so the spec pins the
    * same arithmetic the oracle replays. */
  private def micro(v: Double): Long =
    BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("trainNaiveBayes + scoreNaiveBayes: hand-computed Laplace NB") {
    val train = Seq(
      ("spam", "buy buy pills"),
      ("ham", "meeting notes notes")).toDF("label", "text")
    val model = Classify.trainNaiveBayes(train)
    // vocab = {buy, pills, meeting, notes} → V=4; each label tot=3
    val scored = Classify.scoreNaiveBayes(model,
      Seq((1L, "buy pills")).toDF("doc_id", "text")).collect()
    assert(scored.length == 1)
    assert(scored.head.getAs[String]("predicted") == "spam")
    val want = micro(math.log(0.5)) + // prior 1 of 2 docs
      micro(math.log(3.0 / 7)) + // buy: (2+1)/(3+4)
      micro(math.log(2.0 / 7)) // pills: (1+1)/(3+4)
    assert(scored.head.getAs[Long]("score_micro") == want)
  }

  test("scoreNaiveBayes: ties break to the lexicographically smallest " +
      "label; OOV-only docs score prior + n·unseen") {
    val train = Seq(("l1", "x"), ("l2", "x")).toDF("label", "text")
    val model = Classify.trainNaiveBayes(train)
    val out = Classify.scoreNaiveBayes(model,
      Seq((1L, "x"), (2L, "zz zz")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    // doc 1: both labels identical by symmetry → l1 wins the tie
    assert(out(0).getAs[String]("predicted") == "l1")
    // doc 2: zz unseen everywhere → prior + 2·unseen, still l1 by tie
    assert(out(1).getAs[String]("predicted") == "l1")
    val want = micro(math.log(0.5)) + 2 * micro(math.log(1.0 / 2))
    assert(out(1).getAs[Long]("score_micro") == want) // tot=1, V=1
  }

  test("nbState/nbMerge: model from merged slice states is IDENTICAL " +
      "to batch training on the union (counts add exactly)") {
    val a = Seq(("spam", "buy pills now"), ("ham", "weekly notes"))
      .toDF("label", "text")
    val b = Seq(("spam", "buy buy"), ("ham", "meeting notes notes"))
      .toDF("label", "text")
    val merged = Classify.modelFromState(
      Classify.nbMerge(Seq(Classify.nbState(a), Classify.nbState(b))))
    val batch = Classify.trainNaiveBayes(a.unionByName(b))
    val probe = Seq((1L, "buy pills"), (2L, "weekly meeting notes"),
      (3L, "zz unseen")).toDF("doc_id", "text")
    val mRows = Classify.scoreNaiveBayes(merged, probe)
      .orderBy("doc_id").collect().toSeq
    val bRows = Classify.scoreNaiveBayes(batch, probe)
      .orderBy("doc_id").collect().toSeq
    assert(mRows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ==
      bRows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
  }

  test("compactModel caps the vocabulary to top-N by total count and " +
      "recomputes V/totals; scoreBroadcast ≡ scoreNaiveBayes on it") {
    val train = Seq(
      ("spam", "buy buy buy pills cheap"),
      ("ham", "notes notes meeting agenda today")).toDF("label", "text")
    val state = Classify.nbState(train)
    // top-2 tokens by count: buy(3), notes(2) — everything else drops
    val compact = Classify.compactModel(state, maxVocab = 2)
    assert(compact.tokenScores.select("token").distinct()
      .collect().map(_.getString(0)).sorted.toSeq == Seq("buy", "notes"))
    val probe = Seq((1L, "buy pills"), (2L, "meeting notes"),
      (3L, ""), (4L, "unseen words only")).toDF("doc_id", "text")
    val viaJoin = Classify.scoreNaiveBayes(compact, probe)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val viaMap = Classify.scoreBroadcast(compact, probe)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // both paths share one total contract: token-less docs score as
    // bare priors (r10 advice closed the join path's silent drop)
    assert(viaMap == viaJoin)
    val bare = viaMap.find(_._1 == 3L).get
    assert(bare._2 == "ham") // equal priors -> asc label tie-break
  }

  test("scoreBroadcast refuses an uncapped model past the row bound") {
    val st = Classify.nbState(
      Seq(("a", "x y z"), ("b", "p q r")).toDF("label", "text"))
    val model = Classify.modelFromState(st)
    intercept[IllegalArgumentException] {
      Classify.scoreBroadcast(model,
        Seq((1L, "x")).toDF("doc_id", "text"), maxBroadcastRows = 2L)
    }
  }

  test("nbStateSave/nbStateLoad round-trips the sufficient statistics") {
    val dir = java.nio.file.Files
      .createTempDirectory("nbstate").toString
    val st = Classify.nbState(
      Seq(("a", "x y"), ("b", "y z")).toDF("label", "text"))
    Classify.nbStateSave(st, dir)
    val back = Classify.nbStateLoad(spark, dir)
    assert(back.tokenCounts.orderBy("label", "token").collect().toSeq ==
      st.tokenCounts.orderBy("label", "token").collect().toSeq)
    assert(back.docCounts.orderBy("label").collect().toSeq ==
      st.docCounts.orderBy("label").collect().toSeq)
  }

  test("evaluate: confusion grid accounts for every labeled doc") {
    val labeled = Seq(
      (1L, "alpha", "aa aa bb"), (2L, "alpha", "aa cc"),
      (3L, "beta", "dd dd"), (4L, "beta", "dd ee")).toDF(
      "doc_id", "label", "text")
    val model = Classify.trainNaiveBayes(labeled)
    val grid = Classify.evaluate(model, labeled).collect()
    assert(grid.map(_.getAs[Long]("n")).sum == 4L)
    // a separable corpus self-classifies perfectly
    assert(grid.forall(r =>
      r.getAs[String]("truth") == r.getAs[String]("predicted")))
  }
}

class BudgetMixtureSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.Sampling

  // exact token counts: a=100 (2×50), b=100, c=100 (4×25), d=10
  private lazy val docs = (
    Seq(("a", 50), ("a", 50), ("b", 100), ("c", 25), ("c", 25),
      ("c", 25), ("c", 25), ("d", 10)))
    .zipWithIndex
    .map { case ((s, n), i) => (i.toLong, s, Seq.fill(n)("w").mkString(" ")) }
    .toDF("doc_id", "source", "text")

  private val w = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)

  private def allocs(budget: Long, maxEpochs: Double = 0.5) =
    Sampling.budgetMixture(docs, w, budget, maxEpochs)
      .orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("alloc_tokens"),
        r.getAs[Boolean]("saturated"))).toSeq

  test("no source saturates: allocation is proportional to weight") {
    assert(allocs(80) ==
      Seq(("a", 40L, false), ("b", 20L, false), ("c", 20L, false),
        ("d", 0L, false)))
  }

  test("high-weight source saturates; overflow cascades to the rest") {
    // a wants 75 but caps at 50; the remaining 100 splits evenly over
    // b and c (equal weights), landing exactly on their caps
    assert(allocs(150) ==
      Seq(("a", 50L, true), ("b", 50L, true), ("c", 50L, true),
        ("d", 0L, false)))
  }

  test("budget above the total capacity: everything caps, rest is 0") {
    assert(allocs(400) ==
      Seq(("a", 50L, true), ("b", 50L, true), ("c", 50L, true),
        ("d", 0L, false)))
  }

  test("per-source epoch-cap override shrinks just that source") {
    val out = Sampling.budgetMixture(docs, w, tokenBudget = 150,
      maxEpochs = 0.5, epochCaps = Map("a" -> 0.25))
      .orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("cap_tokens"),
        r.getAs[Long]("alloc_tokens"))).toSeq
    // a caps at 25; remaining 125 splits over b and c but they cap at
    // 50 each -> 125 exceeds their joint capacity, all saturate
    assert(out == Seq(("a", 25L, 25L), ("b", 50L, 50L), ("c", 50L, 50L),
      ("d", 5L, 0L)))
  }

  test("allocation never exceeds the budget and epochs honor the cap") {
    val rows = Sampling.budgetMixture(docs, w, 120, 0.5).collect()
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum <= 120L)
    assert(rows.forall(_.getAs[Double]("epochs") <= 0.5))
  }
}

class TakedownSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private lazy val pairs = Seq(
    (1L, 2L), (2L, 3L), // cluster {1,2,3}
    (5L, 6L) // cluster {5,6}
  ).toDF("id_a", "id_b")

  test("takedownPropagate: listed docs pull their whole cluster; " +
      "listed docs outside any cluster go alone; others survive") {
    val listed = Seq(2L, 9L).toDF("doc_id")
    val m = Dedup.takedownPropagate(pairs, listed)
      .orderBy("doc_id").collect()
    assert(m.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L, 9L))
    assert(m.map(_.getAs[String]("reason")).toSeq ==
      Seq("propagated", "listed", "propagated", "listed"))
    // cluster ids: the {1,2,3} component labels as its min member; the
    // out-of-graph listed doc is its own singleton cluster
    assert(m.map(_.getAs[Long]("cluster_id")).toSeq ==
      Seq(1L, 1L, 1L, 9L))
  }

  test("applyTakedown: left-anti removal of exactly the manifest") {
    val corpus = (1L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val m = Dedup.takedownPropagate(pairs, Seq(2L, 9L).toDF("doc_id"))
    val kept = Dedup.applyTakedown(corpus, m)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(4L, 5L, 6L, 7L, 8L))
  }

  test("takedownPropagate on string-keyed corpora: clusters label in " +
      "the caller's id space, singletons keep their own id") {
    val sp = Seq(("u1", "u2"), ("u2", "u3")).toDF("id_a", "id_b")
    val m = Dedup.takedownPropagate(sp, Seq("u2", "u9").toDF("doc_id"))
      .orderBy("doc_id").collect()
    assert(m.map(_.getAs[String]("doc_id")).toSeq ==
      Seq("u1", "u2", "u3", "u9"))
    assert(m.map(_.getAs[String]("cluster_id")).toSeq ==
      Seq("u1", "u1", "u1", "u9"))
    assert(m.map(_.getAs[String]("reason")).toSeq ==
      Seq("propagated", "listed", "propagated", "listed"))
  }

  test("takedownPropagate: empty takedown list removes nothing") {
    val m = Dedup.takedownPropagate(pairs,
      spark.emptyDataset[Long].toDF("doc_id"))
    assert(m.count() == 0)
  }
}

class BpeTrainSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.TextAnalysis

  test("trainBpeMerges reproduces the hand-worked Sennrich example") {
    // dictionary: low×5, lower×2, newest×6, widest×3.
    // pair counts: (e,s)=9, (s,t)=9, (w,e)=8, (l,o)=7, (o,w)=7, … —
    // ties break lexicographically, so the learned order is
    // (e,s) → (es,t) → (l,o) → (lo,w)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(docs, numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w")))
    // applying what was learned segments as the example predicts
    val pieces = docs.select(
      TextAnalysis.bpeTokens(col("text"), merges).as("p"))
      .head().getSeq[String](0)
    assert(pieces.take(3) == Seq("low", "low", "low"))
    assert(pieces.contains("est")) // newest → n e w est
  }

  test("trainBpeMerges stops early when no pair remains") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(TextAnalysis.trainBpeMerges(docs, numMerges = 10).isEmpty)
  }

  test("learned merges reduce the corpus piece count monotonically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val learned = TextAnalysis.trainBpeMerges(docs, numMerges = 10)
    def total(m: Seq[(String, String)]): Long = docs.select(
      sum(TextAnalysis.bpeTokenCount(col("text"), m))).head().getLong(0)
    val counts = (0 to 10).map(k => total(learned.take(k)))
    assert(counts.sliding(2).forall(p => p(1) <= p(0)))
    assert(counts.last < counts.head) // 10 merges actually compress
  }
}

class MarginMiningSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.Similarity

  test("embeddingDrift: identical slices → cosine 1, shift 0; a known " +
      "mean displacement reports exactly") {
    val ref = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val same = Similarity.embeddingDrift(ref, ref).head()
    assert(same.getAs[Double]("centroid_cosine") == 1.0)
    assert(same.getAs[Double]("mean_l2_shift") == 0.0)
    // cur mean = (1.5, 0.5) vs ref mean (0.5, 0.5): L2 shift exactly 1;
    // cos((1,1),(3,1)) = 4/(√2·√10) = 0.894427
    val cur = Seq((2L, Array(3.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val d = Similarity.embeddingDrift(ref, cur).head()
    assert(d.getAs[Long]("n_ref") == 2L && d.getAs[Long]("n_cur") == 2L)
    assert(d.getAs[Double]("centroid_cosine") == 0.894427)
    assert(d.getAs[Double]("mean_l2_shift") == 1.0)
  }

  test("marginMining: hand-computed ratio margins; a clear match mines, " +
      "a weaker best-match falls under the threshold") {
    val left = Seq(
      (0L, Array(1.0f, 0.0f)), // perfect match with y10
      (1L, Array(0.0f, 1.0f))) // best match y12 but a weaker margin
      .toDF("vec_id", "embedding")
    val right = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.6f, 0.8f)),
      (12L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    // k=2 micro-cosines: x0→(1e6, 6e5, 0), x1→(0, 8e5, 1e6)
    // sumL(x0)=1.6e6; sumR(y10)=1e6 → margin(x0,y10) =
    //   4·1e6·1e6 / 2.6e6 = 1538461; margin(x1,y12) = 1428571
    val out = Similarity.marginMining(left, right, k = 2,
      minMarginPpm = 1500000L).orderBy("left_id").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("left_id") == 0L)
    assert(out.head.getAs[Long]("right_id") == 10L)
    assert(out.head.getAs[Long]("margin_ppm") == 1538461L)
    assert(out.head.getAs[Double]("cosine") == 1.0)
    // lower threshold: both lefts mine, each to its best margin match
    val all = Similarity.marginMining(left, right, k = 2,
      minMarginPpm = 1000000L).orderBy("left_id").collect()
    assert(all.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 10L), (1L, 12L)))
  }
}

class JsonSourceSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private lazy val raw = Seq(
    (1L, """{"id": 1, "meta": {"lang": "en", "tags": [1, 2]}, "n": 10}"""),
    (2L, """{"id": 2, "meta": {"lang": "fr", "tags": []}, "n": 20}"""),
    (3L, """not json at all""")).toDF("row_id", "payload")

  test("parseJson: inferred schema, nested flattening, corrupt → NULLs") {
    val out = JsonSource.parseJson(raw, "payload").orderBy("row_id")
    assert(out.columns.toSeq == Seq("row_id", "id", "meta_lang",
      "meta_tags", "n"))
    val rows = out.collect()
    assert(rows(0).getAs[Long]("id") == 1L)
    assert(rows(0).getAs[String]("meta_lang") == "en")
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("meta_tags"))
      .toList == List(1L, 2L))
    assert(rows(1).getAs[String]("meta_lang") == "fr")
    // corrupt row survives the scan with NULL payload columns
    assert(rows(2).isNullAt(rows(2).fieldIndex("id")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("meta_lang")))
  }

  test("parseJson with a pinned schema skips inference and casts") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(StructField("lang", StringType))))))
    val out = JsonSource.parseJson(raw, "payload", Some(sch))
    assert(out.columns.toSeq == Seq("row_id", "id", "meta_lang"))
    assert(out.filter(col("meta_lang") === "en").count() == 1)
  }

  test("flatten: struct columns become parent_child; flat frames pass " +
      "through untouched") {
    val df = Seq((1L, ("a", 2L))).toDF("k", "v")
    val flat = JsonSource.flatten(df)
    assert(flat.columns.toSeq == Seq("k", "v__1", "v__2") ||
      flat.columns.toSeq == Seq("k", "v_1", "v_2"))
    val plain = Seq((1L, "x")).toDF("a", "b")
    assert(JsonSource.flatten(plain).columns.toSeq == Seq("a", "b"))
  }
}
