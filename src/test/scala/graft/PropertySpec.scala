package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Sampling}

/** Property-based invariants over randomized corpora (scalacheck Gen,
 *  fixed seeds for reproducibility; small sizes — each case runs real
 *  Spark jobs). These pin ALGEBRAIC contracts the example-based specs
 *  can't: they must hold for EVERY input, not just the crafted ones. */
class PropertySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val genIds: Gen[List[Long]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000L))).map(_.distinct)

  private val genDocs: Gen[List[(Long, String)]] =
    Gen.chooseNum(2, 12).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(3, 30).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(0, 200).map(i => s"w$i"))
          .map(_.mkString(" "))))
    }.map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("hashSplit: partition of the corpus — complete, disjoint, " +
      "deterministic, for arbitrary id sets") {
    for (seed <- 1L to 5L) {
      val ids = sample(genIds, seed)
      val df = ids.toDF("doc_id")
      val once = Sampling.hashSplit(df, "doc_id")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(once.keySet == ids.toSet, s"seed=$seed: rows lost or invented")
      assert(once.values.toSet.subsetOf(Set("train", "val", "test")))
      val again = Sampling.hashSplit(df, "doc_id")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(again == once, s"seed=$seed: split not deterministic")
    }
  }

  test("exactDuplicateCount == total - distinct, for arbitrary corpora " +
      "with planted duplicates") {
    for (seed <- 1L to 5L) {
      val docs = sample(genDocs, seed)
      // plant duplicates: repeat a random subset of texts
      val dups = docs.filter(_._1 % 3 == 0)
        .map { case (id, t) => (id + 10000L, t) }
      val all = docs ++ dups
      val expected = all.size.toLong - all.map(_._2).distinct.size
      val got = Dedup.exactDuplicateCount(all.toDF("doc_id", "text"))
        .head.getLong(0)
      assert(got == expected, s"seed=$seed")
    }
  }

  test("duplicateSpanRemoval: removes nothing when every doc's tokens " +
      "are globally unique; scrubs a whole-doc copy completely") {
    for (seed <- 1L to 3L) {
      val n = 3 + (seed % 3).toInt
      // doc i uses tokens u{i}_{j}: no 9-gram can repeat anywhere
      val uniq = (0 until n).map(i =>
        (i.toLong, (0 until 15).map(j => s"u${i}_$j").mkString(" ")))
      val clean = Dedup.duplicateSpanRemoval(uniq.toDF("doc_id", "text"))
        .collect()
      assert(clean.forall(_.getAs[Long]("removed_tokens") == 0L),
        s"seed=$seed: unique corpus lost tokens")
      // now copy doc 0 under the highest id: the copy's every token sits
      // in some duplicated 9-gram, so it is scrubbed to empty and the
      // original (first occurrence) keeps everything
      val withCopy = uniq :+ ((n + 100).toLong, uniq.head._2)
      val out = Dedup.duplicateSpanRemoval(withCopy.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(out(0L)._2 == 0L, s"seed=$seed: original lost tokens")
      val (nTok, removed, cleaned) = out((n + 100).toLong)
      assert(removed == nTok && cleaned.isEmpty,
        s"seed=$seed: copy not fully scrubbed")
    }
  }

  test("leakSafeSplit: no duplicate cluster ever straddles splits, for " +
      "arbitrary pair graphs") {
    for (seed <- 1L to 3L) {
      val ids = sample(genIds, seed * 7 + 1).take(40)
      if (ids.size >= 4) {
        val docs = ids.toDF("doc_id")
        // random chain pairs over the id list (consecutive sampled ids)
        val sorted = ids.sorted
        val pairs = sorted.zip(sorted.drop(1)).zipWithIndex
          .collect { case ((a, b), i) if i % 2 == 0 => (a, b) }
        if (pairs.nonEmpty) {
          val clusters = Dedup.duplicateClusters(
            pairs.toDF("id_a", "id_b"))
          val split = Sampling.leakSafeSplit(docs, clusters)
          val byCluster = split
            .join(clusters, Seq("doc_id"), "left")
            .select(
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.col("cluster_id"),
                org.apache.spark.sql.functions.col("doc_id")).as("c"),
              org.apache.spark.sql.functions.col("split"))
            .distinct().groupBy("c").count().filter("count > 1").count()
          assert(byCluster == 0L, s"seed=$seed: a cluster straddles splits")
        }
      }
    }
  }

  private val genStringIds: Gen[List[String]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 500).map(i => s"u-$i")))
      .map(_.distinct)

  test("denseIdDictionary: a bijection onto 1..N for arbitrary string " +
      "id sets, stable across repeated builds") {
    for (seed <- 1L to 5L) {
      val ids = sample(genStringIds, seed)
      val df = ids.map(Tuple1(_)).toDF("sid")
      val dict = Dedup.denseIdDictionary(df, "sid", buckets = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // bijection: every id encoded, codes exactly 1..N, no collisions
      assert(dict.keySet == ids.toSet, s"seed=$seed: ids lost/invented")
      assert(dict.values.toSet == (1L to ids.size.toLong).toSet,
        s"seed=$seed: codes not dense 1..N")
      // determinism: a rebuild maps every id identically
      val again = Dedup.denseIdDictionary(df, "sid", buckets = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dict == again, s"seed=$seed: rebuild changed the mapping")
    }
  }

  test("string-id duplicateClusters: same components as clustering the " +
      "ids' numeric twins, labels are per-cluster minima") {
    for (seed <- 1L to 5L) {
      val ids = sample(genIds, seed).sorted
      val pairs = ids.zip(ids.drop(1)).zipWithIndex
        .collect { case ((a, b), i) if i % 3 != 2 => (a, b) }
      if (pairs.nonEmpty) {
        // numeric ground truth
        val num = Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // same graph with zero-padded string ids: component structure
        // and (lexicographic == numeric under padding) minima must match
        def s(x: Long) = f"id-$x%06d"
        val str = Dedup.duplicateClusters(
            pairs.map { case (a, b) => (s(a), s(b)) }.toDF("id_a", "id_b"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(str == num.map { case (k, v) => s(k) -> s(v) },
          s"seed=$seed: string-path clusters diverge from numeric")
      }
    }
  }

  test("bottomKSample: merge of arbitrary slice partitions equals the " +
      "union's direct sample, for any k") {
    for (seed <- 1L to 5L) {
      val ids = sample(genIds, seed)
      if (ids.size >= 4) {
        val k = (ids.size / 2).max(1)
        val df = ids.toDF("doc_id")
        val cut = ids(ids.size / 3)
        val direct = Sampling.bottomKSample(df, k)
          .collect().map(_.getLong(0)).toSet
        val merged = Sampling.mergeBottomK(
            Sampling.bottomKSample(df.filter($"doc_id" <= cut), k)
              .unionByName(
                Sampling.bottomKSample(df.filter($"doc_id" > cut), k)), k)
          .collect().map(_.getLong(0)).toSet
        assert(merged == direct, s"seed=$seed k=$k: merge ≠ direct")
      }
    }
  }

  test("CountMin: estimates never under-count, for arbitrary corpora") {
    import graft.profiler.CountMin
    for (seed <- 1L to 3L) {
      val vals = sample(Gen.listOfN(120, Gen.chooseNum(0L, 15L)), seed)
      val df = vals.toDF("v")
      val exact = vals.groupBy(identity).map { case (v, xs) =>
        v -> xs.size.toLong }
      val merged = CountMin.merge(CountMin.sliceState(df, "v", "s"))
      val est = CountMin.estimate(merged, vals.distinct.toDF("value"))
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_count"))
        .toMap
      exact.foreach { case (v, c) =>
        assert(est(v) >= c, s"seed=$seed: CMS under-counted $v")
      }
    }
  }

  test("canonicalizeUrl is idempotent on its own output") {
    import graft.pipeline.TextAnalysis
    val genUrl: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https")
      host <- Gen.oneOf("E.com", "www.Example.co.uk", "api.x.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/a/b", "/a/b/")
      q <- Gen.oneOf("", "?z=1&a=2", "?utm_source=x&b=1", "?utm_campaign=y")
      frag <- Gen.oneOf("", "#top")
    } yield s"$scheme://$host$port$path$q$frag"
    for (seed <- 1L to 5L) {
      val urls = sample(Gen.listOfN(12, genUrl), seed)
      val once = urls.toDF("u")
        .select(TextAnalysis.canonicalizeUrl($"u").as("c"))
        .collect().map(_.getString(0)).toSeq
      val twice = once.toDF("u")
        .select(TextAnalysis.canonicalizeUrl($"u").as("c"))
        .collect().map(_.getString(0)).toSeq
      assert(twice == once, s"seed=$seed: canonicalize not idempotent")
    }
  }

  test("Evolution.widenedSchema is order-insensitive and idempotent") {
    import graft.sources.Evolution
    import org.apache.spark.sql.types._
    val types = Seq(IntegerType, LongType, FloatType, DoubleType,
      ShortType)
    for (seed <- 1L to 5L) {
      val picks = sample(Gen.listOfN(4, Gen.oneOf(types)), seed)
      val schemas = picks.map(t =>
        StructType(Seq(StructField("c", t))))
      val fwd = Evolution.widenedSchema(schemas)("c").dataType
      val rev = Evolution.widenedSchema(schemas.reverse)("c").dataType
      assert(fwd == rev, s"seed=$seed: widening depends on order")
      val again = Evolution.widenedSchema(
        Seq(StructType(Seq(StructField("c", fwd))))
          ++ schemas)("c").dataType
      assert(again == fwd, s"seed=$seed: widening not idempotent")
    }
  }

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap { n =>
      Gen.oneOf(
        // high entropy: arbitrary bytes
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)),
        // low entropy: long runs (the maxSize-forcing worst case)
        Gen.chooseNum(0, 3).map(b => List.fill(n)(b.toByte)))
    }.map(_.toArray)

  test("cdcChunkBytes: chunks tile the byte range exactly within " +
      "[min, max] bounds, deterministically, for arbitrary bytes") {
    for (seed <- 1L to 20L) {
      val bytes = sample(genBytes, seed)
      val cs = Dedup.cdcChunkBytes(bytes, minSize = 8, maxSize = 64,
        mask = 15L)
      if (bytes.isEmpty) assert(cs.isEmpty, s"seed=$seed")
      else {
        assert(cs.head.start == 0, s"seed=$seed")
        assert(cs.last.start + cs.last.len == bytes.length, s"seed=$seed")
        cs.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a.start + a.len == b.start, s"seed=$seed: gap/overlap")
          case _ => ()
        }
        cs.init.foreach(c =>
          assert(c.len >= 8 && c.len <= 64, s"seed=$seed: ${c.len}"))
        assert(cs.last.len <= 64 && cs.last.len >= 1, s"seed=$seed")
        assert(cs == Dedup.cdcChunkBytes(bytes, 8, 64, 15L),
          s"seed=$seed: not deterministic")
      }
    }
  }

  test("rendezvousAssign: complete, deterministic, and S -> S+1 movers " +
      "all land on the new shard, for arbitrary id sets") {
    for (seed <- 1L to 3L) {
      val ids = sample(genIds, seed)
      val df = ids.toDF("doc_id")
      val s = 3 + (seed % 4).toInt
      val from = Sampling.rendezvousAssign(df, "doc_id", s)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(from.keySet == ids.toSet, s"seed=$seed: rows lost")
      assert(from.values.forall(v => v >= 0 && v < s), s"seed=$seed")
      val to = Sampling.rendezvousAssign(df, "doc_id", s + 1)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // the HRW contract: the original shards' hashes are unchanged,
      // so a key either keeps its shard or moves to the NEW one
      ids.foreach { id =>
        assert(to(id) == from(id) || to(id) == s,
          s"seed=$seed: $id moved ${from(id)} -> ${to(id)} (not new)")
      }
    }
  }

  test("tClosenessViolations: a table whose every class mirrors the " +
      "global mix has zero violations, for arbitrary class structures") {
    import graft.pipeline.Privacy
    for (seed <- 1L to 3L) {
      val nGroups = 2 + (seed % 4).toInt
      val mix = sample(Gen.listOfN(4, Gen.chooseNum(1, 5)), seed)
      val rows = for {
        g <- 0 until nGroups; (cnt, b) <- mix.zipWithIndex
        _ <- 0 until cnt
      } yield (s"g$g", b)
      val df = rows.toDF("grp", "bk")
      assert(Privacy.tClosenessViolations(
        df, Seq("grp"), "bk", numBuckets = 4, tPpm = 0L).count() == 0L,
        s"seed=$seed")
    }
  }

  test("touchAttribution: both models conserve conversions and value, " +
      "for arbitrary event logs") {
    import graft.operators.Funnel
    val genEvents: Gen[List[(Long, Long, Int, String, Long)]] =
      Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.chooseNum(0L, 5L)
        m <- Gen.chooseNum(0, 59)
        t <- Gen.oneOf("view", "click", "purchase")
        cents <- Gen.chooseNum(0L, 99999L)
      } yield (u, m.toLong, 0, t, cents)))
        .map(_.zipWithIndex.map { case ((u, m, _, t, c), i) =>
          (i.toLong, u, m.toInt, t, c) })
    for (seed <- 1L to 5L) {
      val evs = sample(genEvents, seed)
      val df = evs.map { case (id, u, m, t, c) =>
        (id, u, java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"),
          t, c / 100.0)
      }.toDF("event_id", "user_id", "ts", "event_type", "value")
      val got = Funnel.touchAttribution(df).collect()
      val nConv = evs.count(_._4 == "purchase").toLong
      val vConv = BigDecimal(evs.filter(_._4 == "purchase")
        .map(_._5).sum) / 100
      // every conversion is attributed exactly once under EACH model —
      // no channel double-counts it, no journey shape drops it
      assert(got.map(_.getLong(1)).sum == nConv, s"seed=$seed first n")
      assert(got.map(_.getLong(3)).sum == nConv, s"seed=$seed last n")
      assert(BigDecimal(got.map(_.getDouble(2)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) == vConv,
        s"seed=$seed first value")
      assert(BigDecimal(got.map(_.getDouble(4)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) == vConv,
        s"seed=$seed last value")
      // '(direct)' never appears as a LAST-only channel without also
      // being first: a journey with no prior touch has neither
      val direct = got.find(_.getString(0) == "(direct)")
      direct.foreach(r => assert(r.getLong(1) == r.getLong(3),
        s"seed=$seed: direct first/last counts must agree"))
    }
  }

  test("scriptMix: rollup partitions the corpus and 'none' rows carry " +
      "zero scripted mass, for arbitrary mixed-script docs") {
    import graft.pipeline.TextAnalysis
    val genText: Gen[String] =
      Gen.chooseNum(0, 20).flatMap(len => Gen.listOfN(len, Gen.oneOf(
        Gen.alphaChar, Gen.oneOf('世', '界', '你'),
        Gen.oneOf('п', 'р', 'и'), Gen.oneOf(' ', '1', '!')))
        .map(_.mkString))
    for (seed <- 1L to 5L) {
      val docs = sample(Gen.chooseNum(1, 30).flatMap(n =>
        Gen.listOfN(n, genText)), seed)
        .zipWithIndex.map { case (t, i) =>
          (i.toLong, if (i % 2 == 0) "en" else "zh", t) }
      val df = docs.toDF("doc_id", "lang", "text")
      val got = TextAnalysis.scriptMix(df).collect()
      assert(got.map(_.getLong(2)).sum == docs.size.toLong,
        s"seed=$seed: n_docs must partition the corpus")
      assert(got.map(_.getLong(6)).sum == docs.map(_._1).sum,
        s"seed=$seed: id_sum must partition the id mass")
      got.foreach { r =>
        assert(r.getLong(3) <= r.getLong(2), s"seed=$seed: mixed > docs")
        if (r.getString(1) == "none")
          assert(r.getLong(4) == 0L && r.getLong(5) == 0L,
            s"seed=$seed: a 'none' cell carried scripted chars")
      }
    }
  }

  test("mmrSelect: selection is a valid prefix ordering for arbitrary " +
      "pages and similarity structures") {
    import graft.pipeline.TextAnalysis
    val genPage: Gen[(List[(Long, Long)], Map[(Long, Long), Long])] = for {
      n <- Gen.chooseNum(1, 20)
      rels <- Gen.listOfN(n, Gen.chooseNum(0L, 1000000L))
      density <- Gen.chooseNum(0, 100)
      simVals <- Gen.listOfN(n * n, Gen.chooseNum(0L, 1000000L))
    } yield {
      val cand = rels.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      val sims = (for {
        a <- 0 until n; b <- (a + 1) until n
        if (a * 31 + b) % 100 < density
      } yield ((a.toLong, b.toLong), simVals(a * n + b))).toMap
      (cand, sims)
    }
    for (seed <- 1L to 8L) {
      val (cand, sims) = sample(genPage, seed)
      val got = TextAnalysis.mmrSelect(cand, sims, k = 8)
      val ids = got.map(_._2)
      assert(ids.distinct.size == ids.size, s"seed=$seed: repeat pick")
      assert(ids.toSet.subsetOf(cand.map(_._1).toSet), s"seed=$seed")
      assert(got.size == math.min(8, cand.size), s"seed=$seed: short")
      assert(got.map(_._1) == (1 to got.size), s"seed=$seed: ranks")
      // pick 1 is ALWAYS the max-relevance (min-id on ties) candidate
      val top = cand.minBy { case (id, rel) => (-rel, id) }
      assert(got.head._2 == top._1, s"seed=$seed: first pick not argmax")
      // with no similarity evidence, MMR degrades to pure relevance
      val pure = TextAnalysis.mmrSelect(cand, Map.empty, k = 8)
      assert(pure.map(_._2) ==
        cand.sortBy { case (id, rel) => (-rel, id) }.take(8).map(_._1),
        s"seed=$seed: no-sims must equal relevance order")
      // determinism
      assert(TextAnalysis.mmrSelect(cand, sims, k = 8) == got,
        s"seed=$seed: not deterministic")
    }
  }

  test("corpusDiff summary: rename mass partitions raw add/remove churn," +
      " for arbitrary snapshot pairs") {
    import graft.pipeline.CorpusDiff
    val genCorpus: Gen[List[(Long, String)]] =
      Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 40L)
        t <- Gen.oneOf("alpha", "beta", "gamma", "delta")
      } yield (id, t))).map(_.distinctBy(_._1))
    for (seed <- 1L to 5L) {
      val v1 = sample(genCorpus, seed)
      val v2 = sample(genCorpus, seed + 100)
      val d1 = v1.toDF("doc_id", "text")
      val d2 = v2.toDF("doc_id", "text")
      val got = CorpusDiff.diffSummary(d1, d2).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
      val ids1 = v1.map(_._1).toSet
      val ids2 = v2.map(_._1).toSet
      val rawAdded = (ids2 -- ids1).size.toLong
      val rawRemoved = (ids1 -- ids2).size.toLong
      // the five classes must partition id-level churn exactly: what
      // rename attribution takes from added/removed it must return
      // as renamed, once
      assert(got("added_new") + got("renamed") == rawAdded,
        s"seed=$seed: added mass leaked")
      assert(got("removed_gone") + got("renamed") == rawRemoved,
        s"seed=$seed: removed mass leaked")
      assert(got("unchanged") + got("modified")
        == (ids1 & ids2).size.toLong, s"seed=$seed: overlap mass leaked")
    }
  }

  test("ngramNovelty: bounds, clone-kills-novelty, and the scored doc " +
      "set, for arbitrary corpora") {
    import graft.pipeline.TextAnalysis
    for (seed <- 1L to 5L) {
      val docs = sample(genDocs, seed)
      // plant an exact clone: both copies must score novelty 0
      val cloneSrc = docs.head
      val all = docs :+ ((cloneSrc._1 + 10000L, cloneSrc._2))
      val got = TextAnalysis.ngramNovelty(all.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      val eligible = all.filter(_._2.split("\\s+").count(_.nonEmpty) >= 3)
      assert(got.keySet == eligible.map(_._1).toSet, s"seed=$seed")
      got.foreach { case (id, (ng, nn, nov)) =>
        assert(ng >= 1 && nn >= 0 && nn <= ng, s"seed=$seed id=$id")
        assert(nov == math.round(nn.toDouble / ng * 1e6) / 1e6,
          s"seed=$seed id=$id ratio")
      }
      if (cloneSrc._2.split("\\s+").count(_.nonEmpty) >= 3) {
        assert(got(cloneSrc._1)._2 == 0L, s"seed=$seed: clone src novel")
        assert(got(cloneSrc._1 + 10000L)._2 == 0L,
          s"seed=$seed: clone copy novel")
      }
    }
  }

  test("pmiCollocations: floor respected, pair count never exceeds " +
      "either unigram count, ordering is (pmi desc, ngram)") {
    import graft.pipeline.TextAnalysis
    for (seed <- 1L to 5L) {
      val docs = sample(genDocs, seed)
      val rows = TextAnalysis.pmiCollocations(
        docs.toDF("doc_id", "text"), minCount = 2, top = 100).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
      rows.foreach { case (g, cnt, c1, c2, _) =>
        assert(cnt >= 2, s"seed=$seed $g below floor")
        assert(cnt <= c1 && cnt <= c2, s"seed=$seed $g pair > unigram")
      }
      val sortKey = rows.map { case (g, _, _, _, pmi) => (-pmi, g) }
      assert(sortKey.sameElements(sortKey.sorted), s"seed=$seed order")
    }
  }

  test("retrievalEval: all four metrics in [0,1]; hits bounded by k " +
      "and by the relevant total, for arbitrary corpora and terms") {
    import graft.pipeline.TextAnalysis
    for (seed <- 1L to 5L) {
      val docs = sample(genDocs, seed)
      val terms = Seq("w1", "w5", "w11")
      val k = 5
      val r = TextAnalysis.retrievalEval(
        docs.toDF("doc_id", "text"), terms, k = k).collect()(0)
      val hits = r.getAs[Long]("n_rel_at_k")
      val tot = r.getAs[Long]("n_rel_total")
      assert(hits <= k && hits <= tot, s"seed=$seed hits")
      Seq("ndcg", "mrr", "precision_at_k", "recall_at_k").foreach { m =>
        val v = r.getAs[Double](m)
        assert(v >= 0.0 && v <= 1.0, s"seed=$seed $m=$v")
      }
      assert(r.getAs[Double]("precision_at_k")
        == math.round(hits.toDouble / k * 1e6) / 1e6, s"seed=$seed p@k")
    }
  }

  test("adamicAdar: predictions are never existing edges, scores " +
      "positive, shared-neighbor counts >= 1, for arbitrary graphs") {
    import graft.pipeline.LinkGraph
    val genEdges: Gen[List[(Long, Long)]] =
      Gen.chooseNum(3, 40).flatMap(n => Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 15L); b <- Gen.chooseNum(0L, 15L)
      } yield (a, b)))
    for (seed <- 1L to 5L) {
      val edges = sample(genEdges, seed).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).toSet
        val got = graft.pipeline.LinkGraph.adamicAdar(
          edges.toDF("src", "dst"), topN = 1000).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3)))
        got.foreach { case (u, v, nc, sc) =>
          assert(u < v, s"seed=$seed pair order")
          assert(!und.contains((u, v)), s"seed=$seed predicted an edge")
          assert(nc >= 1 && sc > 0.0, s"seed=$seed weight")
        }
      }
    }
  }

  test("modularity: degree mass is exactly 2m, within-edges never " +
      "exceed m, total Q <= 1, for arbitrary graphs and partitions") {
    import graft.pipeline.LinkGraph
    val genEdges: Gen[List[(Long, Long)]] =
      Gen.chooseNum(3, 40).flatMap(n => Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 15L); b <- Gen.chooseNum(0L, 15L)
      } yield (a, b)))
    for (seed <- 1L to 5L) {
      val edges = sample(genEdges, seed).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).distinct
        val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
        // arbitrary partition: node mod 3
        val comm = nodes.map(n => (n, n % 3)).toDF("node", "community")
        val rows = LinkGraph.modularity(
          edges.toDF("src", "dst"), comm).collect()
          .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
        val m = und.size.toLong
        assert(rows.map(_._2).sum == 2 * m, s"seed=$seed degree mass")
        assert(rows.map(_._1).sum <= m, s"seed=$seed within-edges")
        assert(rows.map(_._3).sum <= 1.0 + 1e-6, s"seed=$seed Q bound")
      }
    }
  }

  test("eventTransitions: transition mass = events - users, ppm rows " +
      "sum to <= 1e6 within row count, for arbitrary logs") {
    import graft.operators.Funnel
    val genEvents: Gen[List[(Long, Long, Int, String)]] =
      Gen.chooseNum(2, 60).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 6L)
        t <- Gen.chooseNum(0, 500)
        ty <- Gen.oneOf("view", "click", "purchase", "error")
      } yield (u, t.toLong, t, ty)))
        .map(_.zipWithIndex.map { case ((u, _, t, ty), i) =>
          (i.toLong, u, t, ty) })
    for (seed <- 1L to 5L) {
      val evs = sample(genEvents, seed)
      val df = evs.map { case (id, u, t, ty) =>
        (id, u, new java.sql.Timestamp(t * 60000L), ty)
      }.toDF("event_id", "user_id", "ts", "event_type")
      val rows = Funnel.eventTransitions(df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      val nUsers = evs.map(_._2).distinct.size
      assert(rows.map(_._3).sum == evs.size - nUsers,
        s"seed=$seed transition mass")
      rows.groupBy(_._1).foreach { case (from, rs) =>
        val s = rs.map(_._4).sum
        // floor division: total in (1e6 - |row|, 1e6]
        assert(s <= 1000000L && s > 1000000L - rs.size,
          s"seed=$seed row $from ppm sum $s")
      }
    }
  }

  test("editDistanceVerify: Spark's levenshtein equals a reference " +
      "Wagner-Fischer DP for arbitrary short strings") {
    import graft.pipeline.Dedup
    def ref(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val genStr: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    for (seed <- 1L to 8L) {
      val a = sample(genStr, seed)
      val b = sample(genStr, seed + 50)
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val got = Dedup.editDistanceVerify(docs,
        Seq((1L, 2L)).toDF("id_a", "id_b")).collect()(0)
      assert(got.getLong(2) == ref(a, b).toLong,
        s"seed=$seed a='$a' b='$b'")
      // the triangle bounds every DP must respect
      assert(got.getLong(2) >= math.abs(a.length - b.length)
        && got.getLong(2) <= math.max(a.length, b.length), s"seed=$seed")
    }
  }

  test("coOccurrenceLift: pair support never exceeds either item's " +
      "basket count; lift recomputes from the counts, for random baskets") {
    import graft.operators.Basket
    val genRows: Gen[List[(Long, String)]] =
      Gen.chooseNum(4, 80).flatMap(n => Gen.listOfN(n, for {
        b <- Gen.chooseNum(1L, 12L)
        i <- Gen.oneOf("A", "B", "C", "D", "E")
      } yield (b, i)))
    for (seed <- 1L to 5L) {
      val rows = sample(genRows, seed)
      val distinct = rows.distinct
      val n = distinct.map(_._1).distinct.size.toLong
      val rowsDf = rows.toDF("basket", "item")
      val got = Basket.coOccurrenceLift(rowsDf, "basket", "item",
        minSupport = 1, top = 1000).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))
      got.foreach { case (a, b, nb2, na, nbb, lift) =>
        assert(nb2 <= na && nb2 <= nbb, s"seed=$seed ($a,$b) support")
        val micro = math.round(nb2.toDouble * n / (na.toDouble * nbb) * 1e6)
        assert(lift == math.round(micro / 1e6 * 1e6) / 1e6,
          s"seed=$seed ($a,$b) lift replay")
      }
    }
  }
}
