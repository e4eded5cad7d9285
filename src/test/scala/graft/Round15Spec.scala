package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-15 standing gates.
 *
 * [[OracleDtypeSpec]] is the x119 lesson made permanent: DuckDB widens
 * integer aggregate arithmetic to HUGEINT, pandas round-trips that as
 * float64, and the driver's hash is dtype-sensitive — so an oracle can
 * match cell-for-cell on VALUES and still fail the round. Every
 * integral oracle output must be explicitly CAST (recorded rule in
 * BASELINE.md); this spec executes the lint in-process so an uncast
 * oracle goes red in `sbt test`, not in the driver's round report.
 *
 * [[DarkCodeSpec]] is the theilSen/reliabilityByMargin lesson made
 * permanent: round 14's manual grep found two fully-implemented public
 * functions that no query, spec, or demo referenced. This sweep fails
 * on any public `def` in src/main whose name appears in no OTHER file
 * and at most once (its own definition) in its own file.
 */
class OracleDtypeSpec extends AnyFunSuite {

  private def pythonDuckdbAvailable: Boolean =
    try {
      import scala.sys.process._
      Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()
        , _ => ())) == 0
    } catch { case _: Throwable => false }

  private val sfDir = "/root/testdata/sf0.001"

  /** Verify-identical JSON string escape (control chars included). */
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def runLint(oracles: Map[String, String]): (Int, String) = {
    import scala.sys.process._
    val tmp = Files.createTempFile("graft_oracle_lint", ".json")
    Files.writeString(tmp,
      oracles.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
        .mkString("{", ",", "}"))
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/oracle_dtype_lint.py",
      sfDir, tmp.toString)).!(ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    (code, out.toString)
  }

  /** Oracles answerable from the base tables alone — replay-state
   *  oracles (paths under stateRoot) are probed at runtime by
   *  tools/selfcheck.py on every Verify dump instead. */
  private def stateFreeOracles: Map[String, String] =
    SparkEntry.oracleSql.filterNot(_._2.contains(SparkEntry.StateToken))

  test("every state-free oracle is dtype-clean in DuckDB (no HUGEINT/DECIMAL)") {
    assume(pythonDuckdbAvailable, "python3+duckdb not on this box")
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    val oracles = stateFreeOracles
    assert(oracles.size > 200, s"suspiciously few state-free oracles: ${oracles.size}")
    val (code, out) = runLint(oracles)
    assert(code == 0, s"oracle dtype lint failed:\n$out")
  }

  test("the lint goes red on an uncast oracle (x119's round-14 shape)") {
    assume(pythonDuckdbAvailable, "python3+duckdb not on this box")
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    val sql = SparkEntry.oracleSql("x119_margin_reliability")
    val uncast = sql
      .replace("CAST(MIN(margin_micro) AS BIGINT)", "MIN(margin_micro)")
      .replace("CAST(MAX(margin_micro) AS BIGINT)", "MAX(margin_micro)")
    assert(uncast != sql,
      "x119's oracle lost its min/max margin casts — the convention this " +
        "test pins")
    val (code, out) = runLint(Map("x119_uncast" -> uncast))
    assert(code != 0 && out.contains("HUGEINT"),
      s"lint should flag the uncast HUGEINT oracle but said:\n$out")
  }
}

class DarkCodeSpec extends AnyFunSuite {

  private def scalaFiles(root: String): Seq[Path] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".scala")).toSeq
  }

  // members whose callers are frameworks (Aggregator/Iterator/SBT),
  // not our code, plus entrypoints and universal names
  private val frameworkOrEntry = Set(
    "main", "apply", "unapply", "toString", "equals", "hashCode",
    "compare", "compareTo", "close", "hasNext", "next",
    "zero", "reduce", "merge", "finish", "bufferEncoder", "outputEncoder")

  /** Comment lines don't count as references — a function mentioned
   *  only in someone's scaladoc is still dark. */
  private def stripComments(text: String): String =
    text.linesIterator.filterNot { l =>
      val t = l.trim
      t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
    }.mkString("\n")

  test("no dark public functions: every public def is referenced somewhere") {
    val mains = scalaFiles("src/main/scala/graft")
    val tests = scalaFiles("src/test/scala/graft")
    assert(mains.nonEmpty && tests.nonEmpty)
    val texts: Map[Path, String] =
      (mains ++ tests).map(p => p -> Files.readString(p)).toMap
    val refTexts: Map[Path, String] =
      texts.map { case (p, t) => p -> stripComments(t) }
    val defRe = """^\s*(?:(?:final|implicit|lazy)\s+)*def\s+([A-Za-z_][A-Za-z0-9_]*)""".r
    val modRe = """^\s*(?:(?:final|implicit|lazy)\s+)*(?:private|protected|override)\b.*""".r
    val dark = for {
      p <- mains
      line <- texts(p).linesIterator
      if !modRe.matches(line)
      m <- defRe.findFirstMatchIn(line).toSeq
      name = m.group(1)
      if name.length >= 4 && !frameworkOrEntry(name)
      pat = ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      if !refTexts.exists { case (q, t) =>
        q != p && pat.findFirstIn(t).isDefined }
      if pat.findAllIn(refTexts(p)).size <= 1 // only its own definition
    } yield s"$p: $name"
    assert(dark.isEmpty,
      "dark public functions (implemented but referenced by no query, " +
        s"spec, or demo — wire or remove):\n${dark.distinct.mkString("\n")}")
  }
}

/** Wiring for the two facade conveniences the round-15 dark-code sweep
 *  surfaced (the standing-gate version of round 14's manual audit). */
class FacadeWiringSpec extends AnyFunSuite {
  import SharedSpark._

  test("engine.dedupTable: end-to-end corpus dedup from the facade") {
    val state = Files.createTempDirectory("graft_r15_engine").toString
    val engine = new api.GraftEngine(spark, sfDir, state)
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val kept = engine.dedupTable("documents").count()
    assert(kept > 0 && kept <= total)
    // must agree with calling the pipeline op directly
    val direct = graft.pipeline.Dedup.dedupCorpus(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      "doc_id", "text", 0.9).count()
    assert(kept == direct)
  }

  test("UsageLog.usagePattern == usagePatterns(Seq(table)) for one table") {
    import java.sql.Timestamp
    import graft.sources.{QueryLogStore, UsageLog}
    val dir = Files.createTempDirectory("graft_r15_qlog").toString
    val store = new QueryLogStore(spark, dir)
    store.append("SELECT * FROM orders", "SELECT",
      Timestamp.valueOf("2026-02-01 08:00:00"))
    store.append("SELECT o_totalprice FROM orders", "SELECT",
      Timestamp.valueOf("2026-02-02 09:30:00"))
    val single = UsageLog.usagePattern(store.log, "orders").collect()
    val multi = UsageLog.usagePatterns(store.log, Seq("orders")).collect()
    assert(single.map(_.toString).toSeq == multi.map(_.toString).toSeq)
    assert(single.head.getLong(1) == 2L)
  }
}

/** Round-15 ADVICE hardenings: the fresh-noise DP release mode and the
 *  BM25 store's double-ingest guard. */
class AdviceHardeningSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("dpGroupCountsFresh: fresh noise differs across releases, stays " +
      "Laplace-sized, and true counts are never in the output") {
    val df = Seq.tabulate(300)(i => ("g" + (i % 3), i)).toDF("g", "v")
    val r1 = graft.pipeline.Privacy.dpGroupCountsFresh(df, "g")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val r2 = graft.pipeline.Privacy.dpGroupCountsFresh(df, "g")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1.keySet == Set("g0", "g1", "g2"))
    // Laplace(1/eps=1): P(|noise| > 40) = e^-40 — a bound failure is a
    // mechanism bug, not bad luck
    r1.values.foreach(v => assert(math.abs(v - 100.0) < 40.0))
    // two publications must differ (prob of a double collision ~ 0)
    assert(r1 != r2, "fresh releases were identical — noise is not fresh")
  }

  test("seededLaplaceCounts vs dpGroupCountsFresh: same grouping, same " +
      "epsilon column, only the draw differs") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val seeded = graft.pipeline.Privacy.seededLaplaceCounts(df, "g")
    val fresh = graft.pipeline.Privacy.dpGroupCountsFresh(df, "g")
    assert(seeded.columns.toSeq == fresh.columns.toSeq)
    assert(fresh.count() == 2)
  }

  test("bm25StoreAppend: re-ingesting a stored doc id fails loudly " +
      "instead of corrupting scores") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r15_bm25").toString
    val base = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    graft.pipeline.TextAnalysis.bm25StoreCreate(base, dir)
    // a disjoint slice appends fine
    graft.pipeline.TextAnalysis.bm25StoreAppend(dir,
      Seq((3L, "gamma delta")).toDF("doc_id", "text"))
    val q = graft.pipeline.TextAnalysis.bm25StoreQuery(
      spark, dir, Seq("gamma"))
    assert(q.count() == 2)
    // re-ingesting id 2 must throw BEFORE writing
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.TextAnalysis.bm25StoreAppend(dir,
        Seq((2L, "beta gamma"), (4L, "epsilon")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("already in the store"))
    // and nothing was written: the store still scores exactly 3 docs
    val dl = spark.read.parquet(dir + "/doclen")
    assert(dl.count() == 3)
    // duplicate ids WITHIN the slice are rejected too (they would
    // merge into one inflated doc BEFORE the store check could see)
    val e2 = intercept[IllegalArgumentException] {
      graft.pipeline.TextAnalysis.bm25StoreAppend(dir,
        Seq((9L, "zeta"), (9L, "eta")).toDF("doc_id", "text"))
    }
    assert(e2.getMessage.contains("WITHIN the slice"))
    assert(spark.read.parquet(dir + "/doclen").count() == 3)
  }
}

/** j06's operator contract: forward as-of ≡ the naive theta truth,
 *  with equal-ts visibility, the tolerance cut, and bucketed ≡
 *  unbucketed (the same guarantees AsOfJoinSpec pins for backward). */
class AsOfForwardSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.operators.AsOfJoin

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "k1", ts("2026-01-01 10:00:00")),
    (2L, "k1", ts("2026-01-01 12:00:00")), // equal-ts right exists
    (3L, "k1", ts("2026-01-03 23:00:00")), // nothing after -> null
    (4L, "k2", ts("2026-01-01 09:00:00")),
    (5L, "k3", ts("2026-01-01 09:00:00"))  // key with no right rows
  ).toDF("id", "k", "ts")

  private lazy val right = Seq(
    ("k1", ts("2026-01-01 08:00:00"), 10L), // before everything
    ("k1", ts("2026-01-01 12:00:00"), 20L),
    ("k1", ts("2026-01-02 00:00:00"), 30L),
    ("k2", ts("2026-01-05 00:00:00"), 40L)
  ).toDF("k", "rts", "v")

  private def run(bucket: Option[Long], tol: Option[Long] = None) =
    AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
        toleranceSeconds = tol, bucketSeconds = bucket,
        direction = "forward")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getLong(r.fieldIndex("v")))))
      .toMap

  test("forward matches the EARLIEST right >= left.ts; equal ts visible; " +
      "no-future and no-right-rows rows stay null") {
    val got = run(None)
    assert(got == Map(1L -> Some(20L), 2L -> Some(20L), 3L -> None,
      4L -> Some(40L), 5L -> None))
  }

  test("tolerance cuts matches farther than tol seconds ahead") {
    val got = run(None, tol = Some(3 * 3600L))
    // id 1: gap 2h (keeps); id 4: gap ~87h (cut)
    assert(got == Map(1L -> Some(20L), 2L -> Some(20L), 3L -> None,
      4L -> None, 5L -> None))
  }

  test("bucketed path ≡ unbucketed (cross-bucket carry from FOLLOWING buckets)") {
    // 1-hour buckets: id 1's match sits 2 buckets ahead, id 4's ~87
    assert(run(Some(3600L)) == run(None))
    assert(run(Some(3600L), tol = Some(3 * 3600L)) ==
      run(None, tol = Some(3 * 3600L)))
  }

  test("backward defaults stay intact (regression: j01 semantics unchanged)") {
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getLong(r.fieldIndex("v")))))
      .toMap
    assert(got == Map(1L -> Some(10L), 2L -> Some(20L), 3L -> Some(30L),
      4L -> None, 5L -> None))
  }
}

/** x120's operator contract: α=1 keeps natural shares, α→0 flattens to
 *  uniform, weights always sum to 1, epochs = weight·B/tokens. */
class TemperatureMixSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.pipeline.Sampling

  private lazy val docs = Seq(
    ("a", "w " * 80), ("b", "w " * 15), ("c", "w " * 5)
  ).flatMap { case (s, t) => Seq((s, t.trim)) }
    .toDF("source", "text")

  test("alpha=1 reproduces natural shares; alpha=0 is uniform; weights sum to 1") {
    val out = Sampling.temperatureMixture(docs, Seq(0.0, 1.0),
        tokenBudget = 1000L)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(("a", 1.0))._2 == 0.8 && out(("b", 1.0))._2 == 0.15)
    assert(math.abs(out(("a", 0.0))._2 - 1.0 / 3) < 2e-6)
    Seq(0.0, 1.0).foreach { a =>
      val s = Seq("a", "b", "c").map(k => out((k, a))._2).sum
      assert(math.abs(s - 1.0) < 5e-6, s"weights for alpha=$a sum to $s")
    }
  }

  test("implied epochs = weight * budget / tokens; tail up-samples as alpha drops") {
    val out = Sampling.temperatureMixture(docs, Seq(0.3, 1.0),
        tokenBudget = 100L)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    val (cTok, cW, cEp) = out(("c", 1.0))
    assert(cTok == 5L && math.abs(cEp - cW * 100.0 / 5.0) < 2e-6)
    // flattening: the smallest source's weight RISES as alpha drops
    assert(out(("c", 0.3))._2 > out(("c", 1.0))._2)
    assert(out(("a", 0.3))._2 < out(("a", 1.0))._2)
  }
}

/** j07's operator contract: the version valid at ts attaches; validity
 *  gaps and before-first-version facts attach NOTHING (no stale
 *  leak); open-ended versions match forever; boundaries are
 *  [from, to) half-open. */
class PitJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInTimeJoin: match inside validity, gap -> null, open end " +
      "matches forever, half-open boundaries") {
    val facts = Seq(
      (1L, "k", ts("2026-01-01 10:30:00")), // inside v1
      (2L, "k", ts("2026-01-01 12:00:00")), // exactly v2.valid_from
      (3L, "k", ts("2026-01-01 13:30:00")), // GAP: v2 closed 13:00, v3 starts 14:00
      (4L, "k", ts("2026-01-01 15:00:00")), // open-ended v3
      (5L, "k", ts("2026-01-01 08:00:00"))  // before any version
    ).toDF("id", "k", "ts")
    val hist = Seq(
      ("k", ts("2026-01-01 10:00:00"), Option(ts("2026-01-01 12:00:00")), 1L),
      ("k", ts("2026-01-01 12:00:00"), Option(ts("2026-01-01 13:00:00")), 2L),
      ("k", ts("2026-01-01 14:00:00"), None: Option[java.sql.Timestamp], 3L)
    ).toDF("k", "valid_from", "valid_to", "v")
    val got = graft.operators.Scd.pointInTimeJoin(
        facts, hist, Seq("k"), "ts", Seq("v"))
      .collect().map { r =>
        r.getLong(0) -> (
          if (r.isNullAt(r.fieldIndex("v"))) None
          else Some(r.getLong(r.fieldIndex("v"))))
      }.toMap
    assert(got == Map(1L -> Some(1L), 2L -> Some(2L), 3L -> None,
      4L -> Some(3L), 5L -> None))
    // v2's close is exclusive: a fact AT 13:00:00 is already in the gap
    val boundary = Seq((9L, "k", ts("2026-01-01 13:00:00")))
      .toDF("id", "k", "ts")
    val b = graft.operators.Scd.pointInTimeJoin(
      boundary, hist, Seq("k"), "ts", Seq("v")).collect()(0)
    assert(b.isNullAt(b.fieldIndex("v")))
  }
}

/** a23's operator contract: Wilson bounds match the textbook values,
 *  and the small-n discrimination property holds — the same p-hat is
 *  anomalous with strong evidence (large n) but NOT with weak (small
 *  n), which is the whole reason to prefer it over a z-score on
 *  p-hat. */
class ProportionAnomalySpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.anomalies.Anomalies

  test("wilson interval matches the textbook 3/10 case") {
    val df = (Seq.fill(3)(("s", "d1", true)) ++
      Seq.fill(7)(("s", "d1", false)))
      .toDF("seg", "day", "err")
    val r = Anomalies.proportionAnomaly(df, Seq("seg"), "day",
      col("err")).collect()(0)
    val lo = r.getDouble(r.fieldIndex("wilson_lo"))
    val hi = r.getDouble(r.fieldIndex("wilson_hi"))
    // Wilson 95% for k=3, n=10: (0.1078, 0.6032)
    assert(math.abs(lo - 0.1078) < 5e-4, s"lo=$lo")
    assert(math.abs(hi - 0.6032) < 5e-4, s"hi=$hi")
  }

  test("same p-hat, different evidence: 20% of n=1000 flags against a " +
      "~10% baseline, 20% of n=10 stays inside its wide interval") {
    // five 13%-days dominate the pool (baseline ≈ 14.2%, inside each
    // base day's own interval ≈ (0.110, 0.151)); the spiked days both
    // run at 20%: n=1000 excludes the baseline (interval ≈
    // (0.177, 0.226)), n=10 does not (≈ (0.057, 0.510))
    def day(seg: String, d: String, k: Int, n: Int) =
      Seq.fill(k)((seg, d, true)) ++ Seq.fill(n - k)((seg, d, false))
    val rows = (1 to 5).flatMap(i => day("s", s"base$i", 130, 1000)) ++
      day("s", "spike_big", 200, 1000) ++ day("s", "spike_small", 2, 10)
    val got = Anomalies.proportionAnomaly(rows.toDF("seg", "day", "err"),
        Seq("seg"), "day", col("err"))
      .collect().map(r => r.getString(1) ->
        r.getBoolean(r.fieldIndex("is_anomalous"))).toMap
    assert(got("spike_big"), "strong evidence at 20% vs ~14.2% must flag")
    assert(!got("spike_small"), "2/10 has no evidence against ~14.2%")
    (1 to 5).foreach(i => assert(!got(s"base$i"), s"base$i flagged"))
  }
}

/** x121's kernel: the fold table, the FOLD-before-COLLAPSE order
 *  contract, and variant ≡ source under canonicalization. */
class CanonicalizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.pipeline.TextAnalysis

  private def canon(s: String): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.canonicalizeText(col("t")).as("c"))
      .collect()(0).getString(0)

  test("folds curly quotes/dashes/NBSP, collapses whitespace, trims, lowers") {
    assert(canon("“Hello” — It’s  Fine ") ==
      "\"hello\" - it's fine")
    // NBSP folds to space BEFORE the collapse, so a NBSP-space run
    // becomes ONE space (the order contract)
    assert(canon("a   b") == "a b")
    assert(canon("  a\tb\nc  ") == "a b c")
  }

  test("the x121 variant mutation canonicalizes back to its source") {
    val src = "Some document text with several words"
    val variant = src.toUpperCase.replace(" ", "   ")
    assert(canon(variant) == canon(src))
  }
}

/** p48's kernel: coupled nullity reads back as lift >> 1 / jaccard of
 *  the set overlap; independent nullity reads lift ≈ 1; a pair with a
 *  never-null side has undefined (null) lift, never a fake 0. */
class NullityCorrelationSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.profiler.Profiler

  test("subset coupling, independence, and the no-null guard") {
    // 100 rows: a null on 0..19; b null on 0..9 (subset of a);
    // c never null
    val df = (0 until 100).map { i =>
      (if (i < 20) None else Some(i.toLong),
       if (i < 10) None else Some(s"v$i"),
       i.toDouble)
    }.toDF("a", "b", "c")
    val out = Profiler.nullityCorrelation(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getLong(ab.fieldIndex("null_both")) == 10L)
    // lift = 10*100/(20*10) = 5.0 ; jaccard = 10/(20+10-10) = 0.5
    assert(ab.getDouble(ab.fieldIndex("lift")) == 5.0)
    assert(ab.getDouble(ab.fieldIndex("null_jaccard")) == 0.5)
    // c never null: lift undefined (null), jaccard vs a = 0/20 = 0
    val ac = out(("a", "c"))
    assert(ac.isNullAt(ac.fieldIndex("lift")))
    assert(ac.getDouble(ac.fieldIndex("null_jaccard")) == 0.0)
  }
}

/** The dark-code sweep's round-15 catch (after comment-stripping made
 *  the gate honest): TextAnalysis.qualityScore — the standalone column
 *  form — was referenced only by a comment. Pin it as an EQUIVALENCE:
 *  the standalone form and the staged qualityGate path must compute
 *  the identical score, which is the regression guard the staged
 *  optimization has always needed. */
class QualityScoreEquivalenceSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.pipeline.TextAnalysis

  test("standalone qualityScore ≡ qualityGate's staged quality_score") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs far"),
      (2L, "x"),                        // under the length floor
      (3L, "!!! ??? ... ;;; :::"),      // punctuation soup
      (4L, ("word " * 50).trim),        // no stopwords
      (5L, "the of and to is " * 10)    // stopword-saturated
    ).toDF("doc_id", "text")
    val standalone = docs
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val staged = TextAnalysis.qualityGate(docs)
      .select(col("doc_id"), col("quality_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(standalone == staged)
    assert(standalone(2L) < standalone(1L)) // the score discriminates
  }
}

/** s21's kernel: the footer audit sees every chunk at (file, row_group,
 *  column) grain, splits row groups when asked to, and accounts nulls
 *  exactly. */
class ParquetAuditSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("chunk grain, forced row-group split, and null accounting") {
    val dir = Files.createTempDirectory("graft_r15_pqaudit").toString
    val df = (0 until 1000)
      .map(i => (i.toLong, if (i % 4 == 0) None else Some(s"v$i")))
      .toDF("id", "s")
    // tiny row groups force >1 block per file
    df.coalesce(1).write
      .option("parquet.block.size", (64 * 1024).toString)
      .parquet(dir + "/data")
    val chunks = graft.sources.ParquetAudit.rowGroupChunks(
      spark, dir + "/data")
    val byCol = chunks.groupBy("column_name")
      .agg(org.apache.spark.sql.functions.sum("num_values").as("nv"),
        org.apache.spark.sql.functions.sum("null_count").as("nn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byCol("id") == (1000L, 0L))
    assert(byCol("s") == (1000L, 250L)) // every 4th row null
    // each chunk row carries a real (file, row_group, column) key
    val cols = chunks.select("column_name").distinct().collect()
      .map(_.getString(0)).toSet
    assert(cols == Set("id", "s"))
    assert(chunks.count() % 2 == 0) // 2 columns per row group
  }
}
