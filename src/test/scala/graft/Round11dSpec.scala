package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis
import graft.profiler.Benford

class AhoCorasickSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def brute(text: String, pats: Seq[String]): Array[Int] =
    pats.zipWithIndex.collect {
      case (p, i) if text != null && text.contains(p) => i
    }.toArray

  test("matches equal brute-force contains over random strings") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int, alpha: String) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // tiny alphabet so patterns overlap, nest, and share prefixes a lot
    for (_ <- 1 to 50) {
      val pats = (1 to 8).map(_ => randStr(1 + rnd.nextInt(5), "ab"))
        .distinct
      val ac = new TextAnalysis.AhoCorasick(pats)
      for (_ <- 1 to 20) {
        val text = randStr(rnd.nextInt(40), "ab")
        assert(ac.matches(text).toSeq == brute(text, pats).toSeq,
          s"text='$text' pats=$pats")
      }
    }
  }

  test("pattern-inside-pattern and suffix overlaps all report") {
    // "ab" ends inside "aab"; "aab" inside "aaab"; suffix chain matters
    val ac = new TextAnalysis.AhoCorasick(Seq("ab", "aab", "aaab", "b"))
    assert(ac.matches("aaab").toSeq == Seq(0, 1, 2, 3))
    assert(ac.matches("ab").toSeq == Seq(0, 3))
    assert(ac.matches("aa").isEmpty)
    assert(ac.matches(null).isEmpty)
  }

  test("canaryScan counts distinct docs per canary, one pass") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick brown quick brown"), // repeated hit counts ONCE
      (3L, "nothing here"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.canaryScan(docs, Seq("quick brown", "here"))
      .orderBy("canary").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("here", 1L, 3L), ("quick brown", 2L, 1L)))
  }

  test("canaryScan refuses unbounded canary lists and empty needles") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.canaryScan(docs, Seq("a", "b"), maxCanaries = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.canaryScan(docs, Seq(""))
    }
  }
}

class BenfordSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("first digits come from the decimal rendering, not float log") {
    val df = Seq(
      java.math.BigDecimal.valueOf(1000, 2),   // 10.00   -> 1
      java.math.BigDecimal.valueOf(-950, 2),   // -9.50   -> 9
      java.math.BigDecimal.valueOf(5, 2),      // 0.05    -> 5
      java.math.BigDecimal.valueOf(0, 2),      // 0.00    -> excluded
      null).toDF("v")
    val out = Benford.digitProfile(df, Seq("v"))
      .orderBy("digit").collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq == Seq(1, 5, 9))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(1L, 1L, 1L))
  }

  test("a Benford-distributed column passes the audit; uniform fails") {
    // 1000 values with exact Benford digit counts vs 9×111 uniform
    val benford = Benford.ExpectedFreq.zipWithIndex.flatMap {
      case (f, i) => Seq.fill(math.round(f * 1000).toInt)(
        (i + 1) * 100L + 7L)
    }
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(d * 100L + 7L))
    val pass = Benford.audit(benford.toDF("v"), Seq("v")).collect().head
    val fail = Benford.audit(uniform.toDF("v"), Seq("v")).collect().head
    assert(pass.getAs[Boolean]("benford_ok"),
      s"benford sample chi2=${pass.getAs[Double]("chi2")}")
    assert(!fail.getAs[Boolean]("benford_ok"),
      s"uniform sample chi2=${fail.getAs[Double]("chi2")}")
  }
}

class OrcSourceSpec extends AnyFunSuite {
  import SharedSpark._

  test("ORC roundtrip preserves rows; partition + predicate pushdown") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = "/tmp/graft_test_orc/docs"
    graft.sources.OrcSource.writePartitioned(docs, dir, Seq("lang"))
    val back = graft.sources.OrcSource.read(spark, dir)
      .filter(col("lang") === "en" && col("n_chars") > 100)
    val plan = back.queryExecution.executedPlan.toString
    // lang prunes DIRECTORIES (partition filter), n_chars pushes into
    // the ORC stripe index — both must appear in the scan node
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition filter in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), " +
      "GreaterThan(n_chars,100)]"), s"no pushed filter in:\n$plan")
    val expected = docs
      .filter(col("lang") === "en" && col("n_chars") > 100).count()
    assert(back.count() == expected)
    // full-table integrity: every column survives the format hop
    val a = docs.selectExpr("sum(doc_id)", "sum(length(text))",
      "count(distinct source)").collect().head
    val b = graft.sources.OrcSource.read(spark, dir)
      .selectExpr("sum(doc_id)", "sum(length(text))",
        "count(distinct source)").collect().head
    assert(a == b)
  }
}
