package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benford first-significant-digit audit — the classic fabricated-data
 * / broken-upstream-generator detector for naturally-occurring numeric
 * columns (amounts, populations, file sizes). Organic multi-magnitude
 * data follows P(d) = log10(1 + 1/d); uniform synthetics, truncated
 * exports, and hand-keyed figures do not, and the divergence shows up
 * long before any row-level rule fires.
 *
 * Scale shape: one map-only projection (first nonzero digit via the
 * DECIMAL → string rendering, never float log10 — boundary values like
 * 1000.00 must not flap on FP rounding) + a 9-row groupBy. The
 * chi-square statistic is computed on the 9-row result, so the whole
 * audit is scan-bound at any corpus size and the output is O(columns).
 */
object Benford {

  /** Expected Benford mass log10(1 + 1/d), PINNED to the published
   *  6-dp table rather than computed with the engine's log10 — two
   *  engines' libm may differ by an ulp, and the audit's verdict must
   *  not hang on which libm ran it. */
  val ExpectedFreq: Seq[Double] = Seq(
    0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757)

  private def expected(d: Int): Double = ExpectedFreq(d - 1)

  /** First significant digit of `c`: the first [1-9] character of the
   *  value's decimal string. String-sourced so DECIMAL/BIGINT columns
   *  stay exact; zero / null / sign / leading zeros all fall out of the
   *  regex. Rows with no nonzero digit (exact 0, NULL) are excluded —
   *  Benford is defined over nonzero magnitudes. */
  private def firstDigit(c: Column): Column =
    regexp_extract(c.cast("string"), "[1-9]", 0)

  /** Per (column, digit): observed count + frequency vs the Benford
   *  expectation, plus each digit's chi-square contribution; rounded
   *  on a fixed scale so the oracle comparison is FP-stable. */
  def digitProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val digits = df.select(cols.map(c =>
        firstDigit(col(c)).as(c)): _*)
    val perCol = cols.map { c =>
      digits.filter(col(c) =!= "")
        .groupBy(col(c).cast("int").as("digit"))
        .agg(count(lit(1)).as("n"))
        .select(lit(c).as("column"), col("digit"), col("n"))
    }.reduce(_ unionByName _)
    val totals = perCol.groupBy("column")
      .agg(sum("n").as("total"))
    val exp = Seq.tabulate(9)(i => (i + 1, expected(i + 1)))
      .foldLeft(lit(null).cast("double")) { case (acc, (d, e)) =>
        when(col("digit") === d, lit(e)).otherwise(acc)
      }
    // (n − e·total)²/(e·total) via self-multiply, NOT pow(x, 2): both
    // engines' IEEE ·/− are bit-deterministic, libm pow need not be
    val dev = col("n").cast("double") - col("exp_freq") * col("total")
    perCol.join(totals, "column")
      .withColumn("exp_freq", exp)
      .select(col("column"), col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("obs_freq"),
        round(col("exp_freq"), 6).as("exp_freq"),
        round(dev * dev /
          (col("exp_freq") * col("total")), 6).as("chi2_part"))
  }

  /** One verdict row per column: chi-square statistic over ALL 9 digit
   *  cells (df = 8) against a fixed critical value. 20.09 is the
   *  upper 99th percentile of chi-square(8) — a public constant, so
   *  both engines pin the same threshold.
   *
   *  Digits that never occur still owe their cell: for an absent digit
   *  the contribution (0 − e·total)²/(e·total) reduces to e·total, so
   *  the missing mass is (1 − Σ e over PRESENT digits)·total — without
   *  it a column whose tail digits never appear under-reports chi2 and
   *  can false-negative the fabricated-data audit. */
  def audit(df: DataFrame, cols: Seq[String],
      critical: Double = 20.09): DataFrame =
    digitProfile(df, cols)
      .groupBy("column")
      .agg(sum("n").as("n_values"),
        round(sum("chi2_part") +
          (lit(1.0) - sum("exp_freq")) * sum("n"), 4).as("chi2"))
      .withColumn("benford_ok", col("chi2") <= critical)
}
