package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed range join: right rows whose timestamp falls in
 * `[leftTs − lowerSec, leftTs + upperSec)` for the same key.
 *
 * Spark has no native band-join physical operator; a naive theta-join
 * on the time predicate plans as BroadcastNestedLoopJoin (or a
 * cartesian per key) and dies at scale. The standard fix, used here:
 * quantize time into buckets at least as wide as the band, equi-join
 * on (key, bucket) — each left row covers the ≤2 buckets its band can
 * intersect, each right row sits in exactly 1, so every true pair is
 * produced exactly once (no distinct needed) — then apply the exact
 * band predicate as a post-join filter. Shuffle is co-partitioned on
 * (key, bucket); duplication is bounded by 2× the left side
 * regardless of band width or data volume.
 */
object RangeJoin {

  /** Exact floor division to a bucket id: subtract pmod first (a double
   *  floor(x/w) can land on the wrong side at exact bucket boundaries);
   *  the resulting quotient is an exact multiple, so the divide is
   *  lossless. Shared by every bucketing join in this object. */
  private def bucketIdOf(
      c: org.apache.spark.sql.Column, widthUs: Long) =
    ((c - pmod(c, lit(widthUs))) / widthUs).cast("long")

  /** Inner band-join pairs. Left columns keep their names; right
   *  columns come back prefixed `r_`. Band arithmetic runs on integer
   *  epoch micros (exact, engine-portable). */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String = "ts",
      rightTsCol: String = "ts",
      lowerSec: Long = 0L,
      upperSec: Long = 0L): DataFrame = {
    require(lowerSec + upperSec > 0, "band must have positive width")
    val widthUs = (lowerSec + upperSec) * 1000000L
    val lowerUs = lowerSec * 1000000L
    val upperUs = upperSec * 1000000L

    def bucketOf(c: org.apache.spark.sql.Column) = bucketIdOf(c, widthUs)

    // accept any physical ts encoding (LTZ / NTZ / nanos-long), not
    // just what eventsTable happened to produce
    val leftN = TsNorm.normalizeTs(left, leftTsCol)
    val rightN = TsNorm.normalizeTs(right, rightTsCol)

    val lUs = unix_micros(col(leftTsCol))
    val l = leftN
      .withColumn("__lus", lUs)
      .withColumn("__bucket",
        explode(sequence(
          bucketOf(lUs - lowerUs),
          bucketOf(lUs + upperUs - 1))))
    val rCols = rightN.columns.map(c => col(c).as(s"r_$c")).toSeq
    val r = rightN.select(rCols: _*)
      .withColumn("__rus", unix_micros(col(s"r_$rightTsCol")))
      .withColumn("__bucket", bucketOf(col("__rus")))

    val cond = keyCols.map(k => l(k) === r(s"r_$k"))
      .reduce(_ && _) && l("__bucket") === r("__bucket") &&
      r("__rus") >= l("__lus") - lowerUs && r("__rus") < l("__lus") + upperUs
    l.join(r, cond)
      .drop("__lus", "__rus", "__bucket")
  }

  /** Left-outer match counts: every left row with the number of right
   *  rows in its band (0 for no matches). */
  def rangeJoinCount(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String = "ts",
      rightTsCol: String = "ts",
      lowerSec: Long = 0L,
      upperSec: Long = 0L,
      countName: String = "n_matches"): DataFrame = {
    // count per physical ROW, not per row-value: m duplicate left rows
    // with k matches each produce m·k pair rows that the value-keyed
    // groupBy merges — divide by the row-value's multiplicity to get
    // each row's own k (exact: identical rows have identical matches)
    // normalize before the back-join: the pair rows carry the
    // normalized ts, so the outer frame must carry the same values
    val leftN = TsNorm.normalizeTs(left, leftTsCol)
    val pairs = rangeJoin(leftN, right, keyCols, leftTsCol, rightTsCol,
      lowerSec, upperSec)
    val grouped = pairs
      .groupBy(leftN.columns.map(col).toSeq: _*)
      .agg(count(lit(1)).as("__total"))
    val mult = leftN
      .groupBy(leftN.columns.map(col).toSeq: _*)
      .agg(count(lit(1)).as("__m"))
    // a left row containing a NULL column never matches its own group in
    // the using-joins (null ≠ null), so both sides come back null —
    // coalesce keeps the documented "0 for no matches" contract
    leftN.join(grouped, leftN.columns.toSeq, "left")
      .join(mult, leftN.columns.toSeq, "left")
      .withColumn(countName,
        (coalesce(col("__total"), lit(0L))
          / coalesce(col("__m"), lit(1L))).cast("long"))
      .drop("__total", "__m")
  }

  /** Interval-overlap join: pairs of rows (same key) whose [start, end)
   *  intervals intersect — downtime × events, sessions × promotions.
   *  Same bucketing idea as [[rangeJoin]]: every interval explodes to
   *  the time buckets it spans and pairs equi-join on (key, bucket);
   *  a pair sharing several buckets is emitted ONCE — only from the
   *  bucket containing the overlap's start (`greatest(lStart, rStart)`)
   *  — so no distinct pass is needed. Pick `bucketSec` on the order of
   *  a typical interval length: an interval spanning B buckets costs B
   *  exploded rows, and the shuffle stays co-partitioned on
   *  (key, bucket) regardless of data volume. Empty intervals
   *  (end ≤ start) are dropped. Right columns return prefixed `r_`. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStartCol: String = "start",
      leftEndCol: String = "end",
      rightStartCol: String = "start",
      rightEndCol: String = "end",
      bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val widthUs = bucketSec * 1000000L
    def bucketOf(c: org.apache.spark.sql.Column) = bucketIdOf(c, widthUs)

    val leftN = TsNorm.normalizeTs(left, leftStartCol, leftEndCol)
    val rightN = TsNorm.normalizeTs(right, rightStartCol, rightEndCol)
    val l = leftN
      .withColumn("__ls", unix_micros(col(leftStartCol)))
      .withColumn("__le", unix_micros(col(leftEndCol)))
      .filter(col("__le") > col("__ls"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__ls")), bucketOf(col("__le") - 1))))
    val rCols = rightN.columns.map(c => col(c).as(s"r_$c")).toSeq
    val r = rightN.select(rCols: _*)
      .withColumn("__rs", unix_micros(col(s"r_$rightStartCol")))
      .withColumn("__re", unix_micros(col(s"r_$rightEndCol")))
      .filter(col("__re") > col("__rs"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__rs")), bucketOf(col("__re") - 1))))

    val cond = keyCols.map(k => l(k) === r(s"r_$k")).reduce(_ && _) &&
      l("__bucket") === r("__bucket") &&
      l("__ls") < r("__re") && r("__rs") < l("__le") &&
      l("__bucket") === bucketOf(greatest(l("__ls"), r("__rs")))
    l.join(r, cond)
      .drop("__ls", "__le", "__rs", "__re", "__bucket")
  }
}
