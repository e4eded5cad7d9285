package graft.profiler

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types._

/**
 * Single-pass table profiler — the heart of the engine (SURVEY.md §2.2).
 *
 * The reference batches many scalar aggregates into a handful of SELECTs
 * pushed to the warehouse (backend/app.py:3354-3580 "OPTIMIZATION 1"); the
 * Spark-native equivalent is ONE `df.agg(...)` carrying every per-column
 * aggregate expression, which Catalyst compiles to a single shuffle-free
 * scan + partial/final hash aggregation. At 100 TB this is one pass over
 * the data regardless of column count.
 *
 * Two modes:
 *  - exact  = true  → COUNT(DISTINCT) (expand-based) + exact percentile.
 *                     Used for oracle parity at small SF.
 *  - exact  = false → approx_count_distinct (HLL, mergeable sketch) +
 *                     percentile_approx. The 100 TB path: no expand
 *                     explosion, single pass, constant memory per column.
 */
object Profiler {

  /** Backtick-quote an identifier for safe interpolation into SQL/expr
   *  strings (embedded backticks doubled, per Spark's quoting rule). */
  def quoteId(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Type bucketing (reference: collector.py:607-627, app.py:3367-3373).
   *  Spark schemas are precise, so bucket on DataType directly. */
  def typeBucket(dt: DataType): String = dt match {
    case _: NumericType => "numeric"
    case _: StringType => "string"
    case _: DateType | _: TimestampType | _: TimestampNTZType => "datetime"
    case _: BooleanType => "boolean"
    case _ => "other"
  }

  /** P25: normalized column type distribution (collector.py:607-627). */
  def typeDistribution(schema: StructType): Map[String, Int] =
    schema.fields
      .groupBy(f => typeBucket(f.dataType) match {
        case "string" => "text"; case b => b
      })
      .map { case (k, v) => k -> v.length }

  /** P24: table health score (reference arithmetic, collector.py:661-687):
   *  100 − 20 (no PK) − 30 (empty) − 15 (>80% nullable cols) − 10 (>50 cols),
   *  floored at 0. */
  def healthScore(
      hasPrimaryKey: Boolean,
      rowCount: Long,
      nullableFraction: Double,
      columnCount: Int): Int = {
    var score = 100
    if (!hasPrimaryKey) score -= 20
    if (rowCount == 0) score -= 30
    if (nullableFraction > 0.8) score -= 15
    if (columnCount > 50) score -= 10
    math.max(score, 0)
  }

  /** Build the per-column aggregate expressions for the single-pass profile.
   *  Every expression is a codegen-friendly built-in (conditional SUM /
   *  MIN / MAX / AVG), so the whole profile stays inside one
   *  WholeStageCodegen span. `now` is injected for deterministic
   *  future-date counts (SURVEY.md §7.4). */
  def aggExprs(
      schema: StructType,
      exact: Boolean,
      now: java.sql.Timestamp,
      longTextThreshold: Int = 10000): Seq[Column] = {
    val exprs = Seq.newBuilder[Column]
    exprs += count(lit(1)).as("__row_count")
    schema.fields.foreach { f =>
      val c = col(f.name)
      val n = f.name
      // P2: null counts — one conditional sum per column, single scan
      exprs += coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"${n}__nulls")
      // P3: distinct counts (exact for parity; HLL sketch at scale —
      // rsd 5%, Spark's default: constant-memory mergeable sketch. The
      // tighter 2% setting quadrupled the whole mixed-agg wall time at
      // sf0.1 (bigger register arrays through partial-agg buffers) for
      // precision a profile's distinct count never uses.
      exprs += (if (exact) countDistinct(c) else approx_count_distinct(c, 0.05))
        .as(s"${n}__distinct")
      typeBucket(f.dataType) match {
        case "numeric" =>
          // min/max/sum stay on the native type (decimal columns keep
          // exact decimal aggregates — VERDICT r1 #6); conversion to the
          // profile's Double fields happens at the driver edge.
          exprs += min(c).as(s"${n}__min")
          exprs += max(c).as(s"${n}__max")
          exprs += avg(c).as(s"${n}__mean")
          exprs += sum(c).as(s"${n}__sum")
          exprs += stddev_samp(c.cast(DoubleType)).as(s"${n}__stddev")
          // accuracy 1000 ⇒ rank error ≤ 0.1% — far inside what a profile
          // median is used for, and the quantile-summary maintenance cost
          // (an imperative agg, off the codegen path) scales with it
          exprs += (if (exact) expr(s"percentile(${quoteId(n)}, 0.5)")
                    else percentile_approx(c.cast(DoubleType), lit(0.5), lit(1000)))
            .as(s"${n}__median")
          val d = c.cast(DoubleType)
          // P6: sign buckets (app.py:3472-3474)
          exprs += sum(when(d === 0.0, 1L).otherwise(0L)).as(s"${n}__zero")
          exprs += sum(when(d < 0.0, 1L).otherwise(0L)).as(s"${n}__neg")
          exprs += sum(when(d > 0.0, 1L).otherwise(0L)).as(s"${n}__pos")
        case "string" =>
          // P10-P11: length stats + empty-string count (app.py:3571-3575)
          val len = length(c)
          exprs += min(len).cast(LongType).as(s"${n}__minlen")
          exprs += max(len).cast(LongType).as(s"${n}__maxlen")
          exprs += avg(len).as(s"${n}__avglen")
          exprs += sum(when(c === "", 1L).otherwise(0L)).as(s"${n}__empty")
        case "datetime" =>
          // P12-P13: date range + future/past counts with injected `now`
          // (reference emits both, app.py:3558-3562 — VERDICT r1 #4)
          exprs += date_format(min(c), "yyyy-MM-dd HH:mm:ss").as(s"${n}__mindate")
          exprs += date_format(max(c), "yyyy-MM-dd HH:mm:ss").as(s"${n}__maxdate")
          exprs += sum(when(c > lit(now), 1L).otherwise(0L)).as(s"${n}__future")
          exprs += sum(when(c <= lit(now), 1L).otherwise(0L)).as(s"${n}__past")
          // P19: freshness — hours since latest timestamp vs injected now
          // (reference: core/anomalies/metrics.py:80-85). TIMESTAMP_NTZ
          // can't cast straight to BIGINT; hop through TIMESTAMP (UTC).
          exprs += floor(
            (lit(now).cast(TimestampType).cast(LongType) -
              max(c).cast(TimestampType).cast(LongType)) / 3600L)
            .as(s"${n}__freshness_hours")
        case _ => ()
      }
    }
    exprs.result()
  }

  /** P14: top-K frequent values for ALL eligible columns in ONE job.
   *
   *  Instead of the reference's per-column `GROUP BY c ORDER BY count DESC
   *  LIMIT 10` queries (app.py:3646-3653), unpivot the eligible columns
   *  with `stack` and run a single groupBy + windowed row_number. At scale
   *  this is one shuffle keyed by (column, value) — partial aggregation
   *  makes the map-side output proportional to distinct values, not rows. */
  def topValues(
      df: DataFrame,
      columns: Seq[String],
      k: Int = 10): DataFrame = {
    require(columns.nonEmpty, "topValues needs at least one column")
    // Group on the FULL value — truncation is display-only (the reference
    // truncates to 97 chars + '...' when rendering, app.py:3664-3667;
    // grouping on a prefix would merge distinct values and inflate counts).
    val stackExpr = columns
      .map(c => s"'${c.replace("'", "''")}', cast(${quoteId(c)} as string)")
      .mkString(s"stack(${columns.size}, ", ", ", ") as (column_name, value)")
    val unpivoted = df.selectExpr(stackExpr).filter(col("value").isNotNull)
    val counted = unpivoted.groupBy("column_name", "value").count()
    val w = Window.partitionBy("column_name")
      .orderBy(col("count").desc, col("value"))
    counted
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("rank")
  }

  /** P14 scale path: approximate top-K via a mergeable frequent-items
   *  sketch (Misra–Gries / Space-Saving family — DataSketches
   *  `ItemsSketch`, same library Spark's `hll_sketch_agg` wraps).
   *
   *  The exact [[topValues]] shuffles every distinct (column, value)
   *  pair; this path shuffles NOTHING — one bounded sketch per
   *  (partition, column) built map-side, combined with `treeReduce`
   *  (log-depth executor-side merges), ~KBs per sketch regardless of
   *  input size. At 100 TB with a high-cardinality column the exact
   *  path's shuffle is the bottleneck; this is the one you run.
   *
   *  Guarantees (inherited from Misra–Gries): estimate error ≤
   *  maximumError ≤ 3.5·N/maxMapSize, and when a column's distinct
   *  count stays under ~0.75·maxMapSize the map never purges and every
   *  count is EXACT (maximumError = 0) — which is what the p35 oracle
   *  pins. Output: (column_name, value, estimate, lower_bound,
   *  upper_bound), top-k by estimate with the value as tiebreak. */
  def approxTopValues(
      df: DataFrame,
      columns: Seq[String],
      k: Int = 10,
      maxMapSize: Int = 1024): DataFrame = {
    require(columns.nonEmpty, "approxTopValues needs at least one column")
    require((maxMapSize & (maxMapSize - 1)) == 0,
      "maxMapSize must be a power of 2")
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    import org.apache.datasketches.memory.Memory
    val spark = df.sparkSession
    val n = columns.size
    val strs = df.select(columns.map(c => col(c).cast(StringType)): _*)
    val merged: Array[Array[Byte]] = strs.rdd
      .mapPartitions { it =>
        val serDe = new ArrayOfStringsSerDe()
        val sks = Array.fill(n)(new ItemsSketch[String](maxMapSize))
        it.foreach { row =>
          var i = 0
          while (i < n) {
            if (!row.isNullAt(i)) sks(i).update(row.getString(i))
            i += 1
          }
        }
        Iterator.single(sks.map(_.toByteArray(serDe)))
      }
      .treeReduce({ (a, b) =>
        val serDe = new ArrayOfStringsSerDe()
        a.zip(b).map { case (x, y) =>
          ItemsSketch.getInstance[String](Memory.wrap(x), serDe)
            .merge(ItemsSketch.getInstance[String](Memory.wrap(y), serDe))
            .toByteArray(serDe)
        }
      }, depth = 2)
    val serDe = new ArrayOfStringsSerDe()
    val rows = columns.zip(merged).flatMap { case (cname, bytes) =>
      val sk = ItemsSketch.getInstance[String](Memory.wrap(bytes), serDe)
      sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .sortBy(r => (-r.getEstimate, r.getItem))
        .take(k)
        .map(r => (cname, r.getItem, r.getEstimate,
          r.getLowerBound, r.getUpperBound))
        .toSeq
    }
    import spark.implicits._
    rows.toDF("column_name", "value", "estimate",
      "lower_bound", "upper_bound")
  }

  /** P20: regex pattern match counts/percentages for a string column
   *  (reference: app.py:4210-4237 — matching vs non-matching vs null,
   *  percentages over total rows). Single-pass conditional aggregate. */
  def patternMatch(df: DataFrame, column: String, pattern: String): DataFrame = {
    val c = col(column)
    df.agg(
      count(lit(1)).as("total_count"),
      coalesce(sum(when(c.isNotNull && c.rlike(pattern), 1L).otherwise(0L)), lit(0L))
        .as("matching_count"),
      coalesce(sum(when(c.isNotNull && !c.rlike(pattern), 1L).otherwise(0L)), lit(0L))
        .as("non_matching_count"),
      coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as("null_count"))
      .withColumn("matching_percentage",
        round(col("matching_count") * 100.0 / col("total_count"), 6))
      .withColumn("non_matching_percentage",
        round(col("non_matching_count") * 100.0 / col("total_count"), 6))
  }

  /** P28 / §1.3 `distribution_data`: equal-width numeric histogram
   *  (frontend consumer: sparvi-frontend TableColumns.js:109,
   *  TableProfile.js:63 — the shape is ours to define; equal-width
   *  buckets from min/max is the reference-style renderable form).
   *
   *  Two passes: one min/max agg (driver-collected: 2 doubles), one
   *  conditional-count agg — both shuffle-free single scans. Buckets are
   *  densified (empty buckets emit count 0) so the output is always
   *  exactly `buckets` rows. Values at max land in the last bucket. */
  def histogram(df: DataFrame, column: String, buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val c = col(column).cast(DoubleType)
    val stats = df.agg(min(c).as("mn"), max(c).as("mx"))
    val base = df.select(c.as("x")).filter(col("x").isNotNull)
      .crossJoin(broadcast(stats))
    // (x − mn) / ((mx − mn) / buckets): keep this exact double-op order —
    // the DuckDB oracle mirrors it token for token for bit parity
    val width = (col("mx") - col("mn")) / lit(buckets).cast(DoubleType)
    val idx = when(col("mx") === col("mn"), 0)
      .otherwise(least(
        floor((col("x") - col("mn")) / width).cast(IntegerType),
        lit(buckets - 1)))
    val counted = base.groupBy(idx.as("bucket")).agg(count(lit(1)).as("cnt"))
    val all = broadcast(stats)
      .select(explode(sequence(lit(0), lit(buckets - 1))).as("bucket"),
        col("mn"), col("mx"))
    all.join(counted, Seq("bucket"), "left")
      .select(col("bucket"),
        round(col("mn") + col("bucket") * width, 6).as("lo"),
        round(col("mn") + (col("bucket") + 1) * width, 6).as("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("bucket")
  }

  /** Quantile bin edges for [[equiDepthHistogram]]: one aggregation
   *  producing `buckets` (bucket, lo, hi) rows from the exact
   *  `percentile(col, array(0, 1/k, …, 1))` (linear interpolation; the
   *  oracle-parity form). `exact=false` is the 100 TB path —
   *  `percentile_approx` sketches merge without the exact percentile's
   *  per-partition value buffering. Raw full-precision doubles: callers
   *  round for display, the bucketing itself must use these bits. */
  def quantileEdges(
      df: DataFrame,
      column: String,
      buckets: Int,
      exact: Boolean = true): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val probs = (0 to buckets).map(i => i.toDouble / buckets).mkString(", ")
    val agg =
      if (exact) expr(s"percentile($column, array($probs))")
      else expr(s"percentile_approx($column, array($probs), 10000)")
    // pair (lo, hi) = (edge[i], edge[i+1]) inside the single-row array
    // BEFORE exploding — no unpartitioned lead() window (which logs the
    // WindowExec single-partition warning on every call) and no join
    df.agg(agg.as("__edges"))
      .select(posexplode(expr(
        """transform(slice(__edges, 1, size(__edges) - 1),
          |  (lo, i) -> struct(lo AS lo, __edges[i + 1] AS hi))"""
          .stripMargin)).as(Seq("bucket", "__s")))
      .select(col("bucket"), col("__s.lo"), col("__s.hi"))
  }

  /** Equi-depth histogram — the quantile-binned complement of the
   *  equal-width [[histogram]] (skew-robust: every bin holds ~n/k rows,
   *  so one hot value can't blank out the rest of the chart). Bin i =
   *  [lo, hi) with the last bin closed; a value equal to an interior
   *  edge goes RIGHT (x ≥ lo wins), duplicate edges from discrete data
   *  yield empty bins rather than double counts. The bin frame is tiny
   *  (k rows) and broadcast, so counting is a map-only scan + one
   *  k-cell aggregation — no global sort, no row shuffle. */
  def equiDepthHistogram(
      df: DataFrame,
      column: String,
      buckets: Int = 10,
      exact: Boolean = true): DataFrame =
    histogramWithEdges(df, column, quantileEdges(df, column, buckets, exact))

  /** Count rows per pre-computed (bucket, lo, hi) bin — split out so a
   *  persisted edge table can be replayed (the oracle path) or reused
   *  across days for drift-stable binning. */
  def histogramWithEdges(
      df: DataFrame,
      column: String,
      edges: DataFrame): DataFrame = {
    val c = col(column).cast(DoubleType)
    // last-bucket id as a 1-row cross join over the k-row edge frame —
    // not a global window (empty partition spec = WindowExec warning)
    val bins = broadcast(edges.select(col("bucket"), col("lo"), col("hi"))
      .crossJoin(edges.agg(max(col("bucket")).as("__last"))))
    val counted = df.select(c.as("__x")).filter(col("__x").isNotNull)
      .join(bins,
        col("__x") >= col("lo") &&
          (col("__x") < col("hi") ||
            (col("bucket") === col("__last") && col("__x") <= col("hi"))))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    // broadcast the k-cell count side: a left join can only broadcast-
    // build its right input (build-left is unsupported and warns)
    bins.select(col("bucket"), col("lo"), col("hi"))
      .join(broadcast(counted), Seq("bucket"), "left")
      .select(col("bucket"),
        round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("bucket")
  }

  /** P4: fully-duplicated row count = COUNT(*) − COUNT(DISTINCT *).
   *
   *  Scale path (default): rows are reduced map-side to TWO independent
   *  64-bit xxhash64 values (the seed column differs), so the shuffle
   *  carries 16 bytes per row instead of the full row width — at 100 TB
   *  that is ~1% of the naive groupBy-all-columns shuffle — and the
   *  combined 128-bit key makes collisions negligible (~2^-64 at 1e11
   *  rows; a single 64-bit hash would NOT be: ~0.3 collision odds at
   *  1e11). xxhash64 hashes the row values directly — an earlier
   *  md5(to_json(...)) variant materialized a JSON string per row and
   *  was the dominant cost of the tier-profile bench query. `exact=true`
   *  keeps the full-row groupBy for oracle-parity paranoia at small SF. */
  def duplicateRowCount(df: DataFrame, exact: Boolean = false): Long = {
    val grouped =
      if (exact) {
        val cols = df.columns.map(col).toSeq
        df.groupBy(cols: _*).count()
      } else {
        val cols = df.columns.map(col).toSeq
        // salt PREPENDED: Spark's xxhash64 chains each field's hash as
        // the next field's seed, so a trailing salt only varies the last
        // step — two rows colliding in the running state would collide
        // in BOTH hashes. A leading salt makes the chains diverge from
        // the first field, giving genuinely independent 64-bit keys.
        df.select(
          xxhash64((lit(1L) +: cols): _*).as("h1"),
          xxhash64((lit(2L) +: cols): _*).as("h2"))
          .groupBy("h1", "h2").count()
      }
    grouped
      .agg(coalesce(sum(col("count") - 1L), lit(0L)).as("dupes"))
      .first().getLong(0)
  }

  /** Per-group profile (beyond-reference): the SAME single-pass
   *  aggregate battery as [[profile]], grouped by a segment column —
   *  per-source / per-language / per-tenant data quality in ONE
   *  map-side-combined hash aggregation instead of one profile job per
   *  segment. The group column itself is excluded from the battery.
   *  Output: one row per group, columns named `col__metric` exactly as
   *  [[aggExprs]] emits them. */
  def profileByGroup(
      df: DataFrame,
      groupCol: String,
      exact: Boolean = true,
      now: java.sql.Timestamp =
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == groupCol))
    val exprs = aggExprs(schema, exact, now)
    df.groupBy(col(groupCol)).agg(exprs.head, exprs.tail: _*)
  }

  /** Functional-dependency check A → B (beyond-reference): for every
   *  value of `lhs`, does `rhs` take exactly one non-null value? The
   *  classic schema-inference / data-quality probe (order → customer,
   *  zip → state). One lhs-keyed aggregation; returns per-group
   *  (lhs..., n_rows, n_rhs_values, violates). Aggregate `violates` for
   *  the table-level violation rate. */
  def fdViolations(
      df: DataFrame,
      lhs: Seq[String],
      rhs: String): DataFrame = {
    require(lhs.nonEmpty, "need at least one determinant column")
    df.groupBy(lhs.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(rhs)).as("n_rhs_values"))
      .withColumn("violates", col("n_rhs_values") > 1L)
  }

  /** Pairwise functional-dependency DISCOVERY over a column set — the
   *  schema-inference sweep that PROPOSES candidate FDs, where
   *  [[fdViolations]] checks one the user already named. For every
   *  ordered pair (A, B): A → B holds iff |distinct A| =
   *  |distinct (A, B)|; violation_ppm = the extra (A, B) combinations
   *  per determinant group, the g3-style strength measure a profiler
   *  ranks near-FDs by.
   *
   *  Null semantics: a null determinant is a GROUP (struct-based
   *  distinct counts), matching the SELECT DISTINCT subquery the
   *  oracle uses — never the null-skipping COUNT(DISTINCT col).
   *
   *  Scale shape: ONE aggregation pass with |cols| + |cols|·(|cols|−1)
   *  exact distinct counts — Catalyst plans an Expand of that factor,
   *  bounded by the SCHEMA (a hand-picked candidate set), never the
   *  data. For very wide sweeps swap countDistinct for
   *  approx_count_distinct (the p27 move) — the holds verdict then
   *  becomes a screen, not a proof. */
  def fdDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to pair")
    require(cols.distinct.size == cols.size, "duplicate columns in set")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    val aggs = cols.map(c => countDistinct(struct(col(c))).as(s"__d_$c")) ++
      pairs.map { case (a, b) =>
        countDistinct(struct(col(a), col(b))).as(s"__p_${a}__$b")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (a, b) =>
        struct(
          lit(a).as("determinant"), lit(b).as("dependent"),
          col(s"__d_$a").as("n_det"),
          col(s"__p_${a}__$b").as("n_pairs"))
      }: _*)).as("__r"))
      .select(col("__r.*"))
      .withColumn("holds", col("n_pairs") === col("n_det"))
      .withColumn("violation_ppm",
        expr("(n_pairs - n_det) * 1000000 div n_det"))
  }

  /** Nullity-correlation sweep — WHICH columns go null TOGETHER (the
   *  missingno-matrix question): per unordered column pair, the
   *  observed both-null count against independence
   *  (`expected_both = null_a·null_b/n`), as a lift ratio plus the
   *  Jaccard of the two null sets. Co-null columns betray a shared
   *  upstream cause (one failed join, one dead extractor) that
   *  per-column null rates (P2) can't see.
   *
   *  Same scale shape as [[fdDiscovery]]: ONE aggregation pass with
   *  |cols| + C(|cols|,2) indicator sums — bounded by the schema,
   *  never the data — exploded to pair rows with no driver collect.
   *  `lift` is null when either side has no nulls (independence is
   *  undefined, not 0). */
  def nullityCorrelation(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to pair")
    require(cols.distinct.size == cols.size, "duplicate columns in set")
    val pairs = for { a <- cols; b <- cols if a < b } yield (a, b)
    val aggs = count(lit(1)).as("__n") +:
      (cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__na_$c")) ++
       pairs.map { case (a, b) =>
         sum(when(col(a).isNull && col(b).isNull, 1L).otherwise(0L))
           .as(s"__nb_${a}__$b")
       })
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          col("__n").as("n_rows"),
          col(s"__na_$a").as("null_a"),
          col(s"__na_$b").as("null_b"),
          col(s"__nb_${a}__$b").as("null_both"))
      }: _*)).as("__r"))
      .select(col("__r.*"))
      .withColumn("expected_both",
        round(col("null_a").cast("double") * col("null_b")
          / col("n_rows"), 6))
      .withColumn("lift",
        when(col("null_a") > 0 && col("null_b") > 0,
          round(col("null_both").cast("double") * col("n_rows")
            / (col("null_a") * col("null_b")), 6)))
      .withColumn("null_jaccard",
        when(col("null_a") + col("null_b") - col("null_both") > 0,
          round(col("null_both").cast("double")
            / (col("null_a") + col("null_b") - col("null_both")), 6))
          .otherwise(lit(0.0)))
  }

  /** Full profile of a DataFrame: single-pass agg + one top-K job + one
   *  duplicate-count job (3 scans total; the reference issues 4+ SELECT
   *  batches per table, app.py:3354-3677). */
  def profile(
      df: DataFrame,
      table: String,
      meta: Option[TableMeta] = None,
      exact: Boolean = true,
      now: java.sql.Timestamp = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
      topK: Int = 10,
      topKDistinctLimit: Long = 1000,
      topKMaxColumns: Int = 10,
      includeDuplicates: Boolean = true,
      includeDistributions: Boolean = true,
      distributionBuckets: Int = 10,
      includeSamples: Boolean = false,
      sampleRows: Int = 50,
      maxColumns: Int = Int.MaxValue): TableProfile = {
    // P26: tier-limited stats — cap profiled columns (reference limits
    // per-column stats to the first 5–10 columns at lower tiers,
    // collector.py:150-165); row count, column_count and the type
    // distribution stay table-wide.
    val fullSchema = df.schema
    val schema = org.apache.spark.sql.types.StructType(
      fullSchema.fields.take(maxColumns))
    val exprs = aggExprs(schema, exact, now)
    val row = df.agg(exprs.head, exprs.tail: _*).first()
    val idx = row.schema.fieldNames.zipWithIndex.toMap

    def optL(k: String): Option[Long] =
      idx.get(k).filterNot(row.isNullAt).map(i => row.get(i) match {
        case l: Long => l
        case i2: Int => i2.toLong
        case d: Double => d.toLong
        case b: java.math.BigDecimal => b.longValue
        case x => x.toString.toLong
      })
    def optD(k: String): Option[Double] =
      idx.get(k).filterNot(row.isNullAt).map(i => row.get(i) match {
        case d: Double => d
        case l: Long => l.toDouble
        case i2: Int => i2.toDouble
        case f: Float => f.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case b: java.math.BigDecimal => b.doubleValue
        case x => x.toString.toDouble
      })
    def optS(k: String): Option[String] =
      idx.get(k).filterNot(row.isNullAt).map(row.getString)

    val rowCount = row.getLong(idx("__row_count"))

    // top-K: all types except long text / binary (reference includes
    // dates & booleans, app.py:3625-3637), only distinct<limit, capped
    // column count — the reference's knobs (app.py:3628-3645)
    val distinctByCol = schema.fieldNames
      .map(n => n -> optL(s"${n}__distinct").getOrElse(0L)).toMap
    val topKCols = schema.fields
      .filterNot(f => f.dataType == BinaryType ||
        typeBucket(f.dataType) == "other")
      .map(_.name)
      .filter(n => distinctByCol(n) > 0 && distinctByCol(n) < topKDistinctLimit)
      .take(topKMaxColumns)
    def display(v: String): String =
      if (v.length > 100) v.take(97) + "..." else v
    val topByCol: Map[String, Seq[TopValue]] =
      if (topKCols.isEmpty || rowCount == 0) Map.empty
      else topValues(df, topKCols.toIndexedSeq, topK).collect()
        .groupBy(_.getString(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(r => (-r.getLong(2), r.getString(1))).map { r =>
            val cnt = r.getLong(2)
            TopValue(display(r.getString(1)), cnt, cnt.toDouble / rowCount * 100.0)
          }.toSeq
        }

    // P28 `distribution_data`: per-column equal-width bucket counts for
    // ALL numeric columns in ONE extra conditional-agg pass — min/max are
    // already known from the main agg row, so bucket membership is a
    // codegen'd when/sum per (column, bucket); no shuffle, no per-column
    // jobs. Empty/constant columns get a single degenerate bucket.
    val histByCol: Map[String, Seq[HistBucket]] =
      if (!includeDistributions || rowCount == 0) Map.empty
      else {
        val numCols = schema.fields
          .filter(f => typeBucket(f.dataType) == "numeric")
          .map(_.name)
          .filter(n => optD(s"${n}__min").isDefined)
        if (numCols.isEmpty) Map.empty
        else {
          val b = distributionBuckets
          val hexprs = numCols.flatMap { n =>
            val mn = optD(s"${n}__min").get
            val mx = optD(s"${n}__max").get
            val x = col(n).cast(DoubleType)
            val idxExpr =
              if (mx == mn) lit(0)
              else least(floor((x - mn) / ((mx - mn) / b)).cast(IntegerType),
                lit(b - 1))
            (0 until b).map(i =>
              sum(when(x.isNotNull && idxExpr === i, 1L).otherwise(0L))
                .as(s"${n}__h$i"))
          }
          val hrow = df.agg(hexprs.head, hexprs.tail: _*).first()
          val hidx = hrow.schema.fieldNames.zipWithIndex.toMap
          numCols.map { n =>
            val mn = optD(s"${n}__min").get
            val mx = optD(s"${n}__max").get
            val width = (mx - mn) / b
            n -> (0 until b).map { i =>
              HistBucket(mn + i * width, mn + (i + 1) * width,
                hrow.getLong(hidx(s"${n}__h$i")))
            }.toSeq
          }.toMap
        }
      }

    val colProfiles = schema.fields.map { f =>
      val n = f.name
      val nulls = optL(s"${n}__nulls").getOrElse(0L)
      val nonNull = rowCount - nulls
      val distinct = optL(s"${n}__distinct")
      ColumnProfile(
        name = n,
        dataType = f.dataType.simpleString,
        typeBucket = typeBucket(f.dataType),
        nullCount = nulls,
        nullPercentage = if (rowCount == 0) 0.0 else nulls.toDouble / rowCount * 100.0,
        distinctCount = distinct,
        distinctPercentage = distinct.map(d =>
          if (nonNull == 0) 0.0 else d.toDouble / nonNull * 100.0),
        isUnique = distinct.map(_ == nonNull),
        min = optD(s"${n}__min"),
        max = optD(s"${n}__max"),
        mean = optD(s"${n}__mean"),
        sum = optD(s"${n}__sum"),
        stddev = optD(s"${n}__stddev"),
        median = optD(s"${n}__median"),
        zeroCount = optL(s"${n}__zero"),
        negativeCount = optL(s"${n}__neg"),
        positiveCount = optL(s"${n}__pos"),
        minLength = optL(s"${n}__minlen"),
        maxLength = optL(s"${n}__maxlen"),
        avgLength = optD(s"${n}__avglen"),
        emptyCount = optL(s"${n}__empty"),
        minDate = optS(s"${n}__mindate"),
        maxDate = optS(s"${n}__maxdate"),
        futureCount = optL(s"${n}__future"),
        pastCount = optL(s"${n}__past"),
        freshnessHours = optL(s"${n}__freshness_hours"),
        topValues = topByCol.getOrElse(n, Nil),
        distribution = histByCol.getOrElse(n, Nil))
    }.toSeq

    // include_samples (routes/profiles.py:30-31,76): OFF by default — the
    // reference pins it false in cloud mode; when on, carry ≤sampleRows
    // preview rows (stringified, NULL → null) alongside the stats.
    val samples: Seq[Map[String, String]] =
      if (!includeSamples) Nil
      else df.select(schema.fieldNames.map(col).toSeq: _*)
        .limit(sampleRows).collect().toSeq.map { r =>
        schema.fieldNames.zipWithIndex.map { case (n, i) =>
          n -> (if (r.isNullAt(i)) null else r.get(i).toString)
        }.toMap
      }

    val dupes = if (includeDuplicates) duplicateRowCount(df) else 0L
    val nullableFrac =
      if (fullSchema.fields.isEmpty) 0.0
      else fullSchema.fields.count(_.nullable).toDouble / fullSchema.fields.length

    TableProfile(
      table = table,
      timestamp = now.toString,
      rowCount = rowCount,
      columnCount = fullSchema.fields.length,
      duplicateCount = dupes,
      columns = colProfiles,
      typeDistribution = typeDistribution(fullSchema),
      healthScore = healthScore(
        meta.exists(_.primaryKeys.nonEmpty), rowCount, nullableFrac,
        fullSchema.fields.length),
      samples = samples)
  }
}
