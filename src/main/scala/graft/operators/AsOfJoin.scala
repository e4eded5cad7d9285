package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: attach to each left row the most recent right row with
 * `right.ts <= left.ts` (optionally within a tolerance), per key — the
 * time-series join the reference's metric/event alignment needs and
 * Spark lacks as a built-in. `direction = "forward"` mirrors it to the
 * earliest right row with `right.ts >= left.ts`.
 *
 * Composed from built-ins per the custom-operator preference order
 * (SURVEY.md §7.3 (a)): union both sides tagged, then ONE window pass
 * per key carrying the last-seen right ROW forward. Cost is a single
 * shuffle keyed by the join key + a sort — O(n log n) per key and never
 * the naive range-join's O(n·m).
 *
 * Matched-row semantics: the carry is a single struct per right row
 * (`last(struct(ts, values...), ignoreNulls)`), so every attached value
 * AND `asof_ts` come from the one matched right row — including that
 * row's genuine NULL values. (A per-column `last(v, ignoreNulls)` would
 * silently substitute an older row's value when the matched row holds
 * NULL, diverging from DuckDB ASOF JOIN semantics.)
 *
 * Scale: with low-cardinality keys a single per-key window sorts on
 * ≤|keys| tasks regardless of cluster size. Pass `bucketSeconds` to
 * sub-partition each key by time range: within-bucket carry runs on
 * (key × bucket) tasks, and a second, tiny window over per-bucket
 * summaries carries the last right row across bucket boundaries.
 */
object AsOfJoin {

  /** @param left        probe side (keeps every row)
    * @param right       build side; its `valueCols` are attached
    * @param keyCols     equality keys present on both sides
    * @param leftTs      left timestamp column
    * @param rightTs     right timestamp column
    * @param valueCols   right columns to carry (become nullable)
    * @param toleranceSeconds max allowed |left.ts − right.ts| (None = ∞)
    * @param bucketSeconds time-bucket width for intra-key parallelism
    *                    (None = one partition per key; set for
    *                    low-cardinality keys at scale)
    * @param direction   "backward" (default): latest right with
    *                    right.ts <= left.ts — DuckDB `ASOF … ON l >= r`.
    *                    "forward": EARLIEST right with right.ts >=
    *                    left.ts — DuckDB `ASOF … ON l <= r`; the shape
    *                    for next-scheduled-run / next-price-tick
    *                    alignment. Same single shuffle + window pass,
    *                    mirrored orderings.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceSeconds: Option[Long] = None,
      bucketSeconds: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    // the time axis the carry walks: ascending for backward (last seen
    // right ≤ ts), DESCENDING for forward (so "last seen" = earliest
    // right ≥ ts) — one flipped sort, not a second algorithm
    def tsOrder: Seq[Column] =
      if (fwd) Seq(col("__ts").desc, col("__side"))
      else Seq(col("__ts"), col("__side"))
    val leftCols = left.columns.toSeq
    // right rows sort BEFORE left rows at equal timestamps (side 0 < 1)
    // so right.ts == left.ts is visible, matching ASOF >=/<= semantics
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val lAligned = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__v_$c", lit(null).cast(
        right.schema(c).dataType)))
    val r0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(rightTs))
    val rAligned0 = valueCols.foldLeft(r0)((df, c) =>
      df.withColumn(s"__v_$c", col(c)))
    // align schemas for the union: key cols + carry cols + nulls for
    // the left-only payload
    val carry = Seq("__ts", "__side", "__rts") ++ valueCols.map(c => s"__v_$c")
    val rAligned = leftCols.filterNot(keyCols.contains)
      .foldLeft(rAligned0.select((keyCols ++ carry).map(col): _*))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select((leftCols ++ carry).map(col): _*)
      .unionByName(rAligned.select((leftCols ++ carry).map(col): _*))

    // one struct per RIGHT row (null for left rows): ts + all values
    // travel together, so the match is a whole row, never a column mix
    val rowStruct = when(col("__side") === 0,
      struct(col("__rts").as("__mts") +:
        valueCols.map(c => col(s"__v_$c").as(c)): _*))

    val matched = bucketSeconds match {
      case None =>
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(tsOrder: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        unioned.withColumn("__m", last(rowStruct, ignoreNulls = true).over(w))

      case Some(width) =>
        // intra-key parallelism: (key, time-bucket) partitions, plus a
        // boundary carry computed over the per-bucket summaries (tiny:
        // one row per key × bucket) and joined back
        val bucketed = unioned.withColumn("__bkt",
          floor(unix_timestamp(col("__ts")) / width))
        val wIn = Window.partitionBy((keyCols :+ "__bkt").map(col): _*)
          .orderBy(tsOrder: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        val inBucket = bucketed
          .withColumn("__row", rowStruct)
          .withColumn("__m_in", last(col("__row"), ignoreNulls = true).over(wIn))
        // boundary right row per bucket (latest for backward, EARLIEST
        // for forward — right rows only)
        val bucketLast = inBucket
          .filter(col("__row").isNotNull)
          .groupBy((keyCols :+ "__bkt").map(col): _*)
          .agg((if (fwd) min_by(col("__row"), col("__row.__mts"))
                else max_by(col("__row"), col("__row.__mts"))).as("__bl"))
        // carry across EVERY bucket present for the key (a bucket holding
        // only left rows still inherits the boundary right row from its
        // preceding — for forward: FOLLOWING — buckets)
        val allBuckets = bucketed
          .select((keyCols :+ "__bkt").map(col): _*).distinct()
        val wPrev = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(if (fwd) col("__bkt").desc else col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val prevCarry = allBuckets
          .join(bucketLast, keyCols :+ "__bkt", "left")
          .withColumn("__m_prev", last(col("__bl"), ignoreNulls = true).over(wPrev))
          .select((keyCols.map(col) :+ col("__bkt") :+ col("__m_prev")): _*)
        inBucket
          .join(prevCarry, keyCols :+ "__bkt", "left")
          .withColumn("__m", coalesce(col("__m_in"), col("__m_prev")))
    }

    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        val gap =
          if (fwd) unix_timestamp(col("__m.__mts")) -
            unix_timestamp(col("__ts"))
          else unix_timestamp(col("__ts")) -
            unix_timestamp(col("__m.__mts"))
        col("__m").isNotNull && gap <= tol
      case None => col("__m").isNotNull
    }
    val out = valueCols.foldLeft(matched.filter(col("__side") === 1))(
      (df, c) => df.withColumn(c, when(withinTol, col("__m").getField(c))))
      .withColumn("__matched_ts", when(withinTol, col("__m.__mts")))
    out.select((leftCols.map(col) :+ col("__matched_ts").as("asof_ts"))
      ++ valueCols.map(col): _*)
  }
}
