package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: attach to each left row the most recent right row with
 * `right.ts <= left.ts` (optionally within a tolerance), per key — the
 * time-series join the reference's metric/event alignment needs and
 * Spark lacks as a built-in.
 *
 * Composed from built-ins per the custom-operator preference order
 * (SURVEY.md §7.3 (a)): union both sides tagged, then ONE window pass
 * per key carrying the last-seen right values forward. Cost is a single
 * shuffle keyed by the join key + a sort — O(n log n) per key and never
 * the naive range-join's O(n·m); at 100 TB the plan is
 * sort-merge-shaped and AQE-splittable.
 */
object AsOfJoin {

  /** @param left        probe side (keeps every row)
    * @param right       build side; its `valueCols` are attached
    * @param keyCols     equality keys present on both sides
    * @param leftTs      left timestamp column
    * @param rightTs     right timestamp column
    * @param valueCols   right columns to carry (become nullable)
    * @param toleranceSeconds max allowed left.ts − right.ts (None = ∞)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows sort BEFORE left rows at equal timestamps (side 0 < 1)
    // so right.ts == left.ts is visible, matching ASOF >= semantics
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

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(
      unioned.withColumn("__last_rts",
        last(col("__rts"), ignoreNulls = true).over(w)))(
      (df, c) => df.withColumn(s"__c_$c",
        last(col(s"__v_$c"), ignoreNulls = true).over(w)))

    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        col("__last_rts").isNotNull &&
          (unix_timestamp(col("__ts")) - unix_timestamp(col("__last_rts"))) <= tol
      case None => col("__last_rts").isNotNull
    }
    val out = valueCols.foldLeft(carried.filter(col("__side") === 1))(
      (df, c) => df.withColumn(c, when(withinTol, col(s"__c_$c"))))
      .withColumn("__matched_ts", when(withinTol, col("__last_rts")))
    out.select((leftCols.map(col) :+ col("__matched_ts").as("asof_ts"))
      ++ valueCols.map(col): _*)
  }
}
