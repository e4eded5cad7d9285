package graft.anomalies

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Changepoint localization (binary segmentation, one level): find the
 * split of each series that maximizes the drop in summed squared error
 * when the series is modeled as two constant segments instead of one —
 * the classic CUSUM companion ([[Anomalies.cusum]] says "something
 * drifted"; this says WHERE the level broke).
 *
 * Everything reduces to ordered prefix sums: SSE(a..b) =
 * Σy² − (Σy)²/len, so cost(split) needs only the running Σy and Σy²
 * per series — two stacked window passes, no UDF, no driver math, and
 * the whole derivation replays as SQL window functions. Thousands of
 * series parallelize across the cluster; each window is
 * series-bounded, the same O(points-per-series) state as the rest of
 * the detection battery.
 */
object Changepoint {

  /** Best single split per series: (keyCols..., n_points, change_at =
   *  orderCol value where the new regime starts, mean_before,
   *  mean_after, sse_reduction). Series shorter than 2 points drop;
   *  cost ties break to the earliest split. */
  def binarySegmentation(
      series: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val all = Window.partitionBy(keys: _*)
    val y = col(valueCol).cast("double")
    val base = series
      .withColumn("__r", row_number().over(w))
      .withColumn("__s1", sum(y).over(w))
      .withColumn("__s2", sum(y * y).over(w))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__t1", sum(y).over(all))
      .withColumn("__t2", sum(y * y).over(all))
      .filter(col("__n") >= 2 && col("__r") >= 2)
    // split at row r: left = 1..r-1 (strip the current row from the
    // inclusive running sums), right = r..n
    val scored = base
      .withColumn("__ls1", col("__s1") - y)
      .withColumn("__ls2", col("__s2") - y * y)
      .withColumn("__rs1", col("__t1") - col("__ls1"))
      .withColumn("__rs2", col("__t2") - col("__ls2"))
      .withColumn("__ln", (col("__r") - 1).cast("double"))
      .withColumn("__rn", (col("__n") - col("__r") + 1).cast("double"))
      .withColumn("__cost",
        (col("__ls2") - col("__ls1") * col("__ls1") / col("__ln")) +
          (col("__rs2") - col("__rs1") * col("__rs1") / col("__rn")))
    val pick = Window.partitionBy(keys: _*)
      .orderBy(col("__cost").asc, col(orderCol).asc)
    scored
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select((keys :+
        col("__n").as("n_points") :+
        col(orderCol).as("change_at") :+
        (col("__ls1") / col("__ln")).as("mean_before") :+
        (col("__rs1") / col("__rn")).as("mean_after") :+
        ((col("__t2") - col("__t1") * col("__t1") / col("__n")) -
          col("__cost")).as("sse_reduction")): _*)
  }
}
