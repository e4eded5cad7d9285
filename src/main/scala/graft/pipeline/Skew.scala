package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for the 100 TB path.
 *
 * First line of defense is AQE (enabled by default on Spark 4: runtime
 * skew-join splitting + coalescing). These helpers cover the cases AQE
 * can't fix: a single hot key inside an aggregation's shuffle, and a
 * broadcast-too-big / sort-merge-skewed equi-join where the build side
 * still fits replicated.
 */
object Skew {

  /** Two-phase (salted) aggregation: count per key without any single
   *  reducer receiving a hot key's entire partition. Phase 1 groups by
   *  (key, salt) — map-side partial aggregation bounds each reducer at
   *  1/saltFactor of the hot key; phase 2 sums the partials. */
  def saltedCount(
      df: DataFrame,
      keyCol: String,
      saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("count"))

  /** Salted equi-join: replicate the small side `saltFactor` times with
   *  an explicit salt column, salt the big side randomly-but-
   *  deterministically, and join on (key, salt). A hot key's rows are
   *  spread over `saltFactor` reducers instead of one. Use when the
   *  small side is too big to broadcast but cheap to replicate. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // replication breaks outer semantics: an unmatched small-side row
    // would be emitted once per salt replica
    require(Set("inner", "left", "leftouter")(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), spark_partition_id(),
        monotonically_increasing_id()), lit(saltFactor.toLong)))
    val saltedSmall = small
      .withColumn("__salt", explode(
        sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(saltedSmall,
      saltedBig(key) === saltedSmall(key) &&
        saltedBig("__salt") === saltedSmall("__salt"),
      joinType)
      .drop(saltedSmall(key))
      .drop("__salt")
  }

  /** Keys whose row count reaches `minCount` — the planning input for
   *  differential salting. One partial-aggregated count; the result is
   *  hot-key-sized (small by definition: a key is only hot when few
   *  keys hold a large share of the rows). */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("key_count"))
      .filter(col("key_count") >= minCount)

  /** Bloom-reduced join — the row-level runtime-filter pattern made
   *  explicit: build a Bloom filter over the SMALL side's join keys
   *  (driver-side, `expectedItems`/`fpp` sized) and pre-filter the BIG
   *  side BEFORE its shuffle. False positives only admit extra
   *  candidate rows into the (exact) hash join, so the result is
   *  IDENTICAL to the plain join while the shuffled volume drops
   *  toward the semi-join size — the win at 100 TB when the small
   *  side is selective (a date-filtered dimension, a sampled key
   *  set). Long keys only, stated loudly (the filter's insert and
   *  probe types must agree). */
  def bloomReducedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(big.schema(key).dataType ==
        org.apache.spark.sql.types.LongType &&
      small.schema(key).dataType ==
        org.apache.spark.sql.types.LongType,
      s"bloomReducedJoin requires LongType join keys; '$key' is " +
        s"${big.schema(key).dataType.simpleString} / " +
        small.schema(key).dataType.simpleString)
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k.longValue()))
    big.filter(mightContain(col(key))).join(small, Seq(key), joinType)
  }

  /** Pre-join cardinality estimate — the audit run BEFORE a 100 TB
   *  join commits to a plan: per-key row counts on both sides, the
   *  EXACT output size a key contributes (n_left·n_right), the top
   *  blowup keys, and the total. This is the number that decides
   *  broadcast vs shuffle vs salt ([[adaptiveSaltedJoin]]) — and it
   *  costs two partial-aggregated key counts + one key-frame join,
   *  never the join itself. Top-k by contribution is TakeOrdered;
   *  the one-row totals broadcast onto every emitted row. */
  def joinCardinality(
      left: DataFrame,
      right: DataFrame,
      key: String,
      topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    val ca = left.groupBy(col(key))
      .agg(count(lit(1)).as("n_left"))
    val cb = right.groupBy(col(key))
      .agg(count(lit(1)).as("n_right"))
    val per = ca.join(cb, Seq(key))
      .withColumn("est_rows", col("n_left") * col("n_right"))
    val totals = broadcast(per.agg(
      sum("est_rows").as("total_est_rows"),
      count(lit(1)).as("n_join_keys")))
    per.orderBy(col("est_rows").desc, col(key).asc)
      .limit(topK)
      .crossJoin(totals)
      .withColumn("share_ppm",
        round(lit(1e6) * col("est_rows") / col("total_est_rows"), 0)
          .cast("long"))
  }

  /** Differential salted join: salt ONLY the hot keys. [[saltedJoin]]
   *  replicates the whole small side `saltFactor` times — fine when it
   *  is tiny, a `saltFactor`× shuffle tax when it isn't. Here the
   *  hot-key frame (broadcast, hot-key-sized) marks each side: hot big
   *  rows salt over `saltFactor` reducers, cold rows keep salt 0; hot
   *  small rows replicate `saltFactor` ways, cold rows once. The join
   *  stays a plain equi-join on (key, salt) and the replication tax is
   *  paid only where the skew is. */
  def adaptiveSaltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      hot: DataFrame,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter")(
      joinType.toLowerCase.replace("_", "")),
      s"adaptiveSaltedJoin supports inner/left joins only, got '$joinType'")
    val hotSet = broadcast(hot.select(col(key)).distinct()
      .withColumn("__hot", lit(true)))
    val saltedBig = big
      .join(hotSet, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull,
          pmod(xxhash64(col(key), spark_partition_id(),
            monotonically_increasing_id()), lit(saltFactor.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val saltedSmall = small
      .join(hotSet, Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot").isNotNull,
          sequence(lit(0L), lit(saltFactor.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .drop("__hot")
    saltedBig.join(saltedSmall,
      saltedBig(key) === saltedSmall(key) &&
        saltedBig("__salt") === saltedSmall("__salt"),
      joinType)
      .drop(saltedSmall(key))
      .drop("__salt")
  }
}
