package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftEngine

/** Full-lifecycle test of the facade: profile → validations → schema
 *  detection → metric history → anomaly scan → trends, end to end on
 *  the sf0.001 fixtures. */
class EngineSpec extends AnyFunSuite {
  import SharedSpark._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("incremental profiling: record slices once, answer ranges from states") {
    val state = Files.createTempDirectory("graft_engine_slices").toString
    val engine = new GraftEngine(spark, sfDir, state)
    // "daily" slices of lineitem by orderkey parity classes
    (0 until 3).foreach(i => engine.recordProfileSlice(
      "lineitem", s"d$i", col("l_orderkey") % 3 === i,
      quantileCols = Seq("l_extendedprice"),
      topKCol = Some("l_linenumber"), k = 8))
    // range read over slices 0+2 ≡ direct aggregation over those rows
    val got = engine.profileRange("lineitem", Seq("d0", "d2"))
      .filter(col("column") === "l_quantity").head()
    val want = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 3 =!= 1)
      .agg(org.apache.spark.sql.functions.count(col("l_quantity")),
        org.apache.spark.sql.functions.sum(col("l_quantity")).cast("double"))
      .head()
    assert(got.getAs[Long]("cnt") == want.getLong(0))
    assert(math.abs(got.getAs[Double]("sm") - want.getDouble(1)) < 1e-6)
    // quantile + top-K lanes answer from the same store
    val q = engine.sliceStates("lineitem")
      .quantiles("l_extendedprice", Seq(0.5), slices = Seq("d0", "d2"))
      .head()
    assert(q.getAs[Double]("estimate") > 0)
    val hh = engine.sliceStates("lineitem").topK(k = 8).collect()
    assert(hh.nonEmpty && hh.forall(r =>
      r.getAs[Long]("lower") <= r.getAs[Long]("upper")))
  }

  test("engine lifecycle: profile, validate, detect, trend, scan") {
    val state = Files.createTempDirectory("graft_engine").toString
    val engine = new GraftEngine(spark, sfDir, state)

    // day 1: profile + validations + schema baseline
    val p1 = engine.profileTable("region", ts("2026-01-01 00:00:00"))
    assert(p1.rowCount == 5)
    val results = engine.runValidations("region", ts("2026-01-01 00:00:00"))
    assert(results.nonEmpty && results.forall(_.error.isEmpty))
    assert(engine.detectSchemaChanges(ts("2026-01-01 00:00:00")).isEmpty) // bootstrap

    // days 2..8: more profile runs → a metric series builds up
    (2 to 8).foreach(d =>
      engine.profileTable("region", ts(f"2026-01-0$d%d 00:00:00")))
    assert(engine.profiles.history("region").count() == 8)

    // trends over the stored series
    val trends = engine.metricTrends("region").collect()
    val rowCountTrend = trends.find(_.getAs[String]("metric") == "row_count").get
    assert(rowCountTrend.getAs[Double]("current_value") == 5.0)
    assert(rowCountTrend.getAs[Double]("absolute_change") == 0.0)

    // anomaly scan over the (flat) row_count series → no anomalies
    val anomalies = engine.runAnomalyScan("row_count",
      now = Some(ts("2026-01-09 00:00:00")))
    assert(anomalies.count() == 0)

    // second schema detection with an unchanged catalog → no changes
    assert(engine.detectSchemaChanges(ts("2026-01-02 00:00:00")).isEmpty)

    // validation daily trend densifies the calendar
    val vt = engine.validationTrends("region", totalRules = results.size,
      "2026-01-01", "2026-01-03").collect()
    assert(vt.length == 3)
    assert(vt.head.getAs[Long]("total_validations") == results.size.toLong)
    assert(vt(1).getAs[Long]("total_validations") == 0)
  }

  test("pipeline facade: split, vocabulary, query-log usage patterns") {
    val state = Files.createTempDirectory("graft_pipe").toString
    val engine = new GraftEngine(spark, sfDir, state)
    val split = engine.splitTable("documents").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.values.sum > 0 && split.contains("train"))
    val vocab = engine.vocabulary("documents", top = 10).collect()
    assert(vocab.length == 10)
    assert(vocab.head.getAs[Long]("total_count") >=
      vocab.last.getAs[Long]("total_count"))
    engine.queryLog.append("SELECT * FROM documents", "SELECT",
      ts("2026-01-05 10:00:00"))
    val usage = engine.usagePatterns(Seq("documents", "region")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(usage == Map("documents" -> 1L, "region" -> 0L))
    // per-segment battery and FD probe ride the same catalog
    val groups = engine.profileByGroup("documents", "source",
      ts("2026-01-01 00:00:00"))
    assert(groups.count() > 1)
    assert(groups.columns.contains("text__nulls"))
    val fd = engine.checkFunctionalDependency("documents",
      Seq("doc_id"), "source")
    assert(fd.filter(org.apache.spark.sql.functions.col("violates")).count() == 0)
  }

  test("automation: due jobs flow through queue + pool into the engine") {
    import java.time.Instant
    val state = Files.createTempDirectory("graft_auto").toString
    val engine = new GraftEngine(spark, sfDir, state)
    val auto = new graft.scheduler.Automation(engine, Seq("region", "nation"))
    try {
      // never-run defaults: all three job families fire on the first tick
      val fired = auto.tick(Instant.parse("2026-01-05T04:00:00Z"))
      assert(fired.toSet == Set("metadata_refresh",
        "schema_change_detection", "validation_automation"))
      auto.drain()
      assert(auto.stats.processed == 3 && auto.stats.failed == 0)
      // the executed jobs hit real engine surfaces:
      assert(engine.profiles.history("region").count() >= 1) // profiled
      assert(engine.validations.results("region").count() > 0) // validated
      // a second tick the same day enqueues nothing (daily/weekly dedup)
      assert(auto.tick(Instant.parse("2026-01-05T05:00:00Z")).isEmpty)
    } finally auto.shutdown()
  }

  test("anomaly scan persists detected anomalies through the store") {
    import spark.implicits._
    val state = Files.createTempDirectory("graft_anom").toString
    val engine = new GraftEngine(spark, sfDir, state)
    // 20 stable points + one spike (max attainable z is (n−1)/√n, so a
    // spike needs >9 stable neighbors to clear threshold 3)
    val pts = ((1 to 20).map(d =>
      ("default", "region", null: String, "custom_metric", 10.0,
        ts(f"2026-01-$d%02d 00:00:00"))) :+
      ("default", "region", null: String, "custom_metric", 100.0,
        ts("2026-01-21 00:00:00")))
      .toDF("connection_id", "table_name", "column_name", "metric_name",
        "metric_value", "ts")
    engine.metrics.append(pts)
    val detected = engine.runAnomalyScan("custom_metric",
      now = Some(ts("2026-01-22 00:00:00")), persist = true)
    assert(detected.filter(col("is_anomaly")).count() == 1)
    // round-trip: the store serves the same anomaly back
    val stored = engine.anomalies.list(tableName = Some("region"),
      metricName = Some("custom_metric")).collect()
    assert(stored.length == 1)
    assert(stored(0).getAs[Double]("metric_value") == 100.0)
    assert(stored(0).getAs[String]("severity") != null)
  }
}
