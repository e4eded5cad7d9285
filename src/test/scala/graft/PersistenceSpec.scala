package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Duration, Instant, LocalTime}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftEngine
import graft.anomalies.AnomalyConfigStore
import graft.notifications.{EventStore, Notifications}
import graft.notifications.Notifications._
import graft.scheduler.{Automation, JobStore, Scheduler}
import graft.types.{AnomalyConfig, ValidationRule}
import graft.validations.{RuleStore, Runner}

/** Round-4 persistence layer: rule store CRUD, anomaly config store +
 *  batch scan, notification publisher routing, scheduler job
 *  persistence across a restart, trends-attached profile response. */
class PersistenceSpec extends AnyFunSuite {
  import SharedSpark._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  // ---- validation rule store ------------------------------------------

  test("rule store: add/update/deactivate/delete with latest-version-wins") {
    val store = new RuleStore(spark, tmp("graft_rules") + "/rules")
    val r1 = ValidationRule("r1", "d1", "SELECT 1", "equals", 1L)
    val r2 = ValidationRule("r2", "d2", "SELECT 2", "less_than", 10L)
    val r3 = ValidationRule("r3", "d3", "SELECT 3", "greater_than", 0L)
    store.addRule("t", r1, ts("2026-01-01 00:00:00"))
    store.addRule("t", r2, ts("2026-01-01 00:00:01"))
    store.addRule("t", r3, ts("2026-01-01 00:00:02"))
    assert(store.ruleNames("t") == Set("r1", "r2", "r3"))

    // update shadows the original definition
    store.updateRule("t", r2.copy(expectedValue = 99L), ts("2026-01-02 00:00:00"))
    val r2loaded = store.activeRules("t").find(_.name == "r2").get
    assert(r2loaded.expectedValue == 99L)

    // deactivate keeps the rule listed but out of the active suite
    store.deactivateRule("t", "r3", ts("2026-01-03 00:00:00"))
    assert(store.ruleNames("t") == Set("r1", "r2", "r3"))
    assert(store.activeRules("t").map(_.name) == Seq("r1", "r2"))

    // re-activate brings it back
    store.activateRule("t", "r3", ts("2026-01-04 00:00:00"))
    assert(store.activeRules("t").map(_.name) == Seq("r1", "r2", "r3"))

    // delete tombstones it everywhere
    store.deleteRule("t", "r1", ts("2026-01-05 00:00:00"))
    assert(store.ruleNames("t") == Set("r2", "r3"))
    assert(!store.ruleExists("t", "r1") && store.ruleExists("t", "r2"))
  }

  test("rule store: expectedValue round-trips typed (long/double/list)") {
    val store = new RuleStore(spark, tmp("graft_rules") + "/rules")
    store.addRule("t", ValidationRule("a", "", "SELECT 1", "equals", 5L),
      ts("2026-01-01 00:00:00"))
    store.addRule("t", ValidationRule("b", "", "SELECT 1", "less_than", 2.5),
      ts("2026-01-01 00:00:01"))
    store.addRule("t", ValidationRule("c", "", "SELECT 1", "between",
      Seq(1.0, 9.0)), ts("2026-01-01 00:00:02"))
    // string elements that LOOK numeric must survive as strings (zero-
    // padded codes), and long elements must stay longs — element tags
    store.addRule("t", ValidationRule("d", "", "SELECT 1", "in",
      Seq("01", "007", "xy")), ts("2026-01-01 00:00:03"))
    store.addRule("t", ValidationRule("e", "", "SELECT 1", "in",
      Seq(1L, 2L)), ts("2026-01-01 00:00:04"))
    val loaded = store.activeRules("t").map(r => r.name -> r.expectedValue).toMap
    assert(loaded("a") == 5L)
    assert(loaded("b") == 2.5)
    assert(loaded("c") == Seq(1.0, 9.0))
    assert(loaded("d") == Seq("01", "007", "xy"))
    assert(loaded("e") == Seq(1L, 2L))
  }

  test("engine: seed defaults once, stored suite runs and records") {
    val state = tmp("graft_engine_rs")
    val engine = new GraftEngine(spark, sfDir, state)
    val seeded = engine.seedDefaultRules("region", ts("2026-01-01 00:00:00"))
    assert(seeded.nonEmpty)
    // seeding again adds nothing (dedup against the store)
    assert(engine.seedDefaultRules("region", ts("2026-01-01 00:00:01")).isEmpty)
    val results = engine.runStoredValidations("region", ts("2026-01-02 00:00:00"))
    assert(results.size == seeded.size)
    assert(results.forall(_.error.isEmpty))
    assert(engine.validations.results("region").count() == seeded.size)
  }

  // ---- anomaly config store + batch scan ------------------------------

  test("anomaly config store: CRUD with latest-version-wins") {
    val store = new AnomalyConfigStore(spark, tmp("graft_cfg") + "/cfg")
    val c1 = AnomalyConfig("row_count", "orders", detectionMethod = "zscore")
    val c2 = AnomalyConfig("null_percentage", "orders", Some("o_comment"),
      detectionMethod = "iqr")
    store.createConfig(c1, ts("2026-01-01 00:00:00"))
    store.createConfig(c2, ts("2026-01-01 00:00:01"))
    assert(store.activeConfigs().size == 2)
    store.updateConfig(c1.copy(sensitivity = 2.0), ts("2026-01-02 00:00:00"))
    val updated = store.activeConfigs().find(_.metricName == "row_count").get
    assert(updated.sensitivity == 2.0)
    store.deactivateConfig(c2, ts("2026-01-03 00:00:00"))
    assert(store.activeConfigs().map(_.metricName) == Seq("row_count"))
    store.deleteConfig(c1, ts("2026-01-04 00:00:00"))
    assert(store.activeConfigs().isEmpty)
  }

  test("engine: batch scan runs every stored config with its own method") {
    val state = tmp("graft_engine_scan")
    val engine = new GraftEngine(spark, sfDir, state,
      extraSinks = Seq(new WebhookSink()))
    import spark.implicits._
    // two series: tableA spikes (15 flat points + one 10x), tableB flat
    val mk = (table: String, vals: Seq[Double]) =>
      vals.zipWithIndex.map { case (v, i) =>
        ("default", table, null: String, "m", v,
          ts(f"2026-01-${i + 1}%02d 00:00:00"))
      }
    engine.metrics.append(
      (mk("tableA", Seq.fill(15)(10.0) :+ 100.0) ++
        mk("tableB", Seq.fill(16)(5.0)) ++
        mk("tableC", Seq.fill(15)(20.0) :+ 200.0))
        .toDF("connection_id", "table_name", "column_name", "metric_name",
          "metric_value", "ts"))
    engine.anomalyConfigs.createConfig(
      AnomalyConfig("m", "tableA", detectionMethod = "zscore"),
      ts("2026-01-20 00:00:00"))
    engine.anomalyConfigs.createConfig(
      AnomalyConfig("m", "tableB", detectionMethod = "iqr"),
      ts("2026-01-20 00:00:00"))
    engine.anomalyConfigs.createConfig(
      AnomalyConfig("m", "tableC", detectionMethod = "ewma"),
      ts("2026-01-20 00:00:00"))
    val out = engine.runAnomalyScanAll(ts("2026-01-20 00:00:00"),
      historyDays = 30, persist = true).collect()
    // the zscore and ewma spikes fire; the flat iqr series stays quiet
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("is_anomaly")))
    val byTable = out.groupBy(_.getAs[String]("table_name"))
    assert(byTable.contains("tableA") && !byTable.contains("tableB"))
    assert(byTable.contains("tableC"))
    assert(byTable("tableA").forall(_.getAs[String]("method") == "zscore"))
    assert(byTable("tableC").forall(_.getAs[String]("method") == "ewma"))
    // persisted + one anomaly_detected event published through the gate
    assert(engine.anomalies.list().count() == out.length)
    val feed = engine.events.feed(eventType = Some("anomaly")).collect()
    assert(feed.length == 1)
    assert(feed.head.getAs[String]("subtype") == "anomaly_detected")
  }

  // ---- anomaly status lifecycle (api.py:275-332) ----------------------

  private def detectedFrame(rows: Seq[(String, String, Double, String)]) = {
    import spark.implicits._
    rows.map { case (table, day, v, sev) =>
      (table, "", "m", ts(s"$day 00:00:00"), v, 4.0, true, 3.0, sev, "zscore")
    }.toDF("table_name", "column_name", "metric_name", "ts", "metric_value",
      "score", "is_anomaly", "threshold", "severity", "method")
  }

  test("anomalies store: status lifecycle round-trip") {
    val store = new graft.history.AnomaliesStore(spark,
      tmp("graft_anom_status") + "/anomalies")
    store.append(detectedFrame(Seq(
      ("tableA", "2026-01-01", 100.0, "high"),
      ("tableA", "2026-01-02", 90.0, "medium"),
      ("tableB", "2026-01-02", 50.0, "low"))), ts("2026-01-03 00:00:00"))

    // every row lands open with a deterministic id
    val opened = store.list(now = Some(ts("2026-01-03 00:00:00"))).collect()
    assert(opened.length == 3)
    assert(opened.forall(_.getAs[String]("status") == "open"))
    val id = opened.find(_.getAs[String]("severity") == "high").get
      .getAs[String]("anomaly_id")

    // resolve one by id: status + note + resolved stamps
    store.updateStatus(id, "resolved", ts("2026-01-04 00:00:00"),
      Some("bad load"), Some("oncall"))
    val resolved = store.list(status = Some("resolved")).collect()
    assert(resolved.length == 1)
    assert(resolved.head.getAs[String]("anomaly_id") == id)
    assert(resolved.head.getAs[String]("resolution_note") == "bad load")
    assert(resolved.head.getAs[java.sql.Timestamp]("resolved_at") ==
      ts("2026-01-04 00:00:00"))
    assert(resolved.head.getAs[String]("resolved_by") == "oncall")

    // acknowledge does NOT stamp resolved_at (api.py:304-307)
    store.updateStatusWhere(col("table_name") === "tableB", "acknowledged",
      ts("2026-01-05 00:00:00"))
    val acked = store.list(status = Some("acknowledged")).collect()
    assert(acked.length == 1)
    assert(acked.head.getAs[java.sql.Timestamp]("resolved_at") == null)

    // invalid status rejected before any rewrite
    intercept[IllegalArgumentException] {
      store.updateStatus(id, "closed", ts("2026-01-06 00:00:00"))
    }

    // summary counts line up (1 open, 1 acknowledged, 1 resolved)
    val sum = store.summary(ts("2026-01-05 00:00:00"), days = 30).collect().head
    assert(sum.getAs[Long]("total_anomalies") == 3)
    assert(sum.getAs[Long]("open") == 1)
    assert(sum.getAs[Long]("acknowledged") == 1)
    assert(sum.getAs[Long]("resolved") == 1)
    assert(sum.getAs[Long]("expected") == 0)
    assert(sum.getAs[Long]("high_severity") == 1)
  }

  test("engine: expected-marked series do not re-notify on the next scan") {
    val state = tmp("graft_engine_expected")
    val engine = new GraftEngine(spark, sfDir, state)
    import spark.implicits._
    val pts = (Seq.fill(15)(10.0) :+ 100.0).zipWithIndex.map { case (v, i) =>
      ("default", "tableA", null: String, "m", v,
        ts(f"2026-01-${i + 1}%02d 00:00:00"))
    }
    engine.metrics.append(pts.toDF("connection_id", "table_name",
      "column_name", "metric_name", "metric_value", "ts"))
    engine.anomalyConfigs.createConfig(
      AnomalyConfig("m", "tableA", detectionMethod = "zscore"),
      ts("2026-01-20 00:00:00"))

    engine.runAnomalyScanAll(ts("2026-01-20 00:00:00"), historyDays = 30,
      persist = true)
    assert(engine.events.feed(eventType = Some("anomaly")).count() == 1)

    // triage: this series' spikes are expected — next scan re-detects,
    // persists (history stays complete), but publishes nothing new
    engine.anomalies.updateStatusWhere(col("table_name") === "tableA",
      "expected", ts("2026-01-21 00:00:00"))
    val stored = engine.anomalies.list(anomaliesOnly = true).count()
    engine.runAnomalyScanAll(ts("2026-01-22 00:00:00"), historyDays = 30,
      persist = true)
    assert(engine.events.feed(eventType = Some("anomaly")).count() == 1)
    assert(engine.anomalies.list(anomaliesOnly = true).count() == stored * 2)
    // the re-detected rows land open; only the triaged originals are expected
    assert(engine.anomalies.list(status = Some("expected")).count() == stored)
  }

  test("anomalies store: unknown-id update is a true no-op (0 matched, " +
      "no rewrite) and a fresh dashboard reads schema-correct empties") {
    val engine = new GraftEngine(spark, sfDir, tmp("graft_engine_dash"))
    // unknown id: no event published, caller told nothing matched
    assert(!engine.updateAnomalyStatus("no-such-id", "resolved",
      ts("2026-01-01 00:00:00")))
    assert(engine.events.feed(eventType = Some("anomaly")).count() == 0)
    // fresh install: same schemas as a populated store would serve
    val dash = engine.anomalyDashboard(ts("2026-01-01 00:00:00"))
    val sum = dash.summary.collect()
    assert(sum.length == 1 && sum.head.getAs[Long]("total_anomalies") == 0)
    assert(dash.summary.columns.toSet.contains("detected_today"))
    assert(dash.trends.columns.toSeq ==
      Seq("date", "total", "high", "medium", "low"))
    assert(dash.trends.count() == 31) // zero-filled 30-day spine
    assert(dash.recentAnomalies.columns.contains("resolution_note"))
    assert(dash.recentAnomalies.count() == 0)
  }

  test("engine batch: dashboard fan-out over read routes, per-request " +
      "isolation for unknown paths") {
    import graft.api.BatchRunner
    val engine = new GraftEngine(spark, sfDir, tmp("graft_engine_batch"))
    engine.profileTable("region", ts("2026-01-01 00:00:00"))
    val out = engine.batch(Seq(
      BatchRunner.BatchRequest("p", "profiles/region"),
      BatchRunner.BatchRequest("s", "anomalies/summary"),
      BatchRunner.BatchRequest("a", "anomalies/table/region"),
      BatchRunner.BatchRequest("bad", "nope/404")),
      ts("2026-01-02 00:00:00"))
    val byId = out.map(r => r.id -> r.result).toMap
    assert(byId("p").toOption.get.count() == 1) // the one profile run
    assert(byId("s").toOption.get.collect()
      .head.getAs[Long]("total_anomalies") == 0L)
    assert(byId("a").toOption.get.count() == 0) // listing, not summary
    assert(byId("bad") == Left("unknown op: nope/404"))
  }

  test("engine: batch scan on a fresh install returns an empty frame") {
    val engine = new GraftEngine(spark, sfDir, tmp("graft_engine_empty"))
    // no metrics, no configs — schema-correct empty result, no throw
    engine.profileTable("region", ts("2026-01-01 00:00:00")) // seed metrics
    assert(engine.runAnomalyScanAll(ts("2026-01-02 00:00:00")).count() == 0)
  }

  // ---- notification publisher -----------------------------------------

  test("publisher: severity gate and important-event filter") {
    val store = new EventStore(spark, tmp("graft_events") + "/ev")
    val hook = new WebhookSink()
    val pub = new NotificationPublisher(store,
      NotificationSettings(notifyLowSeverity = false), Seq(hook))

    // low-only anomaly: stored, not notified (default settings)
    pub.publish(GraftEvent("anomaly", "anomaly_detected", "c", Some("t"),
      Map("low_severity_count" -> "3"), ts("2026-01-01 00:00:00")))
    assert(hook.posted.isEmpty)

    // high-severity anomaly: notified
    pub.publish(GraftEvent("anomaly", "anomaly_detected", "c", Some("t"),
      Map("high_severity_count" -> "1"), ts("2026-01-01 00:00:01")))
    assert(hook.posted.size == 1)
    assert(hook.posted.head._1 == "Anomaly Alert: t")

    // unimportant automation event: stored, not notified
    pub.publish(GraftEvent("automation", "automation_job_completed", "c",
      None, Map.empty, ts("2026-01-01 00:00:02")))
    assert(hook.posted.size == 1)

    // important automation event: notified
    pub.publish(GraftEvent("automation", "validation_failures_detected", "c",
      Some("t"), Map("failed_count" -> "2"), ts("2026-01-01 00:00:03")))
    assert(hook.posted.size == 2)

    // every publish landed in the durable feed regardless of routing
    assert(store.feed().count() == 4)
    assert(store.feed(eventType = Some("automation")).count() == 2)
  }

  test("engine: one event per failed-validation run / important change") {
    val state = tmp("graft_engine_ev")
    val hook = new WebhookSink()
    val engine = new GraftEngine(spark, sfDir, state, extraSinks = Seq(hook))
    // a rule battery with one deliberate failure
    engine.catalog.registerAll()
    val failing = ValidationRule("always_fails", "", "SELECT COUNT(*) FROM region",
      "equals", 0L)
    engine.runValidations("region", ts("2026-01-01 00:00:00"), Seq(failing))
    val feed = engine.events.feed(eventType = Some("automation")).collect()
    assert(feed.length == 1)
    assert(feed.head.getAs[String]("subtype") == "validation_failures_detected")
    assert(feed.head.getAs[String]("data").contains("failed_count=1"))
    assert(hook.posted.map(_._2.subtype) == Seq("validation_failures_detected"))
  }

  // ---- scheduler job persistence --------------------------------------

  test("job store: schedules and lastRun round-trip") {
    val store = new JobStore(spark, tmp("graft_jobs") + "/jobs")
    val jobs = Scheduler.defaultJobs :+
      Scheduler.Job("hourly", "metadata_refresh",
        Scheduler.Every(Duration.ofHours(1)),
        lastRun = Some(Instant.parse("2026-01-01T02:00:00Z")))
    store.saveAll(jobs, Instant.parse("2026-01-01T03:00:00Z"))
    val loaded = store.load()
    assert(loaded.map(_.id).toSet == jobs.map(_.id).toSet)
    val hourly = loaded.find(_.id == "hourly").get
    assert(hourly.schedule == Scheduler.Every(Duration.ofHours(1)))
    assert(hourly.lastRun.contains(Instant.parse("2026-01-01T02:00:00Z")))
    assert(loaded.find(_.id == "metadata_refresh").get.schedule ==
      Scheduler.Daily(LocalTime.of(2, 0)))
  }

  test("stores: concurrent appends to one path are serialized and lossless") {
    // Hadoop's FileOutputCommitter stages every in-flight attempt under a
    // single <path>/_temporary and deletes it wholesale on commitJob, so
    // two UNserialized concurrent append jobs to the same path can lose
    // files or die with FileNotFoundException. StoreIO.appendLocked takes
    // a per-path monitor; this drives it from 8 threads (the Automation
    // worker-pool shape) and asserts every row landed.
    val store = new JobStore(spark, tmp("graft_jobs_conc") + "/jobs")
    val now = Instant.parse("2026-01-01T00:00:00Z")
    val threads = (1 to 8).map { i =>
      new Thread(() => store.save(
        Scheduler.Job(s"job$i", "metadata_refresh",
          Scheduler.Every(Duration.ofHours(i.toLong))), now))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val loaded = store.load()
    assert(loaded.map(_.id).toSet == (1 to 8).map(i => s"job$i").toSet)
  }

  test("automation: lastRun survives restart; a missed run fires once") {
    val state = tmp("graft_auto")
    val engine = new GraftEngine(spark, sfDir, state)
    val storePath = state + "/jobs"

    val a1 = new Automation(engine, Seq("region"),
      jobStore = Some(new JobStore(spark, storePath)))
    // first tick: every default job is due (never run) and fires
    val fired1 = a1.tick(Instant.parse("2026-01-05T04:00:00Z"))
    assert(fired1.toSet == Set("metadata_refresh", "schema_change_detection",
      "validation_automation"))
    a1.drain(); a1.shutdown()

    // RESTART: a new Automation over the same store must see lastRun —
    // ticking one minute later re-fires nothing
    val a2 = new Automation(engine, Seq("region"),
      jobStore = Some(new JobStore(spark, storePath)))
    assert(a2.tick(Instant.parse("2026-01-05T04:01:00Z")).isEmpty)
    // a tick days later (runs were missed while "down") fires each job
    // exactly once, not once per missed day — Jan 12 is past the next
    // daily (Jan 6) AND the next weekly Sunday (Jan 11) fire times
    val fired2 = a2.tick(Instant.parse("2026-01-12T05:00:00Z"))
    assert(fired2.toSet == Set("metadata_refresh", "schema_change_detection",
      "validation_automation"))
    a2.drain()
    assert(a2.tick(Instant.parse("2026-01-12T05:06:00Z")).isEmpty)
    a2.shutdown()
  }

  test("automation: scheduled anomaly_detection job runs the batch scan") {
    val state = tmp("graft_auto_anom")
    val engine = new GraftEngine(spark, sfDir, state)
    import spark.implicits._
    engine.metrics.append(
      (Seq.fill(15)(10.0) :+ 100.0).zipWithIndex.map { case (v, i) =>
        ("default", "tableA", null: String, "m", v,
          ts(f"2026-01-${i + 1}%02d 00:00:00"))
      }.toDF("connection_id", "table_name", "column_name", "metric_name",
        "metric_value", "ts"))
    engine.anomalyConfigs.createConfig(
      AnomalyConfig("m", "tableA", detectionMethod = "zscore"),
      ts("2026-01-17 00:00:00"))
    // a job store seeded with ONLY the anomaly job drives the loop
    val js = new JobStore(spark, state + "/jobs")
    js.save(Scheduler.Job("anomaly_detection", "anomaly_detection",
      Scheduler.Every(Duration.ofHours(1))),
      Instant.parse("2026-01-17T00:00:00Z"))
    val auto = new Automation(engine, Seq("region"), jobStore = Some(js))
    assert(auto.tick(Instant.parse("2026-01-17T01:00:00Z")) ==
      Seq("anomaly_detection"))
    auto.drain(); auto.shutdown()
    // the spike was detected, persisted, and its event published
    assert(engine.anomalies.list().count() >= 1)
    assert(engine.events.feed(eventType = Some("anomaly")).count() == 1)
  }

  test("engine: profileAll caps tables and column depth like the tiers") {
    val engine = new GraftEngine(spark, sfDir, tmp("graft_engine_all"))
    val all = engine.profileAll(ts("2026-01-01 00:00:00"),
      maxTables = 3, maxColumns = 2)
    assert(all.size == 3) // table cap honored (catalog has 10 tables)
    all.values.foreach { p =>
      assert(p.columns.size <= 2) // tier depth: first 2 columns statted
      assert(p.columnCount >= p.columns.size) // table-wide count intact
    }
    // every profiled table persisted one history row
    all.keys.foreach(t => assert(engine.profiles.history(t).count() == 1))
  }

  // ---- trends-attached profile ----------------------------------------

  test("engine: profileTableWithTrends composes profile + history + trends") {
    val state = tmp("graft_engine_tr")
    val engine = new GraftEngine(spark, sfDir, state)
    engine.profileTable("region", ts("2026-01-01 00:00:00"))
    engine.profileTable("region", ts("2026-01-02 00:00:00"))
    val resp = engine.profileTableWithTrends("region", ts("2026-01-03 00:00:00"))
    assert(resp.profile.rowCount == 5)
    // history holds all three runs, newest first
    val hist = resp.history.collect()
    assert(hist.length == 3)
    assert(hist.head.getAs[Timestamp]("ts") == ts("2026-01-03 00:00:00"))
    // the trend slice covers the row_count series including this run
    val rc = resp.trends.filter(col("metric") === "row_count").collect()
    assert(rc.length == 1 && rc.head.getAs[Double]("current_value") == 5.0)
  }
}
