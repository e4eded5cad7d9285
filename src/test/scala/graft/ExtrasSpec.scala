package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{DayOfWeek, Duration, Instant, LocalTime}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.anomalies.{Metrics => ME}
import graft.history.{ChangesStore, MetricsStore, ProfileStore, ValidationStore}
import graft.profiler.Profiler
import graft.scheduler.Scheduler
import graft.sources.Connections
import graft.streaming.StreamingDetect
import graft.types.{SchemaChange, ValidationResult}

class SchedulerSpec extends AnyFunSuite {
  import Scheduler._

  private def at(s: String) = Instant.parse(s)

  test("daily schedule fires once per day at the configured time") {
    val job = Job("m", "metadata_refresh", Daily(LocalTime.of(2, 0)),
      lastRun = Some(at("2026-01-01T02:00:00Z")))
    assert(!isDue(job, at("2026-01-02T01:59:00Z")))
    assert(isDue(job, at("2026-01-02T02:00:00Z")))
  }

  test("weekly schedule fires on the configured day") {
    // 2026-01-04 is a Sunday
    val job = Job("v", "validation_automation",
      Weekly(DayOfWeek.SUNDAY, LocalTime.of(1, 0)),
      lastRun = Some(at("2026-01-04T01:00:00Z")))
    assert(!isDue(job, at("2026-01-10T12:00:00Z")))
    assert(isDue(job, at("2026-01-11T01:00:00Z")))
  }

  test("never-run jobs are immediately due") {
    assert(isDue(Job("m", "x", Daily(LocalTime.of(2, 0))),
      at("2026-01-01T00:00:00Z")))
  }

  test("dedup: running and recently-run jobs are filtered (simplified_scheduler.py:244-296)") {
    val due = Job("a", "x", Every(Duration.ofHours(1)),
      lastRun = Some(at("2026-01-01T00:00:00Z")))
    val now = at("2026-01-01T02:00:00Z")
    assert(dueJobs(Seq(due), now).size == 1)
    assert(dueJobs(Seq(due.copy(running = true)), now).isEmpty)
    val justRan = due.copy(lastRun = Some(now.minusSeconds(120)))
    assert(dueJobs(Seq(justRan), now).isEmpty) // < 5 min ago
  }

  test("default jobs match the reference schedule (schedule_manager.py:249-271)") {
    val byId = defaultJobs.map(j => j.id -> j.schedule).toMap
    assert(byId("metadata_refresh") == Daily(LocalTime.of(2, 0)))
    assert(byId("schema_change_detection") == Daily(LocalTime.of(3, 0)))
    assert(byId("validation_automation") ==
      Weekly(DayOfWeek.SUNDAY, LocalTime.of(1, 0)))
  }
}

class TaskQueueSpec extends AnyFunSuite {
  import graft.scheduler.TaskQueue._

  private def task(id: String, prio: String) =
    MetadataTask(id, "table_metadata", "default", priority = prio)

  test("strict priority: high drains before medium before low, FIFO within") {
    val q = new PriorityTaskQueue
    q.put(task("l1", "low")); q.put(task("m1", "medium"))
    q.put(task("h1", "high")); q.put(task("h2", "high"))
    q.put(task("weird", "no-such-priority")) // defaults to medium
    assert(q.counts == Map("high" -> 2, "medium" -> 2, "low" -> 1))
    val order = Iterator.continually(q.poll()).takeWhile(_.isDefined)
      .map(_.get.id).toSeq
    assert(order == Seq("h1", "h2", "m1", "weird", "l1"))
    assert(q.isEmpty)
  }

  test("worker pool drains the queue, counts failures, reports stats") {
    val q = new PriorityTaskQueue
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    (1 to 20).foreach(i => q.put(task(s"t$i", "medium")))
    q.put(task("boom", "high"))
    val pool = new WorkerPool(q, t => {
      if (t.id == "boom") sys.error("handler failure")
      seen.add(t.id); ()
    }, maxWorkers = 3)
    pool.start()
    assert(pool.awaitQuiescence(10000))
    val s = pool.stats
    assert(s.processed == 20)
    assert(s.failed == 1) // the failure is counted, pool survives
    assert(s.queueCounts.values.sum == 0)
    assert(s.uptimeSeconds >= 0.0)
    assert(pool.stop())
    assert(seen.size == 20)
  }
}

class ConnectionsSpec extends AnyFunSuite {
  test("S2: connection builders produce JDBC URLs + option maps") {
    val pg = Connections.postgres("db.example.com", 5432, "warehouse", "u", "p")
    assert(pg.url == "jdbc:postgresql://db.example.com:5432/warehouse")
    assert(pg.options("user") == "u")
    val sf = Connections.snowflake("acct", "db", "public", "wh", "u", "p")
    assert(sf.url.contains("acct.snowflakecomputing.com"))
    assert(sf.options("warehouse") == "wh")
  }

  test("S9: table storage metrics from backing files") {
    val (files, bytes) = Connections.tableStorage(
      SharedSpark.spark, SharedSpark.sfDir, "region")
    assert(files >= 1 && bytes > 0)
  }

  test("S9 usage half: one-pass usage patterns over a query log") {
    import SharedSpark.spark
    import spark.implicits._
    import graft.sources.{QueryLogStore, UsageLog}
    val dir = Files.createTempDirectory("graft_qlog").toString
    val store = new QueryLogStore(spark, dir)
    store.append("SELECT * FROM orders JOIN customer USING (o_custkey)",
      "SELECT", Timestamp.valueOf("2026-01-01 10:00:00"))
    store.append("SELECT count(*) FROM ORDERS", // case-insensitive match
      "SELECT", Timestamp.valueOf("2026-01-02 11:00:00"))
    store.append("INSERT INTO orders VALUES (1)", // non-SELECT: ignored
      "INSERT", Timestamp.valueOf("2026-01-03 09:00:00"))
    val out = UsageLog.usagePatterns(store.log,
      Seq("orders", "customer", "nation"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getTimestamp(2)))).toMap
    assert(out("orders") ==
      (2L, Some(Timestamp.valueOf("2026-01-02 11:00:00"))))
    assert(out("customer") ==
      (1L, Some(Timestamp.valueOf("2026-01-01 10:00:00"))))
    assert(out("nation") == (0L, None)) // densified: never mentioned
    // fresh install: the log is empty but schema-correct, so usage
    // queries return all-zero rows instead of failing on a missing path
    val fresh = new QueryLogStore(spark,
      Files.createTempDirectory("graft_qlog_empty").toString + "/log")
    val empty = UsageLog.usagePatterns(fresh.log, Seq("orders")).collect()
    assert(empty.length == 1 && empty(0).getLong(1) == 0L)

    // plan shape (the 100 TB contract): the non-equi contains() join is
    // a nested-loop join that must BUILD the driver-small table list and
    // STREAM the unbounded log — building the log side would broadcast
    // the whole SELECT history through one task (round-3 s09 regression)
    val plan = UsageLog.usagePatterns(store.log, Seq("orders", "customer"))
      .queryExecution.executedPlan.toString
    // the matching join is `... join broadcast(tabs) ... Inner` — so the
    // BUILT side is by construction the table list; what must never
    // come back is a BuildLeft/outer variant that broadcasts the log
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight, Inner"),
      s"expected an inner BNLJ building the table-list side in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin BuildLeft"),
      s"BNLJ must not build the query-log side:\n$plan")
  }

  test("S1 integration: real JDBC round-trip vs embedded Derby, " +
      "partitioned read + predicate pushdown in the plan") {
    import SharedSpark.spark
    import org.apache.spark.sql.functions.{col, sum}
    // Derby writes derby.log under derby.system.home — keep it in /tmp
    val home = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", home)
    val conn = Connections.derbyEmbedded(s"$home/graftdb")
    val jdbc = java.sql.DriverManager.getConnection(conn.url)
    try {
      val st = jdbc.createStatement()
      st.executeUpdate(
        "CREATE TABLE orders_mirror (id INT NOT NULL, amount DOUBLE, category VARCHAR(8))")
      val ins = jdbc.prepareStatement(
        "INSERT INTO orders_mirror VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setDouble(2, i * 1.5)
        ins.setString(3, if (i % 2 == 0) "even" else "odd")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally jdbc.close()

    // partitioned scan: 4 parallel range reads, not one serial pull
    val df = Connections.readJdbc(spark, conn, "orders_mirror",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)

    // predicate pushdown: the filter must reach the JDBC scan (shipped
    // as SQL to the database), not run Spark-side over a full pull
    val filtered = df.filter(col("id") > 90).select("id", "amount")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(ID,90)"),
      s"expected GreaterThan(ID,90) pushed to the JDBC source in:\n$plan")
    assert(filtered.count() == 10)
    val total = filtered.agg(sum("amount")).collect()(0).getDouble(0)
    assert(total == (91 to 100).map(_ * 1.5).sum)
  }

  test("catalog rowCounts: one job matches per-table count()") {
    import SharedSpark._
    val cat = graft.sources.Catalog(spark, sfDir)
    val counts = cat.rowCounts(Seq("region", "nation", "customer"))
    assert(counts("region") ==
      spark.read.parquet(s"$sfDir/region.parquet").count())
    assert(counts("nation") ==
      spark.read.parquet(s"$sfDir/nation.parquet").count())
    assert(counts.size == 3)
  }
}

class BatchRunnerSpec extends AnyFunSuite {
  import graft.api.BatchRunner
  import graft.api.BatchRunner.BatchRequest

  private val registry: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "nums" -> ((s, _) => s.range(5).toDF("n")),
      "lit" -> ((s, _) => { import s.implicits._; Seq(("x", 1)).toDF("a", "b") }),
      "boom" -> ((_, _) => throw new IllegalStateException("kaboom")))

  test("run: per-request isolation — unknown and throwing ops become " +
      "error entries, the rest build; blank id/op rows skipped") {
    val out = BatchRunner.run(SharedSpark.spark, "/unused",
      Seq(BatchRequest("a", "nums"), BatchRequest("b", "nope"),
        BatchRequest("c", "boom"), BatchRequest("", "nums"),
        BatchRequest("d", "")),
      registry)
    assert(out.map(_.id) == Seq("a", "b", "c")) // blanks skipped, order kept
    assert(out(0).result.toOption.get.count() == 5)
    assert(out(1).result == Left("unknown op: nope"))
    assert(out(2).result.swap.toOption.get.contains("kaboom"))
  }

  test("summary: concurrent materialization yields (ok, rows, head) per " +
      "sub-request; failures isolated") {
    val df = BatchRunner.summary(SharedSpark.spark, "/unused",
      Seq(BatchRequest("a", "nums"), BatchRequest("b", "lit"),
        BatchRequest("c", "boom"), BatchRequest("d", "nope")),
      registry, parallelism = 4)
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getBoolean(2), r.getLong(3), Option(r.getString(4)))).toMap
    assert(rows("a") == ((true, 5L, Some("0"))))
    assert(rows("b") == ((true, 1L, Some("x"))))
    assert(rows("c")._1 == false && rows("c")._2 == -1L)
    assert(rows("d")._1 == false)
    assert(df.collect().length == 4)
  }
}

class StoresSpec extends AnyFunSuite {
  import SharedSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft_store").toString

  test("profile store: append + history ordering (S8/T1)") {
    val store = new ProfileStore(spark, tmp())
    val df = spark.read.parquet(s"$sfDir/region.parquet")
    val p = Profiler.profile(df, "region")
    store.append(p, Timestamp.valueOf("2026-01-01 00:00:00"))
    store.append(p.copy(rowCount = p.rowCount + 1),
      Timestamp.valueOf("2026-01-02 00:00:00"))
    val h = store.history("region").collect()
    assert(h.length == 2)
    assert(h.head.getAs[Double]("metric_value") == p.rowCount + 1) // newest first
  }

  test("validation store: results + failure events with schema-mismatch sniffing (V5)") {
    val store = new ValidationStore(spark, tmp())
    store.append("t", Seq(
      ValidationResult("ok_rule", isValid = true, Some(0L), 0, "equals"),
      ValidationResult("bad_rule", isValid = false, Some(5L), 0, "equals"),
      ValidationResult("err_rule", isValid = false, None, 0, "equals",
        Some("[UNRESOLVED_COLUMN] `gone` does not exist"))),
      Timestamp.valueOf("2026-01-01 00:00:00"))
    assert(store.results("t").count() == 3)
    val events = store.failureEvents("t").collect()
    assert(events.length == 2)
    assert(events.count(_.getAs[Boolean]("schema_mismatch")) == 1)
  }

  test("changes store: append, filtered list, acknowledge (C8)") {
    val store = new ChangesStore(spark, tmp())
    store.append(Seq(
      SchemaChange("column_removed", "t1", Some("c"), Map.empty, important = true),
      SchemaChange("table_added", "t2", None, Map.empty, important = false)),
      Timestamp.valueOf("2026-01-01 00:00:00"))
    assert(store.list().count() == 2)
    assert(store.list(importantOnly = true).count() == 1)
    store.acknowledge("column_removed", "t1")
    assert(store.list(includeAcknowledged = false).count() == 1)
    assert(store.list(tableName = Some("t1")).first()
      .getAs[Boolean]("acknowledged"))
  }

  test("metrics store: partitioned append + filtered range query (T10)") {
    import spark.implicits._
    val store = new MetricsStore(spark, tmp())
    store.append(Seq(
      ("c1", "t1", "col", "row_count", 10.0, Timestamp.valueOf("2026-01-01 00:00:00")),
      ("c1", "t1", "col", "row_count", 12.0, Timestamp.valueOf("2026-01-05 00:00:00")),
      ("c2", "t2", "col", "row_count", 99.0, Timestamp.valueOf("2026-01-05 00:00:00")))
      .toDF("connection_id", "table_name", "column_name", "metric_name",
        "metric_value", "ts"))
    assert(store.query("c1").count() == 2)
    assert(store.query("c1", tableName = Some("t1"),
      days = Some(2),
      now = Some(Timestamp.valueOf("2026-01-06 00:00:00"))).count() == 1)
    assert(store.query("c2").first().getAs[Double]("metric_value") == 99.0)
  }
}

class MetricsExtractSpec extends AnyFunSuite {
  import SharedSpark._

  test("A8: one-pass extraction into the long metrics shape") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val out = ME.extract(df, "lineitem", Seq(
      ME.RowCount(), ME.NullPercentage("l_quantity"),
      ME.DistinctCount("l_returnflag"), ME.Stats("l_quantity")),
      Timestamp.valueOf("2026-01-01 00:00:00")).collect()
    val byMetric = out.map(r =>
      r.getAs[String]("metric_name") -> r.getAs[Double]("metric_value")).toMap
    assert(byMetric("row_count") == df.count().toDouble)
    assert(byMetric("null_percentage") == 0.0)
    assert(byMetric("distinct_count") == 3.0)
    assert(byMetric("min_value") >= 1.0)
    assert(byMetric("median") > 0.0)
  }
}

class StreamingSpec extends AnyFunSuite {
  import SharedSpark._

  test("streaming z-score detects a spike with batch-detector math") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDetect.MetricEvent]
    val detections = StreamingDetect.zscoreStream(input.toDS(), windowSize = 4)
    val query = detections.writeStream
      .format("memory").queryName("det_out")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val values = Seq(10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 100.0, 10.0)
      input.addData(values.zipWithIndex.map { case (v, i) =>
        StreamingDetect.MetricEvent("m1", new Timestamp(base + i * 60000L), v)
      }: _*)
      query.processAllAvailable()
      val rows = spark.table("det_out").orderBy("ts").collect()
      assert(rows.length == 4) // first 4 points are warm-up
      val spike = rows.find(_.getAs[Double]("value") == 100.0).get
      assert(spike.getAs[Boolean]("isAnomaly"))
      assert(spike.getAs[String]("severity") == "high")
      assert(rows.count(_.getAs[Boolean]("isAnomaly")) == 1)
    } finally query.stop()
  }

  test("streaming detections persist into the durable anomalies store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream_store").toString
    val store = new graft.history.AnomaliesStore(spark, s"$dir/anoms")
    val input = MemoryStream[StreamingDetect.MetricEvent]
    val query = StreamingDetect.persistDetections(
      StreamingDetect.zscoreStream(input.toDS(), windowSize = 4),
      store, Timestamp.valueOf("2026-02-01 00:00:00"))
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val values = Seq(10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 100.0, 10.0)
      input.addData(values.zipWithIndex.map { case (v, i) =>
        StreamingDetect.MetricEvent("m1", new Timestamp(base + i * 60000L), v)
      }: _*)
      query.processAllAvailable()
      val stored = store.list(anomaliesOnly = true).collect()
      assert(stored.length == 1)
      assert(stored.head.getAs[Double]("metric_value") == 100.0)
      assert(stored.head.getAs[String]("metric_name") == "m1")
      // non-anomalous warm-up rows landed too (anomaliesOnly = false)
      assert(store.list(anomaliesOnly = false).count() == 4)
    } finally query.stop()
  }

  test("streaming dedup keeps only the first doc per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDetect.Doc]
    val deduped = StreamingDetect.dedupStream(input.toDS())
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        StreamingDetect.Doc(1L, "alpha"), StreamingDetect.Doc(2L, "beta"),
        StreamingDetect.Doc(3L, "alpha")) // dup within the batch
      query.processAllAvailable()
      input.addData(
        StreamingDetect.Doc(4L, "beta"), // dup across batches
        StreamingDetect.Doc(5L, "gamma"))
      query.processAllAvailable()
      val kept = spark.table("dedup_out").collect()
        .map(r => r.getAs[Long]("docId") -> r.getAs[String]("text")).toMap
      assert(kept == Map(1L -> "alpha", 2L -> "beta", 5L -> "gamma"))
    } finally query.stop()
  }

  test("streaming near-dup flags an almost-copy, ignores unrelated text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 160 tokens: one swapped word moves the SimHash by ~1 bit (vote
    // margins widen with doc length), well inside the hamming-3 bar
    val base = (1 to 160).map(i => s"word$i").mkString(" ")
    val nearCopy = ((1 to 159).map(i => s"word$i") :+ "changed").mkString(" ")
    val unrelated = (1 to 160).map(i => s"other$i").mkString(" ")
    val input = MemoryStream[StreamingDetect.Doc]
    val out = StreamingDetect.nearDupStream(input.toDS())
    val query = out.writeStream
      .format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData(StreamingDetect.Doc(1L, base))
      query.processAllAvailable()
      input.addData(
        StreamingDetect.Doc(2L, nearCopy),   // cross-batch near-dup of 1
        StreamingDetect.Doc(3L, unrelated))
      query.processAllAvailable()
      input.addData(StreamingDetect.Doc(4L, base)) // exact copy, h = 0
      query.processAllAvailable()
      val got = spark.table("neardup_out")
        .select("docId", "dupOf").distinct().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got.contains(2L -> 1L), s"near copy not flagged: $got")
      assert(got.contains(4L -> 1L), s"exact copy not flagged: $got")
      assert(!got.exists(_._1 == 3L), s"unrelated doc flagged: $got")
      assert(!got.exists(p => p._1 == 4L && p._2 == 3L))
    } finally query.stop()
  }

  test("streaming quantile states equal the batch sketch per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h0 = Timestamp.valueOf("2026-01-01 00:30:00")
    val h1 = Timestamp.valueOf("2026-01-01 01:30:00")
    val w0 = Seq(1.0, 2.5, 2.5, 40.0, 0.0, -3.0)
    val w1 = Seq(10.0, 10.0, 0.5)
    val input = MemoryStream[(Timestamp, Double)]
    val query = StreamingDetect.streamingQuantiles(
      input.toDS().toDF("ts", "value"), "ts", "value", alpha = 0.01,
      windowLength = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("stq_out")
      .outputMode("complete").start()
    try {
      input.addData(w0.map((h0, _)) ++ w1.map((h1, _)): _*)
      query.processAllAvailable()
      val got = spark.table("stq_out")
        .select("slice_id", "lane", "bucket", "cnt")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = graft.profiler.LogSketch
        .sliceState(w0.toDF("value"), "value", 0.01, "2026-01-01 01:00:00")
        .unionByName(graft.profiler.LogSketch
          .sliceState(w1.toDF("value"), "value", 0.01, "2026-01-01 02:00:00"))
        .select("slice_id", "lane", "bucket", "cnt")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == want, s"stream states $got != batch states $want")
    } finally query.stop()
  }

  test("near-dup stream bootstrapped from a persisted batch store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 160).map(i => s"word$i").mkString(" ")
    val nearCopy = ((1 to 159).map(i => s"word$i") :+ "changed").mkString(" ")
    val unrelated = (1 to 160).map(i => s"other$i").mkString(" ")
    // the standing corpus was signed by the BATCH pipeline; only its
    // signatures reach the stream (no text)
    val store = graft.pipeline.Dedup.simhashSignatures(
      Seq(1L -> base, 2L -> unrelated).toDF("doc_id", "text"))
    val input = MemoryStream[StreamingDetect.Doc]
    val out = StreamingDetect.nearDupStreamWithStore(input.toDS(), store)
    val query = out.writeStream
      .format("memory").queryName("neardup_boot_out")
      .outputMode("append").start()
    try {
      input.addData(
        StreamingDetect.Doc(10L, nearCopy), // vs store doc 1
        StreamingDetect.Doc(11L, unrelated)) // exact copy of store doc 2
      query.processAllAvailable()
      input.addData(StreamingDetect.Doc(12L, nearCopy)) // vs store AND 10
      query.processAllAvailable()
      val got = spark.table("neardup_boot_out")
        .select("docId", "dupOf").distinct().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got.contains(10L -> 1L), s"store near-dup missed: $got")
      assert(got.contains(11L -> 2L), s"store exact dup missed: $got")
      assert(got.contains(12L -> 1L) && got.contains(12L -> 10L),
        s"later arrival must match store and stream: $got")
      assert(!got.exists(p => p._1 == 10L && p._2 == 2L),
        s"unrelated store doc flagged: $got")
    } finally query.stop()
  }

  test("streaming sessionization closes sessions at the gap and sums values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDetect.MetricEvent]
    val sess = StreamingDetect.sessionizeStream(
      input.toDS().toDF().withColumnRenamed("series", "user_id"),
      keyCol = "user_id", gap = "30 minutes", watermark = "0 seconds")
    val query = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      input.addData(
        StreamingDetect.MetricEvent("u1", new Timestamp(base), 1.5),
        StreamingDetect.MetricEvent("u1", new Timestamp(base + 600000L), 2.0),
        StreamingDetect.MetricEvent("u2", new Timestamp(base), 8.0))
      query.processAllAvailable()
      // 50 minutes later: past u1's session end + gap, so it must close
      input.addData(StreamingDetect.MetricEvent("u1",
        new Timestamp(base + 3000000L), 4.0))
      query.processAllAvailable()
      input.addData(StreamingDetect.MetricEvent("u3",
        new Timestamp(base + 9000000L), 0.0)) // push watermark far ahead
      query.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .map(r => (r.getAs[String]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Double]("value_sum")))
      assert(rows.toSet.contains(("u1", 2L, 3.5))) // first u1 session closed
      assert(rows.toSet.contains(("u2", 1L, 8.0)))
      assert(rows.toSet.contains(("u1", 1L, 4.0))) // second u1 session
    } finally query.stop()
  }

  test("streaming profile emits mergeable slice states per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDetect.MetricEvent]
    val prof = StreamingDetect.streamingProfile(
      input.toDS().toDF(), "ts", Seq("value"),
      windowLength = "10 minutes", watermark = "0 seconds")
    val query = prof.writeStream.format("memory").queryName("prof_out")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      // two 10-minute windows of 10 points each, values 0-9 / 10-19
      input.addData((0 until 20).map(i =>
        StreamingDetect.MetricEvent("s",
          new Timestamp(base + i * 60000L), i.toDouble)): _*)
      // a late event pushes the watermark so both windows close
      input.addData(StreamingDetect.MetricEvent("s",
        new Timestamp(base + 3600000L), 0.0))
      query.processAllAvailable()
      import org.apache.spark.sql.functions.col
      val states = spark.table("prof_out")
        .filter(col("slice_id") < "2026-01-01 00:30:00")
      assert(states.count() == 2) // one state row per closed window
      // the streaming states merge through the SAME batch path
      val merged = graft.profiler.IncrementalProfile.merge(
        states.drop("slice_id")
          .select("column", "cnt", "nulls", "mn", "mx", "sm", "hll"))
        .collect()(0)
      assert(merged.getAs[Long]("cnt") == 20L)
      assert(merged.getAs[Double]("mn") == 0.0)
      assert(merged.getAs[Double]("mx") == 19.0)
      assert(merged.getAs[Double]("sm") == 190.0)
      val est = merged.getAs[Long]("distinct_estimate")
      assert(est >= 19 && est <= 21) // 20 distinct values
    } finally query.stop()
  }

  test("windowed series aggregates counts per (series, window)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingDetect.MetricEvent]
    val agg = StreamingDetect.windowedSeries(
      input.toDS().toDF(), windowLength = "10 minutes", watermark = "0 seconds")
    val query = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      input.addData((0 until 30).map(i =>
        StreamingDetect.MetricEvent("s", new Timestamp(base + i * 60000L), 1.0)): _*)
      // push watermark past the first windows with a late-hour event
      input.addData(StreamingDetect.MetricEvent("s",
        new Timestamp(base + 3600000L), 1.0))
      query.processAllAvailable()
      val rows = spark.table("win_out").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Double]("value") == 10.0))
    } finally query.stop()
  }
}

class TierProfileSpec extends AnyFunSuite {
  import SharedSpark._

  test("P26: maxColumns caps per-column stats but not table-level facts") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val p = Profiler.profile(df, "lineitem", maxColumns = 3,
      includeDuplicates = false)
    assert(p.columns.size == 3)
    assert(p.columnCount == 11)
    assert(p.rowCount == df.count())
  }
}

class SkewSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("salted count agrees with plain groupBy on a hot-key distribution") {
    val df = (Seq.fill(5000)("hot") ++ (1 to 500).map(i => s"k$i"))
      .toDF("k")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.pipeline.Skew.saltedCount(df, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 5000)
  }

  test("salted join matches a plain join, including hot keys") {
    val big = (Seq.fill(2000)(("hot", 1)) ++
      (1 to 200).map(i => (s"k$i", i))).toDF("k", "v")
    val small = (Seq(("hot", 99)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "w")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val plain = normalize(big.join(small, "k"))
    val salted = normalize(graft.pipeline.Skew.saltedJoin(big, small, "k"))
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 2000)
  }

  test("adaptive salted join: hot keys detected, result matches plain " +
      "join, cold small rows not replicated") {
    import graft.pipeline.Skew
    import org.apache.spark.sql.functions.col
    val big = (Seq.fill(2000)(("hot", 1)) ++
      (1 to 200).map(i => (s"k$i", i))).toDF("k", "v")
    val small = (Seq(("hot", 99), ("nomatch", 0)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("k", "w")
    val hot = Skew.hotKeys(big, "k", minCount = 1000L)
    assert(hot.collect().map(_.getString(0)).toSeq == Seq("hot"))
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val plain = normalize(big.join(small, "k"))
    val inner = normalize(Skew.adaptiveSaltedJoin(big, small, "k", hot,
      saltFactor = 8))
    assert(inner == plain)
    // left join keeps unmatched big rows exactly once
    val left = Skew.adaptiveSaltedJoin(
      big, small.filter(col("k") =!= "k1"), "k", hot, joinType = "left")
    assert(left.count() == big.count())
    assert(left.filter(col("k") === "k1" && col("w").isNull).count() == 1)
    // a full-outer ask is rejected rather than silently wrong
    intercept[IllegalArgumentException] {
      Skew.adaptiveSaltedJoin(big, small, "k", hot, joinType = "outer")
    }
  }
}

class BucketingSpec extends AnyFunSuite {
  import SharedSpark._

  test("bucketed co-located join has no shuffle Exchange in its plan") {
    import graft.sources.Bucketing
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "o_orderkey")
      assert(!Bucketing.hasShuffle(joined), "bucketed join must not shuffle")
      assert(joined.count() == lineitem.count())
      // same join on raw (unbucketed) parquet DOES shuffle
      val raw = lineitem.join(orders, "o_orderkey")
      assert(Bucketing.hasShuffle(raw))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}

class IvfSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions.col

  test("IVF top-k beats the probe fraction and approaches brute force") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val index = Similarity.ivfBuild(emb, k = 16)
    val ivf = pairs(Similarity.ivfTopK(index, queries, k = 10, nprobe = 6))
    val recall = (brute & ivf).size.toDouble / brute.size
    // probing 6/16 cells scans ~38% of the corpus; recall must beat that
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("save/load round-trip: identical search results, cell-partitioned " +
      "files, partition pruning on probe") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val built = Similarity.ivfBuild(emb, k = 8)
    val dir = Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfSave(built, dir)
    val loaded = Similarity.ivfLoad(spark, dir)
    assert(loaded.idCol == built.idCol && loaded.embCol == built.embCol)
    assert(loaded.centroids.length == built.centroids.length)
    assert(loaded.centroids.zip(built.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    def res(ix: Similarity.IvfIndex) =
      Similarity.ivfTopK(ix, queries, k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(res(loaded) == res(built))
    // the assignment table is laid out one directory per cell, so an
    // nprobe search prunes at the FILE level — the 100 TB win of saving
    val scan = loaded.assigned.filter(col("__cell") === 0)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("__cell"),
      s"expected __cell partition pruning in:\n$scan")
  }

  test("ivfAppend: appended index answers like a full build on the " +
      "same centroids, and only slice rows are added") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
    val old = emb.filter(col("vec_id") < 400)
    val slice = emb.filter(col("vec_id") >= 400)
    val dir = Files.createTempDirectory("graft_ivf_append").toString
    val oldIndex = Similarity.ivfBuild(old, k = 8)
    Similarity.ivfSave(oldIndex, dir)
    Similarity.ivfAppend(dir, slice)
    val appended = Similarity.ivfLoad(spark, dir)
    def res(ix: Similarity.IvfIndex) =
      Similarity.ivfTopK(ix, queries, k = 5, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // reference: assign the FULL corpus with the OLD centroids (what a
    // rebuild-on-same-centroids would produce)
    val fullOnOldCentroids = Similarity.IvfIndex(
      emb.filter(col("embedding").isNotNull)
        .withColumn("__cell",
          Similarity.nearestCellUdf(oldIndex.centroids)(col("embedding"))),
      oldIndex.centroids, oldIndex.idCol, oldIndex.embCol)
    assert(res(appended) == res(fullOnOldCentroids),
      "appended index must answer like a same-centroid full assignment")
    assert(appended.assigned.count() ==
      old.filter(col("embedding").isNotNull).count() +
      slice.filter(col("embedding").isNotNull).count())
  }
}

class GraftFunctionsSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions.{col, expr, max, abs => sqlAbs, sqrt, call_function}

  test("graft_cosine: single-pass codegen expression is bit-identical " +
      "to the composed three-dot form, SQL-callable") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val paired = emb.crossJoin(emb.limit(3)
      .select(col("embedding").as("other")))
    def dot(a: String, b: String) =
      call_function("graft_dot", col(a), col(b))
    val diff = paired
      .select(
        call_function("graft_cosine", col("embedding"), col("other"))
          .as("fast"),
        (dot("embedding", "other") /
          (sqrt(dot("embedding", "embedding")) * sqrt(dot("other", "other"))))
          .as("composed"))
      .select(max(sqlAbs(col("fast") - col("composed"))).as("d"))
      .head().getDouble(0)
    assert(diff == 0.0, s"expected bit-identical cosine, max diff $diff")
    // callable straight from SQL
    emb.limit(5).createOrReplaceTempView("gf_emb")
    val viaSql = spark.sql(
      "SELECT graft_cosine(embedding, embedding) c FROM gf_emb").collect()
    assert(viaSql.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
    // zero-norm edge is DEFINED as 0.0, never NaN: NaN sorts above
    // every double in Spark's total order and would rank a zero vector
    // #1 in every top-k (ZeroVectorSpec covers the operator side)
    val z = spark.sql(
      """SELECT graft_cosine(array(CAST(0.0 AS FLOAT)),
        array(CAST(1.0 AS FLOAT))) c""").head().getDouble(0)
    assert(z == 0.0)
  }
}

class PqSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions.col

  test("PQ codes are deterministic, bounded, and ~32x smaller than floats") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val a = Similarity.pqBuild(emb, m = 8, ks = 16)
    val b = Similarity.pqBuild(emb, m = 8, ks = 16)
    // same corpus + seed => identical codebooks and identical codes
    assert(a.codebooks.length == 8 && a.codebooks.head.length == 16)
    assert(a.codebooks.flatMap(_.flatMap(_.toSeq)).toSeq ==
      b.codebooks.flatMap(_.flatMap(_.toSeq)).toSeq)
    def codeMap(ix: Similarity.PqIndex) = ix.codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val ca = codeMap(a)
    assert(ca == codeMap(b))
    // every code addresses a real centroid; 8 ints replace 64 floats
    assert(ca.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
  }

  test("pqAppend: slice codes equal a same-codebook encode; load round-trips") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val old = emb.filter(col("vec_id") < 400)
    val slice = emb.filter(col("vec_id") >= 400)
    val built = Similarity.pqBuild(old, m = 8, ks = 16)
    val dir = Files.createTempDirectory("graft_pq_append").toString
    Similarity.pqSave(built, dir)
    Similarity.pqAppend(dir, slice)
    val loaded = Similarity.pqLoad(spark, dir)
    // codebooks round-trip bit-exact; append must not have touched them
    assert(loaded.codebooks.flatMap(_.flatMap(_.toSeq)).toSeq ==
      built.codebooks.flatMap(_.flatMap(_.toSeq)).toSeq)
    assert((loaded.m, loaded.ks, loaded.subDim) ==
      (built.m, built.ks, built.subDim))
    def codeMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val after = codeMap(loaded.codes)
    // appended rows ≡ what a rebuild-with-these-codebooks would encode:
    // a full-corpus pqBuild is NOT the comparison (its codebooks would
    // retrain); encode the whole corpus via append into a fresh dir
    val dir2 = Files.createTempDirectory("graft_pq_append2").toString
    Similarity.pqSave(built.copy(codes = built.codes.limit(0)), dir2)
    Similarity.pqAppend(dir2, emb)
    assert(after == codeMap(Similarity.pqLoad(spark, dir2).codes))
    assert(after.size ==
      emb.filter(col("embedding").isNotNull).count().toInt)
  }

  test("PQ search fails loudly on a non-long id column in the QUERIES frame") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val index = Similarity.pqBuild(emb.limit(50), m = 8, ks = 16)
    // an int-id queries frame passes the codes-side guard but would
    // ClassCastException at getLong without the queries-side check
    val badQueries = emb.limit(3)
      .withColumn("vec_id", col("vec_id").cast("int"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(index, badQueries, k = 3).collect()
    }
    assert(e.getMessage.contains("queries frame"))
  }

  test("ADC top-k recall vs exact L2 beats chance by an order of magnitude") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 5)
    // exact L2 ground truth (ADC approximates L2, not cosine)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val qvecs = vecs.filter(_._1 < 5)
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = qvecs.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .sortBy { case (nid, nv) => (l2(qv, nv), nid) }
        .take(10).map { case (nid, _) => (qid, nid) }
    }.toSet
    val index = Similarity.pqBuild(emb, m = 8, ks = 16)
    val pq = Similarity.pqTopK(index, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // random top-10 from a 500-vector corpus would land ~0.02; a sampled
    // 16-centroid codebook is coarse, but ADC must still be far better
    assert(recall >= 0.2, s"PQ recall too low: $recall")
  }

  test("IVF-PQ: results stay inside the probed candidate set and ADC " +
      "distances agree with the full PQ scan") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfBuild(emb, k = 16)
    val pq = Similarity.pqBuild(emb, m = 8, ks = 16)
    val cands = Similarity.ivfCandidates(ivf, queries, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val res = Similarity.ivfPqTopK(ivf, pq, queries, k = 10, nprobe = 6)
      .collect()
    assert(res.nonEmpty)
    // pruning is real: every emitted neighbor came from a probed cell
    assert(res.forall(r => cands((r.getLong(0), r.getLong(1)))))
    // scoring is the SAME quantizer: distances match the full scan's
    val full = Similarity.pqTopK(pq, queries, k = emb.count().toInt)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(res.forall(r =>
      math.abs(full((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-9))
  }
}

class ApproxModeSpec extends AnyFunSuite {
  import SharedSpark._
  import org.apache.spark.sql.functions.col

  test("HLL/approx profile mode tracks exact within tolerance") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = Profiler.profile(df, "lineitem", exact = true,
      includeDuplicates = false)
    val approx = Profiler.profile(df, "lineitem", exact = false,
      includeDuplicates = false)
    val exactBy = exact.columns.map(c => c.name -> c).toMap
    approx.columns.foreach { c =>
      val e = exactBy(c.name)
      (c.distinctCount, e.distinctCount) match {
        case (Some(a), Some(x)) if x > 0 =>
          val err = math.abs(a - x).toDouble / x
          // approx mode runs HLL at Spark's default rsd = 0.05 (one
          // standard deviation); 15% = 3σ keeps the test deterministic
          // for the fixed fixture without asserting inside the noise
          assert(err < 0.15, s"${c.name}: HLL distinct off by ${err * 100}%")
        case _ => ()
      }
      // percentile_approx returns a sample value (no interpolation), so
      // on low-cardinality domains a one-step offset is inherent — only
      // meaningful to compare on high-cardinality columns
      (c.median, e.median, e.distinctCount) match {
        case (Some(a), Some(x), Some(d)) if x != 0 && d >= 100 =>
          assert(math.abs(a - x) / math.abs(x) < 0.05,
            s"${c.name}: approx median off (approx=$a exact=$x)")
        case _ => ()
      }
    }
  }
}

class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import graft.operators.AsOfJoin

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of semantics: latest right at-or-before, per key, with tolerance") {
    val left = Seq(
      ("k1", ts("2026-01-01 10:00:00"), "a"),
      ("k1", ts("2026-01-01 12:00:00"), "b"),
      ("k1", ts("2026-01-01 09:00:00"), "early"),
      ("k2", ts("2026-01-01 11:00:00"), "other-key"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      ("k1", ts("2026-01-01 10:00:00"), 100.0), // equal ts → visible
      ("k1", ts("2026-01-01 11:30:00"), 200.0),
      ("k2", ts("2026-01-01 08:00:00"), 300.0))
      .toDF("k", "rts", "price")

    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price")).collect()
      .map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(out("a").contains(100.0))      // equal-ts match
    assert(out("b").contains(200.0))      // latest of two
    assert(out("early").isEmpty)          // nothing at-or-before
    assert(out("other-key").contains(300.0))

    // 1-hour tolerance drops the stale k2 match but keeps fresh ones
    val tol = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price"), toleranceSeconds = Some(3600)).collect()
      .map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(tol("a").contains(100.0))
    assert(tol("b").contains(200.0))
    assert(tol("other-key").isEmpty) // 3h stale
  }

  test("matched right row's NULL value is attached, never an older value") {
    val left = Seq(("k1", ts("2026-01-01 12:00:00"), "probe"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      ("k1", ts("2026-01-01 10:00:00"), Some(100.0)),
      ("k1", ts("2026-01-01 11:00:00"), None)) // matched row holds NULL
      .toDF("k", "rts", "price")
    val row = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price")).collect()(0)
    // asof_ts is the 11:00 row AND its genuine NULL rides along —
    // a per-column ignoreNulls carry would smuggle in 100.0
    assert(row.getAs[Timestamp]("asof_ts") == ts("2026-01-01 11:00:00"))
    assert(row.isNullAt(row.fieldIndex("price")))
  }

  test("time-bucketed path agrees with the single-window path") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map { i =>
      ("k" + (i % 2), ts(f"2026-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i)
    }.toDF("k", "ts", "n")
    val right = (0 until 50).map { i =>
      // second = i keeps right timestamps unique per key (tie order
      // between equal right timestamps is unspecified in both paths)
      ("k" + (i % 2), ts(f"2026-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${i % 60}%02d"), i * 1.0)
    }.toDF("k", "rts", "price")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ts", "n", "asof_ts", "price").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
    val plain = rows(AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price")))
    // 1-hour buckets: intra-key parallelism with boundary carry — rows
    // whose bucket has no right row must inherit from earlier buckets
    val bucketed = rows(AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price"), bucketSeconds = Some(3600)))
    assert(bucketed == plain)
    // tolerance composes with bucketing too
    val plainTol = rows(AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price"), toleranceSeconds = Some(1800)))
    val bucketedTol = rows(AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("price"), toleranceSeconds = Some(1800), bucketSeconds = Some(3600)))
    assert(bucketedTol == plainTol)
  }
}

class LayoutSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.sources.Layout

  test("interleaveBits is the Morton code; equal-width bucket clamps") {
    val df = Seq((5L, 3L)).toDF("a", "b") // 101, 011 -> 100111 = 39
    assert(df.select(Layout.interleaveBits(col("a"), col("b"), 3))
      .first().getLong(0) == 39L)
    val buckets = Seq(-10.0, 0.0, 50.0, 100.0, 999.0).toDF("v")
      .select(Layout.equalWidthBucket(col("v"), 0.0, 100.0, 2))
      .collect().map(_.getLong(0)).toSeq
    assert(buckets == Seq(0L, 0L, 2L, 3L, 3L)) // clamped to [0, 3]
  }

  test("interleaveBits round-trips: the Morton code is a bijection") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val zs = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.interleaveBits(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      (0 until 8).foreach { i =>
        a |= ((z >> (2 * i + 1)) & 1L) << i
        b |= ((z >> (2 * i)) & 1L) << i
      }
      (a, b)
    }
    zs.foreach { case (a, b, z) =>
      assert(deinterleave(z) == ((a, b)), s"z=$z for ($a, $b)")
    }
    // distinct inputs → distinct codes (bijectivity on the sample)
    assert(zs.map(_._3).distinct.length == pairs.distinct.length)
  }

  test("z-order layout prunes both dimensions; a sort prunes only one") {
    // 4096 points on a 64x64 grid, shuffled arrival order
    val rnd = new scala.util.Random(7)
    val pts = rnd.shuffle((0 until 64).flatMap(x => (0 until 64)
      .map(y => (x.toDouble, y.toDouble))).toVector)
      .toDF("x", "y")
    val files = 16
    def ranges(df: org.apache.spark.sql.DataFrame): Array[(Double, Double, Double, Double)] =
      df.withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
    // a file "matches" a point predicate if its [min,max] box covers it
    def hits(rs: Array[(Double, Double, Double, Double)], px: Double, py: Double) =
      rs.count { case (x0, x1, y0, y1) =>
        px >= x0 && px <= x1 && py >= y0 && py <= y1 }
    val z = ranges(Layout.zorder(pts, "x", "y", files, bits = 6))
    val sorted = ranges(pts.repartitionByRange(files, col("x")))
    val probes = Seq((5.0, 50.0), (33.0, 12.0), (60.0, 60.0), (17.0, 3.0))
    val zHits = probes.map { case (px, py) => hits(z, px, py) }.sum
    val sHitsY = probes.map { case (_, py) =>
      sorted.count { case (_, _, y0, y1) => py >= y0 && py <= y1 } }.sum
    // point predicate on BOTH dims: z-order touches ~1-2 files per probe
    // (z-range boxes can overlap at curve seams, never the whole set)
    assert(zHits <= probes.size * 3, s"z-order hit $zHits file-boxes")
    assert(zHits * 4 < sHitsY, s"z-order ($zHits) not ≪ sorted ($sHitsY)")
    // predicate on the NON-leading dim of the plain sort prunes nothing
    assert(sHitsY == probes.size * files,
      s"expected y-predicates to hit every x-sorted file, got $sHitsY")
  }

  test("compact bin-packs small files and moves bytes unchanged") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val data = (1 to 5000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
    data.repartition(32).write.parquet(s"$base/small")
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/small") == 32)
    val stats = Layout.compact(spark, s"$base/small", s"$base/out",
      targetBytes = 64L * 1024 * 1024)
    assert(stats.filesBefore == 32)
    assert(stats.filesAfter == 1, s"expected 1 packed file, got $stats")
    assert(parquetFiles(s"$base/out") == 1)
    // compaction must not change one row
    val out = spark.read.parquet(s"$base/out")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == (1 to 5000).map(i => (i.toLong, s"row_$i")))
    // a tight byte budget splits into multiple right-sized files
    val tight = Layout.compact(spark, s"$base/small", s"$base/out2",
      targetBytes = math.max(1L, stats.bytesTotal / 4))
    assert(tight.filesAfter >= 3 && tight.filesAfter <= 5,
      s"expected ~4 files for a quarter-size budget, got $tight")
    assert(spark.read.parquet(s"$base/out2").count() == 5000L)
  }
}
