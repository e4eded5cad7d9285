package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic harness (never run by the driver): like QTime
 *  but decomposes each query's wall time with a SparkListener —
 *  number of jobs, summed job wall time, task count and summed task
 *  time. The gap between query wall and summed job time is driver-side
 *  work (planning, fixture orchestration, commit protocol); the gap
 *  between job wall and (task time / cores) is scheduling overhead.
 *  Usage: SPARK_GRAFT_SF_DIR=... runMain graft.JTime <query> ... */
object JTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JTime <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // SPARK_GRAFT_JTIME_CONF="k=v;k=v": extra session confs for
    // diagnostic what-if runs (e.g. AQE off). Dev-only.
    sys.env.get("SPARK_GRAFT_JTIME_CONF").foreach(_.split(';')
      .map(_.trim).filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.stateRoot =
      s"/tmp/graft_qstate_j${ProcessHandle.current().pid()}_" +
        s"${System.currentTimeMillis()}"
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val nJobs = new AtomicInteger(0)
    val jobMs = new AtomicLong(0L)
    val nTasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    // SPARK_GRAFT_JTIME_TRACE=1: one line per job (duration, call site,
    // description) — attributes a job-cascade query's count to its
    // operators. Dev-only, like the harness itself.
    val trace = sys.env.get("SPARK_GRAFT_JTIME_TRACE").contains("1")
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet(); jobStarts.put(e.jobId, e.time)
        if (trace) {
          // the result stage's name carries the action's call site
          // ("parquet at Curation.scala:123"); list every distinct site
          // in the job so shuffle stages attribute too
          val sites = e.stageInfos.map(_.name).distinct.mkString(" ;; ")
          jobInfo.put(e.jobId, s"stages=${e.stageIds.size} | $sites")
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(e.jobId)
        if (s != null) jobMs.addAndGet(e.time - s)
        if (trace) {
          val info = Option(jobInfo.remove(e.jobId)).getOrElse("")
          val dur = if (s != null) e.time - s else -1L
          println(f"  [job ${e.jobId}%4d] ${dur}%5d ms  $info")
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        if (e.taskInfo != null)
          taskMs.addAndGet(e.taskInfo.duration)
      }
    })

    def runOne(name: String, print: Boolean): Unit = {
      nJobs.set(0); jobMs.set(0L); nTasks.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      // listener bus is async: give it a beat to drain before reading
      Thread.sleep(300)
      if (print)
        println(f"$name%-34s wall ${wall}%6.2f s  jobs ${nJobs.get}%3d " +
          f"(sum ${jobMs.get / 1e3}%6.2f s)  tasks ${nTasks.get}%5d " +
          f"(sum ${taskMs.get / 1e3}%7.2f s)  driver-gap " +
          f"${wall - jobMs.get / 1e3}%6.2f s")
    }
    runOne(args.head, print = false) // untimed warmup
    args.foreach(runOne(_, print = true))
    try {
      val root = new org.apache.hadoop.fs.Path(SparkEntry.stateRoot)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
