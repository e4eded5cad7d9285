package graft.scheduler

import java.sql.Timestamp
import java.time.Instant

import graft.api.GraftEngine
import graft.scheduler.Scheduler.{Job, defaultJobs, dueJobs}
import graft.scheduler.TaskQueue.{MetadataTask, PriorityTaskQueue, WorkerPool}

/**
 * End-to-end automation orchestration (SURVEY.md §3.3): the reference
 * runs a scheduler loop that enqueues metadata/schema/validation jobs
 * into the priority task queue, which a bounded worker pool drains
 * (simplified_scheduler.py + core/metadata/worker.py). This class is
 * that loop, wired to [[GraftEngine]]:
 *
 *   tick(now) → due jobs (Scheduler) → tasks (PriorityTaskQueue)
 *             → WorkerPool → engine.detectSchemaChanges /
 *               profileTable / runValidations
 *
 * Driver-side only: each executed task fires one Spark action chain;
 * the cluster parallelizes the data work, the pool only bounds how many
 * actions are in flight.
 *
 * Priorities mirror the reference's stance (schema drift is the page-
 * worthy event; metadata refresh routine; validation suites heavy and
 * least urgent): schema_change_detection=high, metadata_refresh=medium,
 * validation_automation=low.
 */
final class Automation(
    engine: GraftEngine,
    tables: Seq[String],
    maxWorkers: Int = 3,
    // reference parity (schedule_manager.py:110-147): jobs live in
    // `automation_scheduled_jobs`, not in process memory — with a store,
    // lastRun survives a driver restart and a run missed while down
    // fires exactly once on the next tick (isDue computes next-fire from
    // the persisted lastRun)
    jobStore: Option[JobStore] = None,
    // daily corpus-ingest turn (job type "ingest_automation"): the
    // landed−processed-ledger diff makes missed-run catch-up structural
    // — see [[IngestScheduler]]
    ingest: Option[IngestScheduler.IngestConfig] = None) {

  private val queue = new PriorityTaskQueue
  @volatile private var jobs: Seq[Job] =
    jobStore.map(_.load()).filter(_.nonEmpty).getOrElse(defaultJobs)
  @volatile private var lastErr: Option[Throwable] = None

  private def priorityOf(jobType: String): String = jobType match {
    case "schema_change_detection" => "high"
    case "validation_automation" => "low"
    case _ => "medium"
  }

  private def execute(task: MetadataTask): Unit = {
    val now = Timestamp.from(Instant.parse(task.params("now")))
    task.taskType match {
      case "metadata_refresh" =>
        tables.foreach(t => engine.profileTable(t, now))
      case "schema_change_detection" =>
        engine.detectSchemaChanges(now)
      case "validation_automation" =>
        // runValidations generates the table's default rule suite itself
        tables.foreach(t => engine.runValidations(t, now))
      case "anomaly_detection" =>
        // the reference's per-config scheduled detection loop
        // (scheduler.py:211-341): every stored active config, one job,
        // results persisted + severity-gated notification
        engine.runAnomalyScanAll(now, persist = true)
      case "ingest_automation" =>
        val cfg = ingest.getOrElse(sys.error(
          "ingest_automation job scheduled but Automation has no IngestConfig"))
        IngestScheduler.runOnce(engine.spark, cfg,
          Instant.parse(task.params("now")), Some(engine.notifier))
      case other => sys.error(s"unknown job type: $other")
    }
  }

  private val pool = new WorkerPool(queue,
    t => try {
      execute(t)
      // at-least-once: lastRun persists only after the work COMPLETED —
      // persisting at enqueue time would make a crash (or a failing
      // handler) between tick and execution silently swallow the run.
      // lastRun comes from the TASK, not the mutable jobs list: a fast
      // worker can run before tick() advances the in-memory lastRun, and
      // persisting the stale pre-tick value (latest-version-wins) would
      // re-fire a completed run after restart.
      for (s <- jobStore; id <- t.params.get("jobId");
           j <- jobs.find(_.id == id)) {
        val ranAt = Instant.parse(t.params("now"))
        s.save(j.copy(lastRun = Some(ranAt)), ranAt)
      }
    } catch { case e: Throwable => lastErr = Some(e); throw e },
    maxWorkers)
  pool.start()

  /** One scheduler tick: enqueue every due job (priority by type) and
   *  mark it run. Returns the enqueued job ids. */
  def tick(now: Instant): Seq[String] = {
    val due = dueJobs(jobs, now)
    due.foreach { j =>
      queue.put(MetadataTask(
        id = s"${j.id}@$now",
        taskType = j.jobType,
        connectionId = "default",
        params = Map("now" -> now.toString, "jobId" -> j.id),
        priority = priorityOf(j.jobType)))
    }
    // in-memory lastRun advances at enqueue (dedups within this
    // process); the DURABLE lastRun is written by the worker only after
    // the task completes, so a crash mid-flight re-fires on restart
    // (at-least-once, the reference's stance)
    val dueIds = due.map(_.id).toSet
    jobs = jobs.map(j =>
      if (dueIds(j.id)) j.copy(lastRun = Some(now)) else j)
    due.map(_.id)
  }

  /** Block until enqueued work is done; surfaces the first handler
   *  error (tests + callers should not get silent failures). */
  def drain(timeoutMillis: Long = 120000L): Unit = {
    val done = pool.awaitQuiescence(timeoutMillis)
    lastErr.foreach(e => throw new RuntimeException("automation task failed", e))
    require(done, s"automation did not drain within ${timeoutMillis}ms")
  }

  def stats: TaskQueue.PoolStats = pool.stats

  def shutdown(): Unit = pool.stop()
}
