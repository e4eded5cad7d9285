package graft.scheduler

import java.time.Instant
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

/**
 * Metadata task queue + worker pool (SURVEY.md §3.3; reference:
 * core/metadata/worker.py:67-230 — `PriorityTaskQueue` with three
 * priority lanes and `MetadataWorker` with a bounded thread pool and
 * stats accounting).
 *
 * Spark-native stance: this is DRIVER-side bookkeeping only. Each task's
 * handler typically fires one Spark action (a profile, a snapshot, a
 * validation suite); Spark's scheduler provides the data-plane
 * parallelism, so the pool exists to bound how many concurrent actions
 * the driver submits — NOT to parallelize data work itself.
 */
object TaskQueue {

  /** One queued unit of work (worker.py:14-62). */
  final case class MetadataTask(
      id: String,
      taskType: String, // full_collection | table_metadata | refresh | ...
      connectionId: String,
      params: Map[String, String] = Map.empty,
      priority: String = "medium", // high | medium | low
      createdAt: Instant = Instant.now(),
      status: String = "pending") // pending | running | completed | failed

  /** Three-lane strict-priority FIFO (worker.py:67-180): `get` always
   *  drains high before medium before low; FIFO within a lane. */
  final class PriorityTaskQueue {
    private val high = new ConcurrentLinkedQueue[MetadataTask]()
    private val medium = new ConcurrentLinkedQueue[MetadataTask]()
    private val low = new ConcurrentLinkedQueue[MetadataTask]()

    def put(task: MetadataTask): Unit = task.priority match {
      case "high" => high.add(task)
      case "low" => low.add(task)
      case _ => medium.add(task) // unknown priorities default to medium
    }

    /** Next task by priority, or None when all lanes are empty. */
    def poll(): Option[MetadataTask] =
      Option(high.poll()).orElse(Option(medium.poll()))
        .orElse(Option(low.poll()))

    def counts: Map[String, Int] =
      Map("high" -> high.size, "medium" -> medium.size, "low" -> low.size)

    def isEmpty: Boolean = high.isEmpty && medium.isEmpty && low.isEmpty
  }

  /** Pool statistics (worker.py get_stats shape). */
  final case class PoolStats(
      processed: Long,
      failed: Long,
      activeWorkers: Int,
      uptimeSeconds: Double,
      queueCounts: Map[String, Int])

  /**
   * Bounded worker pool draining a [[PriorityTaskQueue]]
   * (worker.py:230-360 semantics): `maxWorkers` threads, each pulls the
   * highest-priority pending task and runs `handler` on it; failures are
   * counted, never fatal to the pool. `stop()` drains in-flight work.
   */
  final class WorkerPool(
      queue: PriorityTaskQueue,
      handler: MetadataTask => Unit,
      maxWorkers: Int = 3,
      idleMillis: Long = 20L) {

    private val processed = new AtomicLong(0)
    private val failed = new AtomicLong(0)
    private val active = new AtomicInteger(0)
    private val running = new AtomicBoolean(false)
    private val pool = Executors.newFixedThreadPool(maxWorkers, r => {
      val t = new Thread(r, "graft-metadata-worker")
      t.setDaemon(true)
      t
    })
    @volatile private var startedAt: Option[Instant] = None
    private val stopped = new CountDownLatch(maxWorkers)

    def start(): Unit = if (running.compareAndSet(false, true)) {
      startedAt = Some(Instant.now())
      (1 to maxWorkers).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try {
              while (running.get()) {
                queue.poll() match {
                  case Some(task) =>
                    active.incrementAndGet()
                    try {
                      handler(task.copy(status = "running"))
                      processed.incrementAndGet()
                    } catch {
                      case _: InterruptedException => return
                      case scala.util.control.NonFatal(_) =>
                        failed.incrementAndGet()
                    } finally active.decrementAndGet()
                  case None => Thread.sleep(idleMillis)
                }
              }
            } catch { case _: InterruptedException => () }
            finally stopped.countDown()
          }
        })
      }
    }

    /** Stop accepting work; wait for in-flight tasks to finish. */
    def stop(timeoutMillis: Long = 5000L): Boolean = {
      running.set(false)
      val done = stopped.await(timeoutMillis, TimeUnit.MILLISECONDS)
      pool.shutdownNow()
      done
    }

    def stats: PoolStats = PoolStats(
      processed = processed.get(),
      failed = failed.get(),
      activeWorkers = active.get(),
      uptimeSeconds = startedAt
        .map(s => (System.currentTimeMillis() - s.toEpochMilli) / 1000.0)
        .getOrElse(0.0),
      queueCounts = queue.counts)

    /** Block until the queue is drained AND no task is in flight. */
    def awaitQuiescence(timeoutMillis: Long = 30000L): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMillis
      while (System.currentTimeMillis() < deadline) {
        if (queue.isEmpty && active.get() == 0) return true
        Thread.sleep(idleMillis)
      }
      queue.isEmpty && active.get() == 0
    }
  }
}
