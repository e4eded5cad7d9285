package graft.scheduler

import java.time.{DayOfWeek, Duration, Instant, LocalTime, ZoneOffset, ZonedDateTime}

/**
 * Driver-side automation scheduling (SURVEY.md §3.3): due-job
 * computation, in-flight/recent dedup and the reference's default
 * schedules (simplified_scheduler.py:65-296,
 * schedule_manager.py:110-271). Pure driver logic — each fired job is
 * one Spark action; Spark handles the data-plane parallelism.
 */
object Scheduler {

  sealed trait Schedule {
    /** Next fire time strictly after `after` (UTC). */
    def nextAfter(after: ZonedDateTime): ZonedDateTime
  }

  /** Daily at a fixed UTC time (metadata 02:00, schema detection 03:00). */
  final case class Daily(at: LocalTime) extends Schedule {
    def nextAfter(after: ZonedDateTime): ZonedDateTime = {
      val today = after.toLocalDate.atTime(at).atZone(ZoneOffset.UTC)
      if (today.isAfter(after)) today else today.plusDays(1)
    }
  }

  /** Weekly on a fixed day/time (validations Sun 01:00). */
  final case class Weekly(day: DayOfWeek, at: LocalTime) extends Schedule {
    def nextAfter(after: ZonedDateTime): ZonedDateTime = {
      var t = after.toLocalDate.atTime(at).atZone(ZoneOffset.UTC)
      while (!t.isAfter(after) || t.getDayOfWeek != day) t = t.plusDays(1)
      t
    }
  }

  /** Fixed interval (anomaly scans hourly/daily loops). */
  final case class Every(interval: Duration) extends Schedule {
    def nextAfter(after: ZonedDateTime): ZonedDateTime = after.plus(interval)
  }

  final case class Job(
      id: String,
      jobType: String, // metadata_refresh | schema_change_detection | ...
      schedule: Schedule,
      lastRun: Option[Instant] = None,
      running: Boolean = false)

  /** Reference defaults (schedule_manager.py:249-271). */
  def defaultJobs: Seq[Job] = Seq(
    Job("metadata_refresh", "metadata_refresh", Daily(LocalTime.of(2, 0))),
    Job("schema_change_detection", "schema_change_detection",
      Daily(LocalTime.of(3, 0))),
    Job("validation_automation", "validation_automation",
      Weekly(DayOfWeek.SUNDAY, LocalTime.of(1, 0))))

  /** Due = next fire time after lastRun (or epoch) is ≤ now. */
  def isDue(job: Job, now: Instant): Boolean = {
    val anchor = job.lastRun.getOrElse(Instant.EPOCH)
    val next = job.schedule.nextAfter(
      ZonedDateTime.ofInstant(anchor, ZoneOffset.UTC))
    !next.toInstant.isAfter(now)
  }

  /** Dedup filters (simplified_scheduler.py:220-296): drop jobs already
   *  running or run within the last `recentWindow` (default 5 min). */
  def dueJobs(
      jobs: Seq[Job],
      now: Instant,
      recentWindow: Duration = Duration.ofMinutes(5)): Seq[Job] =
    jobs.filter { j =>
      !j.running &&
        j.lastRun.forall(lr => Duration.between(lr, now).compareTo(recentWindow) >= 0) &&
        isDue(j, now)
    }
}
