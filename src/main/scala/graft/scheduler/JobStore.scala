package graft.scheduler

import java.sql.Timestamp
import java.time.{DayOfWeek, Duration, Instant, LocalTime}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.scheduler.Scheduler.{Daily, Every, Job, Schedule, Weekly}

/**
 * Persisted scheduler jobs (reference: schedule_manager.py:110-147
 * `automation_scheduled_jobs` + task_status_tracker.py): `lastRun`
 * survives a driver restart, so a restarted engine neither re-fires
 * everything nor forgets a missed run — `Scheduler.isDue` computes the
 * next fire time from the PERSISTED lastRun, which makes a job missed
 * while the driver was down fire exactly once on the next tick (the
 * next-after-lastRun time is in the past) instead of N times.
 *
 * Append-only versioned parquet like the rule/config stores: every
 * lastRun advance or definition change appends a row; latest wins.
 */
final class JobStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def encodeSchedule(s: Schedule): (String, String) = s match {
    case Daily(at) => ("daily", at.toString)
    case Weekly(day, at) => ("weekly", s"$day@$at")
    case Every(d) => ("every", d.getSeconds.toString)
  }

  private def decodeSchedule(kind: String, arg: String): Schedule = kind match {
    case "daily" => Daily(LocalTime.parse(arg))
    case "weekly" =>
      val Array(day, at) = arg.split("@", 2)
      Weekly(DayOfWeek.valueOf(day), LocalTime.parse(at))
    case "every" => Every(Duration.ofSeconds(arg.toLong))
    case other => sys.error(s"unknown schedule kind: $other")
  }

  /** Persist the current state of a job (definition + lastRun). */
  def save(job: Job, now: Instant): Unit = {
    val (kind, arg) = encodeSchedule(job.schedule)
    val row = Seq((job.id, job.jobType, kind, arg,
      job.lastRun.map(Timestamp.from).orNull, Timestamp.from(now)))
      .toDF("job_id", "job_type", "schedule_kind", "schedule_arg",
        "last_run", "updated_at")
    graft.history.StoreIO.appendLocked(path) {
      row.write.mode(SaveMode.Append).parquet(path)
    }
  }

  def saveAll(jobs: Seq[Job], now: Instant): Unit =
    jobs.foreach(save(_, now))

  private def exists: Boolean =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** Load the latest version of every job; empty on a fresh install
   *  (callers seed with `Scheduler.defaultJobs` and persist). */
  def load(): Seq[Job] = {
    if (!exists) return Nil
    spark.read.parquet(path)
      .groupBy("job_id")
      .agg(max_by(
        struct(col("job_type"), col("schedule_kind"), col("schedule_arg"),
          col("last_run"), col("updated_at")),
        col("updated_at")).as("v"))
      .select(col("job_id"), col("v.*"))
      .orderBy("job_id")
      .collect().toSeq.map { r =>
        Job(
          id = r.getAs[String]("job_id"),
          jobType = r.getAs[String]("job_type"),
          schedule = decodeSchedule(r.getAs[String]("schedule_kind"),
            r.getAs[String]("schedule_arg")),
          lastRun = Option(r.getAs[Timestamp]("last_run")).map(_.toInstant))
      }
  }
}
