package graft.scheduler

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.notifications.Notifications.{GraftEvent, NotificationPublisher}
import graft.pipeline.Curation
import graft.pipeline.Curation.{CurationConfig, IngestReport}
import graft.profiler.SliceStateStore

/**
 * The daily corpus-ingest turn as a PERSISTED scheduled job — the
 * [[graft.pipeline.Curation.incrementalIngest]] composition wired into
 * the [[Automation]] loop the way the reference wires its automation
 * jobs (core/automation/simplified_scheduler.py:65-131), at
 * LLM-pipeline scale:
 *
 *   landing zone (one parquet dir per arriving slice)
 *     → pending = landed − processed-ledger
 *     → per slice, in slice-id order: quality gate → exact dedup
 *       within the slice → near-dup screen vs the persisted MinHash
 *       store → signature append → optional slice-state record
 *     → ledger append (per-stage counts) → event publish
 *
 * Catch-up is STRUCTURAL, not clock-math: the scheduler's at-least-once
 * daily fire decides WHEN to look, and the landed−processed diff
 * decides WHAT to do — a driver down for three days processes all
 * three waiting slices on its first tick, and a re-fired tick with
 * nothing pending is a no-op (the crash-safe idempotence lane:
 * the ledger row appends only AFTER a slice's store append completed,
 * so a crash mid-slice re-runs that slice, never skips it).
 *
 * Scale shape: every per-slice stage is O(slice) — the store is only
 * touched through band-matched signature joins and parquet appends;
 * the ledger and landing listing are metadata-sized.
 */
object IngestScheduler {

  /** Everything the scheduled job needs, serializable-by-path: the
   *  landing dir, the persisted MinHash store, the processed-slice
   *  ledger, and (optionally) a slice-state store path + an event
   *  publisher. */
  final case class IngestConfig(
      landingDir: String,
      storePath: String,
      ledgerPath: String,
      stateStorePath: Option[String] = None,
      curation: CurationConfig = CurationConfig(),
      idCol: String = "doc_id",
      textCol: String = "text")

  /** Append-only processed-slice ledger: one row per completed slice
   *  turn with the [[IngestReport]] counts. Same crash-safe
   *  append-under-lock discipline as every other store. */
  final class IngestLedger(spark: SparkSession, path: String) {
    import spark.implicits._

    def exists: Boolean = graft.history.StoreIO.exists(spark, path)

    def record(sliceId: String, r: IngestReport, now: Instant): Unit =
      recordAll(Seq(sliceId -> r), now)

    /** Batch form: one tick's completed slices land in ONE parquet
     *  append (one committer round-trip instead of per-slice). */
    def recordAll(rows: Seq[(String, IngestReport)], now: Instant): Unit = {
      if (rows.isEmpty) return
      val df = rows.map { case (sliceId, r) =>
        (sliceId, Timestamp.from(now), r.arrived,
          r.afterQuality, r.droppedExactWithin, r.droppedNearDup, r.kept)
      }.toDF("slice_id", "processed_at", "arrived", "after_quality",
        "dropped_exact_within", "dropped_near_dup", "kept")
      graft.history.StoreIO.appendLocked(path) {
        df.write.mode(SaveMode.Append).parquet(path)
      }
    }

    def frame: DataFrame =
      if (!exists)
        Seq.empty[(String, Timestamp, Long, Long, Long, Long, Long)]
          .toDF("slice_id", "processed_at", "arrived", "after_quality",
            "dropped_exact_within", "dropped_near_dup", "kept")
      else spark.read.parquet(path)

    /** Slice ids already fully processed (their ledger row exists). */
    def processedSliceIds: Set[String] =
      if (!exists) Set.empty
      else frame.select("slice_id").distinct()
        .collect().map(_.getString(0)).toSet
  }

  /** Slice dirs currently in the landing zone, slice-id-sorted (the
   *  processing order — ingest semantics are order-dependent because
   *  earlier slices' survivors screen later slices). */
  def landedSlices(spark: SparkSession, landingDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(landingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
  }

  /** One scheduled firing: process every landed-but-unprocessed slice
   *  in order. Returns the slice ids processed this run (empty = the
   *  idempotent re-fire). */
  def runOnce(
      spark: SparkSession,
      cfg: IngestConfig,
      now: Instant,
      publisher: Option[NotificationPublisher] = None): Seq[String] = {
    val ledger = new IngestLedger(spark, cfg.ledgerPath)
    val done = ledger.processedSliceIds
    val pending = landedSlices(spark, cfg.landingDir).filterNot(done)
    val stateStore = cfg.stateStorePath
      .map(p => new SliceStateStore(spark, p))
    val events = Seq.newBuilder[GraftEvent]
    val reports = Seq.newBuilder[(String, IngestReport)]
    pending.foreach { sliceId =>
      val docs = spark.read.parquet(s"${cfg.landingDir}/$sliceId")
      val (_, report) = Curation.incrementalIngest(
        docs, cfg.storePath,
        stateStore.map(st => (st, sliceId)),
        cfg.curation, cfg.idCol, cfg.textCol)
      reports += sliceId -> report
      events += GraftEvent(
        eventType = "automation",
        subtype = "ingest_slice_processed",
        connectionId = "default",
        tableName = Some(sliceId),
        data = Map(
          "arrived" -> report.arrived.toString,
          "kept" -> report.kept.toString,
          "dropped_near_dup" -> report.droppedNearDup.toString),
        ts = Timestamp.from(now))
    }
    // the tick's ledger rows land in ONE append, AFTER every slice's
    // store append completed. Crash mid-tick: the un-ledgered slices
    // (possibly including ones whose store append finished) re-run next
    // fire — re-running an appended slice is CONVERGENT, because its
    // docs now match their own stored signatures at agreement 1.0 and
    // drop, so nothing appends twice (at-least-once, never skip).
    ledger.recordAll(reports.result(), now)
    // events are an advisory feed, not the replay ledger — one write
    publisher.foreach(_.publishAll(events.result()))
    pending
  }
}
