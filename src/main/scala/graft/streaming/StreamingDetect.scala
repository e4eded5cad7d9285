package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming front-end for the anomaly detectors
 * (SURVEY.md §2.7 "Streaming"): the reference polls on a daily/hourly
 * scheduler (core/anomalies/scheduler_service.py:56-145); the idiomatic
 * Spark upgrade is a continuous pipeline —
 *
 *   readStream → watermarked window aggregation (metric series)
 *              → flatMapGroupsWithState (per-series detector state)
 *              → writeStream (anomalies sink)
 *
 * The detector math is the SAME rolling z-score as the batch path
 * (algorithms.py:10-61): trailing `window` values excluding the current
 * point, population σ, threshold 3/sensitivity — kept in a bounded
 * per-series ring buffer, so state is O(series × window) regardless of
 * stream length.
 */
object StreamingDetect {

  final case class MetricEvent(series: String, ts: Timestamp, value: Double)

  final case class SeriesState(values: List[Double])

  final case class Detection(
      series: String,
      ts: Timestamp,
      value: Double,
      score: Double,
      isAnomaly: Boolean,
      threshold: Double,
      method: String,
      severity: String)

  /** Watermarked per-window metric aggregation: raw events → one metric
   *  point per (series, window). The downstream detector consumes the
   *  closed windows. */
  def windowedSeries(
      events: DataFrame,
      seriesCol: String = "series",
      tsCol: String = "ts",
      valueCol: String = "value",
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    graft.operators.TsNorm.normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(col(seriesCol), window(col(tsCol), windowLength))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(col(seriesCol).as("series"),
        col("window.end").as("ts"), col("value"))

  /** Watermarked hourly error/total rollup — the streaming half of the
   *  SLO burn-rate monitor ([[graft.anomalies.Slo]]): the stream pays
   *  for the ONE data-bound stage (per-hour counts, map-side combined
   *  into windowed state), and the trailing-window/alert math runs
   *  over the drained, hours-sized sink via `Slo.burnFromHourly` —
   *  the st11 split (stream builds states, metadata-sized batch stage
   *  finishes). */
  def streamingHourlyErrors(
      events: DataFrame,
      tsCol: String = "ts",
      isError: org.apache.spark.sql.Column = col("event_type") === "error",
      watermark: String = "2 hours"): DataFrame =
    graft.operators.TsNorm.normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("total_1h"),
        sum(when(isError, 1L).otherwise(0L)).as("err_1h"))
      .select(col("window.start").as("hour"),
        col("err_1h"), col("total_1h"))

  /** Rolling z-score over a stream of metric points. Call on a streaming
   *  Dataset[MetricEvent] grouped by series; emits one Detection per
   *  arriving point once the trailing window is full. */
  def zscoreStream(
      points: Dataset[MetricEvent],
      windowSize: Int = 7,
      sensitivity: Double = 1.0): Dataset[Detection] = {
    val spark = points.sparkSession
    import spark.implicits._
    val threshold = 3.0 / sensitivity

    def step(
        series: String,
        events: Iterator[MetricEvent],
        state: GroupState[SeriesState]): Iterator[Detection] = {
      var values = state.getOption.map(_.values).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer[Detection]()
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        if (values.length >= windowSize) {
          val win = values.takeRight(windowSize)
          val mean = win.sum / win.size
          val std = math.sqrt(win.map(v => math.pow(v - mean, 2)).sum / win.size)
          val score = if (std == 0.0) 0.0 else math.abs((e.value - mean) / std)
          val isAnomaly = score > threshold
          val severity =
            if (score > 5.0) "high" else if (score > 3.5) "medium" else "low"
          out += Detection(series, e.ts, e.value, score, isAnomaly,
            threshold, "zscore", severity)
        }
        values = (values :+ e.value).takeRight(windowSize)
      }
      state.update(SeriesState(values))
      out.iterator
    }

    points
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
  }

  /** Continuous profiling: per-window column stats over a stream, one
   *  watermarked streaming aggregation. Each output row is a MERGEABLE
   *  slice state in the exact shape `IncrementalProfile.merge` consumes
   *  (slice_id = window end, then count/nulls/min/max/sum + HLL
   *  sketch) — so the running whole-history profile is a metadata-only
   *  merge over this stream's sink, never a rescan. Stream state is
   *  bounded by the watermark: closed windows emit and drop. */
  def streamingProfile(
      events: DataFrame,
      tsCol: String,
      cols: Seq[String],
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}
    require(cols.nonEmpty, "no columns to profile")
    val schema = events.schema
    val aggs = cols.flatMap { name =>
      val c = col(name)
      val num = schema(name).dataType.isInstanceOf[NumericType]
      Seq(
        count(c).as(s"${name}__cnt"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${name}__nulls"),
        (if (num) min(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${name}__mn"),
        (if (num) max(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${name}__mx"),
        (if (num) sum(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${name}__sm"),
        hll_sketch_agg(c.cast(StringType)).as(s"${name}__hll"))
    }
    val perWindow = graft.operators.TsNorm.normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength))
      .agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { name =>
      struct(
        lit(name).as("column"),
        col(s"${name}__cnt").as("cnt"),
        col(s"${name}__nulls").as("nulls"),
        col(s"${name}__mn").as("mn"),
        col(s"${name}__mx").as("mx"),
        col(s"${name}__sm").as("sm"),
        col(s"${name}__hll").as("hll"))
    }
    perWindow
      .select(col("window.end").cast("string").as("slice_id"),
        explode(array(perCol: _*)).as("s"))
      .select(col("slice_id"), col("s.*"))
  }

  /** Continuous quantile profiling — the [[streamingProfile]] twin for
   *  the quantile lane: per watermarked window, one
   *  [[graft.profiler.LogSketch]] state row per occupied (lane, bucket)
   *  cell, in EXACTLY the shape `LogSketch.merge`/`quantiles` (and the
   *  `SliceStateStore` quantiles lane) consume, with
   *  slice_id = window end. So "p99 latency per hour" streams
   *  continuously, and "p99 over any window range" is a metadata-only
   *  merge of this stream's sink — never a rescan. State per window is
   *  bounded by the bucket count (O(log range / α)), and closed
   *  windows drop with the watermark. */
  def streamingQuantiles(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      alpha: Double = 0.01,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import graft.profiler.LogSketch
    val v = col(valueCol).cast("double")
    graft.operators.TsNorm.normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .where(v.isNotNull)
      .groupBy(window(col(tsCol), windowLength),
        LogSketch.laneExpr(v).as("lane"),
        LogSketch.bucketExpr(v, alpha).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.end").cast("string").as("slice_id"),
        lit(valueCol).as("column"), col("lane"), col("bucket"), col("cnt"))
  }

  /** Continuous heavy-hitter profiling: per-window value counts out of
   *  a watermarked window aggregation, shaped like
   *  [[graft.profiler.MergeableTopK]]'s slice states with slice_id =
   *  window end — so "top users over any window range" is a
   *  metadata-only candidate-prune + merge over this stream's sink,
   *  never a rescan (the [[streamingQuantiles]] pattern applied to the
   *  top-K lane). State per open window is the window's distinct-value
   *  count; closed windows drop with the watermark. The k·cnt > n
   *  candidate cut happens at merge time (the sink is the full
   *  per-window count state, which the MergeableTopK math prunes
   *  exactly as a batch slice). */
  def streamingTopKStates(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      windowLength: String = "1 day",
      watermark: String = "2 days"): DataFrame =
    graft.operators.TsNorm.normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .where(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), windowLength),
        col(valueCol).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.end").cast("string").as("slice_id"),
        col("value"), col("cnt"))

  /** Streaming gap-based sessionization — the stream-native counterpart
   *  of the batch `operators.Sessionize` rollup, built on Spark's
   *  session_window (dynamic-gap session state, merged incrementally as
   *  events arrive, closed and emitted once the watermark passes the
   *  session's end + gap). Output row per closed session: key, bounds,
   *  event count, value sum. State is per-open-session, bounded by the
   *  watermark — this is exactly the operator a 100 TB/day event feed
   *  needs, because the batch variant would re-shuffle the whole history
   *  every run while this touches each event once. */
  def sessionizeStream(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    graft.operators.TsNorm.normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double")
          .as("value_sum"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"), col("value_sum"))

  final case class Doc(docId: Long, text: String)

  /** Streaming exact dedup: emit only the FIRST document per content
   *  hash; later arrivals with identical text are dropped. State is one
   *  boolean per distinct hash, partitioned by the hash key — the
   *  streaming analog of the batch `Dedup.exactDuplicates` path, for
   *  ingest-time filtering instead of after-the-fact cleanup. The full
   *  text never enters state: only its md5 groups the stream. */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def step(
        hash: String,
        events: Iterator[Doc],
        state: GroupState[Boolean]): Iterator[Doc] = {
      if (state.exists) { state.update(true); Iterator.empty }
      else {
        val first = events.toSeq.minBy(_.docId)
        state.update(true)
        Iterator.single(first)
      }
    }

    docs
      .groupByKey(d => java.security.MessageDigest.getInstance("MD5")
        .digest(d.text.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
  }

  final case class CdcEvent(key: Long, seq: Long, ts: Timestamp,
    value: String)

  final case class CdcOpen(value: String, since: Timestamp, seq: Long)

  final case class CdcClosed(key: Long, value: String,
    valid_from: Timestamp, valid_to: Timestamp)

  /** CDC change feed → SCD2 history, streaming: each arriving (key,
   *  ts, value) event SETS the key's current value; when the value
   *  CHANGES, the previous version's validity interval closes and is
   *  EMITTED. Append-mode-honest: only closed intervals leave the
   *  stream (an open-ended row can't be appended and later amended);
   *  the open version per key lives in state — O(keys), independent of
   *  feed length — and closes on the key's next change, whichever
   *  micro-batch it arrives in. The batch twin is
   *  [[graft.operators.Scd.scd2Merge]] (snapshot-grain); this is the
   *  event-grain form a 100 TB/day change feed needs, touching each
   *  event once instead of re-joining history every load. Within a
   *  micro-batch, events order by (ts, seq) so replays are
   *  deterministic; consecutive equal values collapse (no zero-length
   *  versions). */
  def cdcHistoryStream(changes: Dataset[CdcEvent]): Dataset[CdcClosed] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def step(
        key: Long,
        events: Iterator[CdcEvent],
        state: GroupState[CdcOpen]): Iterator[CdcClosed] = {
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.seq))
      var open = state.getOption
      val out = Seq.newBuilder[CdcClosed]
      sorted.foreach { e =>
        open match {
          case Some(o) if o.value != e.value =>
            out += CdcClosed(key, o.value, o.since, e.ts)
            open = Some(CdcOpen(e.value, e.ts, e.seq))
          case Some(_) => // same value: extend silently
          case None => open = Some(CdcOpen(e.value, e.ts, e.seq))
        }
      }
      open.foreach(state.update)
      out.result().iterator
    }

    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
  }

  final case class Transition(key: Long, fromType: String, toType: String)

  /** Streaming event-type transition extraction — the streaming twin
   *  of the batch Markov matrix (x114's `Funnel.eventTransitions`):
   *  per-key state holds only the LAST event (value, ts, seq); each
   *  micro-batch sorts its per-key arrivals by (ts, seq) and emits one
   *  (from, to) row per consecutive pair, chaining across batches
   *  through the retained last event. State is O(keys) × one event —
   *  the ingest-time shape; the matrix itself is a downstream
   *  types²-sized rollup of the emitted rows. Reuses the CDC event
   *  record: `value` IS the event type here.
   *
   *  Cross-micro-batch LATE events are dropped (see the in-body
   *  contract) — pass `droppedLate` to count them, so a consumer
   *  comparing this stream against a batch recomputation (st22) can
   *  tell "parity broke" from "the source split out-of-order input
   *  across batches and N events were dropped by contract". */
  def transitionStream(
      events: Dataset[CdcEvent],
      droppedLate: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._

    def step(
        key: Long,
        it: Iterator[CdcEvent],
        state: GroupState[CdcOpen]): Iterator[Transition] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.seq))
      var last = state.getOption
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        // late-data contract (the watermark discipline): an event
        // older than the retained last event CANNOT be retro-inserted
        // into an already-emitted chain without full history — it is
        // DROPPED, never emitted as an inverted transition. Same-batch
        // disorder is handled by the sort; only cross-batch lateness
        // hits this branch.
        val late = last.exists(l => e.ts.getTime < l.since.getTime
          || (e.ts.getTime == l.since.getTime && e.seq < l.seq))
        if (!late) {
          last.foreach(l => out += Transition(key, l.value, e.value))
          last = Some(CdcOpen(e.value, e.ts, e.seq))
        } else droppedLate.foreach(_.add(1L))
      }
      last.foreach(state.update)
      out.result().iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
  }

  final case class NearDupCandidate(docId: Long, dupOf: Long, hamming: Int)

  /** Internal keying record for [[nearDupStream]] (public only because
   *  Catalyst's generated code must reach the constructor). */
  final case class ChunkKeyed(
      chunkIdx: Int, chunkKey: Int, docId: Long, simhash: Long)

  /** Streaming SimHash near-dup detection — ingest-time screening of
   *  documents that are ALMOST copies of something already seen. Each
   *  doc's 64-bit SimHash splits into four 16-bit chunks (pigeonhole:
   *  hamming ≤ 3 ⇒ at least one chunk identical), the stream is keyed
   *  by (chunk index, chunk value), and per-key state holds the
   *  signatures seen — hamming is verified EXACTLY against them, so
   *  chunk collisions cause work, never false candidates. Emits one
   *  (docId, dupOf, hamming) row per prior match; a pair matching in
   *  two chunks emits twice (dedupe downstream with `dropDuplicates`
   *  — cheaper than cross-key coordination inside the stream). State
   *  is bounded per key by `maxBucketSize` (the batch operator's
   *  degenerate-bucket guard): saturated buckets stop ADMITTING new
   *  signatures but keep matching against the retained ones. Same-batch
   *  arrivals are processed in docId order, so A~B in one batch emits
   *  (B, dupOf=A) exactly like cross-batch arrival. */
  def nearDupStream(
      docs: Dataset[Doc],
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): Dataset[NearDupCandidate] = {
    // the 4×16-bit pigeonhole only guarantees a shared chunk for
    // hamming ≤ 3; a larger bar would silently lose recall
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-chunk scheme")
    val spark = docs.sparkSession
    import spark.implicits._
    chunkKeyed(docs)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        nearDupStep(maxHamming, maxBucketSize))
  }

  /** [[nearDupStream]] with its per-chunk state BOOTSTRAPPED from a
   *  persisted batch signature store (`(doc_id, simhash)` — the frame
   *  `Dedup.simhashSignatures` writes). This is the daily-ingest shape
   *  end to end: the standing corpus was signed ONCE by the batch
   *  pipeline; the stream screens every arriving document against the
   *  corpus AND earlier arrivals without re-reading a byte of old
   *  text. Uses Structured Streaming's initial-state overload, so the
   *  store loads once at query start, partitioned by the same chunk
   *  keys the stream shuffles on — the streaming twin of the batch
   *  `Dedup.incrementalHammingNearDuplicates`. Store entries admit in
   *  docId order under the same `maxBucketSize` cap as arrivals. */
  def nearDupStreamWithStore(
      docs: Dataset[Doc],
      storeSigs: DataFrame,
      idCol: String = "doc_id",
      sigCol: String = "simhash",
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): Dataset[NearDupCandidate] = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0, 3] for the 4-chunk scheme")
    val spark = docs.sparkSession
    import spark.implicits._
    val initial = storeSigs
      .select(col(idCol).cast("long"), col(sigCol).cast("long"))
      .as[(Long, Long)]
      .flatMap { case (id, sh) =>
        (0 until 4).map(i =>
          ChunkKeyed(i, ((sh >>> (i * 16)) & 0xffffL).toInt, id, sh))
      }
      .groupByKey(k => (k.chunkIdx, k.chunkKey))
      .mapGroups { (key, it) =>
        val sigs = it.map(e => (e.docId, e.simhash)).toSeq
          .sortBy(_._1).take(maxBucketSize).reverse.toList
        (key, sigs)
      }
      .groupByKey(_._1).mapValues(_._2)
    chunkKeyed(docs)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout(), initial)(
        nearDupStep(maxHamming, maxBucketSize))
  }

  /** SimHash each doc and key it by its four 16-bit chunks. */
  private def chunkKeyed(
      docs: Dataset[Doc]): org.apache.spark.sql.KeyValueGroupedDataset[
      (Int, Int), ChunkKeyed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .flatMap { d =>
        val sh = graft.pipeline.Dedup.simhash64(d.text)
        (0 until 4).map(i =>
          ChunkKeyed(i, ((sh >>> (i * 16)) & 0xffffL).toInt, d.docId, sh))
      }
      .groupByKey(k => (k.chunkIdx, k.chunkKey))
  }

  /** Per-chunk match-then-admit step shared by the cold-start and
   *  store-seeded near-dup streams. */
  private def nearDupStep(maxHamming: Int, maxBucketSize: Int)(
      key: (Int, Int),
      events: Iterator[ChunkKeyed],
      state: GroupState[List[(Long, Long)]]): Iterator[NearDupCandidate] = {
    var seen = state.getOption.getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
    events.toSeq.sortBy(_.docId).foreach { e =>
      seen.foreach { case (id, sh) =>
        val h = java.lang.Long.bitCount(sh ^ e.simhash)
        if (h <= maxHamming && id != e.docId)
          out += NearDupCandidate(e.docId, id, h)
      }
      if (seen.size < maxBucketSize) seen = (e.docId, e.simhash) :: seen
    }
    state.update(seen)
    out.iterator
  }

  /** Persist a streaming detection frame into the engine's durable
   *  anomalies store — the streaming → persistence glue: each
   *  micro-batch appends through the SAME locked store the batch scans
   *  use (one writer at a time, date-partitioned), so dashboards and
   *  trend queries see streaming and scheduled detections in one
   *  place. Start the returned query; stop it to drain. The batch
   *  epoch id stamps `run_at` so a replayed epoch is attributable. */
  def persistDetections(
      detections: Dataset[Detection],
      store: graft.history.AnomaliesStore,
      baseTs: java.sql.Timestamp): org.apache.spark.sql.streaming.StreamingQuery =
    detections
      .withColumnRenamed("series", "metric_name")
      .withColumnRenamed("isAnomaly", "is_anomaly")
      .withColumn("table_name", lit("__stream"))
      .withColumn("column_name", lit(null).cast("string"))
      .withColumn("metric_value", col("value"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        if (!batch.isEmpty)
          store.append(batch.toDF(),
            new java.sql.Timestamp(baseTs.getTime + epochId))
      }
      .start()
}
