package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.anomalies.Anomalies
import graft.history.Trends
import graft.pipeline.{Curation, Dedup, LinkGraph, Multimodal, Pii, Sampling, Similarity, TextAnalysis}
import graft.profiler.{IncrementalProfile, Profiler}
import graft.sources.Catalog
import graft.types.ValidationRule
import graft.validations.{DefaultValidations, Runner}

/** J-series temporal joins slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesOperator {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
    Q("j01_asof_join",
      (s, d) => {
        val ev = eventsTable(s, d).select("event_id", "event_type", "ts")
        val daily = eventsTable(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("daily_count"))
          .select(col("event_type"), col("day").cast("timestamp").as("day_ts"),
            col("daily_count"))
        graft.operators.AsOfJoin.asofJoin(ev, daily,
          keyCols = Seq("event_type"), leftTs = "ts", rightTs = "day_ts",
          valueCols = Seq("daily_count"))
          .select(col("event_id"), col("event_type"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
            col("daily_count"))
          .orderBy("event_id")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
            CAST(COUNT(*) AS BIGINT) AS daily_count
          FROM events GROUP BY 1, 2)
        SELECT e.event_id, e.event_type,
          strftime(d.day_ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
          d.daily_count
        FROM events e ASOF LEFT JOIN daily d
          ON e.event_type = d.event_type AND e.ts >= d.day_ts
        ORDER BY e.event_id""")),

    Q("j06_asof_forward",
      // FORWARD as-of join (AsOfJoin direction="forward"): each event
      // attaches the EARLIEST per-type daily summary at-or-AFTER its
      // ts — the next-scheduled-run / next-tick alignment shape.
      // Checked against DuckDB's native ASOF with the mirrored
      // inequality; same single shuffle + one window pass as j01,
      // just a flipped sort. Events on the final day match nothing
      // (ASOF LEFT semantics on both sides).
      (s, d) => {
        val ev = eventsTable(s, d).select("event_id", "event_type", "ts")
        val daily = eventsTable(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("daily_count"))
          .select(col("event_type"), col("day").cast("timestamp").as("day_ts"),
            col("daily_count"))
        graft.operators.AsOfJoin.asofJoin(ev, daily,
          keyCols = Seq("event_type"), leftTs = "ts", rightTs = "day_ts",
          valueCols = Seq("daily_count"), direction = "forward")
          .select(col("event_id"), col("event_type"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
            col("daily_count"))
          .orderBy("event_id")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
            CAST(COUNT(*) AS BIGINT) AS daily_count
          FROM events GROUP BY 1, 2)
        SELECT e.event_id, e.event_type,
          strftime(d.day_ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
          d.daily_count
        FROM events e ASOF LEFT JOIN daily d
          ON e.event_type = d.event_type AND e.ts <= d.day_ts
        ORDER BY e.event_id""")),

    Q("j07_pit_join",
      // point-in-time join (Scd.pointInTimeJoin): each event attaches
      // the dimension VERSION valid at its ts — valid_from <= ts <
      // valid_to — with validity GAPS attaching NOTHING (the stale-
      // version leak is the classic PIT bug). The version table is
      // the per-type daily summary with 1-day validity, and every
      // third day is REMOVED so real gaps exist: events on removed
      // days must come back null. One asof pass + a closed-by-ts
      // check, never the naive O(facts x versions) range join; the
      // oracle IS that naive theta join.
      (s, d) => {
        val ev = eventsTable(s, d).select("event_id", "event_type", "ts")
        graft.operators.Scd.pointInTimeJoin(ev, pitVersionHist(s, d),
            keyCols = Seq("event_type"), factTs = "ts",
            valueCols = Seq("daily_count"))
          .select(col("event_id"), col("event_type"),
            date_format(col("version_from"), "yyyy-MM-dd HH:mm:ss")
              .as("version_from"),
            col("daily_count"))
          .orderBy("event_id")
      },
      Some(pitOracleSql)))
}
