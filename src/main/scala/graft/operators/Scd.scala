package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Type-2 slowly-changing-dimension merge — the canonical incremental
 * upsert a warehouse dimension runs every load. The reference keeps
 * versioned profile/schema history with acknowledged "changes since
 * last" semantics (backend/core/history, schema_changes); this is the
 * same idea applied to the dimension rows themselves, with validity
 * intervals instead of event rows.
 *
 * Scale shape: ONE key-partitioned full-outer join between the OPEN
 * slice of the dimension and the incoming snapshot; the closed history
 * passes through untouched (never shuffled, never rewritten) — exactly
 * the property that makes SCD2 viable on a 100 TB dimension where each
 * daily snapshot touches a fraction of keys. No window functions, no
 * global ordering.
 */
object Scd {

  val OpenEnd = "9999-12-31 00:00:00"

  /** Bootstrap a dimension from a first snapshot: every row open from
   *  `asOf`. */
  def scd2Init(
      snapshot: DataFrame,
      asOf: String): DataFrame =
    snapshot
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(OpenEnd))
      .withColumn("is_current", lit(true))

  /** Merge a new snapshot into an SCD2 dimension.
   *
   *  `dim` carries `keyCols ++ trackedCols ++ (valid_from, valid_to,
   *  is_current)`; `snapshot` carries `keyCols ++ trackedCols`. Per
   *  key:
   *   - unchanged (all tracked columns null-safe-equal): open row kept;
   *   - changed: open row closed at `asOf` + a new open row;
   *   - absent from the snapshot (deleted upstream): open row closed;
   *   - new key: a new open row.
   *  Closed history rows pass through untouched. Tracked-column
   *  comparison is null-safe (`<=>`), so NULL→NULL is "unchanged" and
   *  NULL→value is a change. */
  def scd2Merge(
      dim: DataFrame,
      snapshot: DataFrame,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      asOf: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2Merge needs at least one key column")
    val outCols = (keyCols ++ trackedCols ++
      Seq("valid_from", "valid_to", "is_current")).map(col)
    val closedHistory = dim.filter(!col("is_current")).select(outCols: _*)
    val open = dim.filter(col("is_current"))

    val snapAliased = snapshot.select(
      (keyCols.map(k => col(k).as(s"__k_$k")) ++
        trackedCols.map(c => col(c).as(s"__s_$c"))): _*)
    val joinCond = keyCols
      .map(k => col(k) === col(s"__k_$k"))
      .reduce(_ && _)
    val j = open.join(snapAliased, joinCond, "full_outer")

    val inDim = keyCols.map(k => col(k).isNotNull).reduce(_ || _)
    val inSnap = keyCols.map(k => col(s"__k_$k").isNotNull).reduce(_ || _)
    val changed = trackedCols
      .map(c => !(col(c) <=> col(s"__s_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    // the open row, closed at asOf (changed or deleted keys)
    val closeOld = j.filter(inDim && (!inSnap || changed))
      .select((keyCols.map(col) ++ trackedCols.map(col) ++ Seq(
        col("valid_from"), lit(asOf).as("valid_to"),
        lit(false).as("is_current"))): _*)
    // the open row, kept as-is (unchanged keys)
    val keepOpen = j.filter(inDim && inSnap && !changed)
      .select(outCols: _*)
    // the snapshot row, opened at asOf (changed or brand-new keys)
    val openNew = j.filter(inSnap && (!inDim || changed))
      .select((keyCols.map(k =>
        coalesce(col(s"__k_$k"), col(k)).as(k)) ++
        trackedCols.map(c => col(s"__s_$c").as(c)) ++ Seq(
          lit(asOf).as("valid_from"), lit(OpenEnd).as("valid_to"),
          lit(true).as("is_current"))): _*)

    closedHistory.unionByName(closeOld).unionByName(keepOpen)
      .unionByName(openNew)
  }

  /** Point-in-time join: attach to each fact row the dimension VERSION
   *  that was valid at the fact's timestamp — `valid_from <= ts <
   *  valid_to` (null `valid_to` = still open) — the join every
   *  fact-against-SCD2 rollup needs ("price as of the order", "config
   *  as of the event"). Facts falling in a validity GAP (their latest
   *  preceding version already closed) attach NOTHING: leaking a stale
   *  version is the classic PIT bug, and the gap is surfaced as nulls.
   *
   *  Built on [[AsOfJoin.asofJoin]] (backward): validity intervals are
   *  non-overlapping per key, so the latest version STARTING at-or-
   *  before ts is the only candidate, and one closed-by-ts check
   *  replaces the naive range join. Cost = one key shuffle + one
   *  window pass — never O(facts × versions). Output: every fact
   *  column + `version_from` (the matched version's start, null on
   *  gap/no-version) + `valueCols`. */
  def pointInTimeJoin(
      facts: DataFrame,
      history: DataFrame,
      keyCols: Seq[String],
      factTs: String,
      valueCols: Seq[String],
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val joined = AsOfJoin.asofJoin(facts, history, keyCols, factTs,
      validFrom, valueCols :+ validTo)
    // the asof candidate is stale when the fact sits past its close —
    // a validity gap, not a match ([from, to) half-open)
    val stale = col(validTo).isNotNull && col(validTo) <= col(factTs)
    valueCols.foldLeft(joined)((df, c) =>
        df.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
      .withColumn("version_from",
        when(stale, lit(null)).otherwise(col("asof_ts")))
      .drop("asof_ts", validTo)
  }
}
