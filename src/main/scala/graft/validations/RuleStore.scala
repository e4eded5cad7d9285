package graft.validations

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.ValidationRule

/**
 * Persisted validation rule definitions (reference:
 * supabase_validation_manager.py:130 `add_rule`, :155 `delete_rule`,
 * :171 `deactivate_rule`, :406 `update_rule`; table
 * `validation_rules`) — the piece that lets a user keep a curated rule
 * suite between sessions instead of re-generating defaults every run.
 *
 * Storage shape: append-only versioned parquet. Every mutation appends
 * a new full row version keyed by (table_name, rule_name) with the
 * mutation timestamp; reads resolve latest-version-wins with one
 * `max_by` aggregate, and a `deleted` tombstone hides a rule. No file
 * is ever rewritten in place — mutations are crash-safe appends, and
 * at scale the store compacts like any event-sourced table.
 *
 * `expectedValue: Any` round-trips through (string, kind) so a Long
 * stays a Long after reload (the reference stores JSON,
 * update_rule:408).
 */
final class RuleStore(spark: SparkSession, path: String) {
  import spark.implicits._

  // list elements are joined with the ASCII unit separator, not a comma
  // — a comma inside a string element would corrupt the round trip
  private val ListSep = ""

  // each list element carries a one-char type tag so the round trip is
  // LOSSLESS: "01" (a zero-padded code) must come back as the string
  // "01", not the double 1.0, and a Long element must stay a Long
  private def encodeElem(e: Any): String = e match {
    case l: Long => s"l:$l"
    case i: Int => s"l:$i"
    case d: Double => s"d:$d"
    case other => s"s:${String.valueOf(other)}"
  }

  private def decodeElem(e: String): Any =
    if (e.startsWith("l:")) e.drop(2).toLong
    else if (e.startsWith("d:")) e.drop(2).toDouble
    else e.drop(2) // "s:" — tagged lists only ever contain tagged elems

  private def encodeExpected(v: Any): (String, String) = v match {
    case l: Long => (l.toString, "long")
    case i: Int => (i.toString, "long")
    case d: Double => (d.toString, "double")
    // "tlist" = element-tagged list; plain "list" is the legacy untagged
    // format, still decoded below so pre-existing stores stay readable
    // (a legacy string element that happens to start with "l:"/"d:"
    // must NOT be mistaken for a tag — the kind decides, not the prefix)
    case s: Seq[_] => (s.map(encodeElem).mkString(ListSep), "tlist")
    case other => (String.valueOf(other), "string")
  }

  private def decodeExpected(s: String, kind: String): Any = kind match {
    case "long" => s.toLong
    case "double" => s.toDouble
    case "tlist" =>
      if (s.isEmpty) Seq.empty[Any]
      else s.split(ListSep, -1).toSeq.map(decodeElem)
    case "list" => // legacy heuristic: numeric-looking → double
      if (s.isEmpty) Seq.empty[Any]
      else s.split(ListSep, -1).toSeq
        .map(e => e.toDoubleOption.getOrElse(e): Any)
    case _ => s
  }

  private def versionRow(
      tableName: String,
      rule: ValidationRule,
      active: Boolean,
      deleted: Boolean,
      now: Timestamp) = {
    val (ev, kind) = encodeExpected(rule.expectedValue)
    (tableName, rule.name, rule.description, rule.query, rule.operator,
      ev, kind, active, deleted, now)
  }

  private def appendVersions(rows: Seq[(String, String, String, String,
      String, String, String, Boolean, Boolean, Timestamp)]): Unit =
    graft.history.StoreIO.appendLocked(path) {
      rows.toDF("table_name", "rule_name", "description", "query", "operator",
        "expected_value", "expected_kind", "is_active", "deleted",
        "updated_at")
        .write.mode(SaveMode.Append).partitionBy("table_name").parquet(path)
    }

  private def appendVersion(
      tableName: String,
      rule: ValidationRule,
      active: Boolean,
      deleted: Boolean,
      now: Timestamp): Unit =
    appendVersions(Seq(versionRow(tableName, rule, active, deleted, now)))

  /** add_rule: persist a new rule (active). Mutations with equal
   *  `now` on the same rule are unordered — callers inject distinct
   *  timestamps (the engine's injected-now discipline guarantees it). */
  def addRule(tableName: String, rule: ValidationRule, now: Timestamp): Unit =
    appendVersion(tableName, rule, active = true, deleted = false, now)

  /** Batch add: one parquet append for the whole suite (seeding a wide
   *  table's generated defaults is ~20 rules — one write job, one file,
   *  not twenty of each). */
  def addRules(
      tableName: String, rules: Seq[ValidationRule], now: Timestamp): Unit =
    if (rules.nonEmpty)
      appendVersions(rules.map(r =>
        versionRow(tableName, r, active = true, deleted = false, now)))

  /** update_rule: replace a rule's definition (stays active). */
  def updateRule(tableName: String, rule: ValidationRule, now: Timestamp): Unit =
    appendVersion(tableName, rule, active = true, deleted = false, now)

  /** deactivate_rule: keep the definition, stop running it. */
  def deactivateRule(tableName: String, ruleName: String, now: Timestamp): Unit =
    latestVersion(tableName, ruleName).foreach(r =>
      appendVersion(tableName, r, active = false, deleted = false, now))

  /** Re-activate a previously deactivated rule. */
  def activateRule(tableName: String, ruleName: String, now: Timestamp): Unit =
    latestVersion(tableName, ruleName).foreach(r =>
      appendVersion(tableName, r, active = true, deleted = false, now))

  /** delete_rule: tombstone — the rule disappears from listings. */
  def deleteRule(tableName: String, ruleName: String, now: Timestamp): Unit =
    latestVersion(tableName, ruleName).foreach(r =>
      appendVersion(tableName, r, active = false, deleted = true, now))

  private def exists: Boolean =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  private def emptyFrame: DataFrame =
    Seq.empty[(String, String, String, String, String, String, String,
      Boolean, Boolean, Timestamp)]
      .toDF("table_name", "rule_name", "description", "query", "operator",
        "expected_value", "expected_kind", "is_active", "deleted",
        "updated_at")

  /** Latest version of every rule for a table (tombstones excluded).
   *  One partition-pruned scan + one max_by aggregate. */
  def rules(tableName: String, activeOnly: Boolean = false): DataFrame = {
    if (!exists) return emptyFrame.drop("table_name")
    val latest = spark.read.parquet(path)
      .filter(col("table_name") === tableName)
      .groupBy("rule_name")
      .agg(max_by(
        struct(col("description"), col("query"), col("operator"),
          col("expected_value"), col("expected_kind"), col("is_active"),
          col("deleted"), col("updated_at")),
        col("updated_at")).as("v"))
      .select(col("rule_name"), col("v.*"))
      .filter(!col("deleted"))
    if (activeOnly) latest.filter(col("is_active")) else latest
  }

  private def latestVersion(
      tableName: String, ruleName: String): Option[ValidationRule] =
    rules(tableName).filter(col("rule_name") === ruleName)
      .collect().headOption.map(rowToRule)

  private def rowToRule(r: org.apache.spark.sql.Row): ValidationRule =
    ValidationRule(
      r.getAs[String]("rule_name"),
      r.getAs[String]("description"),
      r.getAs[String]("query"),
      r.getAs[String]("operator"),
      decodeExpected(r.getAs[String]("expected_value"),
        r.getAs[String]("expected_kind")))

  /** The active rule suite, ready for [[Runner.runAll]]. */
  def activeRules(tableName: String): Seq[ValidationRule] =
    rules(tableName, activeOnly = true)
      .orderBy("rule_name").collect().toSeq.map(rowToRule)

  /** check_rule_exists (manager.py:197): name present and not deleted. */
  def ruleExists(tableName: String, ruleName: String): Boolean =
    latestVersion(tableName, ruleName).isDefined

  /** Names for generation-time dedup ([[Runner.dedupNew]]). */
  def ruleNames(tableName: String): Set[String] =
    rules(tableName).select("rule_name").collect()
      .map(_.getString(0)).toSet
}
