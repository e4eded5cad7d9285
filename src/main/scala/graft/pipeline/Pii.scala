package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction over a document corpus — the scrub pass a
 * training-data pipeline runs before anything leaves the raw zone
 * (mirrors the hygiene role of the reference's format checks,
 * backend/core/profiling/validations, applied corpus-wide).
 *
 * Scale shape: pure map-side — every column here is a codegen'd
 * regexp expression over the text column; no shuffle, no UDF, no
 * driver participation. At 100 TB this is scan-bound, which is the
 * best case. Patterns stay in the RE2 ∩ java.util.regex common
 * subset (no backreferences, no lookaround) so the same pattern text
 * runs on Spark, DuckDB and any RE2-based scanner unchanged.
 */
object Pii {

  /** (name, pattern, replacement-tag). Patterns are NOT fully disjoint:
   *  an SSN- or IP-shaped substring INSIDE an email address matches both
   *  its own pattern and the email pattern ("078-05-1120@example.com"
   *  scans as one email and one SSN), so per-pattern counts can
   *  double-count such composites, and redaction applies the passes in
   *  THIS declared order — email first, so a composite redacts as the
   *  enclosing item (`<EMAIL>`), which is the containing-entity
   *  convention scanners normally want. The order is part of the
   *  operator contract (the x14 oracle replays it). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // US-format phone with parenthesized area code; the parens keep it
    // disjoint from SSN/IP digit runs
    ("phone", "\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"))

  /** Text with every PII pattern replaced by its tag. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Per-document PII hit counts plus an md5 of the redacted text (the
   *  hash pins the exact redaction output without carrying the full
   *  text through the result). */
  def piiScan(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val counts = patterns.map { case (name, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$name")
    }
    docs.select(
      (col(idCol) +: counts :+
        md5(redact(col(textCol)).cast("binary")).as("redacted_md5")): _*)
  }

  /** Corpus rollup: documents and total hits per category. */
  def piiSummary(
      scanned: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val aggs = patterns.flatMap { case (name, _, _) =>
      Seq(
        sum(col(s"n_$name")).as(s"total_$name"),
        sum(when(col(s"n_$name") > 0, 1L).otherwise(0L))
          .as(s"docs_with_$name"))
    }
    scanned.agg(aggs.head, aggs.tail: _*)
  }
}
