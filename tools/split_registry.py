#!/usr/bin/env python3
"""One-shot round-17 refactor: move SparkEntry's ten per-lane
`private def xxxQueries: Seq[Q] = Seq(...)` bodies into per-lane
registry files (pipeline split in three), zero behavior change.
Scala-aware paren matching (strings/comments skipped)."""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"

LANES = [
    ("profilerQueries", "QueriesProfiler", "P-series profiling"),
    ("validationQueries", "QueriesValidation", "V-series validations"),
    ("anomalyQueries", "QueriesAnomaly", "A-series anomaly detection"),
    ("batchQueries", "QueriesBatch", "B-series batch multiplexers"),
    ("trendQueries", "QueriesTrend", "T-series trends/analytics"),
    ("pipelineQueries", None, "D/E/M/X-series LLM data pipeline"),
    ("sourceQueries", "QueriesSource", "S-series sources/catalog"),
    ("operatorQueries", "QueriesOperator", "J-series temporal joins"),
    ("schemaQueries", "QueriesSchema", "C-series schema diff + X-tail"),
    ("streamingQueries", "QueriesStreaming", "ST-series streaming gates"),
]

HEADER = '''package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.anomalies.Anomalies
import graft.history.Trends
import graft.pipeline.{Curation, Dedup, LinkGraph, Multimodal, Pii, Sampling, Similarity, TextAnalysis}
import graft.profiler.{IncrementalProfile, Profiler}
import graft.sources.Catalog
import graft.types.ValidationRule
import graft.validations.{DefaultValidations, Runner}

/** %s slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object %s {
  import SparkEntry._

'''


def match_close(text, open_idx):
    """Index just past the `)` matching the `(` at open_idx,
    skipping strings and comments."""
    i = open_idx
    depth = 0
    n = len(text)
    while i < n:
        c = text[i]
        if text.startswith('"""', i):
            i += 3
            while i < n:
                if text.startswith('"""', i):
                    # consume the whole quote run; close on its tail
                    j = i
                    while j < n and text[j] == '"':
                        j += 1
                    i = j
                    break
                i += 1
            continue
        if c == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
            i += 1
            continue
        if text.startswith("//", i):
            while i < n and text[i] != "\n":
                i += 1
            continue
        if text.startswith("/*", i):
            d = 1
            i += 2
            while i < n and d:
                if text.startswith("/*", i):
                    d += 1
                    i += 2
                elif text.startswith("*/", i):
                    d -= 1
                    i += 2
                else:
                    i += 1
            continue
        if c == "'" and i + 2 < n:
            if text[i + 1] == "\\" and i + 3 < n and text[i + 3] == "'":
                i += 4
                continue
            if text[i + 2] == "'":
                i += 3
                continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise SystemExit("unbalanced parens from %d" % open_idx)


def main():
    text = open(SRC).read()
    out_files = {}
    for lane, obj, desc in LANES:
        m = re.search(
            r"\n  private def %s: Seq\[Q\] = Seq\(" % lane, text)
        if not m:
            raise SystemExit("lane %s not found" % lane)
        open_idx = text.index("Seq(", m.start()) + 3
        end = match_close(text, open_idx)
        body = text[open_idx + 1 : end - 1]  # inside Seq( ... )
        # drop the def (incl. leading newline) from SparkEntry
        text = text[: m.start()] + "\n" + text[end:]
        if lane != "pipelineQueries":
            out_files[obj] = (
                HEADER % (desc, obj)
                + "  def queries: Seq[Q] = Seq(" + body + ")\n}\n"
            )
        else:
            # split items at top-level `    Q("` line starts
            starts = [mm.start() for mm in
                      re.finditer(r'(?m)^    Q\("', body)]
            if len(starts) < 30:
                raise SystemExit("pipeline split found %d items"
                                 % len(starts))
            k = len(starts) // 3
            cuts = [starts[0], starts[k], starts[2 * k], len(body)]
            names = ["QueriesPipelineA", "QueriesPipelineB",
                     "QueriesPipelineC"]
            for idx, nm in enumerate(names):
                chunk = body[cuts[idx]: cuts[idx + 1]].rstrip()
                if chunk.endswith(","):
                    chunk = chunk[:-1]
                out_files[nm] = (
                    HEADER % (desc + " (%d/3)" % (idx + 1), nm)
                    + "  def queries: Seq[Q] = Seq(\n    "
                    + chunk + ")\n}\n"
                )
    # rewrite the registry concatenation
    old_reg = re.search(
        r"lazy val registry: Seq\[Q\] =\n(.*?\n\n)", text, re.S)
    reg_old_block = re.search(
        r"  lazy val registry: Seq\[Q\] =\n"
        r"    profilerQueries \+\+ validationQueries \+\+ anomalyQueries \+\+\n"
        r"      trendQueries \+\+ pipelineQueries \+\+ sourceQueries \+\+ schemaQueries \+\+\n"
        r"      operatorQueries \+\+ batchQueries \+\+ streamingQueries",
        text)
    if not reg_old_block:
        raise SystemExit("registry concat not found verbatim")
    text = text.replace(
        reg_old_block.group(0),
        "  lazy val registry: Seq[Q] =\n"
        "    QueriesProfiler.queries ++ QueriesValidation.queries ++\n"
        "      QueriesAnomaly.queries ++ QueriesTrend.queries ++\n"
        "      QueriesPipelineA.queries ++ QueriesPipelineB.queries ++\n"
        "      QueriesPipelineC.queries ++ QueriesSource.queries ++\n"
        "      QueriesSchema.queries ++ QueriesOperator.queries ++\n"
        "      QueriesBatch.queries ++ QueriesStreaming.queries")
    # widen helper visibility so the lane objects see them via
    # `import SparkEntry._`
    text = re.sub(r"(?m)^  private (val|def|lazy val) ",
                  r"  private[graft] \1 ", text)
    open(SRC, "w").write(text)
    for nm, content in out_files.items():
        open("src/main/scala/graft/%s.scala" % nm, "w").write(content)
        print("wrote", nm, len(content.splitlines()), "lines")
    print("SparkEntry now", len(text.splitlines()), "lines")


if __name__ == "__main__":
    main()
