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

/**
 * Driver contract: named queries (one per operator, SURVEY.md §2) with
 * DuckDB oracle SQL for the correctness gate.
 *
 * Parity discipline (so Spark output hash-matches the DuckDB oracle):
 *  - counts stay BIGINT on both sides;
 *  - money sums go through DECIMAL(28,6) (exact, order-independent) and
 *    are cast back to double;
 *  - float-fragile aggregates (avg/median/stddev-ish) are ROUNDed on
 *    BOTH sides, far above the engines' summation-order noise;
 *  - every result has a deterministic ORDER BY;
 *  - CURRENT_DATE/NOW are replaced by an injected fixed timestamp.
 */
object SparkEntry {

  private[graft] val NOW = "2026-01-01 00:00:00"

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** [[t]] with [[graft.pipeline.Par.spread]]: scale-adaptive read for
   *  query bodies whose first stage is an expensive aggregate / expand /
   *  percentile over a small fixture (a single-row-group parquet scans
   *  as ONE task, serializing the whole partial-aggregation pass while
   *  the other cores idle). At production partition counts spread is a
   *  no-op, so no shuffle is ever added to a large input. Use only
   *  where the per-row work dominates the added exchange (measured;
   *  cheap scan-aggregates like p01 stay on [[t]]). */
  private[graft] def tS(s: SparkSession, dir: String, name: String): DataFrame =
    graft.pipeline.Par.spread(t(s, dir, name))

  /** Run independent fixture actions CONCURRENTLY (optimization guide
   *  §2.6: actions are only sequential because driver code calls them
   *  sequentially; the scheduler back-fills one job's task tail with
   *  the next job's tasks). For query bodies that stage 2+ fixture
   *  writes to DISJOINT paths before the measured read — never for
   *  actions ordered by a crash-safety contract (store append before
   *  ledger row) or writes sharing one committer _temporary. */
  private[graft] def inParallel(actions: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    Await.result(
      Future.sequence(actions.map(a => Future(a()))), Duration.Inf)
  }

  /** events.parquet has carried several physical ts encodings across
   *  driver testdata generations — TIMESTAMP(NANOS) (read as long under
   *  spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS,
   *  isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). Normalize all of
   *  them to TimestampType via the shared [[graft.operators.TsNorm]]
   *  (UTC session → value-identical). */
  private[graft] def eventsTable(s: SparkSession, dir: String): DataFrame =
    graft.operators.TsNorm.normalizeTs(t(s, dir, "events"), "ts")

  private[graft] def anyToDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case b: java.math.BigDecimal => b.doubleValue
    case b: Boolean => if (b) 1.0 else 0.0
    case x => x.toString.toDouble
  }

  /** Literal path token authored inside every persisted-replay oracle
   *  SQL string. NEVER read directly by DuckDB: [[oracleSqlResolved]]
   *  substitutes the run-scoped [[stateRoot]] at dump time. */
  private[graft] val StateToken = "/tmp/graft_qstate"

  /** Root for persisted-replay query state. Defaults to the legacy
   *  shared dir (specs/dev); [[Verify]]/[[Bench]]/[[Soak]] override it
   *  with a run-scoped dir so a concurrent bench/soak/spec run can
   *  never swap state under a Verify artifact awaiting its DuckDB
   *  oracle read (the round-11 phantom-FAIL gotcha). */
  @volatile private[graft] var stateRoot: String = StateToken

  /** Scratch state dir for queries exercising the persistence layer
   *  (stores/engine). Wiped at every call so the query is idempotent —
   *  verify and bench can run it any number of times. */
  private[graft] def freshState(s: SparkSession, name: String): String = {
    val path = s"$stateRoot/$name"
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    path
  }

  /** Flagship: full profile of lineitem at the given SF; driver
   *  smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cat = Catalog(spark, dir)
    val p = Profiler.profile(
      t(spark, dir, "lineitem"), "lineitem", Some(cat.tableMeta("lineitem")))
    import spark.implicits._
    Seq((p.table, p.rowCount, p.columnCount, p.duplicateCount,
      p.healthScore, p.columns.size))
      .toDF("table_name", "row_count", "column_count", "duplicate_count",
        "health_score", "profiled_columns")
  }

  // ------------------------------------------------------------------
  // registry
  // ------------------------------------------------------------------

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicated name would silently drop one entry in the Map —
    // fail loudly instead (the gate artifacts key on these names)
    val dup = registry.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names in registry: ${dup.mkString(", ")}")
    registry.map(q => q.name -> q.fn).toMap
  }

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** [[oracleSql]] with the authored [[StateToken]] path rewritten to
   *  the live [[stateRoot]] — what Verify dumps, so the DuckDB oracle
   *  always reads the exact state THIS run wrote. */
  def oracleSqlResolved: Map[String, String] =
    oracleSql.map { case (k, v) => k -> v.replace(StateToken, stateRoot) }

  lazy val registry: Seq[Q] =
    QueriesProfiler.queries ++ QueriesValidation.queries ++
      QueriesAnomaly.queries ++ QueriesTrend.queries ++
      QueriesPipelineA.queries ++ QueriesPipelineB.queries ++
      QueriesPipelineC.queries ++ QueriesSource.queries ++
      QueriesSchema.queries ++ QueriesOperator.queries ++
      QueriesBatch.queries ++ QueriesStreaming.queries

  // ------------------------------------------------------------------
  // P-series: profiling operators
  // ------------------------------------------------------------------



  // ------------------------------------------------------------------
  // V-series: validation rule engine
  // ------------------------------------------------------------------

  /** Hand-picked rule battery exercising V1/V2 end-to-end: each rule's
   *  scalar SQL runs through Runner (spark.sql + Evaluator), the oracle
   *  recomputes the same scalar + comparison in DuckDB. */
  private[graft] def batteryRules: Seq[(ValidationRule, String, String)] = Seq(
    (ValidationRule("check_lineitem_not_empty", "rows > 0",
      "SELECT COUNT(*) FROM lineitem", "greater_than", 0),
      "SELECT COUNT(*) FROM lineitem", "actual > 0"),
    (ValidationRule("check_lineitem_pk_unique", "pk dupes = 0",
      """SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS c
        |FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1) d"""
        .stripMargin, "equals", 0),
      """SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS c
        FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1) d""",
      "actual = 0"),
    (ValidationRule("check_l_quantity_positive", "no negatives",
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0", "equals", 0),
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0", "actual = 0"),
    (ValidationRule("check_l_tax_not_zero", "no zero tax",
      "SELECT COUNT(*) FROM lineitem WHERE l_tax = 0", "equals", 0),
      "SELECT COUNT(*) FROM lineitem WHERE l_tax = 0", "actual = 0"),
    (ValidationRule("check_o_totalprice_not_zero", "no zero price",
      "SELECT COUNT(*) FROM orders WHERE o_totalprice = 0", "equals", 0),
      "SELECT COUNT(*) FROM orders WHERE o_totalprice = 0", "actual = 0"),
    (ValidationRule("check_customer_row_cap", "rows < 1e6",
      "SELECT COUNT(*) FROM customer", "less_than", 1000000),
      "SELECT COUNT(*) FROM customer", "actual < 1000000"),
    (ValidationRule("check_c_acctbal_between", "avg balance in range",
      "SELECT AVG(c_acctbal) FROM customer", "between", Seq(-100000, 100000)),
      "SELECT AVG(c_acctbal) FROM customer",
      "actual BETWEEN -100000 AND 100000"),
    (ValidationRule("check_o_orderdate_reasonable", "no pre-1970 dates",
      "SELECT COUNT(*) FROM orders WHERE o_orderdate < '1970-01-01'", "equals", 0),
      "SELECT COUNT(*) FROM orders WHERE o_orderdate < TIMESTAMP '1970-01-01 00:00:00'",
      "actual = 0"),
    // P22: varchar max-length violation (default_validations.py:229-234)
    (ValidationRule("check_c_mktsegment_max_length", "length <= 10",
      "SELECT COUNT(*) FROM customer WHERE LENGTH(c_mktsegment) > 10", "equals", 0),
      "SELECT COUNT(*) FROM customer WHERE LENGTH(c_mktsegment) > 10",
      "actual = 0"))



  // ------------------------------------------------------------------
  // A-series: anomaly detection over the events daily series
  // ------------------------------------------------------------------

  /** Daily event-count series per event_type: 5 series × 30 days.
   *  Counts are integers → exact doubles on both engines. */
  private[graft] def dailySeries(s: SparkSession, d: String): DataFrame =
    eventsTable(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("value"))

  private[graft] val duckDailySeries =
    """SELECT event_type, CAST(ts AS DATE) AS day,
      CAST(COUNT(*) AS DOUBLE) AS value FROM events GROUP BY 1, 2"""

  /** Shared a12/a13/t11 fixture: global-zscore anomalies over a
   *  double-spiked daily series (day 15 ×10 → medium, day 28 ×8 → low;
   *  a single global-zscore series can't hold a >5σ point AND a second
   *  ≥3σ point, so 'high' is structurally absent), persisted as two
   *  scans (run_at 01-20 / 01-31), then triaged with three bulk status
   *  updates. Last update wins per row; only 'resolved' stamps
   *  resolved_at/by (api.py:299-307) and they are never cleared. */
  private[graft] def triagedAnomalyStore(
      s: SparkSession, d: String, name: String): graft.history.AnomaliesStore = {
    val store = new graft.history.AnomaliesStore(s,
      freshState(s, name) + "/anomaly_results")
    val spiked = dailySeries(s, d).withColumn("value",
      when(col("day") === lit(java.sql.Date.valueOf("2024-01-15")),
        col("value") * 10)
        .when(col("day") === lit(java.sql.Date.valueOf("2024-01-28")),
          col("value") * 8)
        .otherwise(col("value")))
    val hits = Anomalies.zscore(spiked, Seq("event_type"), "day", "value")
      .filter(col("is_anomaly"))
      .select(col("event_type").as("table_name"),
        lit("").as("column_name"), lit("daily_events").as("metric_name"),
        col("day").cast("timestamp").as("ts"),
        col("value").as("metric_value"),
        col("score"), col("is_anomaly"), col("threshold"), col("severity"))
      .withColumn("method", lit("zscore"))
    val cut = lit(java.sql.Date.valueOf("2024-01-20")).cast("timestamp")
    store.append(hits.filter(col("ts") <= cut),
      java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    store.append(hits.filter(col("ts") > cut),
      java.sql.Timestamp.valueOf("2024-01-31 00:00:00"))
    store.updateStatusWhere(col("severity") === "medium", "resolved",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      Some("spike explained"), Some("analyst"))
    store.updateStatusWhere(col("table_name") === "view", "acknowledged",
      java.sql.Timestamp.valueOf("2024-02-02 00:00:00"))
    store.updateStatusWhere(col("table_name") === "error", "expected",
      java.sql.Timestamp.valueOf("2024-02-03 00:00:00"))
    store
  }

  /** DuckDB replay of the triaged store: same spiked series, same
   *  global zscore, same sequential-update semantics folded into CASE
   *  expressions (error → expected and view → acknowledged overwrite
   *  the earlier medium → resolved status but keep its stamps/clear its
   *  note, because later updates pass note = NULL). */
  private[graft] val duckTriagedAnomalies =
    s"""WITH series0 AS ($duckDailySeries),
      series AS (SELECT event_type, day,
        CASE WHEN day = DATE '2024-01-15' THEN value * 10
          WHEN day = DATE '2024-01-28' THEN value * 8
          ELSE value END AS value
        FROM series0),
      st AS (SELECT event_type, day, value,
        AVG(value) OVER (PARTITION BY event_type) AS m,
        STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
        COUNT(value) OVER (PARTITION BY event_type) AS n
        FROM series),
      scored AS (SELECT event_type, day, value,
        CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw
        FROM st WHERE n >= 2),
      hits AS (SELECT event_type AS table_name, day, value AS metric_value,
        CASE WHEN raw > 5.0 THEN 'high' WHEN raw > 3.5 THEN 'medium'
          ELSE 'low' END AS severity,
        CASE WHEN day <= DATE '2024-01-20'
          THEN TIMESTAMP '2024-01-20 00:00:00'
          ELSE TIMESTAMP '2024-01-31 00:00:00' END AS run_at
        FROM scored WHERE raw > 3.0),
      tri AS (SELECT table_name, day, metric_value, severity, run_at,
        CASE WHEN table_name = 'error' THEN 'expected'
          WHEN table_name = 'view' THEN 'acknowledged'
          WHEN severity = 'medium' THEN 'resolved'
          ELSE 'open' END AS status,
        CASE WHEN table_name IN ('error', 'view') THEN NULL
          WHEN severity = 'medium' THEN 'spike explained' END
          AS resolution_note,
        CASE WHEN severity = 'medium' THEN '2024-02-01 00:00:00' END
          AS resolved_at,
        CASE WHEN severity = 'medium' THEN 'analyst' END AS resolved_by
        FROM hits)"""



  // ------------------------------------------------------------------
  // B-series: batch multiplexer
  // ------------------------------------------------------------------



  // ------------------------------------------------------------------
  // T-series: trends / history analytics
  // ------------------------------------------------------------------



  // ------------------------------------------------------------------
  // D/E/X-series: LLM-data-pipeline operators
  // ------------------------------------------------------------------

  /** Full-model replay for the NB classifier: counts, Laplace
   *  smoothing, priors, unseen mass, integer micro-nat sums, argmax.
   *  Shared by x52 (batch training) and x53 (merged slice states) —
   *  the incremental path must reproduce the batch model exactly, so
   *  one oracle gates both. */
  private[graft] def nbOracle(testSelect: String, vocabCap: Option[Int]): String =
    nbOracleCtes(testSelect, vocabCap) + """
        SELECT doc_id, label AS predicted,
          CAST(score_micro AS BIGINT) AS score_micro
        FROM ranked WHERE rk = 1 ORDER BY doc_id"""

  /** The shared NB-replay CTE chain (train → model → score → ranked);
   *  callers append their own final SELECT over `ranked`/`test`. */
  private[graft] def nbOracleCtes(
      testSelect: String, vocabCap: Option[Int]): String = {
    // with a cap, the vocabulary is the top-N tokens by total count
    // (ties -> token asc) and the model is finished over the REDUCED
    // counts -- mirroring Classify.compactModel exactly
    val countsCte = vocabCap match {
      case None =>
        """counts AS (
          SELECT label, token, COUNT(*) AS cnt FROM ttok GROUP BY 1, 2),"""
      case Some(n) =>
        s"""counts_all AS (
          SELECT label, token, COUNT(*) AS cnt FROM ttok GROUP BY 1, 2),
        vrank AS (
          SELECT token FROM (
            SELECT token, SUM(cnt) AS t FROM counts_all GROUP BY token)
          ORDER BY t DESC, token LIMIT $n),
        counts AS (
          SELECT c.label, c.token, c.cnt
          FROM counts_all c JOIN vrank USING (token)),"""
    }
    s"""WITH train AS (
          SELECT * FROM documents WHERE doc_id % 5 <> 0),
        test AS ($testSelect),
        ttoks AS (
          SELECT source AS label,
            unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
          FROM train),
        ttok AS (SELECT label, token FROM ttoks WHERE len(token) > 0),
        $countsCte
        totals AS (SELECT label, SUM(cnt) AS tot FROM counts GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT token) AS v FROM counts),
        dpl AS (
          SELECT source AS label, COUNT(*) AS n_docs FROM train GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n FROM train),
        tok_lp AS (
          SELECT c.label, c.token,
            CAST(ROUND(ln((c.cnt + 1.0) / (t.tot + v.v)) * 1e6, 0)
              AS BIGINT) AS lp_micro
          FROM counts c JOIN totals t USING (label) CROSS JOIN vocab v),
        meta AS (
          SELECT d.label,
            CAST(ROUND(ln(CAST(d.n_docs AS DOUBLE) / nd.n) * 1e6, 0)
              AS BIGINT) AS prior_micro,
            CAST(ROUND(ln(1.0 / (t.tot + v.v)) * 1e6, 0)
              AS BIGINT) AS unseen_micro
          FROM dpl d JOIN totals t USING (label)
          CROSS JOIN vocab v CROSS JOIN nd),
        stoks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
          FROM test),
        stok AS (SELECT doc_id, token FROM stoks WHERE len(token) > 0),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM stok GROUP BY 1, 2),
        dlen AS (SELECT doc_id, SUM(tf) AS n_tok FROM tf GROUP BY 1),
        hits AS (
          SELECT tf.doc_id, l.label,
            SUM(tf.tf * l.lp_micro) AS hit_sum, SUM(tf.tf) AS hit_tf
          FROM tf JOIN tok_lp l USING (token) GROUP BY 1, 2),
        scored AS (
          SELECT dl.doc_id, m.label,
            m.prior_micro + COALESCE(h.hit_sum, 0)
              + (dl.n_tok - COALESCE(h.hit_tf, 0)) * m.unseen_micro
              AS score_micro
          FROM dlen dl CROSS JOIN meta m
          LEFT JOIN hits h ON h.doc_id = dl.doc_id AND h.label = m.label),
        ranked AS (
          SELECT doc_id, label, score_micro,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score_micro DESC, label) AS rk
          FROM scored)"""
  }

  private[graft] val nbOracleSql: String =
    nbOracle("SELECT * FROM documents WHERE doc_id % 5 = 0", None)



  /** DuckDB mirror of Catalog.keyIntegrity — every check rebuilt in SQL
   *  from the SAME declared sidecar keys, so the constants can't drift
   *  between engine and oracle. */
  private[graft] lazy val duckKeyIntegritySql: String = {
    val pk = graft.sources.Catalog.primaryKeys.toSeq.sortBy(_._1).map {
      case (t0, cols) =>
        val tuple =
          if (cols.size == 1) cols.head else cols.mkString("(", ", ", ")")
        // WHERE all-non-null mirrors the Spark side's filter — the two
        // engines disagree on partial-NULL tuples in COUNT(DISTINCT)
        val nonNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
        s"""SELECT '$t0' AS table_name,
           'pk:${cols.mkString(",")}' AS constraint_name,
           CAST(COUNT(*) - COUNT(DISTINCT $tuple) AS BIGINT) AS violations
           FROM $t0 WHERE $nonNull"""
    }
    val fk = graft.sources.Catalog.foreignKeys.toSeq.sortBy(_._1).flatMap {
      case (t0, fks) => fks.map { k =>
        // NOT EXISTS, not NOT IN: a single NULL parent key makes NOT IN
        // return UNKNOWN for every orphan (violations=0) while Spark's
        // left_anti still counts them — NOT EXISTS matches left_anti
        s"""SELECT '$t0' AS table_name,
           'fk:${k.column}->${k.refTable}.${k.refColumn}' AS constraint_name,
           CAST((SELECT COUNT(*) FROM $t0 c WHERE c.${k.column} IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM ${k.refTable} p
               WHERE p.${k.refColumn} = c.${k.column})) AS BIGINT)
             AS violations"""
      }
    }
    (pk ++ fk).mkString("\nUNION ALL\n") +
      "\nORDER BY table_name, constraint_name"
  }

  /** DuckDB mirror of Drift.correlations — same decimal moments, same
   *  final double formula, so results match bit-for-bit. */
  private[graft] lazy val duckCorrelationsSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val moments = pairs.flatMap { case (a, b) =>
      val both = s"$a IS NOT NULL AND $b IS NOT NULL"
      val x = s"CASE WHEN $both THEN CAST($a AS DECIMAL(19,6)) END"
      val y = s"CASE WHEN $both THEN CAST($b AS DECIMAL(19,6)) END"
      Seq(
        s"COUNT(CASE WHEN $both THEN 1 END) AS n_${a}_$b",
        s"CAST(SUM($x) AS DOUBLE) AS sx_${a}_$b",
        s"CAST(SUM($y) AS DOUBLE) AS sy_${a}_$b",
        s"CAST(SUM(CAST(($x) * ($y) AS DECIMAL(38,12))) AS DOUBLE) AS sxy_${a}_$b",
        s"CAST(SUM(CAST(($x) * ($x) AS DECIMAL(38,12))) AS DOUBLE) AS sxx_${a}_$b",
        s"CAST(SUM(CAST(($y) * ($y) AS DECIMAL(38,12))) AS DOUBLE) AS syy_${a}_$b")
    }.mkString(",\n  ")
    val rows = pairs.map { case (a, b) =>
      val (n, sx, sy) = (s"n_${a}_$b", s"sx_${a}_$b", s"sy_${a}_$b")
      val (sxy, sxx, syy) = (s"sxy_${a}_$b", s"sxx_${a}_$b", s"syy_${a}_$b")
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST($n AS BIGINT) AS n,
        CASE WHEN ($n * $sxx - $sx * $sx) > 0 AND ($n * $syy - $sy * $sy) > 0
        THEN ROUND(($n * $sxy - $sx * $sy)
          / sqrt(($n * $sxx - $sx * $sx) * ($n * $syy - $sy * $sy)), 6)
        ELSE NULL END AS corr FROM s"""
    }.mkString("\nUNION ALL\n")
    s"WITH s AS (SELECT\n  $moments\n FROM lineitem)\n$rows\nORDER BY col_a, col_b"
  }

  /** DuckDB mirror of TextAnalysis.gopherFilter — same token shapes,
   *  same stop list, rules compared on the same 6-dp-rounded signals. */
  private[graft] lazy val duckGopherFilterSql: String = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "was", "at", "by", "be")
    val inList = stop.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            t -> len(t) > 0) AS ts,
          len(regexp_replace(lower(trim(text)), '\\s', '', 'g')) AS nws
        FROM documents),
      sig AS (
        SELECT doc_id,
          CAST(len(ts) AS BIGINT) AS n_tokens,
          CASE WHEN len(ts) = 0 THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(nws AS DOUBLE) / len(ts), 6) END
            AS mean_token_len,
          CAST(len(list_filter(ts, t -> t IN ($inList))) AS BIGINT)
            AS n_stop,
          CASE WHEN len(ts) = 0 THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(len(list_filter(ts,
              t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(ts), 6)
            END AS alpha_frac
        FROM toks)
      SELECT doc_id, n_tokens, mean_token_len, n_stop, alpha_frac,
        CAST(CASE WHEN n_tokens >= 30 AND n_tokens <= 10000
          THEN 1 ELSE 0 END AS INT) AS wc_ok,
        CAST(CASE WHEN mean_token_len >= CAST(3.0 AS DOUBLE)
            AND mean_token_len <= CAST(10.0 AS DOUBLE)
          THEN 1 ELSE 0 END AS INT) AS mlen_ok,
        CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS stop_ok,
        CAST(CASE WHEN alpha_frac >= CAST(0.8 AS DOUBLE)
          THEN 1 ELSE 0 END AS INT) AS alpha_ok,
        CAST(CASE WHEN n_tokens >= 30 AND n_tokens <= 10000
            AND mean_token_len >= CAST(3.0 AS DOUBLE)
            AND mean_token_len <= CAST(10.0 AS DOUBLE)
            AND n_stop >= 2 AND alpha_frac >= CAST(0.8 AS DOUBLE)
          THEN 1 ELSE 0 END AS INT) AS keep
      FROM sig ORDER BY doc_id"""
  }

  /** DuckDB mirror of TextAnalysis.profileText — same regexes, same
   *  arithmetic, same rounding. */
  /** Shared by a19 (batch burn rate) and st13 (streaming hourly rollup
   *  + the same burnFromHourly stage) — identical math, one oracle. */
  private[graft] val sloOracleSql: String = """WITH h AS (
          SELECT date_trunc('hour', ts) AS hour,
            CAST(COUNT(*) AS BIGINT) AS total_1h,
            CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
              AS err_1h
          FROM events GROUP BY 1),
        w AS (
          SELECT hour, err_1h, total_1h,
            CAST(SUM(err_1h) OVER tw AS BIGINT) AS err_l,
            CAST(SUM(total_1h) OVER tw AS BIGINT) AS total_l
          FROM h
          WINDOW tw AS (ORDER BY hour RANGE BETWEEN
            INTERVAL 5 HOURS PRECEDING AND CURRENT ROW))
        SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
          err_1h, total_1h,
          CAST(ROUND(1e12 * CAST(err_1h AS DOUBLE)
            / CAST(total_1h * 250000 AS DOUBLE), 0) AS BIGINT)
            AS burn_short_ppm,
          CAST(ROUND(1e12 * CAST(err_l AS DOUBLE)
            / CAST(total_l * 250000 AS DOUBLE), 0) AS BIGINT)
            AS burn_long_ppm,
          (err_1h * 1000000000000 >= total_1h * 300000000000
            AND err_l * 1000000000000 >= total_l * 300000000000)
            AS page
        FROM w ORDER BY hour"""

  private[graft] lazy val duckMmrSql: String = {
    // 8 unrolled greedy-argmax steps: p{t} = ids selected so far,
    // every chained CTE MATERIALIZED: each s{t} reads p{t-1} twice and
    // p{t} reads both again, so inlined CTEs re-evaluate the whole
    // greedy tree ~3^t times (the shingle self-join included) --
    // materialization makes each step evaluate exactly once,
    // s{t} = step t's winner row. All arithmetic is floored integer
    // ppm, ties to the smaller id -- the exact mmrSelect contract.
    def step(t: Int): String = {
      val prev = s"p${t - 1}"
      s"""
        s$t AS MATERIALIZED (
          SELECT c.doc_id, c.rel_ppm, COALESCE(MAX(x.sim), 0) AS msim,
            (7 * c.rel_ppm) // 10
              - (3 * COALESCE(MAX(x.sim), 0)) // 10 AS mmr
          FROM cand c
          LEFT JOIN sim2 x ON x.a = c.doc_id
            AND x.b IN (SELECT doc_id FROM $prev)
          WHERE c.doc_id NOT IN (SELECT doc_id FROM $prev)
          GROUP BY c.doc_id, c.rel_ppm
          ORDER BY mmr DESC, c.doc_id LIMIT 1),
        p$t AS MATERIALIZED (SELECT doc_id FROM $prev
          UNION ALL SELECT doc_id FROM s$t)"""
    }
    val steps = (2 to 8).map(step).mkString(",", ",", "")
    val out = (1 to 8).map(t =>
      s"""SELECT $t AS rank, doc_id, mmr AS mmr_ppm, rel_ppm,
        CAST(msim AS BIGINT) AS max_sim_ppm FROM s$t""")
      .mkString("\n        UNION ALL ")
    s"""WITH candraw AS MATERIALIZED (
          SELECT doc_id, rel_micro
          FROM read_parquet('/tmp/graft_qstate/x105/cand/*.parquet')),
        cand AS MATERIALIZED (
          SELECT doc_id, rel_micro * 1000000
            // (SELECT MAX(rel_micro) FROM candraw) AS rel_ppm
          FROM candraw),
        toks AS (
          SELECT d.doc_id, list_filter(
            string_split_regex(lower(trim(d.text)), '\\s+'),
            t -> len(t) > 0) AS ts
          FROM documents d JOIN candraw c ON d.doc_id = c.doc_id),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        cp AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        simp AS (
          SELECT id_a, id_b,
            inter * 1000000 // (sa.sz + sb.sz - inter) AS sim
          FROM cp JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b),
        sim2 AS MATERIALIZED (
          SELECT id_a AS a, id_b AS b, sim FROM simp
          UNION ALL SELECT id_b, id_a, sim FROM simp),
        s1 AS MATERIALIZED (
          SELECT doc_id, rel_ppm, 0 AS msim, (7 * rel_ppm) // 10 AS mmr
          FROM cand ORDER BY mmr DESC, doc_id LIMIT 1),
        p1 AS MATERIALIZED (SELECT doc_id FROM s1)$steps
        $out
        ORDER BY rank"""
  }

  private[graft] lazy val duckTextProfileSql: String = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "was", "at", "by", "be")
    def hits(ws: Seq[String]): String = {
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN ($inList)))"
    }
    val stopHits = hits(stop)
    val langs = Seq(
      "en" -> Seq("the", "and", "of", "to", "is"),
      "de" -> Seq("der", "die", "und", "ist", "das"),
      "fr" -> Seq("le", "la", "les", "et", "est"),
      "es" -> Seq("el", "los", "las", "es", "una"))
    val langScores = langs.map { case (l, ws) => l -> hits(ws) }
    val bestExpr = langScores.map(_._2).map(e => s"($e)")
      .mkString("GREATEST(", ", ", ")")
    val pickExpr = langScores.reverse.foldLeft("'und'") {
      case (acc, (l, sc)) =>
        s"CASE WHEN ($sc) = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH base AS (
      SELECT doc_id, text,
        LENGTH(text) AS n_chars,
        CASE WHEN LENGTH(trim(text)) = 0 THEN 0
          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]'))
          AS n_subwords,
        CASE WHEN LENGTH(text) = 0 THEN 0.0
          ELSE CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
            AS DOUBLE) / LENGTH(text) END AS alpha_r,
        CASE WHEN LENGTH(text) = 0 THEN 0.0
          ELSE CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))
            AS DOUBLE) / LENGTH(text) END AS punct_r,
        ($stopHits) AS stop_hits,
        $bestExpr AS best,
        LENGTH(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk
      FROM documents),
    b2 AS (
      SELECT doc_id, n_tokens, n_subwords, alpha_r, punct_r,
        CASE WHEN n_tokens = 0 THEN 0.0
          ELSE CAST(stop_hits AS DOUBLE) / n_tokens END AS stop_r,
        CASE WHEN n_chars < 20 THEN 0.0 WHEN n_chars > 20000 THEN 0.25
          ELSE 1.0 END AS len_score,
        CASE WHEN cjk > 0 THEN 'zh' ELSE $pickExpr END AS lang_detected
      FROM base)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      CAST(n_subwords AS BIGINT) AS n_subwords,
      ROUND(alpha_r, 6) AS alpha_ratio,
      ROUND(punct_r, 6) AS punct_ratio,
      ROUND(stop_r, 6) AS stopword_ratio,
      ROUND(len_score * 0.4 + LEAST(alpha_r * 1.25, 1.0) * 0.3
        + (1.0 - LEAST(punct_r * 4.0, 1.0)) * 0.2
        + LEAST(stop_r * 5.0, 1.0) * 0.1, 6) AS quality_score,
      lang_detected
    FROM b2 ORDER BY doc_id"""
  }

  // ------------------------------------------------------------------
  // S-series: sources / catalog
  // ------------------------------------------------------------------



  // ------------------------------------------------------------------
  // J-series: custom operators beyond Spark's built-ins
  // ------------------------------------------------------------------

  /** As-of join, checked against DuckDB's NATIVE ASOF JOIN: each event
    * attaches the latest per-type daily summary at-or-before its ts. */


  /** Shared by j07 (batch asof+check) and st23 (stream-static
   *  enrichment): the gap-injected daily version table — per-type
   *  daily summaries with 1-day validity, every third day REMOVED so
   *  real validity gaps exist. */
  private[graft] def pitVersionHist(s: SparkSession, d: String): DataFrame =
    eventsTable(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("daily_count"))
      .filter(pmod(datediff(col("day"), lit("1970-01-01")), lit(3)) =!= 0)
      .select(col("event_type"),
        col("day").cast("timestamp").as("valid_from"),
        date_add(col("day"), 1).cast("timestamp").as("valid_to"),
        col("daily_count"))

  /** One oracle for BOTH PIT paths — the naive theta join over the
   *  validity windows. Any semantic fix applies to batch and stream
   *  at once (the x114/st22 discipline). */
  private[graft] val pitOracleSql: String =
    """WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS BIGINT) AS daily_count
          FROM events GROUP BY 1, 2),
        hist AS (
          SELECT event_type, CAST(day AS TIMESTAMP) AS valid_from,
            CAST(day + INTERVAL 1 DAY AS TIMESTAMP) AS valid_to,
            daily_count
          FROM daily
          WHERE date_diff('day', DATE '1970-01-01', day) % 3 <> 0)
        SELECT e.event_id, e.event_type,
          strftime(h.valid_from, '%Y-%m-%d %H:%M:%S') AS version_from,
          h.daily_count
        FROM events e LEFT JOIN hist h
          ON e.event_type = h.event_type
          AND e.ts >= h.valid_from AND e.ts < h.valid_to
        ORDER BY e.event_id"""

  // ------------------------------------------------------------------
  // C-series: schema-change detection
  // ------------------------------------------------------------------

  /** C1+C2+C6: snapshot the real catalog, apply a declared mutation to
   *  derive the "previous" snapshot (drop table supplier; drop column
   *  l_tax; retype o_totalprice; re-key region), diff, classify. The
   *  oracle re-states the EXPECTED diff of that declared mutation. */


  // ------------------------------------------------------------------
  // ST-series: Structured Streaming operators, oracle-gated.
  //
  // Each query drives a REAL bounded stream (file source →
  // Trigger.AvailableNow → memory sink) through the StreamingDetect
  // operators and compares the drained sink against the batch-
  // equivalent DuckDB SQL. `maxFilesPerTrigger` is set far above the
  // fixture's file count so the whole input lands in ONE micro-batch —
  // that pins the stateful operators' first-seen/arrival-order
  // semantics to something the batch oracle can express (min doc_id,
  // ts-sorted series). The checkpoint lives in freshState so every
  // invocation reprocesses the full input (idempotent for verify/bench
  // reruns).
  // ------------------------------------------------------------------

  private[graft] def runBoundedStream(
      s: SparkSession,
      df: DataFrame,
      name: String,
      mode: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = freshState(s, name) + "/ckpt"
    // Stateful streaming ops pay a FIXED per-partition state-store
    // setup cost each micro-batch; at gate scale the state is tiny, so
    // 32 partitions is almost pure overhead (stream-stream join: one
    // store per side per partition). Cap partitions for the bounded
    // run — results are partition-count independent; production
    // streams size this by config to the real state volume.
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, math.min(prev.toInt, 8).toString)
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set(key, prev)
    s.table(name)
  }

  /** Streaming read of a fixture parquet with the batch reader's schema
   *  (file streams need one declared up front). The file source only
   *  accepts directories, and the fixtures are single files — stage a
   *  symlink inside a scratch dir (copy if the fs refuses links). */
  private[graft] def streamOf(s: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val srcDir =
      if (!f.isFile) path
      else {
        val dir = java.nio.file.Paths.get(
          freshState(s, "stream_in_" + f.getName.replace('.', '_')))
        java.nio.file.Files.createDirectories(dir)
        val link = dir.resolve(f.getName)
        try java.nio.file.Files.createSymbolicLink(link, f.toPath)
        catch {
          case _: Exception => java.nio.file.Files.copy(f.toPath, link)
        }
        dir.toString
      }
    s.readStream
      .schema(s.read.parquet(path).schema)
      .option("maxFilesPerTrigger", 1000000)
      .parquet(srcDir)
  }

  /** Streaming twin of [[eventsTable]]: same encoding normalization on
   *  the unbounded frame (TsNorm is a plan-time rewrite, so it applies
   *  to streaming frames unchanged). */
  private[graft] def eventsStream(s: SparkSession, dir: String): DataFrame =
    graft.operators.TsNorm.normalizeTs(
      streamOf(s, s"$dir/events.parquet"), "ts")



  /** Shared by x114 (batch) and st22 (streaming): the two paths are
   *  the SAME contract, so any oracle fix applies to both at once. */
  private[graft] val transitionsOracleSql: String =
    """WITH s AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS nxt
        FROM events WHERE user_id IS NOT NULL),
      tr AS (SELECT event_type AS from_type, nxt AS to_type,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, SUM(n) AS t FROM tr GROUP BY 1)
      SELECT from_type, to_type, n,
        CAST(n * 1000000 // t AS BIGINT) AS p_ppm
      FROM tr JOIN tot USING (from_type)
      ORDER BY from_type, to_type"""
}
