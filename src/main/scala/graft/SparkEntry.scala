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

  private val NOW = "2026-01-01 00:00:00"

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has carried several physical ts encodings across
   *  driver testdata generations — TIMESTAMP(NANOS) (read as long under
   *  spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS,
   *  isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). Normalize all of
   *  them to TimestampType via the shared [[graft.operators.TsNorm]]
   *  (UTC session → value-identical). */
  private[graft] def eventsTable(s: SparkSession, dir: String): DataFrame =
    graft.operators.TsNorm.normalizeTs(t(s, dir, "events"), "ts")

  private def anyToDouble(v: Any): Double = v match {
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
    profilerQueries ++ validationQueries ++ anomalyQueries ++
      trendQueries ++ pipelineQueries ++ sourceQueries ++ schemaQueries ++
      operatorQueries ++ batchQueries ++ streamingQueries

  // ------------------------------------------------------------------
  // P-series: profiling operators
  // ------------------------------------------------------------------

  private def profilerQueries: Seq[Q] = Seq(
    Q("p01_row_count",
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("row_count")),
      Some("SELECT COUNT(*) AS row_count FROM lineitem")),

    Q("p02_null_counts",
      (s, d) => {
        val df = t(s, d, "lineitem")
        val aggs = df.columns.toSeq.map(c =>
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"${c}_nulls"))
        df.agg(aggs.head, aggs.tail: _*)
      },
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        val exprs = cols.map(c =>
          s"CAST(COUNT(*) - COUNT($c) AS BIGINT) AS ${c}_nulls").mkString(", ")
        s"SELECT $exprs FROM lineitem"
      }),

    Q("p03_distinct_counts",
      (s, d) => {
        val df = t(s, d, "lineitem")
        val aggs = df.columns.toSeq.map(c =>
          countDistinct(col(c)).as(s"${c}_distinct"))
        df.agg(aggs.head, aggs.tail: _*)
      },
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        val exprs = cols.map(c =>
          s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS ${c}_distinct").mkString(", ")
        s"SELECT $exprs FROM lineitem"
      }),

    Q("p04_duplicate_rows",
      (s, d) => {
        val df = t(s, d, "lineitem")
        df.groupBy(df.columns.map(col).toSeq: _*).count()
          .agg(coalesce(sum(col("count") - 1L), lit(0L)).as("duplicate_count"))
      },
      Some("""SELECT CAST(COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS BIGINT) AS duplicate_count FROM lineitem""")),

    Q("p05_numeric_stats",
      (s, d) => t(s, d, "lineitem").agg(
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        sum(col("l_quantity").cast("decimal(28,6)")).cast("double").as("qty_sum"),
        (sum(col("l_quantity").cast("decimal(28,6)")).cast("double") /
          count(col("l_quantity"))).as("qty_mean"),
        min(col("l_extendedprice")).as("price_min"),
        max(col("l_extendedprice")).as("price_max"),
        sum(col("l_extendedprice").cast("decimal(28,6)")).cast("double").as("price_sum"),
        (sum(col("l_extendedprice").cast("decimal(28,6)")).cast("double") /
          count(col("l_extendedprice"))).as("price_mean"),
        min(col("l_discount")).as("disc_min"),
        max(col("l_discount")).as("disc_max"),
        sum(col("l_discount").cast("decimal(28,6)")).cast("double").as("disc_sum")),
      Some("""SELECT
        MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty_sum,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS qty_mean,
        MIN(l_extendedprice) AS price_min, MAX(l_extendedprice) AS price_max,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS price_sum,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS price_mean,
        MIN(l_discount) AS disc_min, MAX(l_discount) AS disc_max,
        CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS disc_sum
        FROM lineitem""")),

    Q("p06_sign_buckets",
      (s, d) => t(s, d, "lineitem").agg(
        coalesce(sum(when(col("l_discount") === 0.0, 1L).otherwise(0L)), lit(0L)).as("zero_count"),
        coalesce(sum(when(col("l_discount") < 0.0, 1L).otherwise(0L)), lit(0L)).as("negative_count"),
        coalesce(sum(when(col("l_discount") > 0.0, 1L).otherwise(0L)), lit(0L)).as("positive_count")),
      Some("""SELECT
        CAST(COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS BIGINT) AS zero_count,
        CAST(COUNT(CASE WHEN l_discount < 0 THEN 1 END) AS BIGINT) AS negative_count,
        CAST(COUNT(CASE WHEN l_discount > 0 THEN 1 END) AS BIGINT) AS positive_count
        FROM lineitem""")),

    // stddev via exact integer moments (l_quantity is integral): both
    // engines compute identical doubles from identical exact sums.
    Q("p07_stddev",
      (s, d) => t(s, d, "lineitem").agg(
        count(col("l_quantity")).as("n"),
        sum(col("l_quantity")).as("s1"),
        sum(col("l_quantity") * col("l_quantity")).as("s2"))
        .select(
          col("n"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("stddev_samp"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
            .as("stddev_pop")),
      Some("""WITH m AS (SELECT COUNT(l_quantity) AS n, SUM(l_quantity) AS s1,
          SUM(l_quantity * l_quantity) AS s2 FROM lineitem)
        SELECT CAST(n AS BIGINT) AS n,
          SQRT((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp,
          SQRT((s2 - s1 * s1 / n) / n) AS stddev_pop
        FROM m""")),

    Q("p08_median_quantiles",
      (s, d) => t(s, d, "lineitem").agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_median"),
        round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_q1"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("qty_q3"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("price_median")),
      Some("""SELECT
        ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_median,
        ROUND(quantile_cont(l_quantity, 0.25), 6) AS qty_q1,
        ROUND(quantile_cont(l_quantity, 0.75), 6) AS qty_q3,
        ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS price_median
        FROM lineitem""")),

    Q("p10_string_lengths",
      (s, d) => t(s, d, "orders").agg(
        min(length(col("o_orderpriority"))).cast("long").as("prio_minlen"),
        max(length(col("o_orderpriority"))).cast("long").as("prio_maxlen"),
        (sum(length(col("o_orderpriority"))).cast("double") /
          count(col("o_orderpriority"))).as("prio_avglen"),
        min(length(col("o_orderstatus"))).cast("long").as("status_minlen"),
        max(length(col("o_orderstatus"))).cast("long").as("status_maxlen")),
      Some("""SELECT
        CAST(MIN(LENGTH(o_orderpriority)) AS BIGINT) AS prio_minlen,
        CAST(MAX(LENGTH(o_orderpriority)) AS BIGINT) AS prio_maxlen,
        CAST(SUM(LENGTH(o_orderpriority)) AS DOUBLE) / COUNT(o_orderpriority) AS prio_avglen,
        CAST(MIN(LENGTH(o_orderstatus)) AS BIGINT) AS status_minlen,
        CAST(MAX(LENGTH(o_orderstatus)) AS BIGINT) AS status_maxlen
        FROM orders""")),

    Q("p11_empty_strings",
      (s, d) => t(s, d, "customer").agg(
        coalesce(sum(when(col("c_name") === "", 1L).otherwise(0L)), lit(0L)).as("name_empty"),
        coalesce(sum(when(col("c_mktsegment") === "", 1L).otherwise(0L)), lit(0L)).as("segment_empty")),
      Some("""SELECT
        CAST(COUNT(CASE WHEN c_name = '' THEN 1 END) AS BIGINT) AS name_empty,
        CAST(COUNT(CASE WHEN c_mktsegment = '' THEN 1 END) AS BIGINT) AS segment_empty
        FROM customer""")),

    Q("p12_date_range",
      (s, d) => t(s, d, "orders").agg(
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("min_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_date")),
      Some("""SELECT
        strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
        strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
        FROM orders""")),

    Q("p13_future_past_dates",
      (s, d) => t(s, d, "orders").agg(
        coalesce(sum(when(col("o_orderdate") > lit(java.sql.Timestamp.valueOf(NOW)), 1L)
          .otherwise(0L)), lit(0L)).as("future_count"),
        coalesce(sum(when(col("o_orderdate") <= lit(java.sql.Timestamp.valueOf(NOW)), 1L)
          .otherwise(0L)), lit(0L)).as("past_count")),
      Some(s"""SELECT
        CAST(COUNT(CASE WHEN o_orderdate > TIMESTAMP '$NOW' THEN 1 END) AS BIGINT) AS future_count,
        CAST(COUNT(CASE WHEN o_orderdate <= TIMESTAMP '$NOW' THEN 1 END) AS BIGINT) AS past_count
        FROM orders""")),

    Q("p14_top_values",
      (s, d) =>
        Profiler.topValues(t(s, d, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), 10)
          .orderBy(col("column_name"), col("count").desc, col("value")),
      Some("""WITH unpivoted AS (
          SELECT 'l_returnflag' AS column_name, l_returnflag AS value FROM lineitem
          UNION ALL
          SELECT 'l_linestatus' AS column_name, l_linestatus AS value FROM lineitem),
        counted AS (
          SELECT column_name, value, COUNT(*) AS count FROM unpivoted
          WHERE value IS NOT NULL GROUP BY column_name, value),
        ranked AS (
          SELECT column_name, value, count,
            ROW_NUMBER() OVER (PARTITION BY column_name
              ORDER BY count DESC, value) AS rk
          FROM counted)
        SELECT column_name, value, CAST(count AS BIGINT) AS count
        FROM ranked WHERE rk <= 10
        ORDER BY column_name, count DESC, value""")),

    // 3σ outlier count with deterministic bounds from exact moments
    Q("p15_outliers_3sigma",
      (s, d) => {
        val df = t(s, d, "lineitem")
        val stats = df.agg(
          count(col("l_quantity")).as("n"),
          sum(col("l_quantity")).as("s1"),
          sum(col("l_quantity") * col("l_quantity")).as("s2"))
          .select(
            (col("s1") / col("n")).as("mean"),
            sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
              .as("sd"))
        df.crossJoin(broadcast(stats))
          .filter(col("l_quantity") > col("mean") + lit(3.0) * col("sd") ||
            col("l_quantity") < col("mean") - lit(3.0) * col("sd"))
          .agg(count(lit(1)).as("outlier_count"))
      },
      Some("""WITH m AS (SELECT COUNT(l_quantity) AS n, SUM(l_quantity) AS s1,
          SUM(l_quantity * l_quantity) AS s2 FROM lineitem),
        st AS (SELECT s1 / n AS mean,
          SQRT((s2 - s1 * s1 / n) / (n - 1)) AS sd FROM m)
        SELECT CAST(COUNT(*) AS BIGINT) AS outlier_count
        FROM lineitem, st
        WHERE l_quantity > st.mean + 3.0 * st.sd
           OR l_quantity < st.mean - 3.0 * st.sd""")),

    Q("p16_null_rate",
      (s, d) => eventsTable(s, d).agg(
        count(lit(1)).as("total_rows"),
        coalesce(sum(when(col("props").isNull, 1L).otherwise(0L)), lit(0L)).as("null_count"))
        .select(col("total_rows"), col("null_count"),
          (col("null_count") * lit(100.0) / col("total_rows")).as("null_percentage")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
        CAST(COUNT(*) - COUNT(props) AS BIGINT) AS null_count,
        (COUNT(*) - COUNT(props)) * 100.0 / COUNT(*) AS null_percentage
        FROM events""")),

    Q("p17_dominant_category",
      (s, d) => {
        val df = t(s, d, "lineitem")
        val total = df.agg(count(lit(1)).as("total"))
        df.filter(col("l_linestatus").isNotNull)
          .groupBy("l_linestatus").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .filter(col("cnt") * 100.0 / col("total") > 95.0)
          .agg(count(lit(1)).as("dominant_count"))
      },
      Some("""WITH val_counts AS (
          SELECT l_linestatus, COUNT(*) AS cnt,
            COUNT(*) * 100.0 / (SELECT COUNT(*) FROM lineitem) AS pct
          FROM lineitem WHERE l_linestatus IS NOT NULL GROUP BY l_linestatus)
        SELECT CAST(COUNT(*) AS BIGINT) AS dominant_count
        FROM val_counts WHERE pct > 95.0""")),

    Q("p18_fk_cardinality",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_suppkey").isNotNull)
        .agg(when(countDistinct(col("l_suppkey")) === 1, 1L).otherwise(0L)
          .as("single_value_flag")),
      Some("""SELECT CAST(CASE WHEN (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem
        WHERE l_suppkey IS NOT NULL) = 1 THEN 1 ELSE 0 END AS BIGINT) AS single_value_flag""")),

    Q("p19_freshness",
      (s, d) => eventsTable(s, d).agg(
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("latest_timestamp"),
        floor((unix_timestamp(lit(NOW)) - unix_timestamp(max(col("ts")))) / 3600)
          .as("hours_since_update")),
      Some(s"""SELECT
        strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_timestamp,
        CAST(FLOOR((epoch(TIMESTAMP '$NOW') - FLOOR(epoch(MAX(ts)))) / 3600) AS BIGINT) AS hours_since_update
        FROM events""")),

    Q("p20_pattern_match",
      (s, d) => Profiler.patternMatch(t(s, d, "customer"), "c_mktsegment",
        "^(BUILDING|MACHINERY)"),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS total_count,
        CAST(COUNT(CASE WHEN c_mktsegment IS NOT NULL
          AND regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)') THEN 1 END) AS BIGINT) AS matching_count,
        CAST(COUNT(CASE WHEN c_mktsegment IS NOT NULL
          AND NOT regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)') THEN 1 END) AS BIGINT) AS non_matching_count,
        CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT) AS null_count,
        ROUND(COUNT(CASE WHEN c_mktsegment IS NOT NULL
          AND regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)') THEN 1 END) * 100.0 / COUNT(*), 6) AS matching_percentage,
        ROUND(COUNT(CASE WHEN c_mktsegment IS NOT NULL
          AND NOT regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)') THEN 1 END) * 100.0 / COUNT(*), 6) AS non_matching_percentage
        FROM customer""")),

    // P21: email/phone/postal format checks (the Validations family-9
    // predicates, default_validations.py:255-300) counted over customer
    // with deterministic synthesized invalids — every Nth key is
    // corrupted the same way on both engines, so the counts are real
    // format-check behavior, not an always-zero tautology.
    Q("p21_format_checks",
      (s, d) => {
        val email = lower(concat(regexp_replace(col("c_name"), " ", "."),
          when(col("c_custkey") % 5 === 0, "_at_acme.com")
            .otherwise("@acme.com")))
        // the sf customer table carries no phone/postal columns, so both
        // are synthesized from c_custkey the same way on both engines
        val phone = when(col("c_custkey") % 7 === 0,
          concat(lit("PHONE-"), col("c_custkey").cast("string")))
          .otherwise(concat(col("c_custkey").cast("string"), lit("-555-0100")))
        val postal = when(col("c_custkey") % 11 === 0, lit(" A "))
          .otherwise(lpad((col("c_custkey") % 100000).cast("string"), 5, "0"))
        t(s, d, "customer").agg(
          count(lit(1)).as("total_rows"),
          coalesce(sum(when(!email.like("%@%.%"), 1L).otherwise(0L)), lit(0L))
            .as("email_invalid"),
          coalesce(sum(when(!phone.rlike("^(\\+)?[0-9][0-9 ()-]+$"), 1L)
            .otherwise(0L)), lit(0L)).as("phone_invalid"),
          coalesce(sum(when(length(trim(postal)) < 3, 1L).otherwise(0L)), lit(0L))
            .as("postal_invalid"))
      },
      Some("""WITH c AS (
          SELECT lower(concat(replace(c_name, ' ', '.'),
              CASE WHEN c_custkey % 5 = 0 THEN '_at_acme.com'
                ELSE '@acme.com' END)) AS email,
            CASE WHEN c_custkey % 7 = 0 THEN concat('PHONE-', c_custkey)
              ELSE concat(c_custkey, '-555-0100') END AS phone,
            CASE WHEN c_custkey % 11 = 0 THEN ' A '
              ELSE lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') END
              AS postal
          FROM customer)
        SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
          CAST(COUNT(CASE WHEN email NOT LIKE '%@%.%' THEN 1 END) AS BIGINT)
            AS email_invalid,
          CAST(COUNT(CASE WHEN NOT regexp_matches(phone,
            '^(\+)?[0-9][0-9 ()-]+$') THEN 1 END) AS BIGINT) AS phone_invalid,
          CAST(COUNT(CASE WHEN LENGTH(TRIM(postal)) < 3 THEN 1 END) AS BIGINT)
            AS postal_invalid
        FROM c""")),

    Q("p24_health_scores",
      (s, d) => {
        val cat = Catalog(s, d)
        import s.implicits._
        // resolve each table handle ONCE: spark.read.parquet reads the
        // footer eagerly, so the old loop (rowCounts + schemaOf +
        // tableMeta each opening the table) paid three serial footer
        // rounds per table — the dominant cost of this query. Counts
        // still run as ONE union-all job over the resolved handles.
        val resolved = cat.listTables().map(tn => tn -> cat.table(tn))
        val counts = cat.rowCountsResolved(resolved)
        val rows = resolved.map { case (tn, df) =>
          val schema = df.schema
          val meta = cat.tableMeta(tn, schema)
          val nullableFrac =
            if (schema.isEmpty) 0.0
            else schema.count(_.nullable).toDouble / schema.length
          (tn, Profiler.healthScore(meta.primaryKeys.nonEmpty, counts(tn),
            nullableFrac, schema.length))
        }
        rows.toDF("table_name", "health_score").orderBy("table_name")
      },
      Some {
        // parquet columns are always nullable → −15 applies everywhere;
        // every test table has a declared PK in the sidecar (−0); none
        // has >50 columns (−0); −30 only if the table is empty.
        val tables = Seq("customer", "documents", "embeddings", "events",
          "lineitem", "nation", "orders", "part", "region", "supplier")
        tables.map(tn =>
          s"""SELECT '$tn' AS table_name, CAST(100 - 15 -
             (CASE WHEN (SELECT COUNT(*) FROM $tn) = 0 THEN 30 ELSE 0 END)
             AS INT) AS health_score""").mkString(" UNION ALL ") +
          " ORDER BY table_name"
      }),

    Q("p26_tier_limited_profile",
      (s, d) => {
        import s.implicits._
        // tier-limited = the cheap pass: approx distinct/percentile, no
        // duplicate scan, no top-K, no histograms — the reference's
        // low-depth tier collects basic stats only (collector.py:150-165;
        // the exact mode is oracle-checked elsewhere; here the oracle
        // pins only shape + counts)
        val p = Profiler.profile(t(s, d, "lineitem"), "lineitem",
          exact = false, maxColumns = 5, includeDuplicates = false,
          includeDistributions = false, topKMaxColumns = 0)
        Seq((p.table, p.columnCount.toLong, p.columns.size.toLong, p.rowCount))
          .toDF("table_name", "column_count", "profiled_columns", "row_count")
      },
      Some("""SELECT 'lineitem' AS table_name,
        CAST((SELECT COUNT(*) FROM (DESCRIBE lineitem)) AS BIGINT) AS column_count,
        CAST(5 AS BIGINT) AS profiled_columns,
        (SELECT COUNT(*) FROM lineitem) AS row_count""")),

    // the 100 TB scan mode: HLL distinct + approximate percentile — no
    // expand explosion, constant memory; benched alongside the exact path.
    // Oracle lane: the sketches can't hash-match DuckDB, so the query
    // emits TOLERANCE VERDICTS (|approx−exact| within the sketch's
    // published error: HLL rsd 5%, percentile_approx accuracy 1000) and
    // the oracle pins them TRUE plus the exact row count — a failed
    // sketch flips a boolean and the hash mismatches.
    Q("p27_profile_approx_mode",
      (s, d) => {
        val df = t(s, d, "lineitem")
        val exprs = Profiler.aggExprs(df.schema, exact = false,
          java.sql.Timestamp.valueOf(NOW))
        val approx = df.agg(exprs.head, exprs.tail: _*)
          .select(col("__row_count").as("row_count"),
            col("l_orderkey__distinct").as("__ad_ok"),
            col("l_quantity__distinct").as("__ad_qty"),
            col("l_extendedprice__median").as("__am_price"))
        // exact distinct twin on just the 2 checked columns (pruned
        // scan; the battery's shuffle is shared via exchange reuse)
        val exactD = df.agg(
          countDistinct(col("l_orderkey")).as("__ed_ok"),
          countDistinct(col("l_quantity")).as("__ed_qty"))
        // median check by RANK, not value: the fraction of rows ≤ the
        // approx median must sit at 0.5 ± 1% (accuracy 1000 ⇒ rank
        // error ≤ 0.1%). A map-only conditional sum — an exact
        // percentile here would cost more than the whole approx lane
        // and this query's bench number is the approx lane's cost.
        val rank = df
          .select(col("l_extendedprice").cast("double").as("__p"))
          .crossJoin(broadcast(approx.select(col("__am_price"))))
          .agg((sum(when(col("__p") <= col("__am_price"), 1L).otherwise(0L))
            .cast("double") / count(col("__p"))).as("__mfrac"))
        // tolerance = 3σ of the sketch's rsd (0.05 × 3 = 15%), with a
        // small absolute floor for tiny cardinalities (l_quantity has
        // ~50 and HLL++ bias correction wobbles a few counts). rsd is a
        // STANDARD DEVIATION, not a bound — a 1σ gate would flip on
        // ~1/3 of regenerated fixtures with no code bug, and the gate's
        // job is catching broken sketches (off by orders), not grading
        // precision.
        def withinRel(a: Column, e: Column, tol: Double,
            absFloor: Double = 0.0): Column =
          abs(a.cast("double") - e.cast("double")) <=
            greatest(e.cast("double") * tol, lit(absFloor))
        approx.crossJoin(exactD).crossJoin(rank) // 1 row × 1 row × 1 row
          .select(
            col("row_count"),
            withinRel(col("__ad_ok"), col("__ed_ok"), 0.15)
              .as("distinct_orderkey_ok"),
            withinRel(col("__ad_qty"), col("__ed_qty"), 0.15, absFloor = 5.0)
              .as("distinct_quantity_ok"),
            (abs(col("__mfrac") - 0.5) <= 0.01).as("median_price_ok"))
      },
      Some("""SELECT (SELECT COUNT(*) FROM lineitem) AS row_count,
        TRUE AS distinct_orderkey_ok, TRUE AS distinct_quantity_ok,
        TRUE AS median_price_ok""")),

    Q("p28_histogram",
      // P28 / §1.3 distribution_data: 10 equal-width buckets over
      // l_extendedprice — two shuffle-free passes (min/max, then
      // conditional counts), densified to exactly 10 rows
      (s, d) => Profiler.histogram(t(s, d, "lineitem"), "l_extendedprice", 10)
        .select(col("bucket").cast("long").as("bucket"),
          col("lo"), col("hi"), col("cnt"))
        .orderBy("bucket"),
      Some("""WITH stats AS (
          SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS mn,
                 CAST(MAX(l_extendedprice) AS DOUBLE) AS mx
          FROM lineitem),
        binned AS (
          SELECT CASE WHEN mx = mn THEN 0
            ELSE LEAST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mn)
              / ((mx - mn) / CAST(10 AS DOUBLE))) AS INT), 9) END AS bucket
          FROM lineitem, stats WHERE l_extendedprice IS NOT NULL),
        counts AS (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM binned GROUP BY bucket)
        SELECT b.bucket,
          ROUND(mn + b.bucket * ((mx - mn) / CAST(10 AS DOUBLE)), 6) AS lo,
          ROUND(mn + (b.bucket + 1) * ((mx - mn) / CAST(10 AS DOUBLE)), 6) AS hi,
          COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt
        FROM (SELECT unnest(range(0, 10)) AS bucket) b
        CROSS JOIN stats
        LEFT JOIN counts c USING (bucket)
        ORDER BY bucket""")),

    Q("p29_incremental_profile",
      // mergeable profiling: two disjoint slice states combined WITHOUT
      // rescanning data must equal the whole-table aggregates. Exactly-
      // mergeable fields only (integral-valued columns ⇒ order-free
      // double sums); the HLL distinct estimate is pinned by
      // IncrementalProfileSpec instead (sketch not SQL-portable).
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        val even = li.filter(col("l_orderkey") % 2 === 0)
        val odd = li.filter(col("l_orderkey") % 2 =!= 0)
        IncrementalProfile.merge(
          IncrementalProfile.sliceState(even, "even")
            .unionByName(IncrementalProfile.sliceState(odd, "odd")))
          .select(col("column"), col("cnt"), col("nulls"),
            col("mn"), col("mx"), col("sm"))
          .orderBy("column")
      },
      Some {
        val cols = Seq("l_orderkey", "l_linenumber", "l_quantity")
        cols.map(c =>
          s"""SELECT '$c' AS "column",
             CAST(COUNT($c) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS nulls,
             CAST(MIN($c) AS DOUBLE) AS mn,
             CAST(MAX($c) AS DOUBLE) AS mx,
             CAST(SUM($c) AS DOUBLE) AS sm
           FROM lineitem""").mkString(" UNION ALL ") +
          """ ORDER BY "column""""
      }),

    Q("p30_correlations",
      // pairwise Pearson correlation in ONE pass: decimal-exact moments,
      // identical final double formula on both engines
      (s, d) => graft.profiler.Drift.correlations(t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("col_a", "col_b"),
      Some(duckCorrelationsSql)),

    Q("x17_distribution_drift",
      // categorical drift (KL/JS/TV, add-one smoothing) between the
      // first and second half of the events month; nano-quantized terms
      // so the tiny double sums are order-independent
      (s, d) => {
        val ev = eventsTable(s, d)
        graft.profiler.Drift.categoricalDrift(
          ev.filter(col("ts") < lit("2024-01-16").cast("timestamp")),
          ev.filter(col("ts") >= lit("2024-01-16").cast("timestamp")),
          "event_type")
      },
      Some("""WITH b AS (
          SELECT event_type AS category, COUNT(*) AS n_before FROM events
          WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
        a AS (
          SELECT event_type AS category, COUNT(*) AS n_after FROM events
          WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
        j AS (
          SELECT COALESCE(b.category, a.category) AS category,
            COALESCE(n_before, 0) AS n_before,
            COALESCE(n_after, 0) AS n_after
          FROM b FULL OUTER JOIN a ON b.category = a.category),
        t AS (SELECT SUM(n_before) AS tb, SUM(n_after) AS ta,
          COUNT(*) AS k FROM j),
        f AS (SELECT
            CAST(n_before + 1 AS DOUBLE) / (tb + k) AS p,
            CAST(n_after + 1 AS DOUBLE) / (ta + k) AS q
          FROM j CROSS JOIN t),
        g AS (SELECT p, q, (p + q) / 2 AS m FROM f)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
          ROUND(CAST(SUM(CAST(ROUND(p * ln(p / q) * 1e9, 0) AS BIGINT))
            AS DOUBLE) / 1e9, 6) AS kl_pq,
          ROUND(CAST(SUM(CAST(ROUND((p * ln(p / m) / 2 + q * ln(q / m) / 2)
            * 1e9, 0) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS js,
          ROUND(CAST(SUM(CAST(ROUND(abs(p - q) * 1e9, 0) AS BIGINT))
            AS DOUBLE) / 2e9, 6) AS total_variation
        FROM g""")),

    Q("x18_numeric_psi",
      // numeric drift: PSI over 10 equal-width bins of events.value,
      // first vs second half of the month; same nano-quantized sums
      (s, d) => {
        val ev = eventsTable(s, d)
        graft.profiler.Drift.numericDrift(
          ev.filter(col("ts") < lit("2024-01-16").cast("timestamp")),
          ev.filter(col("ts") >= lit("2024-01-16").cast("timestamp")),
          "value", bins = 10)
      },
      Some("""WITH b AS (
          SELECT value FROM events
          WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL),
        a AS (
          SELECT value FROM events
          WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL),
        bounds AS (
          SELECT CAST(MIN(value) AS DOUBLE) AS mn,
            CAST(MAX(value) AS DOUBLE) AS mx
          FROM (SELECT value FROM b UNION ALL SELECT value FROM a)),
        bb AS (SELECT CASE WHEN mx = mn THEN 0
            ELSE LEAST(9, CAST(FLOOR((CAST(value AS DOUBLE) - mn)
              / ((mx - mn) / 10)) AS BIGINT)) END AS bin
          FROM b CROSS JOIN bounds),
        ab AS (SELECT CASE WHEN mx = mn THEN 0
            ELSE LEAST(9, CAST(FLOOR((CAST(value AS DOUBLE) - mn)
              / ((mx - mn) / 10)) AS BIGINT)) END AS bin
          FROM a CROSS JOIN bounds),
        bc AS (SELECT bin, COUNT(*) AS n_before FROM bb GROUP BY 1),
        ac AS (SELECT bin, COUNT(*) AS n_after FROM ab GROUP BY 1),
        j AS (SELECT COALESCE(bc.bin, ac.bin) AS bin,
            COALESCE(n_before, 0) AS n_before, COALESCE(n_after, 0) AS n_after
          FROM bc FULL OUTER JOIN ac ON bc.bin = ac.bin),
        t AS (SELECT SUM(n_before) AS tb, SUM(n_after) AS ta,
          COUNT(*) AS k FROM j),
        f AS (SELECT CAST(n_before + 1 AS DOUBLE) / (tb + k) AS p,
            CAST(n_after + 1 AS DOUBLE) / (ta + k) AS q
          FROM j CROSS JOIN t)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
          ROUND(CAST(SUM(CAST(ROUND((p - q) * ln(p / q) * 1e9, 0) AS BIGINT))
            AS DOUBLE) / 1e9, 6) AS psi
        FROM f""")),

    Q("p33_percentile_rank",
      // quantile-normalization lookup table: percent_rank computed from
      // value counts (cardinality-sized ordered frame), never a global
      // row sort — identical statistic, 100 TB-safe
      (s, d) => graft.profiler.Drift.percentileRanks(
          t(s, d, "lineitem"), "l_quantity")
        .orderBy("value"),
      Some("""WITH c AS (
          SELECT CAST(l_quantity AS DOUBLE) AS value, COUNT(*) AS cnt
          FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
        t AS (SELECT SUM(cnt) AS n FROM c),
        r AS (SELECT value, cnt,
          COALESCE(SUM(cnt) OVER (ORDER BY value
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
          FROM c)
        SELECT value, CAST(cnt AS BIGINT) AS cnt,
          CASE WHEN n = 1 THEN 0.0
            ELSE ROUND(CAST(lt AS DOUBLE) / (n - 1), 6) END
            AS percentile_rank
        FROM r CROSS JOIN t ORDER BY value""")),

    Q("x33_group_profile",
      // per-source profile: the whole per-column battery grouped by a
      // segment column in ONE hash agg — here a representative slice
      // (row count, text nulls/distinct, n_chars stats, lang distinct)
      (s, d) => graft.profiler.Profiler.profileByGroup(
          t(s, d, "documents"), "source")
        .select(col("source"), col("__row_count"),
          col("text__nulls"), col("text__distinct"),
          col("n_chars__min").cast("long").as("n_chars_min"),
          col("n_chars__max").cast("long").as("n_chars_max"),
          col("n_chars__sum").cast("long").as("n_chars_sum"),
          round(col("n_chars__mean"), 6).as("n_chars_mean"),
          col("lang__distinct"))
        .orderBy("source"),
      Some("""SELECT source,
          CAST(COUNT(*) AS BIGINT) AS __row_count,
          CAST(COUNT(*) - COUNT(text) AS BIGINT) AS text__nulls,
          CAST(COUNT(DISTINCT text) AS BIGINT) AS text__distinct,
          CAST(MIN(n_chars) AS BIGINT) AS n_chars_min,
          CAST(MAX(n_chars) AS BIGINT) AS n_chars_max,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum,
          ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS n_chars_mean,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS lang__distinct
        FROM documents GROUP BY source ORDER BY source""")),

    Q("x34_fd_check",
      // functional-dependency probe l_orderkey → l_returnflag: per-order
      // flag consistency + the table-level violation rate
      (s, d) => graft.profiler.Profiler.fdViolations(
          t(s, d, "lineitem"), Seq("l_orderkey"), "l_returnflag")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("violates"), 1L).otherwise(0L)).cast("long")
            .as("violating_groups"),
          round(sum(when(col("violates"), 1L).otherwise(0L)).cast("double")
            / count(lit(1)), 6).as("violation_rate")),
      Some("""WITH g AS (
          SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS k
          FROM lineitem GROUP BY l_orderkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
          CAST(COUNT(*) FILTER (k > 1) AS BIGINT) AS violating_groups,
          ROUND(CAST(COUNT(*) FILTER (k > 1) AS DOUBLE) / COUNT(*), 6)
            AS violation_rate
        FROM g""")),

    Q("p34_entropy",
      // Shannon entropy of a categorical column (skew/id-ness signal):
      // one combined groupBy to value counts, micro-nat-exact fold
      (s, d) => graft.profiler.Drift.entropy(
        t(s, d, "lineitem"), "l_returnflag"),
      Some("""WITH c AS (
          SELECT l_returnflag AS v, COUNT(*) AS cnt
          FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS distinct_values,
          CAST(SUM(cnt) AS BIGINT) AS n_rows,
          ROUND(ln(CAST(SUM(cnt) AS DOUBLE))
            + CAST(SUM(CAST(ROUND(-(cnt * ln(CAST(cnt AS DOUBLE))) * 1e6, 0)
                AS BIGINT)) AS DOUBLE) / 1e6 / SUM(cnt), 6) AS entropy
        FROM c""")),

    Q("p35_approx_top_values",
      // P14's 100 TB path: mergeable frequent-items sketch (Misra–Gries)
      // built map-side, treeReduce-merged — zero shuffle vs the exact
      // path's (column, value) groupBy. Capacity 1024 ≫ the 25/150
      // distinct brands/types, so the sketch never purges and every
      // estimate is EXACT — the oracle compares against plain GROUP BY
      // top-10 with the same (count desc, value) tiebreak.
      (s, d) => Profiler.approxTopValues(
          t(s, d, "part"), Seq("p_brand", "p_type"), k = 10)
        .select(col("column_name"), col("value"), col("estimate"))
        .orderBy(col("column_name"), col("estimate").desc, col("value")),
      Some("""WITH b AS (
          SELECT 'p_brand' AS column_name, p_brand AS value,
            CAST(COUNT(*) AS BIGINT) AS estimate
          FROM part GROUP BY p_brand
          ORDER BY estimate DESC, value LIMIT 10),
        c AS (
          SELECT 'p_type' AS column_name, p_type AS value,
            CAST(COUNT(*) AS BIGINT) AS estimate
          FROM part GROUP BY p_type
          ORDER BY estimate DESC, value LIMIT 10)
        SELECT column_name, value, estimate
        FROM (SELECT * FROM b UNION ALL SELECT * FROM c)
        ORDER BY column_name, estimate DESC, value""")),

    Q("p36_equidepth_histogram",
      // quantile-binned histogram (the skew-robust complement of p28's
      // equal-width bins). Edge-replay oracle: interpolated percentile
      // edges are float-fragile to recompute bit-identically across
      // engines, so Spark persists its raw-precision edge table and
      // DuckDB re-buckets every lineitem row against those same bits —
      // the bucketing join, boundary semantics (interior edges go
      // right, last bin closed) and counts are all verified; the edge
      // computation itself is pinned by ProfilerSparkSpec.
      (s, d) => {
        val li = t(s, d, "lineitem")
        val path = freshState(s, "p36") + "/edges"
        Profiler.quantileEdges(li, "l_extendedprice", 8)
          .write.mode("overwrite").parquet(path)
        // re-read the persisted edges: Spark and DuckDB then bucket
        // against the SAME bits by construction
        Profiler.histogramWithEdges(li, "l_extendedprice", s.read.parquet(path))
      },
      Some("""WITH e AS (
          SELECT bucket, lo, hi,
            MAX(bucket) OVER () AS lastb
          FROM read_parquet('/tmp/graft_qstate/p36/edges/*.parquet')),
        counted AS (
          SELECT e.bucket, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lineitem l JOIN e
            ON l.l_extendedprice >= e.lo
           AND (l.l_extendedprice < e.hi
                OR (e.bucket = e.lastb AND l.l_extendedprice <= e.hi))
          GROUP BY e.bucket)
        SELECT e.bucket, ROUND(e.lo, 6) AS lo, ROUND(e.hi, 6) AS hi,
          COALESCE(c.cnt, 0) AS cnt
        FROM e LEFT JOIN counted c ON e.bucket = c.bucket
        ORDER BY e.bucket""")),

    Q("p37_mergeable_quantiles",
      // mergeable quantiles (LogSketch: DDSketch-style fixed log-binned
      // buckets, α = 1%) — the quantile column IncrementalProfile's
      // mergeable states couldn't carry. Slice states built
      // independently on the even/odd halves merge by pure count
      // addition into EXACTLY the single-pass whole-table sketch
      // (asserted cell for cell), and the merged estimates land within
      // the sketch's relative-error bound of exact percentiles. Oracle
      // lane: p27 pattern — the sketch isn't SQL-portable, so the
      // query emits equality/tolerance verdicts the oracle pins TRUE,
      // plus the exact non-null count.
      (s, d) => {
        import graft.profiler.LogSketch
        val alpha = 0.01
        val li = t(s, d, "lineitem")
        val cn = "l_extendedprice"
        val even = LogSketch.sliceState(
          li.filter(col("l_orderkey") % 2 === 0), cn, alpha, "even")
        val odd = LogSketch.sliceState(
          li.filter(col("l_orderkey") % 2 =!= 0), cn, alpha, "odd")
        // the sketch is O(log range / α) rows — cache it so the merge-
        // exactness arm and the quantile walk don't re-derive the
        // slice scans (in production the states are PERSISTED; the
        // cache stands in for the store)
        val merged = LogSketch.merge(even.unionByName(odd)).cache()
        val full = LogSketch.merge(LogSketch.sliceState(li, cn, alpha, "full"))
        val mergeExact = merged
          .select(col("lane"), col("bucket"), col("cnt").as("__m"))
          .join(full.select(col("lane"), col("bucket"), col("cnt").as("__f")),
            Seq("lane", "bucket"), "full")
          .agg(coalesce(bool_and(col("__m") === col("__f")), lit(true))
            .as("merge_exact"))
        val ests = LogSketch.quantiles(merged, alpha, Seq(0.5, 0.9, 0.99))
          .agg(
            max(when(col("q") === 0.5, col("estimate"))).as("__e50"),
            max(when(col("q") === 0.9, col("estimate"))).as("__e90"),
            max(when(col("q") === 0.99, col("estimate"))).as("__e99"),
            max(col("n")).as("n"))
        // verify by RANK, not by exact percentile (p27's recipe): the
        // fraction of rows ≤ each estimate must sit near q. One
        // map-only conditional-sum pass against the broadcast 1-row
        // estimate frame — an exact percentile would be the one
        // super-linear aggregate in an otherwise scan-bound query
        // (the first soak measured exactly that: 6.4× at 10× data).
        // 0.05 tolerance: α=1% value error → sub-1% rank drift on this
        // distribution; the gate's job is catching broken sketches.
        val rank = li.select(col(cn).cast("double").as("__v"))
          .where(col("__v").isNotNull)
          .crossJoin(broadcast(ests.select("__e50", "__e90", "__e99")))
          .agg(
            (sum(when(col("__v") <= col("__e50"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("__f50"),
            (sum(when(col("__v") <= col("__e90"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("__f90"),
            (sum(when(col("__v") <= col("__e99"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("__f99"))
        ests.crossJoin(rank).crossJoin(mergeExact) // 1 row × 1 × 1
          .select(col("n"), col("merge_exact"),
            (abs(col("__f50") - 0.5) <= 0.05).as("p50_ok"),
            (abs(col("__f90") - 0.9) <= 0.05).as("p90_ok"),
            (abs(col("__f99") - 0.99) <= 0.05).as("p99_ok"))
      },
      Some("""SELECT CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
        TRUE AS merge_exact, TRUE AS p50_ok, TRUE AS p90_ok,
        TRUE AS p99_ok FROM lineitem""")),

    Q("p38_mergeable_topk",
      // mergeable heavy hitters with deterministic bounds — the top-K
      // member of the mergeable-state family (p29 count/sum/HLL, p37
      // quantiles). Four slice states (l_orderkey % 4) each keep exact
      // counts only for values with k·f_s > n_s (O(k) state); the
      // merge brackets every candidate's global count in
      // [lower, upper] by pure integer arithmetic. Unlike Misra–Gries
      // the merged numbers are order-independent and exact, so the
      // ENTIRE operator replays in DuckDB — full row-hash oracle, and
      // in_bounds doubles as the bracketing proof.
      (s, d) => {
        import graft.profiler.MergeableTopK
        val k = 8
        val li = t(s, d, "lineitem")
        // states are O(k) rows per slice — cache the union so the
        // merge's per-slice totals pass doesn't re-derive the slice
        // scans (production persists these states; the cache stands in)
        val states = (0 until 4).map(i =>
          MergeableTopK.sliceState(
            li.filter(col("l_orderkey") % 4 === i),
            "l_linenumber", k, s"s$i"))
          .reduce(_ unionByName _).cache()
        val exact = li.where(col("l_linenumber").isNotNull)
          .groupBy(col("l_linenumber").cast("string").as("value"))
          .agg(count(lit(1)).as("__f"))
        MergeableTopK.merge(states, k)
          .join(exact, Seq("value"))
          .select(col("value"), col("lower"), col("upper"),
            col("slices_present"),
            col("__f").between(col("lower"), col("upper")).as("in_bounds"))
          .orderBy(col("lower").desc, col("value"))
      },
      Some("""WITH d AS (
          SELECT l_orderkey % 4 AS slice,
            CAST(l_linenumber AS VARCHAR) AS value
          FROM lineitem WHERE l_linenumber IS NOT NULL),
        c AS (SELECT slice, value, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        t AS (SELECT slice, SUM(cnt) AS n FROM c GROUP BY 1),
        cand AS (
          SELECT c.slice, c.value, c.cnt, t.n
          FROM c JOIN t USING (slice) WHERE c.cnt * 8 > t.n),
        mt AS (SELECT SUM(n // 8) AS miss_all FROM t),
        m AS (
          SELECT value, SUM(cnt) AS lower, SUM(n // 8) AS miss_present,
            COUNT(*) AS slices_present
          FROM cand GROUP BY 1),
        ex AS (
          SELECT CAST(l_linenumber AS VARCHAR) AS value, COUNT(*) AS f
          FROM lineitem WHERE l_linenumber IS NOT NULL GROUP BY 1)
        SELECT m.value, CAST(m.lower AS BIGINT) AS lower,
          CAST(m.lower + mt.miss_all - m.miss_present AS BIGINT) AS upper,
          CAST(m.slices_present AS BIGINT) AS slices_present,
          ex.f BETWEEN m.lower
            AND m.lower + mt.miss_all - m.miss_present AS in_bounds
        FROM m CROSS JOIN mt JOIN ex ON ex.value = m.value
        ORDER BY 2 DESC, 1""")),

    Q("p39_state_store_profile",
      // the mergeable families as a PERSISTED profiling service: three
      // "daily" slices (l_orderkey % 3) are each profiled ONCE into the
      // slice-state store (battery + quantile + top-K lanes, slice_id-
      // partitioned parquet), then the merged profile of slices 1∪2 is
      // answered purely from the persisted states — the excluded
      // slice's files are partition-pruned, no data rescan. Oracle:
      // exact mergeable fields recomputed from the equivalent row
      // subset (p29's lane; the HLL/quantile/top-K lanes are pinned by
      // StateStoreSpec since their states aren't SQL-portable).
      (s, d) => {
        import graft.profiler.SliceStateStore
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        val store = new SliceStateStore(s, freshState(s, "p39"))
        (0 until 3).foreach(i => store.record(
          li.filter(col("l_orderkey") % 3 === i), s"s$i",
          quantileCols = Seq("l_quantity"),
          topKCol = Some("l_linenumber"), k = 8))
        store.profile(Seq("s1", "s2"))
          .select(col("column"), col("cnt"), col("nulls"),
            col("mn"), col("mx"), col("sm"))
          .orderBy("column")
      },
      Some {
        val cols = Seq("l_orderkey", "l_linenumber", "l_quantity")
        cols.map(c =>
          s"""SELECT '$c' AS "column",
             CAST(COUNT($c) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS nulls,
             CAST(MIN($c) AS DOUBLE) AS mn,
             CAST(MAX($c) AS DOUBLE) AS mx,
             CAST(SUM($c) AS DOUBLE) AS sm
           FROM lineitem WHERE l_orderkey % 3 IN (1, 2)""")
          .mkString(" UNION ALL ") + """ ORDER BY "column""""
      }),

    Q("p40_state_drift",
      // drift monitoring WITHOUT rescanning data — the op the slice-
      // state store unlocks: PSI between the two half-months of
      // events.value computed purely from their PERSISTED LogSketch
      // states (fixed log-scale cells need no combined-range pass, so
      // slices profiled on different days still compare cell-for-
      // cell). Replay oracle: DuckDB reads the same persisted states
      // and re-derives the smoothed nano-quantized PSI — merge and
      // score arithmetic verified end-to-end (bucketing itself is
      // pinned by p37/st09's rank checks and LogSketchSpec).
      (s, d) => {
        import graft.profiler.{Drift, LogSketch}
        val ev = eventsTable(s, d)
        val state = freshState(s, "p40")
        LogSketch.sliceState(
            ev.filter(col("ts") < lit("2024-01-16").cast("timestamp")),
            "value", 0.01, "h1")
          .write.mode("overwrite").parquet(state + "/h1")
        LogSketch.sliceState(
            ev.filter(col("ts") >= lit("2024-01-16").cast("timestamp")),
            "value", 0.01, "h2")
          .write.mode("overwrite").parquet(state + "/h2")
        Drift.driftFromStates(
          s.read.parquet(state + "/h1"), s.read.parquet(state + "/h2"))
      },
      Some("""WITH b AS (SELECT lane, bucket, cnt
          FROM read_parquet('/tmp/graft_qstate/p40/h1/*.parquet')),
        a AS (SELECT lane, bucket, cnt
          FROM read_parquet('/tmp/graft_qstate/p40/h2/*.parquet')),
        bc AS (SELECT lane, bucket, SUM(cnt) AS n_before
          FROM b GROUP BY 1, 2),
        ac AS (SELECT lane, bucket, SUM(cnt) AS n_after
          FROM a GROUP BY 1, 2),
        j AS (SELECT
            COALESCE(bc.lane, ac.lane) AS lane,
            COALESCE(bc.bucket, ac.bucket) AS bucket,
            COALESCE(n_before, 0) AS n_before,
            COALESCE(n_after, 0) AS n_after
          FROM bc FULL OUTER JOIN ac
            ON bc.lane = ac.lane AND bc.bucket = ac.bucket),
        t AS (SELECT SUM(n_before) AS tb, SUM(n_after) AS ta,
          COUNT(*) AS k FROM j),
        f AS (SELECT CAST(n_before + 1 AS DOUBLE) / (tb + k) AS p,
            CAST(n_after + 1 AS DOUBLE) / (ta + k) AS q
          FROM j CROSS JOIN t)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
          ROUND(CAST(SUM(CAST(ROUND((p - q) * ln(p / q) * 1e9, 0) AS BIGINT))
            AS DOUBLE) / 1e9, 6) AS psi
        FROM f""")),

    Q("p31_ks_drift",
      // exact two-sample Kolmogorov–Smirnov D between odd- and even-order
      // lineitem prices; distributed prefix sums via range buckets (no
      // global sort) — the ECDF values are exact integer-count ratios
      (s, d) => {
        val li = t(s, d, "lineitem")
        graft.profiler.Drift.ksDrift(
          li.filter(col("l_orderkey") % 2 === 1),
          li.filter(col("l_orderkey") % 2 === 0),
          "l_extendedprice")
      },
      Some("""WITH d AS (
          SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_orderkey % 2 AS par
          FROM lineitem WHERE l_extendedprice IS NOT NULL),
        g AS (SELECT v,
            SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS cb,
            SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS ca
          FROM d GROUP BY v),
        t AS (SELECT SUM(cb) AS nb, SUM(ca) AS na, COUNT(*) AS nv FROM g),
        c AS (SELECT
            SUM(cb) OVER (ORDER BY v) AS fb,
            SUM(ca) OVER (ORDER BY v) AS fa
          FROM g)
        SELECT CAST(t.nb AS BIGINT) AS n_before,
          CAST(t.na AS BIGINT) AS n_after,
          CAST(t.nv AS BIGINT) AS n_values,
          ROUND(MAX(ABS(CAST(fb AS DOUBLE) / t.nb
            - CAST(fa AS DOUBLE) / t.na)), 6) AS ks
        FROM c CROSS JOIN t GROUP BY t.nb, t.na, t.nv""")),

    Q("p32_mutual_info",
      // mutual information + chi-square + Cramér's V between returnflag
      // and linestatus; one groupBy to cells, windows over the cell frame
      (s, d) => graft.profiler.Drift.mutualInformation(
        t(s, d, "lineitem"), "l_returnflag", "l_linestatus"),
      Some("""WITH d AS (
          SELECT l_returnflag AS a, l_linestatus AS b FROM lineitem
          WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL),
        cells AS (SELECT a, b, COUNT(*) AS nab FROM d GROUP BY a, b),
        m AS (SELECT a, b, nab,
            SUM(nab) OVER (PARTITION BY a) AS na,
            SUM(nab) OVER (PARTITION BY b) AS nb,
            SUM(nab) OVER () AS n
          FROM cells),
        agg AS (SELECT MAX(n) AS n, COUNT(*) AS n_cells,
            COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb,
            SUM(CAST(ROUND((CAST(nab AS DOUBLE) / n)
              * LN(CAST(nab AS DOUBLE) * n / (CAST(na AS DOUBLE) * nb))
              * 1e9, 0) AS BIGINT)) AS mi_nano,
            SUM(CAST(ROUND(
              (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * nb / n)
              * (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * nb / n)
              / (CAST(na AS DOUBLE) * nb / n) * 1e9, 0) AS BIGINT))
              AS chi_nano,
            SUM(CAST(ROUND((CAST(na AS DOUBLE) * nb / n) * 1e9, 0)
              AS BIGINT)) AS e_nano
          FROM m)
        SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
          CAST(ka AS BIGINT) AS ka, CAST(kb AS BIGINT) AS kb,
          ROUND(CAST(mi_nano AS DOUBLE) / 1e9, 6) AS mi,
          ROUND(CAST(chi_nano AS DOUBLE) / 1e9 + CAST(n AS DOUBLE)
            - CAST(e_nano AS DOUBLE) / 1e9, 6) AS chi2,
          CASE WHEN LEAST(ka, kb) > 1 THEN
            ROUND(SQRT(ROUND(CAST(chi_nano AS DOUBLE) / 1e9
              + CAST(n AS DOUBLE) - CAST(e_nano AS DOUBLE) / 1e9, 6)
              / (CAST(n AS DOUBLE) * (LEAST(ka, kb) - 1))), 6)
          ELSE NULL END AS cramers_v
        FROM agg""")),

    Q("a10_mad_global",
      // robust z-score (median/MAD, Iglewicz–Hoaglin 3.5 cutoff) over the
      // daily per-type series; exact percentile medians, two window
      // passes over one shuffle
      (s, d) => Anomalies.mad(dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          COUNT(value) OVER (PARTITION BY event_type) AS n,
          quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS med
          FROM series),
        m2 AS (SELECT event_type, day, value, n, med,
          quantile_cont(ABS(value - med), 0.5)
            OVER (PARTITION BY event_type) AS madv
          FROM st),
        scored AS (SELECT event_type, day, value,
          CASE WHEN madv = 0 THEN 0.0
            ELSE ABS(value - med) / (CAST(1.4826 AS DOUBLE) * madv) END
            AS raw
          FROM m2 WHERE n >= 2)
        SELECT event_type, day, value, ROUND(raw, 6) AS score,
          raw > 3.5 AS is_anomaly, CAST(3.5 AS DOUBLE) AS threshold,
          CASE WHEN raw > 7.0 THEN 'high' WHEN raw > 5.0 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a11_ewma",
      // EWMA control chart over the daily per-type series: truncated
      // exponential weights over the 7 prior points, classic
      // σ·√(λ/(2−λ)) control scale; array fold over the collected
      // trailing frame — bounded state, one shuffle, engine-replayable
      (s, d) => Anomalies.ewma(dailySeries(s, d), Seq("event_type"),
          "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("ewma"), 6).as("ewma"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        base AS (SELECT event_type, day, value,
          list(value) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS arr,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd
          FROM series),
        f AS (SELECT event_type, day, value, sd,
          list_sum(list_transform(range(0, 7),
            i -> arr[i+1] * POW(0.7, 6 - i)))
            / ((1 - POW(0.7, 7)) / 0.3) AS ew
          FROM base WHERE len(arr) = 7),
        scored AS (SELECT event_type, day, value, ew, sd,
          sd * SQRT(0.3 / 1.7) AS scale,
          CASE WHEN sd * SQRT(0.3 / 1.7) = 0 THEN 0.0
            ELSE ABS((value - ew) / (sd * SQRT(0.3 / 1.7))) END AS raw
          FROM f)
        SELECT event_type, day, value, ROUND(ew, 6) AS ewma,
          ROUND(raw, 6) AS score,
          (scale <> 0 AND raw > 3.0) AS is_anomaly,
          CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw > 5.0 THEN 'high' WHEN raw > 2.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a08_metric_extraction",
      (s, d) => {
        import graft.anomalies.{Metrics => ME}
        ME.extract(t(s, d, "lineitem"), "lineitem",
          Seq(ME.RowCount(), ME.NullPercentage("l_quantity"),
            ME.DistinctCount("l_returnflag"),
            ME.DistinctPercentage("l_returnflag"),
            ME.Stats("l_quantity")),
          java.sql.Timestamp.valueOf(NOW))
          .select(col("table_name"),
            coalesce(col("column_name"), lit("")).as("column_name"),
            col("metric_name"),
            round(col("metric_value"), 6).as("metric_value"))
          .orderBy("column_name", "metric_name")
      },
      Some("""SELECT * FROM (
          SELECT 'lineitem' AS table_name, '' AS column_name,
            'row_count' AS metric_name,
            CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE) AS metric_value
          UNION ALL SELECT 'lineitem', 'l_quantity', 'null_percentage',
            (SELECT ROUND((COUNT(*) - COUNT(l_quantity)) * 100.0 / COUNT(*), 6)
             FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_returnflag', 'distinct_count',
            (SELECT CAST(COUNT(DISTINCT l_returnflag) AS DOUBLE) FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_returnflag', 'distinct_percentage',
            (SELECT ROUND(COUNT(DISTINCT l_returnflag) * 100.0
              / COUNT(l_returnflag), 6) FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_quantity', 'min_value',
            (SELECT MIN(l_quantity) FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_quantity', 'max_value',
            (SELECT MAX(l_quantity) FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_quantity', 'avg_value',
            (SELECT ROUND(SUM(l_quantity) / COUNT(l_quantity), 6) FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_quantity', 'median',
            (SELECT ROUND(quantile_cont(l_quantity, 0.5), 6) FROM lineitem)
          UNION ALL SELECT 'lineitem', 'l_quantity', 'std_dev',
            (SELECT ROUND(SQRT((SUM(l_quantity * l_quantity)
              - SUM(l_quantity) * SUM(l_quantity) / COUNT(l_quantity))
              / (COUNT(l_quantity) - 1)), 6) FROM lineitem))
        ORDER BY column_name, metric_name""")),

    Q("p25_type_distribution",
      (s, d) => {
        import s.implicits._
        Profiler.typeDistribution(t(s, d, "lineitem").schema).toSeq
          .toDF("type_bucket", "column_count")
          .withColumn("column_count", col("column_count").cast("long"))
          .orderBy("type_bucket")
      },
      Some("""SELECT CASE
          WHEN lower(column_type) IN ('bigint','integer','double','float','smallint','tinyint','hugeint')
            OR lower(column_type) LIKE 'decimal%' THEN 'numeric'
          WHEN lower(column_type) = 'varchar' THEN 'text'
          WHEN lower(column_type) LIKE 'timestamp%' OR lower(column_type) = 'date' THEN 'datetime'
          WHEN lower(column_type) = 'boolean' THEN 'boolean'
          ELSE 'other' END AS type_bucket,
        CAST(COUNT(*) AS BIGINT) AS column_count
        FROM (DESCRIBE lineitem)
        GROUP BY 1 ORDER BY type_bucket""")))

  // ------------------------------------------------------------------
  // V-series: validation rule engine
  // ------------------------------------------------------------------

  /** Hand-picked rule battery exercising V1/V2 end-to-end: each rule's
   *  scalar SQL runs through Runner (spark.sql + Evaluator), the oracle
   *  recomputes the same scalar + comparison in DuckDB. */
  private def batteryRules: Seq[(ValidationRule, String, String)] = Seq(
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

  private def validationQueries: Seq[Q] = Seq(
    Q("v01_rule_battery",
      (s, d) => {
        Catalog(s, d).registerAll()
        import s.implicits._
        Runner.runAll(s, batteryRules.map(_._1))
          .map(r => (r.ruleName, r.isValid,
            r.actualValue.map(v =>
              math.round(anyToDouble(v) * 1e6) / 1e6).getOrElse(-1.0)))
          .toSeq.toDF("rule_name", "is_valid", "actual_value")
          .orderBy("rule_name")
      },
      Some {
        batteryRules.map { case (rule, scalarSql, cond) =>
          s"""SELECT '${rule.name}' AS rule_name,
             ($cond) AS is_valid,
             ROUND(CAST(actual AS DOUBLE), 6) AS actual_value
             FROM (SELECT ($scalarSql) AS actual)"""
        }.mkString(" UNION ALL ") + " ORDER BY rule_name"
      }),

    Q("v03_generated_rules",
      (s, d) => {
        import s.implicits._
        val cat = Catalog(s, d)
        val meta = cat.tableMeta("lineitem")
        DefaultValidations
          .generate("lineitem", cat.schemaOf("lineitem"), meta.primaryKeys,
            meta.foreignKeys.map(_.column))
          .map(r => (r.name, r.operator, r.expectedValue.toString))
          .toDF("rule_name", "operator", "expected_value")
          .orderBy("rule_name")
      },
      // schema introspection isn't DuckDB-visible, so the oracle pins the
      // expected rule set (the generator's output is a pure function of
      // the fixed lineitem schema + sidecar keys)
      Some("""SELECT * FROM (VALUES
          ('check_l_discount_outliers', 'less_than', '20'),
          ('check_l_discount_positive', 'equals', '0'),
          ('check_l_extendedprice_not_zero', 'equals', '0'),
          ('check_l_extendedprice_null_rate', 'less_than', '25.0'),
          ('check_l_extendedprice_outliers', 'less_than', '20'),
          ('check_l_extendedprice_positive', 'equals', '0'),
          ('check_l_linenumber_outliers', 'less_than', '20'),
          ('check_l_linenumber_positive', 'equals', '0'),
          ('check_l_linestatus_distribution', 'equals', '0'),
          ('check_l_linestatus_null_rate', 'less_than', '25.0'),
          ('check_l_orderkey_outliers', 'less_than', '20'),
          ('check_l_orderkey_positive', 'equals', '0'),
          ('check_l_orderkey_ref_distribution', 'equals', '0'),
          ('check_l_partkey_outliers', 'less_than', '20'),
          ('check_l_partkey_positive', 'equals', '0'),
          ('check_l_partkey_ref_distribution', 'equals', '0'),
          ('check_l_quantity_outliers', 'less_than', '20'),
          ('check_l_quantity_positive', 'equals', '0'),
          ('check_l_shipdate_reasonable_past', 'equals', '0'),
          ('check_l_suppkey_outliers', 'less_than', '20'),
          ('check_l_suppkey_positive', 'equals', '0'),
          ('check_l_suppkey_ref_distribution', 'equals', '0'),
          ('check_l_tax_not_zero', 'equals', '0'),
          ('check_l_tax_outliers', 'less_than', '20'),
          ('check_l_tax_positive', 'equals', '0'),
          ('check_lineitem_not_empty', 'greater_than', '0'),
          ('check_lineitem_pk_unique', 'equals', '0'),
          ('check_lineitem_row_growth', 'equals', '0'))
        AS t(rule_name, operator, expected_value)
        ORDER BY rule_name""")),

    Q("v04_run_generated",
      (s, d) => {
        import s.implicits._
        val cat = Catalog(s, d)
        cat.registerAll()
        val meta = cat.tableMeta("region")
        val rules = DefaultValidations.generate("region",
          cat.schemaOf("region"), meta.primaryKeys, Nil)
        Runner.runAll(s, rules)
          .map(r => (r.ruleName, r.isValid))
          .toSeq.toDF("rule_name", "is_valid")
          .orderBy("rule_name")
      },
      Some("""SELECT 'check_r_name_null_rate' AS rule_name,
          (SELECT (COUNT(CASE WHEN r_name IS NULL THEN 1 END) * 100.0
            / NULLIF(COUNT(*), 0)) FROM region) < 25.0 AS is_valid
        UNION ALL SELECT 'check_r_regionkey_outliers',
          (SELECT COUNT(*) FROM region, (SELECT AVG(r_regionkey) AS m,
            STDDEV(r_regionkey) AS sd FROM region WHERE r_regionkey IS NOT NULL) st
           WHERE r_regionkey > st.m + 3 * st.sd OR r_regionkey < st.m - 3 * st.sd) < 5
        UNION ALL SELECT 'check_r_regionkey_positive',
          (SELECT COUNT(*) FROM region WHERE r_regionkey < 0) = 0
        UNION ALL SELECT 'check_region_not_empty',
          (SELECT COUNT(*) FROM region) > 0
        UNION ALL SELECT 'check_region_pk_unique',
          (SELECT COUNT(*) FROM (SELECT r_regionkey, COUNT(*) AS c FROM region
            GROUP BY r_regionkey HAVING COUNT(*) > 1) d) = 0
        UNION ALL SELECT 'check_region_row_growth',
          (WITH current_count AS (SELECT COUNT(*) AS count FROM region),
            prev_count AS (SELECT CASE WHEN COUNT(*) = 0 THEN NULL
              ELSE COUNT(*) END AS count FROM region)
           SELECT CASE WHEN prev_count.count IS NULL THEN 0
             WHEN ABS(current_count.count - prev_count.count) > prev_count.count * 0.2 THEN 1
             ELSE 0 END FROM current_count, prev_count) = 0
        ORDER BY rule_name""")),

    // V-series (rule store): persist a suite, update + deactivate, then
    // run what the STORE says is active (supabase_validation_manager.py
    // add_rule/update_rule/deactivate_rule). The oracle recomputes the
    // two surviving rules' predicates over region — latest-version-wins
    // is observable because the updated threshold (1000, passing) must
    // shadow the original (3, failing).
    Q("v06_row_quarantine",
      // the ACTION side of validation: a snapshot with DECLARED
      // row-level defects (every 13th price negated, every 17th
      // priority nulled) splits into clean rows and quarantined rows
      // carrying WHICH rules failed — route-and-review instead of
      // fail-the-batch. One map-only annotate pass + one stacked
      // summary aggregate; NULL predicate results count as
      // violations (an unevaluable rule must not wave a row through),
      // which the nulled-priority lane exercises directly.
      (s, d) => {
        import graft.validations.Quarantine
        val dirty = t(s, d, "orders")
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 13 === 0, -col("o_totalprice"))
              .otherwise(col("o_totalprice")))
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 17 === 0,
              lit(null).cast("string"))
              .otherwise(col("o_orderpriority")))
        Quarantine.summary(dirty, Seq(
          Quarantine.RowRule("price_non_negative",
            col("o_totalprice") >= 0),
          Quarantine.RowRule("priority_known",
            col("o_orderpriority").rlike("^[1-5]-")),
          Quarantine.RowRule("key_positive", col("o_orderkey") > 0)))
          .orderBy("rule")
      },
      Some("""WITH dirty AS (SELECT o_orderkey,
            CASE WHEN o_orderkey % 13 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice,
            CASE WHEN o_orderkey % 17 = 0 THEN NULL
              ELSE o_orderpriority END AS o_orderpriority
          FROM orders),
        flags AS (SELECT
            CASE WHEN COALESCE(o_totalprice >= 0, FALSE)
              THEN 0 ELSE 1 END AS v_price,
            CASE WHEN COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'),
              FALSE) THEN 0 ELSE 1 END AS v_prio,
            CASE WHEN COALESCE(o_orderkey > 0, FALSE)
              THEN 0 ELSE 1 END AS v_key
          FROM dirty)
        SELECT rule, n_rows FROM (
          SELECT 'price_non_negative' AS rule,
            CAST(SUM(v_price) AS BIGINT) AS n_rows FROM flags
          UNION ALL SELECT 'priority_known',
            CAST(SUM(v_prio) AS BIGINT) FROM flags
          UNION ALL SELECT 'key_positive',
            CAST(SUM(v_key) AS BIGINT) FROM flags
          UNION ALL SELECT '_rows_clean',
            CAST(SUM(CASE WHEN v_price + v_prio + v_key = 0
              THEN 1 ELSE 0 END) AS BIGINT) FROM flags
          UNION ALL SELECT '_rows_total',
            CAST(COUNT(*) AS BIGINT) FROM flags)
        ORDER BY rule""")),

    Q("v05_stored_rules",
      (s, d) => {
        Catalog(s, d).registerAll()
        import s.implicits._
        val store = new graft.validations.RuleStore(s,
          freshState(s, "v05") + "/rules")
        val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
        store.addRule("region", ValidationRule("check_region_not_empty",
          "region has rows", "SELECT COUNT(*) FROM region",
          "greater_than", 0L), ts1)
        store.addRule("region", ValidationRule("check_region_max_rows",
          "region small", "SELECT COUNT(*) FROM region",
          "less_than", 3L), ts1)
        store.addRule("region", ValidationRule("check_region_temp",
          "throwaway", "SELECT 1", "equals", 1L), ts1)
        store.updateRule("region", ValidationRule("check_region_max_rows",
          "region small", "SELECT COUNT(*) FROM region",
          "less_than", 1000L), ts2)
        store.deactivateRule("region", "check_region_temp", ts2)
        Runner.runAll(s, store.activeRules("region"))
          .map(r => (r.ruleName, r.isValid,
            r.actualValue.map(anyToDouble).getOrElse(-1.0)))
          .toSeq.toDF("rule_name", "is_valid", "actual_value")
          .orderBy("rule_name")
      },
      Some("""SELECT 'check_region_max_rows' AS rule_name,
          (SELECT COUNT(*) FROM region) < 1000 AS is_valid,
          CAST((SELECT COUNT(*) FROM region) AS DOUBLE) AS actual_value
        UNION ALL SELECT 'check_region_not_empty',
          (SELECT COUNT(*) FROM region) > 0,
          CAST((SELECT COUNT(*) FROM region) AS DOUBLE)
        ORDER BY rule_name""")),

    Q("v07_result_store",
      // V5's event path as an ORACLE row (verdict r14 ask #8): run
      // three rules with known outcomes — pass, fail, and a missing-
      // column error whose message trips the schema-mismatch sniffer —
      // append to a fresh ValidationStore, then read results AND
      // failureEvents back. The raw error TEXT is engine-specific
      // (a Spark analysis message), so the output carries the derived
      // deterministic flags (errored / schema_mismatch), never the
      // message itself.
      (s, d) => {
        Catalog(s, d).registerAll()
        val runTs = java.sql.Timestamp.valueOf("2026-03-01 12:00:00")
        val results = Runner.runAll(s, Seq(
          ValidationRule("check_rows_eq", "exact row count",
            "SELECT COUNT(*) FROM region", "equals", 5L),
          ValidationRule("check_rows_gt", "deliberately too strict",
            "SELECT COUNT(*) FROM region", "greater_than", 100L),
          ValidationRule("check_ghost_col", "schema-drift trip-wire",
            "SELECT MAX(r_ghost) FROM region", "greater_than", 0L)))
        val store = new graft.history.ValidationStore(s,
          freshState(s, "v07") + "/validation_results")
        store.append("region", results, runTs)
        val failures = store.failureEvents("region")
          .select(col("rule_name"), lit(true).as("is_failure_event"))
        store.results("region")
          .join(broadcast(failures), Seq("rule_name"), "left")
          .select(col("rule_name"), col("is_valid"),
            coalesce(col("actual_value"), lit("")).as("actual_value"),
            col("expected_value"), col("operator"),
            col("error").isNotNull.as("errored"),
            col("schema_mismatch"),
            coalesce(col("is_failure_event"), lit(false))
              .as("is_failure_event"),
            date_format(col("run_at"), "yyyy-MM-dd HH:mm:ss")
              .as("run_at"))
          .orderBy("rule_name")
      },
      Some("""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM region)
        SELECT * FROM (
          SELECT 'check_ghost_col' AS rule_name, FALSE AS is_valid,
            '' AS actual_value, '0' AS expected_value,
            'greater_than' AS operator, TRUE AS errored,
            TRUE AS schema_mismatch, TRUE AS is_failure_event,
            '2026-03-01 12:00:00' AS run_at
          UNION ALL
          SELECT 'check_rows_eq', (SELECT c FROM n) = 5,
            CAST((SELECT c FROM n) AS VARCHAR), '5', 'equals',
            FALSE, FALSE, NOT ((SELECT c FROM n) = 5),
            '2026-03-01 12:00:00'
          UNION ALL
          SELECT 'check_rows_gt', (SELECT c FROM n) > 100,
            CAST((SELECT c FROM n) AS VARCHAR), '100', 'greater_than',
            FALSE, FALSE, NOT ((SELECT c FROM n) > 100),
            '2026-03-01 12:00:00')
        ORDER BY rule_name""")))

  // ------------------------------------------------------------------
  // A-series: anomaly detection over the events daily series
  // ------------------------------------------------------------------

  /** Daily event-count series per event_type: 5 series × 30 days.
   *  Counts are integers → exact doubles on both engines. */
  private def dailySeries(s: SparkSession, d: String): DataFrame =
    eventsTable(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("value"))

  private val duckDailySeries =
    """SELECT event_type, CAST(ts AS DATE) AS day,
      CAST(COUNT(*) AS DOUBLE) AS value FROM events GROUP BY 1, 2"""

  /** Shared a12/a13/t11 fixture: global-zscore anomalies over a
   *  double-spiked daily series (day 15 ×10 → medium, day 28 ×8 → low;
   *  a single global-zscore series can't hold a >5σ point AND a second
   *  ≥3σ point, so 'high' is structurally absent), persisted as two
   *  scans (run_at 01-20 / 01-31), then triaged with three bulk status
   *  updates. Last update wins per row; only 'resolved' stamps
   *  resolved_at/by (api.py:299-307) and they are never cleared. */
  private def triagedAnomalyStore(
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
  private val duckTriagedAnomalies =
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

  private def anomalyQueries: Seq[Q] = Seq(
    Q("a01_zscore_global",
      (s, d) => Anomalies.zscore(dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER (PARTITION BY event_type) AS m,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM st WHERE n >= 2)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high' WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a14_seasonal_zscore",
      // day-of-week adjusted z-score (beyond-reference): each point
      // scored against its OWN weekday's mean/σ within the series, so
      // a weekly cycle stops tripping the global detector every
      // weekend; one window job partitioned by (series, dow)
      (s, d) => Anomalies.seasonalZscore(dailySeries(s, d),
          Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          SUM(value) OVER w AS s, SUM(value * value) OVER w AS s2,
          COUNT(value) OVER w AS n
          FROM series
          WINDOW w AS (PARTITION BY event_type, dayofweek(day))),
        loo AS (SELECT event_type, day, value, n,
          (s - value) / (n - 1) AS m,
          SQRT(GREATEST((s2 - value * value) / (n - 1)
            - ((s - value) / (n - 1)) * ((s - value) / (n - 1)),
            CAST(0 AS DOUBLE))) AS sd
          FROM st WHERE n >= 3),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM loo)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high' WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a15_cusum",
      // CUSUM changepoint detector (beyond-reference): cumulative
      // drift catches sustained level shifts per-point detectors miss.
      // The clamped recursion S⁺ₜ = max(0, S⁺ₜ₋₁ + dev) is rewritten as
      // prefix-sum minus running-min — two stacked window passes, no
      // UDF, exactly replayable as SQL
      (s, d) => Anomalies.cusum(dailySeries(s, d),
          Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("cusum_up"), 6).as("cusum_up"),
          round(col("cusum_down"), 6).as("cusum_down"),
          round(col("score"), 6).as("score"),
          col("is_anomaly"), col("direction"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER (PARTITION BY event_type) AS m,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        p AS (SELECT event_type, day, value, sd,
          SUM(value - m - 0.5 * sd) OVER w AS p_up,
          SUM(m - value - 0.5 * sd) OVER w AS p_dn
          FROM st WHERE n >= 2 AND sd > 0
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        sc AS (SELECT event_type, day, value,
          (p_up - LEAST(CAST(0 AS DOUBLE), MIN(p_up) OVER w)) / sd AS s_up,
          (p_dn - LEAST(CAST(0 AS DOUBLE), MIN(p_dn) OVER w)) / sd AS s_dn
          FROM p WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type, day, value,
          ROUND(s_up, 6) AS cusum_up, ROUND(s_dn, 6) AS cusum_down,
          ROUND(GREATEST(s_up, s_dn), 6) AS score,
          GREATEST(s_up, s_dn) > 4.0 AS is_anomaly,
          CASE WHEN GREATEST(s_up, s_dn) <= 4.0 THEN 'none'
            WHEN s_up >= s_dn THEN 'up' ELSE 'down' END AS direction
        FROM sc ORDER BY event_type, day""")),

    Q("a16_holt_forecast",
      // Holt's linear-trend smoothing per series (beyond-reference):
      // the forecast that sets expected ranges for trending metrics.
      // The coupled (level, trend) recurrence folds over the sorted
      // series with the `aggregate` higher-order function — codegen'd,
      // no UDF; series parallelize across the cluster, each fold is
      // the inherently-sequential recurrence. The oracle replays it as
      // a recursive CTE: identical IEEE double ops in identical order,
      // so level/trend/forecasts agree to the bit before rounding.
      (s, d) => graft.anomalies.Forecast.holtLinear(dailySeries(s, d),
          Seq("event_type"), "day", "value")
        .select(col("event_type"), col("n_points"),
          round(col("level"), 6).as("level"),
          round(col("trend"), 6).as("trend"),
          round(col("forecast_1"), 6).as("forecast_1"),
          round(col("forecast_2"), 6).as("forecast_2"),
          round(col("forecast_3"), 6).as("forecast_3"))
        .orderBy("event_type"),
      Some(s"""WITH RECURSIVE series AS ($duckDailySeries),
        o AS (SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
          FROM series),
        n AS (SELECT event_type, MAX(t) AS n FROM o GROUP BY 1
          HAVING MAX(t) >= 2),
        init AS (
          SELECT o1.event_type, 2 AS t,
            CAST(0.5 AS DOUBLE) * o2.value
              + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value))
              AS l,
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o2.value
                + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value)))
              - o1.value)
              + CAST(0.7 AS DOUBLE) * (o2.value - o1.value) AS b
          FROM o o1 JOIN o o2 ON o1.event_type = o2.event_type
            AND o1.t = 1 AND o2.t = 2),
        holt AS (
          SELECT * FROM init
          UNION ALL
          SELECT h.event_type, h.t + 1,
            CAST(0.5 AS DOUBLE) * o.value
              + CAST(0.5 AS DOUBLE) * (h.l + h.b),
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o.value
                + CAST(0.5 AS DOUBLE) * (h.l + h.b)) - h.l)
              + CAST(0.7 AS DOUBLE) * h.b
          FROM holt h JOIN o ON o.event_type = h.event_type
            AND o.t = h.t + 1)
        SELECT h.event_type, CAST(n.n AS INT) AS n_points,
          ROUND(h.l, 6) AS level, ROUND(h.b, 6) AS trend,
          ROUND(h.l + CAST(1 AS DOUBLE) * h.b, 6) AS forecast_1,
          ROUND(h.l + CAST(2 AS DOUBLE) * h.b, 6) AS forecast_2,
          ROUND(h.l + CAST(3 AS DOUBLE) * h.b, 6) AS forecast_3
        FROM holt h JOIN n ON n.event_type = h.event_type AND h.t = n.n
        ORDER BY h.event_type""")),

    Q("a21_forecast_backtest",
      // forecast backtest (the go-live gate for a16's expected
      // ranges): fit Holt on days before Jan 24, score the 7-day
      // held-out tail k-steps-ahead, and compare MAE against the
      // naive last-value baseline — a forecaster that can't beat
      // persistence shouldn't set alert ranges. Micro-unit error
      // quantization before integer per-series sums makes the verdict
      // engine-exact; the oracle replays the Holt recursion (a16's
      // recursive CTE) over the truncated series plus the whole
      // backtest arithmetic.
      (s, d) => graft.anomalies.Forecast.holtBacktest(
          dailySeries(s, d), Seq("event_type"), "day", "value",
          cutoff = lit(java.sql.Date.valueOf("2024-01-24")))
        .orderBy("event_type"),
      Some(s"""WITH RECURSIVE allseries AS ($duckDailySeries),
        series AS (SELECT * FROM allseries
          WHERE day < DATE '2024-01-24'),
        o AS (SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
          FROM series),
        n AS (SELECT event_type, MAX(t) AS n FROM o GROUP BY 1
          HAVING MAX(t) >= 2),
        init AS (
          SELECT o1.event_type, 2 AS t,
            CAST(0.5 AS DOUBLE) * o2.value
              + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value))
              AS l,
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o2.value
                + CAST(0.5 AS DOUBLE) * (o1.value + (o2.value - o1.value)))
              - o1.value)
              + CAST(0.7 AS DOUBLE) * (o2.value - o1.value) AS b
          FROM o o1 JOIN o o2 ON o1.event_type = o2.event_type
            AND o1.t = 1 AND o2.t = 2),
        holt AS (
          SELECT * FROM init
          UNION ALL
          SELECT h.event_type, h.t + 1,
            CAST(0.5 AS DOUBLE) * o.value
              + CAST(0.5 AS DOUBLE) * (h.l + h.b),
            CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * o.value
                + CAST(0.5 AS DOUBLE) * (h.l + h.b)) - h.l)
              + CAST(0.7 AS DOUBLE) * h.b
          FROM holt h JOIN o ON o.event_type = h.event_type
            AND o.t = h.t + 1),
        fit AS (SELECT h.event_type, h.l AS level, h.b AS trend
          FROM holt h JOIN n ON n.event_type = h.event_type
            AND h.t = n.n),
        lastfit AS (SELECT event_type, MAX(day) AS last_day
          FROM series GROUP BY 1),
        naive AS (SELECT s.event_type, s.value AS nv
          FROM series s JOIN lastfit lf
            ON s.event_type = lf.event_type AND s.day = lf.last_day),
        hold AS (SELECT * FROM allseries
          WHERE day >= DATE '2024-01-24'),
        j AS (SELECT h.event_type,
            CAST(ROUND(ABS(h.value - (f.level +
              CAST(date_diff('day', lf.last_day, h.day) AS DOUBLE)
                * f.trend)) * 1e6, 0) AS BIGINT) AS eh,
            CAST(ROUND(ABS(h.value - nv.nv) * 1e6, 0) AS BIGINT) AS en
          FROM hold h
          JOIN fit f ON f.event_type = h.event_type
          JOIN lastfit lf ON lf.event_type = h.event_type
          JOIN naive nv ON nv.event_type = h.event_type)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_holdout,
          ROUND(CAST(SUM(eh) AS DOUBLE) / COUNT(*) / 1e6, 6)
            AS mae_holt,
          ROUND(CAST(SUM(en) AS DOUBLE) / COUNT(*) / 1e6, 6)
            AS mae_naive,
          SUM(eh) < SUM(en) AS holt_beats_naive
        FROM j GROUP BY event_type ORDER BY event_type""")),

    Q("a17_changepoint",
      // changepoint localization (binary segmentation, one level):
      // a15's CUSUM says "something drifted", this says WHERE the level
      // broke — the split minimizing two-segment SSE. Pure ordered
      // prefix-sum windows (SSE(a..b) = Σy² − (Σy)²/len), so the whole
      // derivation replays as SQL window functions over identical
      // doubles; ties break to the earliest split.
      (s, d) => graft.anomalies.Changepoint.binarySegmentation(
          dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("n_points"),
          col("change_at").cast("string").as("change_day"),
          round(col("mean_before"), 6).as("mean_before"),
          round(col("mean_after"), 6).as("mean_after"),
          round(col("sse_reduction"), 6).as("sse_reduction"))
        .orderBy("event_type"),
      Some(s"""WITH series AS ($duckDailySeries),
        base AS (SELECT event_type, day, value,
          ROW_NUMBER() OVER w AS r,
          SUM(value) OVER w AS s1,
          SUM(value * value) OVER w AS s2,
          COUNT(*) OVER p AS n,
          SUM(value) OVER p AS t1,
          SUM(value * value) OVER p AS t2
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          p AS (PARTITION BY event_type)),
        scored AS (
          SELECT event_type, day, n,
            (s1 - value) AS ls1, (s2 - value * value) AS ls2,
            (t1 - (s1 - value)) AS rs1, (t2 - (s2 - value * value)) AS rs2,
            CAST(r - 1 AS DOUBLE) AS ln, CAST(n - r + 1 AS DOUBLE) AS rn,
            t1, t2
          FROM base WHERE n >= 2 AND r >= 2),
        cost AS (
          SELECT event_type, day, n, ls1, rs1, ln, rn, t1, t2,
            (ls2 - ls1 * ls1 / ln) + (rs2 - rs1 * rs1 / rn) AS c
          FROM scored),
        best AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY c ASC, day ASC) AS rk
          FROM cost)
        SELECT event_type, CAST(n AS BIGINT) AS n_points,
          CAST(day AS VARCHAR) AS change_day,
          ROUND(ls1 / ln, 6) AS mean_before,
          ROUND(rs1 / rn, 6) AS mean_after,
          ROUND((t2 - t1 * t1 / n) - c, 6) AS sse_reduction
        FROM best WHERE rk = 1 ORDER BY event_type""")),

    Q("a18_anomaly_contributors",
      // root-cause attribution: for each ≥2σ daily-volume day, the
      // top-3 users whose share of that day deviates most from their
      // share of every other day. The σ test is the z-score rewritten
      // as an INTEGER cross-multiplied comparison (no float at the
      // decision boundary) and the share delta quantizes to ppm from
      // exact counts — the whole derivation replays in SQL.
      (s, d) => graft.anomalies.Attribution.anomalyContributors(
          eventsTable(s, d))
        .orderBy("series", "day", "rank"),
      Some("""WITH d AS (
          SELECT event_type AS series, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        st AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sm,
            CAST(SUM(x * x) AS BIGINT) AS s2
          FROM d GROUP BY 1),
        fl AS (
          SELECT d.series, d.day, d.x AS day_total, st.sm AS all_total
          FROM d JOIN st USING (series)
          WHERE st.n >= 2 AND (n * x - sm) * (n * x - sm)
            >= 4 * (n * s2 - sm * sm)),
        co AS (
          SELECT event_type AS series, CAST(ts AS DATE) AS day,
            user_id AS contributor, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2, 3),
        ca AS (SELECT series, contributor,
            CAST(SUM(c) AS BIGINT) AS c_all
          FROM co GROUP BY 1, 2),
        sc AS (
          SELECT co.series, co.day, co.contributor, co.c,
            fl.day_total,
            CAST(ROUND(1e6 * CAST(co.c * (fl.all_total - fl.day_total)
                - (ca.c_all - co.c) * fl.day_total AS DOUBLE)
              / CAST(fl.day_total * (fl.all_total - fl.day_total)
                AS DOUBLE), 0) AS BIGINT) AS delta_ppm
          FROM co
          JOIN fl ON fl.series = co.series AND fl.day = co.day
          JOIN ca ON ca.series = co.series
            AND ca.contributor = co.contributor
          WHERE fl.all_total - fl.day_total > 0),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY series, day
            ORDER BY delta_ppm DESC, contributor ASC) AS r
          FROM sc)
        SELECT series, day, contributor, c AS day_count, day_total,
          delta_ppm, CAST(r AS INT) AS rank
        FROM rk WHERE r <= 3 ORDER BY series, day, rank""")),

    Q("a19_slo_burn_rate",
      // SLO error-budget burn with multiwindow alerting (the SRE
      // workbook pattern): hourly error ratio over the 1 h and
      // trailing-6 h windows, each over the 25% budget (SLO 75%); a
      // page fires only when BOTH windows burn ≥ 1.2×. Burn rates
      // quantize to ppm from integer counts and the page decision is
      // an integer cross-multiplication — no float at the boundary.
      // One hourly rollup is the only data-bound stage; the trailing
      // window runs over the calendar-bounded hourly series.
      (s, d) => graft.anomalies.Slo.burnRate(eventsTable(s, d))
        .orderBy("hour"),
      Some(sloOracleSql)),

    Q("a20_leading_edge_alerts",
      // alert-fatigue control over detector output: page on the
      // LEADING EDGE of an anomaly run (previous point clean) and
      // re-page every 3rd point while the run persists — a detector
      // that pages every anomalous day of a week-long incident trains
      // people to ignore it, one that pages once lets it go silent.
      // Low threshold (sensitivity 2 → 1.5σ) so the fixture has real
      // runs. One per-series ordered window over the a01 detector.
      (s, d) => Anomalies.leadingEdgeAlerts(
          Anomalies.zscore(dailySeries(s, d), Seq("event_type"), "day",
            "value", sensitivity = 2.0),
          Seq("event_type"), "day", reAlertEvery = 3)
        .select(col("event_type"), col("day"), col("is_anomaly"),
          col("run_length"), col("alert"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER (PARTITION BY event_type) AS m,
          STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        scored AS (SELECT event_type, day,
          (CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END)
            > 1.5 AS is_anomaly
          FROM st WHERE n >= 2),
        starts AS (SELECT event_type, day, is_anomaly,
          CASE WHEN is_anomaly AND NOT COALESCE(
              LAG(is_anomaly) OVER (PARTITION BY event_type
                ORDER BY day), FALSE)
            THEN 1 ELSE 0 END AS is_start
          FROM scored),
        runs AS (SELECT event_type, day, is_anomaly,
          SUM(is_start) OVER (PARTITION BY event_type
            ORDER BY day ROWS UNBOUNDED PRECEDING) AS run_id
          FROM starts),
        pos AS (SELECT event_type, day, is_anomaly,
          CASE WHEN is_anomaly THEN CAST(ROW_NUMBER() OVER (
              PARTITION BY event_type, run_id ORDER BY day) AS BIGINT)
            ELSE 0 END AS run_length
          FROM runs)
        SELECT event_type, day, is_anomaly, run_length,
          (is_anomaly AND (run_length - 1) % 3 = 0) AS alert
        FROM pos ORDER BY event_type, day""")),

    Q("a02_zscore_rolling",
      (s, d) => Anomalies.zscore(dailySeries(s, d), Seq("event_type"), "day",
        "value", sensitivity = 1.0, window = Some(7))
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER w AS m, STDDEV_POP(value) OVER w AS sd,
          COUNT(value) OVER w AS cnt
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM st WHERE cnt = 7)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high' WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a03_iqr_global",
      (s, d) => Anomalies.iqr(dailySeries(s, d), Seq("event_type"), "day", "value")
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          quantile_cont(value, 0.25) OVER (PARTITION BY event_type) AS q1,
          quantile_cont(value, 0.75) OVER (PARTITION BY event_type) AS q3,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series),
        b AS (SELECT event_type, day, value, q3 - q1 AS iqr,
          q1 - (q3 - q1) * 1.5 AS lower_b, q3 + (q3 - q1) * 1.5 AS upper_b
          FROM st WHERE n >= 4),
        scored AS (SELECT event_type, day, value,
          CASE WHEN value < lower_b THEN
            CASE WHEN iqr > 0 THEN ABS((lower_b - value) / iqr) ELSE CAST('inf' AS DOUBLE) END
          WHEN value > upper_b THEN
            CASE WHEN iqr > 0 THEN ABS((value - upper_b) / iqr) ELSE CAST('inf' AS DOUBLE) END
          ELSE 0.0 END AS raw_score,
          value < lower_b OR value > upper_b AS is_anomaly
          FROM b)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          is_anomaly, CAST(1.5 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 3.0 THEN 'high' WHEN raw_score > 1.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a04_iqr_rolling",
      (s, d) => Anomalies.iqr(dailySeries(s, d), Seq("event_type"), "day",
        "value", sensitivity = 1.0, window = Some(7))
        .select(col("event_type"), col("day"), col("value"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          quantile_cont(value, 0.25) OVER w AS q1,
          quantile_cont(value, 0.75) OVER w AS q3,
          COUNT(value) OVER w AS cnt,
          COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        b AS (SELECT event_type, day, value, q3 - q1 AS iqr,
          q1 - (q3 - q1) * 1.5 AS lower_b, q3 + (q3 - q1) * 1.5 AS upper_b
          FROM st WHERE n >= 4 AND cnt = 7),
        scored AS (SELECT event_type, day, value,
          CASE WHEN value < lower_b THEN
            CASE WHEN iqr > 0 THEN ABS((lower_b - value) / iqr) ELSE CAST('inf' AS DOUBLE) END
          WHEN value > upper_b THEN
            CASE WHEN iqr > 0 THEN ABS((value - upper_b) / iqr) ELSE CAST('inf' AS DOUBLE) END
          ELSE 0.0 END AS raw_score,
          value < lower_b OR value > upper_b AS is_anomaly
          FROM b)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          is_anomaly, CAST(1.5 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 3.0 THEN 'high' WHEN raw_score > 1.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("a05_moving_average",
      (s, d) => Anomalies.movingAverage(dailySeries(s, d), Seq("event_type"),
        "day", "value", sensitivity = 1.0, window = 7, stdWindow = Some(5))
        .select(col("event_type"), col("day"), col("value"),
          round(col("moving_avg"), 6).as("moving_avg"),
          round(col("score"), 6).as("score"), col("is_anomaly"),
          col("threshold"), col("severity"))
        .orderBy("event_type", "day"),
      Some(s"""WITH series AS ($duckDailySeries),
        ma0 AS (SELECT event_type, day, value,
          AVG(value) OVER w AS mavg, COUNT(value) OVER w AS cnt
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        ma AS (SELECT * FROM ma0 WHERE cnt = 7),
        st AS (SELECT event_type, day, value, mavg,
          COUNT(mavg) OVER (PARTITION BY event_type) AS L,
          STDDEV_POP(mavg) OVER (PARTITION BY event_type) AS std_global,
          COUNT(mavg) OVER wf AS fwd_cnt,
          CASE WHEN COUNT(mavg) OVER wf = 5
            THEN STDDEV_POP(mavg) OVER wf END AS fwd_std
          FROM ma
          WINDOW wf AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
        st2 AS (SELECT event_type, day, value, mavg, L, std_global,
          LAST_VALUE(fwd_std IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS std_rolling
          FROM st),
        scored AS (SELECT event_type, day, value, mavg,
          CASE WHEN L < 5 THEN std_global ELSE std_rolling END AS sd
          FROM st2),
        fin AS (SELECT event_type, day, value, mavg,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - mavg) / sd) END AS raw_score,
          sd FROM scored)
        SELECT event_type, day, value, ROUND(mavg, 6) AS moving_avg,
          ROUND(raw_score, 6) AS score,
          sd <> 0 AND raw_score > 2.0 AS is_anomaly,
          CAST(2.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 4.0 THEN 'high' WHEN raw_score > 2.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM fin ORDER BY event_type, day""")),

    // A7 batch half (config store + scan-everything-configured): persist
    // two configs with DIFFERENT methods, feed the metrics store a
    // spiked daily series, run the no-args batch scan — configs route
    // their own series through their own detector and the union comes
    // back in one job. Day 15 is deterministically boosted 10× so both
    // detectors fire (detect() emits anomalies only).
    Q("a09_config_scan",
      (s, d) => {
        val engine = new graft.api.GraftEngine(s, d, freshState(s, "a09"))
        // only the two configured series are stored: the metrics store
        // partitions by (connection, table, date), so every extra series
        // is 30 more one-row partition writes for data the scan ignores
        val pts = eventsTable(s, d)
          .filter(col("event_type").isin("click", "error"))
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("metric_value"))
          .select(lit("default").as("connection_id"),
            col("event_type").as("table_name"),
            lit(null).cast("string").as("column_name"),
            lit("daily_events").as("metric_name"),
            when(col("day") === lit(java.sql.Date.valueOf("2024-01-15")),
              col("metric_value") * 10).otherwise(col("metric_value"))
              .as("metric_value"),
            col("day").cast("timestamp").as("ts"))
        engine.metrics.append(pts)
        val ts1 = java.sql.Timestamp.valueOf("2024-01-31 00:00:00")
        engine.anomalyConfigs.createConfig(graft.types.AnomalyConfig(
          "daily_events", "click", detectionMethod = "zscore"), ts1)
        engine.anomalyConfigs.createConfig(graft.types.AnomalyConfig(
          "daily_events", "error", detectionMethod = "iqr"), ts1)
        engine.runAnomalyScanAll(ts1, historyDays = 31)
          .select(col("table_name"), col("metric_name"), col("method"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("metric_value"), round(col("score"), 6).as("score"),
            col("is_anomaly"), col("threshold"), col("severity"))
          .orderBy("method", "table_name", "day")
      },
      Some("""WITH series0 AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS DOUBLE) AS value
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT event_type, day,
            CASE WHEN day = DATE '2024-01-15' THEN value * 10 ELSE value END
              AS value
          FROM series0 WHERE event_type IN ('click', 'error')),
        z AS (
          SELECT event_type, day, value,
            AVG(value) OVER (PARTITION BY event_type) AS m,
            STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd,
            COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series WHERE event_type = 'click'),
        zs AS (
          SELECT event_type, day, value,
            CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM z WHERE n >= 2),
        zfin AS (
          SELECT event_type AS table_name, 'daily_events' AS metric_name,
            'zscore' AS method, strftime(day, '%Y-%m-%d') AS day,
            value AS metric_value, ROUND(raw_score, 6) AS score,
            TRUE AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
            CASE WHEN raw_score > 5.0 THEN 'high'
              WHEN raw_score > 3.5 THEN 'medium' ELSE 'low' END AS severity
          FROM zs WHERE raw_score > 3.0),
        i AS (
          SELECT event_type, day, value,
            quantile_cont(value, 0.25) OVER (PARTITION BY event_type) AS q1,
            quantile_cont(value, 0.75) OVER (PARTITION BY event_type) AS q3,
            COUNT(value) OVER (PARTITION BY event_type) AS n
          FROM series WHERE event_type = 'error'),
        ib AS (
          SELECT event_type, day, value, q3 - q1 AS iqr,
            q1 - (q3 - q1) * 1.5 AS lower_b, q3 + (q3 - q1) * 1.5 AS upper_b
          FROM i WHERE n >= 4),
        iscored AS (
          SELECT event_type, day, value,
            CASE WHEN value < lower_b THEN
              CASE WHEN iqr > 0 THEN ABS((lower_b - value) / iqr)
                ELSE CAST('inf' AS DOUBLE) END
            WHEN value > upper_b THEN
              CASE WHEN iqr > 0 THEN ABS((value - upper_b) / iqr)
                ELSE CAST('inf' AS DOUBLE) END
            ELSE 0.0 END AS raw_score,
            value < lower_b OR value > upper_b AS is_anomaly
          FROM ib),
        ifin AS (
          SELECT event_type AS table_name, 'daily_events' AS metric_name,
            'iqr' AS method, strftime(day, '%Y-%m-%d') AS day,
            value AS metric_value, ROUND(raw_score, 6) AS score,
            is_anomaly, CAST(1.5 AS DOUBLE) AS threshold,
            CASE WHEN raw_score > 3.0 THEN 'high'
              WHEN raw_score > 1.5 THEN 'medium' ELSE 'low' END AS severity
          FROM iscored WHERE is_anomaly)
        SELECT * FROM (SELECT * FROM zfin UNION ALL SELECT * FROM ifin)
        ORDER BY method, table_name, day""")),

    // A-lifecycle (core/anomalies/api.py:275-332,356-506,569-639): a
    // triaged store — two spiked scans persisted at different run days,
    // then three bulk status updates so all four statuses appear — read
    // back as the triage list (a12), the summary row (a13) and the
    // densified daily dashboard trend (t11, registered here to share
    // the fixture builder).
    Q("a12_anomaly_status",
      (s, d) => triagedAnomalyStore(s, d, "a12")
        .list(anomaliesOnly = true)
        .select(col("anomaly_id"), col("table_name"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("metric_value"), col("severity"), col("status"),
          col("resolution_note"),
          date_format(col("resolved_at"), "yyyy-MM-dd HH:mm:ss")
            .as("resolved_at"),
          col("resolved_by"))
        .orderBy("table_name", "day"),
      Some(s"""$duckTriagedAnomalies
        SELECT md5(concat_ws('|', table_name, '', 'daily_events',
            CAST(CAST(day AS TIMESTAMP) AS VARCHAR), 'zscore',
            CAST(run_at AS VARCHAR))) AS anomaly_id,
          table_name, strftime(day, '%Y-%m-%d') AS day, metric_value,
          severity, status, resolution_note, resolved_at, resolved_by
        FROM tri ORDER BY table_name, day""")),

    Q("a13_anomaly_summary",
      (s, d) => triagedAnomalyStore(s, d, "a13")
        .summary(java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), days = 30),
      Some(s"""$duckTriagedAnomalies
        SELECT CAST(COUNT(*) AS BIGINT) AS total_anomalies,
          CAST(COUNT(*) FILTER (severity = 'high') AS BIGINT) AS high_severity,
          CAST(COUNT(*) FILTER (severity = 'medium') AS BIGINT) AS medium_severity,
          CAST(COUNT(*) FILTER (severity = 'low') AS BIGINT) AS low_severity,
          CAST(COUNT(*) FILTER (status = 'open') AS BIGINT) AS open,
          CAST(COUNT(*) FILTER (status = 'acknowledged') AS BIGINT) AS acknowledged,
          CAST(COUNT(*) FILTER (status = 'resolved') AS BIGINT) AS resolved,
          CAST(COUNT(*) FILTER (status = 'expected') AS BIGINT) AS expected,
          CAST(COUNT(*) FILTER (CAST(run_at AS DATE) = DATE '2024-01-31')
            AS BIGINT) AS detected_today
        FROM tri""")),

    Q("t11_anomaly_dashboard",
      (s, d) => triagedAnomalyStore(s, d, "t11")
        .trends(java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), days = 30),
      Some(s"""$duckTriagedAnomalies,
        spine AS (SELECT UNNEST(generate_series(DATE '2024-01-01',
          DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day),
        daily AS (SELECT CAST(run_at AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS total,
          CAST(COUNT(*) FILTER (severity = 'high') AS BIGINT) AS high,
          CAST(COUNT(*) FILTER (severity = 'medium') AS BIGINT) AS medium,
          CAST(COUNT(*) FILTER (severity = 'low') AS BIGINT) AS low
          FROM tri GROUP BY 1)
        SELECT strftime(spine.day, '%Y-%m-%d') AS date,
          COALESCE(total, 0) AS total, COALESCE(high, 0) AS high,
          COALESCE(medium, 0) AS medium, COALESCE(low, 0) AS low
        FROM spine LEFT JOIN daily ON spine.day = daily.day
        ORDER BY date""")))

  // ------------------------------------------------------------------
  // B-series: batch multiplexer
  // ------------------------------------------------------------------

  private def batchQueries: Seq[Q] = Seq(
    Q("b01_batch_multiplex",
      // one call fanning to three sub-operations in a shared session
      // (reference /api/batch, app.py:5853-5990): two real ops + one
      // unknown route. Per-request isolation keeps the batch alive
      // through the unknown op, and `head` (first cell of each
      // sub-result) witnesses that the sub-queries actually executed —
      // the oracle recomputes both values independently.
      (s, d) => {
        import graft.api.BatchRunner
        BatchRunner.summary(s, d,
            Seq(BatchRunner.BatchRequest("r1", "p01_row_count"),
              BatchRunner.BatchRequest("r2", "d01_exact_dup_count"),
              BatchRunner.BatchRequest("bad", "nope_no_such_op")),
            queries)
          .orderBy("id")
      },
      Some("""SELECT * FROM (VALUES
          ('bad', 'nope_no_such_op', false, CAST(-1 AS BIGINT),
            CAST(NULL AS VARCHAR), 'unknown op: nope_no_such_op'),
          ('r1', 'p01_row_count', true, CAST(1 AS BIGINT),
            CAST((SELECT COUNT(*) FROM lineitem) AS VARCHAR),
            CAST(NULL AS VARCHAR)),
          ('r2', 'd01_exact_dup_count', true, CAST(1 AS BIGINT),
            CAST((SELECT COUNT(text) - COUNT(DISTINCT text) FROM
              (SELECT text FROM documents
               UNION ALL SELECT text FROM
                 (SELECT text FROM documents ORDER BY doc_id LIMIT 50)))
              AS VARCHAR),
            CAST(NULL AS VARCHAR))
        ) AS v(id, op, ok, rows, head, error)
        ORDER BY id""")),

    Q("b02_scheduled_ingest",
      // the daily corpus-ingest turn as a PERSISTED scheduled job
      // (reference automation loop, simplified_scheduler.py:65-131, at
      // LLM-pipeline scale): a standing corpus (the [60%, 70%) id
      // band) seeds a MinHash store; dated landing slices (10% each)
      // arrive; the
      // driver "was down" while days 1 and 2 landed — the first daily
      // tick catches BOTH up (pending = landed − processed-ledger),
      // the second tick processes day 3, and a third tick with nothing
      // landed is a ledger no-op. Per slice: quality gate → exact
      // dedup within the slice → near-dup screen vs the store
      // (32 bands: the d10 pigeonhole makes banded = all-pairs at
      // threshold 0.9) → signature append → ledger row → event
      // publish. The oracle replays the whole three-turn cascade from
      // the persisted base/slice signatures — including which TICK
      // processed each slice (the catch-up proof is in processed_at).
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "b02")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        // standing corpus = the [60%, 70%) id band — slice-sized, so
        // the fixture cost is O(slices), not O(corpus); the docs below
        // it simply never entered this store's world
        val cb = 6L * (maxId + 1L) / 10L
        val c0 = 7L * (maxId + 1L) / 10L
        val c1 = 8L * (maxId + 1L) / 10L
        val c2 = 9L * (maxId + 1L) / 10L
        // ONE signing pass covers the standing corpus AND the replay
        // sidecar (the oracle needs DROPPED landing docs' signatures
        // too, which the store by definition never keeps): sign
        // [cb, ∞) once, split the cached frame at the store boundary.
        // The four fixture writes are independent of each other, so
        // they run as CONCURRENT actions (Spark schedules them in one
        // pool) — the fixture costs one wall-clock write, not four.
        val fixtureSigs = Dedup.minhashSignatures(
          docs.filter(col("doc_id") >= cb), numBands = 32).cache()
        def land(lo: Long, hi: Long, day: String): Unit =
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
            .coalesce(4)
            .write.mode("overwrite").parquet(state + s"/landing/$day")
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        Await.result(Future.sequence(Seq(
          Future(Dedup.minhashStoreSave(
            Dedup.MinhashStore(
              fixtureSigs.filter(col("doc_id") < c0).coalesce(4),
              "doc_id", 3, 128, 32, 42L),
            state + "/store")),
          Future(fixtureSigs.filter(col("doc_id") >= c0)
            .coalesce(4).write.mode("overwrite")
            .parquet(state + "/allsigs")),
          Future(land(c0, c1, "2024-01-01")),
          Future(land(c1, c2, "2024-01-02")))), Duration.Inf)
        fixtureSigs.unpersist()
        val engine = new graft.api.GraftEngine(s, d, state + "/engine")
        val jobs = new graft.scheduler.JobStore(s, state + "/jobs")
        jobs.save(graft.scheduler.Scheduler.Job("daily_ingest",
            "ingest_automation",
            graft.scheduler.Scheduler.Daily(java.time.LocalTime.of(2, 0))),
          java.time.Instant.parse("2024-01-01T00:00:00Z"))
        val cfg = graft.scheduler.IngestScheduler.IngestConfig(
          state + "/landing", state + "/store", state + "/ledger",
          curation = Curation.CurationConfig(jaccardThreshold = 0.9))
        val auto = new graft.scheduler.Automation(engine, Nil,
          jobStore = Some(jobs), ingest = Some(cfg))
        try {
          auto.tick(java.time.Instant.parse("2024-01-02T03:00:00Z"))
          auto.drain()
          land(c2, maxId + 1L, "2024-01-03") // lands after the 1st tick
          auto.tick(java.time.Instant.parse("2024-01-03T03:00:00Z"))
          auto.drain()
          auto.tick(java.time.Instant.parse("2024-01-04T03:00:00Z"))
          auto.drain() // due again, nothing pending: must be a no-op
        } finally auto.shutdown()
        new graft.scheduler.IngestScheduler.IngestLedger(
            s, state + "/ledger")
          .frame
          .select(col("slice_id"),
            date_format(col("processed_at"), "yyyy-MM-dd HH:mm:ss")
              .as("processed_at"),
            col("arrived"), col("after_quality"),
            col("dropped_exact_within"), col("dropped_near_dup"),
            col("kept"))
          .orderBy("slice_id")
      },
      Some(s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        cuts AS (SELECT 6 * (m + 1) // 10 AS cb,
          7 * (m + 1) // 10 AS c0, 8 * (m + 1) // 10 AS c1,
          9 * (m + 1) // 10 AS c2 FROM mx),
        prof AS (SELECT doc_id, n_tokens, quality_score
          FROM ($duckTextProfileSql)),
        land AS (
          SELECT d.doc_id, d.text,
            CASE WHEN d.doc_id < (SELECT c1 FROM cuts) THEN '2024-01-01'
                 WHEN d.doc_id < (SELECT c2 FROM cuts) THEN '2024-01-02'
                 ELSE '2024-01-03' END AS slice_id
          FROM documents d WHERE d.doc_id >= (SELECT c0 FROM cuts)),
        q AS (SELECT l.slice_id, l.doc_id, l.text FROM land l
          JOIN prof p ON p.doc_id = l.doc_id
          WHERE p.quality_score >= CAST(0.5 AS DOUBLE)
            AND p.n_tokens >= 10),
        ex AS (SELECT q.slice_id, q.doc_id FROM q
          JOIN (SELECT slice_id, md5(text) AS h, MIN(doc_id) AS keep_id
                FROM q GROUP BY 1, 2) k ON q.doc_id = k.keep_id),
        basesig AS (SELECT doc_id, signature FROM read_parquet(
            '/tmp/graft_qstate/b02/store/signatures/*.parquet')
          WHERE doc_id >= (SELECT cb FROM cuts)
            AND doc_id < (SELECT c0 FROM cuts)),
        lsig AS (SELECT doc_id, signature FROM read_parquet(
            '/tmp/graft_qstate/b02/allsigs/*.parquet')),
        ex1 AS (SELECT doc_id FROM ex WHERE slice_id = '2024-01-01'),
        ex2 AS (SELECT doc_id FROM ex WHERE slice_id = '2024-01-02'),
        ex3 AS (SELECT doc_id FROM ex WHERE slice_id = '2024-01-03'),
        drop1 AS (SELECT DISTINCT ds.doc_id FROM ex1 e
          JOIN lsig ds ON ds.doc_id = e.doc_id
          JOIN (SELECT * FROM basesig UNION ALL
                SELECT s.doc_id, s.signature FROM lsig s
                JOIN ex1 x ON x.doc_id = s.doc_id) o
            ON o.doc_id < ds.doc_id
          WHERE CAST(len(list_filter(range(1, 129),
              i -> ds.signature[i] = o.signature[i])) AS DOUBLE) / 128.0
            >= CAST(0.9 AS DOUBLE)),
        kept1 AS (SELECT doc_id FROM ex1
          WHERE doc_id NOT IN (SELECT doc_id FROM drop1)),
        drop2 AS (SELECT DISTINCT ds.doc_id FROM ex2 e
          JOIN lsig ds ON ds.doc_id = e.doc_id
          JOIN (SELECT * FROM basesig
                UNION ALL SELECT s.doc_id, s.signature FROM lsig s
                  JOIN kept1 x ON x.doc_id = s.doc_id
                UNION ALL SELECT s.doc_id, s.signature FROM lsig s
                  JOIN ex2 x ON x.doc_id = s.doc_id) o
            ON o.doc_id < ds.doc_id
          WHERE CAST(len(list_filter(range(1, 129),
              i -> ds.signature[i] = o.signature[i])) AS DOUBLE) / 128.0
            >= CAST(0.9 AS DOUBLE)),
        kept2 AS (SELECT doc_id FROM ex2
          WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
        drop3 AS (SELECT DISTINCT ds.doc_id FROM ex3 e
          JOIN lsig ds ON ds.doc_id = e.doc_id
          JOIN (SELECT * FROM basesig
                UNION ALL SELECT s.doc_id, s.signature FROM lsig s
                  JOIN kept1 x ON x.doc_id = s.doc_id
                UNION ALL SELECT s.doc_id, s.signature FROM lsig s
                  JOIN kept2 x ON x.doc_id = s.doc_id
                UNION ALL SELECT s.doc_id, s.signature FROM lsig s
                  JOIN ex3 x ON x.doc_id = s.doc_id) o
            ON o.doc_id < ds.doc_id
          WHERE CAST(len(list_filter(range(1, 129),
              i -> ds.signature[i] = o.signature[i])) AS DOUBLE) / 128.0
            >= CAST(0.9 AS DOUBLE)),
        kept3 AS (SELECT doc_id FROM ex3
          WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
        counts AS (SELECT slice_id, CAST(COUNT(*) AS BIGINT) AS arrived
          FROM land GROUP BY 1),
        qc AS (SELECT slice_id, CAST(COUNT(*) AS BIGINT) AS after_quality
          FROM q GROUP BY 1),
        exc AS (SELECT slice_id, CAST(COUNT(*) AS BIGINT) AS n_ex
          FROM ex GROUP BY 1),
        keptc AS (
          SELECT '2024-01-01' AS slice_id,
            CAST(COUNT(*) AS BIGINT) AS kept FROM kept1
          UNION ALL SELECT '2024-01-02',
            CAST(COUNT(*) AS BIGINT) FROM kept2
          UNION ALL SELECT '2024-01-03',
            CAST(COUNT(*) AS BIGINT) FROM kept3)
        SELECT c.slice_id,
          CASE WHEN c.slice_id = '2024-01-03' THEN '2024-01-03 03:00:00'
               ELSE '2024-01-02 03:00:00' END AS processed_at,
          c.arrived,
          COALESCE(qc.after_quality, 0) AS after_quality,
          COALESCE(qc.after_quality, 0) - COALESCE(exc.n_ex, 0)
            AS dropped_exact_within,
          COALESCE(exc.n_ex, 0) - COALESCE(keptc.kept, 0)
            AS dropped_near_dup,
          COALESCE(keptc.kept, 0) AS kept
        FROM counts c
        LEFT JOIN qc USING (slice_id)
        LEFT JOIN exc USING (slice_id)
        LEFT JOIN keptc USING (slice_id)
        ORDER BY c.slice_id""")),

    Q("b03_curation_funnel",
      // the WHOLE batch-curation pipeline oracled as ONE query: raw →
      // quality gate → benchmark decontamination → exact+near dedup →
      // deterministic split, each stage pinned by (n_docs, id_sum) so
      // the oracle verifies WHICH docs survive every gate, not just
      // how many. EVERY stage comes from the real product cascade
      // (Curation.curateCorpusStaged, whose `curated` IS what
      // curateCorpus returns) — if its internal composition ever
      // drifted from the documented semantics, this hash would break. The oracle
      // recomputes the entire cascade from raw text in DuckDB: the
      // x01 profile SQL feeds the quality gate, the x08 bigram-overlap
      // shape feeds decontamination, the d02 md5 + d03 shared-shingle
      // Jaccard shapes feed the pair graph, the d05 recursive closure
      // dedups, and the x06 md5 buckets assign splits. LSH-candidates
      // == all-pairs-at-j>=0.9 holds a fortiori on this subset of the
      // corpus d03 proves it on.
      (s, d) => {
        val docs = t(s, d, "documents")
        // thresholds chosen where the fixture's distributions actually
        // bite: the synthetic text is uniformly clean (quality 0.9+),
        // so the length floor (min 30 tokens) is the working quality
        // gate; contamination > 0.8 drops the benchmark docs plus
        // their true leaks, not the half-corpus a common-vocab
        // fixture shares at 0.2
        val cfg = Curation.CurationConfig(minTokens = 30,
          maxContamination = Some(0.8))
        val bench = TextAnalysis.wordNgrams(
          docs.filter(col("doc_id") < 10)).select("ngram")
        // ALL four stages come from the ONE product call — the staged
        // form checkpoints each boundary (every stage frame has >= 2
        // consumers here: the next stage plus its funnel row), so the
        // cascade runs each gate exactly once
        val stages = Curation.curateCorpusStaged(docs, Some(bench), cfg)
        val kept1 = stages.afterQuality
        val kept2 = stages.afterDecontamination
        val curated = stages.curated
          .select(col("doc_id"), col("split"))
          .localCheckpoint()
        def stageRow(ord: Int, stage: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n_docs"),
              coalesce(sum(col("doc_id")), lit(0L)).cast("long")
                .as("id_sum"))
            .select(lit(ord).as("stage_ord"), lit(stage).as("stage"),
              col("n_docs"), col("id_sum"))
        stageRow(0, "raw", docs)
          .unionByName(stageRow(1, "quality", kept1))
          .unionByName(stageRow(2, "decontaminated", kept2))
          .unionByName(stageRow(3, "deduped", curated))
          .unionByName(curated.groupBy(col("split"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("doc_id")).cast("long").as("id_sum"))
            .select(lit(4).as("stage_ord"),
              concat(lit("split:"), col("split")).as("stage"),
              col("n_docs"), col("id_sum")))
          .orderBy("stage_ord", "stage")
      },
      Some(s"""WITH RECURSIVE
        prof AS (SELECT doc_id, n_tokens, quality_score
          FROM ($duckTextProfileSql)),
        kept1 AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN prof p USING (doc_id)
          WHERE p.quality_score >= 0.5 AND p.n_tokens >= 30),
        btoks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents WHERE doc_id < 10),
        bgr AS (
          SELECT DISTINCT w[i] || ' ' || w[i+1] AS ngram
          FROM (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM btoks WHERE len(w) >= 2)),
        ktoks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM kept1),
        grams AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS ngram
          FROM (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM ktoks WHERE len(w) >= 2)),
        contam AS (
          SELECT g.doc_id,
            ROUND(CAST(COUNT(b.ngram) AS DOUBLE) / COUNT(*), 6) AS c
          FROM grams g LEFT JOIN bgr b USING (ngram)
          GROUP BY g.doc_id),
        kept2 AS (
          SELECT k.doc_id, k.text FROM kept1 k
          WHERE k.doc_id NOT IN
            (SELECT doc_id FROM contam WHERE c > 0.8)),
        md5p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM kept2 a JOIN kept2 b
            ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        stoks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> len(t) > 0) AS ts
          FROM kept2),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM stoks WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        cp AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jacp AS (
          SELECT id_a, id_b FROM cp
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)
            >= CAST(0.9 AS DOUBLE)),
        allp AS (
          SELECT id_a, id_b FROM md5p
          UNION SELECT id_a, id_b FROM jacp),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM allp
          UNION SELECT id_b AS src, id_a AS dst FROM allp),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src),
        surv AS (
          SELECT k.doc_id FROM kept2 k
          LEFT JOIN clust c ON k.doc_id = c.doc_id
          WHERE c.cluster_id IS NULL OR c.cluster_id = k.doc_id),
        spl AS (
          SELECT doc_id,
            CASE WHEN bucket < 800 THEN 'train'
              WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id,
              CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 1000 AS bucket
            FROM surv))
        SELECT CAST(0 AS INT) AS stage_ord, 'raw' AS stage,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS id_sum
          FROM documents
        UNION ALL SELECT 1, 'quality', CAST(COUNT(*) AS BIGINT),
            CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM kept1
        UNION ALL SELECT 2, 'decontaminated', CAST(COUNT(*) AS BIGINT),
            CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM kept2
        UNION ALL SELECT 3, 'deduped', CAST(COUNT(*) AS BIGINT),
            CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM surv
        UNION ALL SELECT 4, 'split:' || split, CAST(COUNT(*) AS BIGINT),
            CAST(SUM(doc_id) AS BIGINT) FROM spl GROUP BY split
        ORDER BY stage_ord, stage""")))

  // ------------------------------------------------------------------
  // T-series: trends / history analytics
  // ------------------------------------------------------------------

  private def trendQueries: Seq[Q] = Seq(
    // T1: profile-history round trip — three persisted runs, read back
    // newest-first with the limit honored (supabase_manager.py:218-266).
    // row_count for region is 5 at every SF, so the pinned oracle holds
    // across the verify (sf0.01) and bench (sf0.1) dirs.
    Q("t12_scd2_build",
      // type-2 slowly-changing-dimension merge: bootstrap the dimension
      // from customer, apply a DECLARED snapshot mutation (%7 balance
      // change, %13 delete, %17 insert-clone at key+1e6), merge. ONE
      // key-partitioned full-outer join between the open slice and the
      // snapshot; closed history passes through untouched — the shape
      // that keeps a 100 TB dimension incremental. The oracle re-states
      // the same full-outer case analysis with IS DISTINCT FROM.
      (s, d) => {
        import graft.operators.Scd
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val dim = Scd.scd2Init(cust, "2025-01-01 00:00:00")
        val snapshot = cust.filter(col("c_custkey") % 13 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
              .otherwise(col("c_acctbal")))
          .unionByName(cust.filter(col("c_custkey") % 17 === 0)
            .select((col("c_custkey") + 1000000L).as("c_custkey"),
              lit(0.0).as("c_acctbal"), lit("NEW").as("c_mktsegment")))
        Scd.scd2Merge(dim, snapshot, Seq("c_custkey"),
            Seq("c_acctbal", "c_mktsegment"), "2026-01-01 00:00:00")
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH dim AS (
          SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        snap AS (
          SELECT c_custkey,
            CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
              ELSE c_acctbal END AS c_acctbal,
            c_mktsegment
          FROM customer WHERE c_custkey % 13 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, CAST(0 AS DOUBLE), 'NEW'
          FROM customer WHERE c_custkey % 17 = 0),
        j AS (
          SELECT d.c_custkey AS dk, d.c_acctbal AS da,
            d.c_mktsegment AS dm, s.c_custkey AS sk,
            s.c_acctbal AS sa, s.c_mktsegment AS sm
          FROM dim d FULL OUTER JOIN snap s ON d.c_custkey = s.c_custkey),
        merged AS (
          SELECT dk AS c_custkey, da AS c_acctbal, dm AS c_mktsegment,
            '2025-01-01 00:00:00' AS valid_from,
            '2026-01-01 00:00:00' AS valid_to, FALSE AS is_current
          FROM j WHERE dk IS NOT NULL AND (sk IS NULL
            OR da IS DISTINCT FROM sa OR dm IS DISTINCT FROM sm)
          UNION ALL
          SELECT dk, da, dm, '2025-01-01 00:00:00',
            '9999-12-31 00:00:00', TRUE
          FROM j WHERE dk IS NOT NULL AND sk IS NOT NULL
            AND da IS NOT DISTINCT FROM sa AND dm IS NOT DISTINCT FROM sm
          UNION ALL
          SELECT sk, sa, sm, '2026-01-01 00:00:00',
            '9999-12-31 00:00:00', TRUE
          FROM j WHERE sk IS NOT NULL AND (dk IS NULL
            OR da IS DISTINCT FROM sa OR dm IS DISTINCT FROM sm))
        SELECT * FROM merged ORDER BY c_custkey, valid_from""")),

    Q("t01_profile_history",
      (s, d) => {
        val store = new graft.history.ProfileStore(s,
          freshState(s, "t01") + "/profiles")
        val cat = Catalog(s, d)
        val p = Profiler.profile(t(s, d, "region"), "region",
          Some(cat.tableMeta("region")))
        Seq("2026-01-01", "2026-01-02", "2026-01-03").foreach(day =>
          store.append(p, java.sql.Timestamp.valueOf(s"$day 00:00:00")))
        store.history("region", limit = 2)
          .select(col("table_name"),
            col("metric_value").as("row_count"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("run_ts"))
          .orderBy(col("run_ts").desc)
      },
      Some("""SELECT * FROM (VALUES
          ('region', CAST(5.0 AS DOUBLE), '2026-01-03 00:00:00'),
          ('region', CAST(5.0 AS DOUBLE), '2026-01-02 00:00:00'))
        AS t(table_name, row_count, run_ts)
        ORDER BY run_ts DESC""")),

    Q("t02_metric_trends",
      (s, d) => {
        val series = eventsTable(s, d)
          .groupBy(col("event_type").as("column_name"),
            to_date(col("ts")).as("ts"))
          .agg(sum(col("value").cast("decimal(28,6)")).cast("double")
            .as("metric_value"))
          .withColumn("metric_name", lit("daily_value_sum"))
        Trends.metricTrends(series)
          .select(col("column"), col("metric"),
            round(col("current_value"), 6).as("current_value"),
            round(col("min_value"), 6).as("min_value"),
            round(col("max_value"), 6).as("max_value"),
            round(col("absolute_change"), 6).as("absolute_change"),
            round(col("percent_change"), 6).as("percent_change"))
          .orderBy("column")
      },
      Some("""WITH series AS (
          SELECT event_type AS clmn, CAST(ts AS DATE) AS day,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2)
        SELECT clmn AS "column", 'daily_value_sum' AS metric,
          ROUND(arg_max(v, day), 6) AS current_value,
          ROUND(MIN(v), 6) AS min_value,
          ROUND(MAX(v), 6) AS max_value,
          ROUND(arg_max(v, day) - arg_min(v, day), 6) AS absolute_change,
          ROUND(CASE WHEN arg_min(v, day) <> 0
            THEN (arg_max(v, day) - arg_min(v, day)) / arg_min(v, day) * 100.0 END, 6)
            AS percent_change
        FROM series GROUP BY clmn ORDER BY "column"""")),

    Q("t03_validation_daily_trends",
      (s, d) => {
        val results = eventsTable(s, d).select(
          col("event_type").as("rule_id"),
          when(col("value") > 400, lit(null).cast("boolean"))
            .otherwise(col("value") > 100).as("is_valid"),
          col("ts").as("run_at"))
        Trends.validationDailyTrends(results, totalRules = 5,
          "2024-01-01", "2024-01-30")
      },
      Some("""WITH results AS (
          SELECT event_type AS rule_id,
            CASE WHEN value > 400 THEN NULL ELSE value > 100 END AS is_valid,
            ts AS run_at FROM events),
        latest AS (
          SELECT rule_id, CAST(run_at AS DATE) AS day, is_valid,
            ROW_NUMBER() OVER (PARTITION BY rule_id, CAST(run_at AS DATE)
              ORDER BY run_at DESC) AS rn
          FROM results),
        daily AS (
          SELECT day, COUNT(*) AS total_validations,
            COUNT(CASE WHEN is_valid = TRUE THEN 1 END) AS passed,
            COUNT(CASE WHEN is_valid = FALSE THEN 1 END) AS failed,
            COUNT(CASE WHEN is_valid IS NULL THEN 1 END) AS errored
          FROM latest WHERE rn = 1 GROUP BY day),
        cal AS (SELECT UNNEST(generate_series(DATE '2024-01-01',
          DATE '2024-01-30', INTERVAL 1 DAY))::DATE AS day)
        SELECT cal.day,
          CAST(COALESCE(total_validations, 0) AS BIGINT) AS total_validations,
          CAST(COALESCE(passed, 0) AS BIGINT) AS passed,
          CAST(COALESCE(failed, 0) AS BIGINT) AS failed,
          CAST(COALESCE(errored, 0) AS BIGINT) AS errored,
          ROUND(CASE WHEN COALESCE(passed, 0) + COALESCE(failed, 0) > 0
            THEN CAST(passed AS DOUBLE) / (passed + failed) * 100.0
            ELSE 0.0 END, 2) AS health_score,
          CAST(5 - COALESCE(total_validations, 0) AS BIGINT) AS not_run
        FROM cal LEFT JOIN daily ON cal.day = daily.day
        ORDER BY cal.day""")),

    Q("t04_current_health_score",
      (s, d) => {
        val results = eventsTable(s, d).select(
          col("event_type").as("rule_id"),
          when(col("value") > 400, lit(null).cast("boolean"))
            .otherwise(col("value") > 100).as("is_valid"),
          col("ts").as("run_at"))
        Trends.currentHealthScore(results)
      },
      Some("""WITH results AS (
          SELECT event_type AS rule_id,
            CASE WHEN value > 400 THEN NULL ELSE value > 100 END AS is_valid,
            ts AS run_at FROM events),
        latest AS (
          SELECT rule_id, is_valid,
            ROW_NUMBER() OVER (PARTITION BY rule_id ORDER BY run_at DESC) AS rn
          FROM results)
        SELECT
          CAST(COUNT(CASE WHEN is_valid = TRUE THEN 1 END) AS BIGINT) AS passed,
          CAST(COUNT(CASE WHEN is_valid = FALSE THEN 1 END) AS BIGINT) AS failed,
          ROUND(CASE WHEN COUNT(CASE WHEN is_valid IS NOT NULL THEN 1 END) > 0
            THEN CAST(COUNT(CASE WHEN is_valid = TRUE THEN 1 END) AS DOUBLE)
              / COUNT(CASE WHEN is_valid IS NOT NULL THEN 1 END) * 100.0
            ELSE 0.0 END, 2) AS health_score
        FROM latest WHERE rn = 1""")),

    Q("t05_change_frequency",
      (s, d) => {
        val checks = eventsTable(s, d).select(
          lit("table").as("object_type"),
          col("event_type").as("object_name"),
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        Trends.changeFrequency(checks)
          .select(col("object_type"), col("object_name"), col("total_checks"),
            col("changes_detected"), round(col("change_ratio"), 6).as("change_ratio"),
            col("frequency"),
            round(col("avg_hours_between_changes"), 6).as("avg_hours_between_changes"),
            date_format(col("most_recent_change"), "yyyy-MM-dd HH:mm:ss")
              .as("most_recent_change"))
          .orderBy("object_name")
      },
      Some("""WITH checks AS (
          SELECT 'table' AS object_type, event_type AS object_name,
            ts AS check_timestamp, value > 250 AS change_detected
          FROM events),
        changed AS (
          SELECT object_name, check_timestamp,
            (epoch(check_timestamp) - epoch(LAG(check_timestamp, 1)
              OVER (PARTITION BY object_name ORDER BY check_timestamp))) / 3600.0
              AS hours
          FROM checks WHERE change_detected),
        agg_changed AS (
          SELECT object_name, AVG(hours) AS avg_hours,
            MAX(check_timestamp) AS most_recent
          FROM changed GROUP BY object_name),
        base AS (
          SELECT object_type, object_name,
            CAST(COUNT(*) AS BIGINT) AS total_checks,
            CAST(COUNT(CASE WHEN change_detected THEN 1 END) AS BIGINT)
              AS changes_detected
          FROM checks GROUP BY object_type, object_name)
        SELECT b.object_type, b.object_name, b.total_checks, b.changes_detected,
          ROUND(CAST(b.changes_detected AS DOUBLE) / b.total_checks, 6) AS change_ratio,
          CASE WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.5 THEN 'high'
            WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.1 THEN 'medium'
            ELSE 'low' END AS frequency,
          ROUND(CASE WHEN b.changes_detected >= 2 THEN a.avg_hours END, 6)
            AS avg_hours_between_changes,
          strftime(a.most_recent, '%Y-%m-%d %H:%M:%S') AS most_recent_change
        FROM base b LEFT JOIN agg_changed a ON b.object_name = a.object_name
        ORDER BY b.object_name""")),

    Q("t06_refresh_suggestion",
      // T6: per-object refresh-interval suggestion — the t05 frequency
      // frame mapped through the REAL Trends.suggestRefreshInterval
      // (as a UDF over the pure function, so the shipped arithmetic is
      // what's checked). avg_hours is 6dp-rounded BEFORE the suggestion
      // on both engines: t05 proves the rounded values hash-match, so
      // the floor()s inside the suggestion see identical inputs.
      (s, d) => {
        val checks = eventsTable(s, d).select(
          lit("table").as("object_type"),
          col("event_type").as("object_name"),
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        val suggest = udf { (freq: String, avg: java.lang.Double, n: Long) =>
          Trends.suggestRefreshInterval(
            freq, Option(avg).map(_.doubleValue), n)
        }
        Trends.changeFrequency(checks)
          .select(col("object_name"), col("frequency"),
            col("total_checks"),
            suggest(col("frequency"),
              round(col("avg_hours_between_changes"), 6),
              col("total_checks")).as("suggested_interval_hours"))
          .orderBy("object_name")
      },
      Some("""WITH checks AS (
          SELECT event_type AS object_name,
            ts AS check_timestamp, value > 250 AS change_detected
          FROM events),
        changed AS (
          SELECT object_name,
            (epoch(check_timestamp) - epoch(LAG(check_timestamp, 1)
              OVER (PARTITION BY object_name ORDER BY check_timestamp))) / 3600.0
              AS hours
          FROM checks WHERE change_detected),
        agg_changed AS (
          SELECT object_name, AVG(hours) AS avg_hours
          FROM changed GROUP BY object_name),
        base AS (
          SELECT object_name,
            CAST(COUNT(*) AS BIGINT) AS total_checks,
            CAST(COUNT(CASE WHEN change_detected THEN 1 END) AS BIGINT)
              AS changes_detected
          FROM checks GROUP BY object_name),
        f AS (
          SELECT b.object_name, b.total_checks,
            CASE WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.5
                THEN 'high'
              WHEN CAST(b.changes_detected AS DOUBLE) / b.total_checks >= 0.1
                THEN 'medium'
              ELSE 'low' END AS frequency,
            ROUND(CASE WHEN b.changes_detected >= 2 THEN a.avg_hours END, 6)
              AS avg_hours
          FROM base b LEFT JOIN agg_changed a ON b.object_name = a.object_name),
        s AS (
          SELECT object_name, frequency, total_checks,
            CASE WHEN total_checks < 5 THEN 24
              WHEN frequency = 'high' THEN
                CASE WHEN avg_hours IS NOT NULL THEN
                    GREATEST(1, LEAST(CAST(FLOOR(avg_hours / 3) AS INT), 24))
                  ELSE GREATEST(1, 12) END
              WHEN frequency = 'medium' THEN
                CASE WHEN avg_hours IS NOT NULL AND avg_hours < 24 THEN
                    GREATEST(1, CAST(FLOOR(avg_hours * 0.75) AS INT))
                  ELSE 24 END
              ELSE LEAST(168, 48) END AS raw
          FROM f)
        SELECT object_name, frequency, total_checks,
          CAST(GREATEST(1, LEAST(168, raw)) AS INT)
            AS suggested_interval_hours
        FROM s ORDER BY object_name""")),

    Q("t07_high_impact_objects",
      (s, d) => {
        val checks = eventsTable(s, d).select(
          lit("table").as("object_type"),
          col("event_type").as("object_name"),
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        Trends.highImpactObjects(Trends.changeFrequency(checks), limit = 3)
          .select(col("object_name"), col("changes_detected"))
      },
      Some("""SELECT event_type AS object_name,
          CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS changes_detected
        FROM events GROUP BY event_type
        ORDER BY changes_detected DESC, object_name LIMIT 3""")),

    Q("t08_daily_check_stats",
      (s, d) => {
        val checks = eventsTable(s, d).select(
          col("ts").as("check_timestamp"),
          (col("value") > 250).as("change_detected"))
        Trends.dailyCheckStats(checks)
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS checks,
          CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS changes,
          ROUND(CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS DOUBLE)
            / COUNT(*) * 100.0, 2) AS change_pct
        FROM events GROUP BY 1 ORDER BY day""")),

    Q("t10_frequency_distribution",
      // T8's frequency half (app.py:5456-5490): ≥5-check objects bucketed
      // by change ratio, one row per non-empty bucket
      (s, d) => {
        val checks = eventsTable(s, d).select(
          col("event_type").as("object_name"),
          (col("value") > 250).as("change_detected"))
        Trends.frequencyDistribution(checks).orderBy("frequency")
      },
      Some("""WITH per_object AS (
          SELECT event_type AS object_name,
            CAST(COUNT(*) AS BIGINT) AS checks,
            CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS changes
          FROM events WHERE event_type IS NOT NULL
          GROUP BY event_type HAVING COUNT(*) >= 5)
        SELECT CASE WHEN CAST(changes AS DOUBLE) / checks >= 0.5 THEN 'high'
            WHEN CAST(changes AS DOUBLE) / checks >= 0.1 THEN 'medium'
            ELSE 'low' END AS frequency,
          CAST(COUNT(*) AS BIGINT) AS object_count
        FROM per_object GROUP BY 1 ORDER BY frequency""")),

    Q("t09_daily_metric_avg",
      (s, d) => {
        val metrics = eventsTable(s, d)
          .select(col("ts"), col("value").as("metric_value"))
        Trends.dailyMetricAvg(metrics)
          .select(col("day"), round(col("avg_value"), 6).as("avg_value"), col("n"))
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value), 6)
            AS avg_value,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1 ORDER BY day""")),

    Q("p23_row_growth",
      (s, d) => {
        val series = eventsTable(s, d)
          .groupBy(to_date(col("ts")).as("ts"))
          .agg(count(lit(1)).cast("double").as("metric_value"))
          .withColumn("series", lit("events"))
        Trends.rowGrowth(series, Seq("series"))
          .select(col("ts").as("day"), col("metric_value"),
            col("prev_value"), round(col("growth_pct"), 6).as("growth_pct"),
            col("unusual_growth"))
          .orderBy("day")
      },
      Some("""WITH series AS (
          SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS v
          FROM events GROUP BY 1)
        SELECT day, v AS metric_value,
          LAG(v, 1) OVER (ORDER BY day) AS prev_value,
          ROUND(CASE WHEN LAG(v, 1) OVER (ORDER BY day) IS NOT NULL
            AND LAG(v, 1) OVER (ORDER BY day) <> 0
            THEN (v - LAG(v, 1) OVER (ORDER BY day))
              / LAG(v, 1) OVER (ORDER BY day) * 100.0 END, 6) AS growth_pct,
          CASE WHEN LAG(v, 1) OVER (ORDER BY day) IS NOT NULL
            THEN ABS(v - LAG(v, 1) OVER (ORDER BY day))
              > LAG(v, 1) OVER (ORDER BY day) * 0.2 END AS unusual_growth
        FROM series ORDER BY day""")))

  // ------------------------------------------------------------------
  // D/E/X-series: LLM-data-pipeline operators
  // ------------------------------------------------------------------

  /** Full-model replay for the NB classifier: counts, Laplace
   *  smoothing, priors, unseen mass, integer micro-nat sums, argmax.
   *  Shared by x52 (batch training) and x53 (merged slice states) —
   *  the incremental path must reproduce the batch model exactly, so
   *  one oracle gates both. */
  private def nbOracle(testSelect: String, vocabCap: Option[Int]): String =
    nbOracleCtes(testSelect, vocabCap) + """
        SELECT doc_id, label AS predicted,
          CAST(score_micro AS BIGINT) AS score_micro
        FROM ranked WHERE rk = 1 ORDER BY doc_id"""

  /** The shared NB-replay CTE chain (train → model → score → ranked);
   *  callers append their own final SELECT over `ranked`/`test`. */
  private def nbOracleCtes(
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

  private val nbOracleSql: String =
    nbOracle("SELECT * FROM documents WHERE doc_id % 5 = 0", None)

  private def pipelineQueries: Seq[Q] = Seq(
    Q("d01_exact_dup_count",
      (s, d) => {
        val docs = t(s, d, "documents")
        val withDupes = docs.select("text")
          .union(docs.orderBy("doc_id").limit(50).select("text"))
        Dedup.exactDuplicateCount(withDupes)
      },
      Some("""SELECT CAST(COUNT(text) - COUNT(DISTINCT text) AS BIGINT)
          AS duplicate_count
        FROM (SELECT text FROM documents
          UNION ALL SELECT text FROM
            (SELECT text FROM documents ORDER BY doc_id LIMIT 50))""")),

    Q("d02_exact_dup_groups",
      (s, d) => {
        val docs = t(s, d, "documents")
        val withDupes = docs.select("doc_id", "text")
          .union(docs.orderBy("doc_id").limit(50)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        // doc_ids flattened to a CSV string: the driver's pandas comparator
        // cannot hash/sort list cells (round-2 d02 err), scalars only.
        Dedup.exactDuplicates(withDupes)
          .select(col("text_hash"), col("cnt"),
            array_join(col("doc_ids"), ",").as("doc_ids"))
          .orderBy("text_hash")
      },
      Some("""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000, text FROM
            (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 50))
        SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT) AS cnt,
          array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
        FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
        ORDER BY text_hash""")),

    Q("d03_minhash_neardup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val sigs = Dedup.minhashSignatures(docs, numHashes = 128, numBands = 32)
        val cands = Dedup.lshCandidatePairs(sigs)
        Dedup.ngramJaccard(docs, cands)
          .filter(col("jaccard") >= 0.9)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      // oracle NOTE: exact all-pairs jaccard >= 0.9 expressed through
      // the d06 inverted-index shape (posting-list equi-join), NOT a
      // literal all-pairs nested loop — any pair at j >= 0.9 shares a
      // shingle, so the result set is identical and the oracle cost
      // drops from O(n^2) list intersections (tens of minutes at
      // sf0.1) to O(postings^2 per shingle) (seconds)
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS ts
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT id_a, id_b,
            CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS j
          FROM pairs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, ROUND(j, 6) AS jaccard
        FROM j WHERE j >= CAST(0.9 AS DOUBLE)
        ORDER BY id_a, id_b""")),

    Q("d04_simhash_neardup",
      // signature-replay oracle: the 64-bit simhash family is not
      // SQL-portable, but the verification IS — Spark persists the
      // signature table and DuckDB replays hamming ≤ 3 over all pairs
      // (pigeonhole: a pair at hamming ≤ 3 always shares one of the 4
      // chunk keys, so the bucketed candidate set equals all-pairs at
      // this threshold).
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.simhashSignatures(docs).write.mode("overwrite")
          .parquet(freshState(s, "d04") + "/signatures")
        // uncapped exact form: the all-pairs replay assumes no chunk
        // bucket was dropped (the public default caps at 1000, which on
        // a boilerplate-heavy corpus could shed a true pair whose only
        // shared chunk is the oversized bucket)
        Dedup.nearDuplicatesSimhash(docs, maxBucketSize = Int.MaxValue)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sig AS (SELECT doc_id, simhash
          FROM read_parquet('/tmp/graft_qstate/d04/signatures/*.parquet')),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            bit_count(xor(a.simhash, b.simhash)) AS h
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        SELECT id_a, id_b, CAST(h AS INT) AS hamming
        FROM pairs WHERE h <= 3 ORDER BY id_a, id_b""")),

    Q("m01_image_neardup",
      // image near-dup via dHash over REAL ImageIO-decoded pixels of a
      // deterministic synthetic PNG corpus (no media files ship in
      // testdata). Same signature-replay oracle as d04: Spark persists
      // the (id, dhash) frame, DuckDB replays all-pairs hamming ≤ 3 —
      // pigeonhole makes the bucketed candidate set equal to all-pairs
      // at this threshold.
      (s, _) => {
        val state = freshState(s, "m01")
        val imgs = Multimodal.syntheticImageCorpus(s, groups = 60)
        // cache the 240-row signature frame so the ImageIO encode +
        // decode runs ONCE (the old body re-ran it for the hamming
        // stage — ImageIO work is the whole cost here). The cache is
        // bench-safe: Bench/Verify sweep persistent RDDs per query.
        val sigs = Multimodal.imageSignatures(imgs).cache()
        sigs.write.mode("overwrite").parquet(state + "/signatures")
        Dedup.hammingNearDuplicates(sigs,
            "id", "dhash", maxHamming = 3, maxBucketSize = Int.MaxValue)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sig AS (SELECT id, dhash
          FROM read_parquet('/tmp/graft_qstate/m01/signatures/*.parquet')),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
            bit_count(xor(a.dhash, b.dhash)) AS h
          FROM sig a JOIN sig b ON a.id < b.id)
        SELECT id_a, id_b, CAST(h AS INT) AS hamming
        FROM pairs WHERE h <= 3 ORDER BY id_a, id_b""")),

    Q("m07_audio_neardup",
      // audio near-dup via the 64-bit energy+pitch fingerprint over
      // REAL WAV PCM decode (the audio lane's m01): a melody corpus
      // (segments varying freq/amp per id — a constant tone
      // fingerprints degenerately) plus 20 "re-encoded" copies at
      // gain 1.05, whose median-relative bits must still match.
      // Signature-replay oracle: fingerprints persist, DuckDB replays
      // all-pairs hamming ≤ 3.
      (s, _) => {
        val state = freshState(s, "m07")
        val base = Multimodal.syntheticMelodyCorpus(s, 150)
        val copies = Multimodal.syntheticMelodyCorpus(s, 20, gain = 1.05)
          .select((col("id") + 1000L).as("id"), col("bytes"))
        val fps = base.unionByName(copies)
          .select(col("id"),
            Multimodal.audioFingerprint(col("bytes")).as("afp"))
          .filter(col("afp").isNotNull).cache()
        fps.write.mode("overwrite").parquet(state + "/signatures")
        Dedup.hammingNearDuplicates(fps,
            "id", "afp", maxHamming = 3, maxBucketSize = Int.MaxValue)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sig AS (SELECT id, afp
          FROM read_parquet('/tmp/graft_qstate/m07/signatures/*.parquet')),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
            bit_count(xor(a.afp, b.afp)) AS h
          FROM sig a JOIN sig b ON a.id < b.id)
        SELECT id_a, id_b, CAST(h AS INT) AS hamming
        FROM pairs WHERE h <= 3 ORDER BY id_a, id_b""")),

    Q("m08_scene_cuts",
      // scene-cut detection over REAL MJPEG-in-AVI decode: each clip
      // pans gradually (+2 gray/frame) with ONE declared hard cut
      // (+100 at frame 4 + id%3); the detector flags frames whose
      // mean-intensity delta from the previous frame exceeds 0.1 —
      // exactly one cut per clip by construction. The decoded frame
      // grain persists (the m03 replay pattern) and the oracle
      // re-derives every delta, flag, and the per-clip rollup.
      (s, _) => {
        val vids = Multimodal.syntheticSceneCorpus(s, 100)
        val media = {
          import s.implicits._
          vids.as[(Long, Array[Byte])].map { case (id, bytes) =>
            Multimodal.MediaRow(id, bytes,
              Multimodal.MediaMeta("video", "avi", 32, 32, 0L))
          }
        }
        val feats = Multimodal.frameFeatures(
          Multimodal.sampleFrames(media, intervalMs = 250L))
          .select(col("id"), col("frame_idx"),
            round(col("mean_intensity"), 6).as("mi"))
        feats.coalesce(2).write.mode("overwrite")
          .parquet(freshState(s, "m08") + "/frames")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("frame_idx")
        val cuts = feats
          .withColumn("delta",
            round(abs(col("mi") - lag(col("mi"), 1).over(w)), 6))
          .withColumn("is_cut",
            coalesce(col("delta") > 0.1, lit(false)))
        cuts.groupBy("id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
            min(when(col("is_cut"), col("frame_idx"))).as("first_cut"))
          .orderBy("id")
      },
      Some("""WITH f AS (SELECT id, frame_idx, mi FROM read_parquet(
            '/tmp/graft_qstate/m08/frames/*.parquet')),
        d AS (SELECT id, frame_idx,
            ROUND(ABS(mi - LAG(mi) OVER (PARTITION BY id
              ORDER BY frame_idx)), 6) AS delta
          FROM f),
        c AS (SELECT id, frame_idx,
            COALESCE(delta > 0.1, FALSE) AS is_cut FROM d)
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_frames,
          CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cuts,
          MIN(CASE WHEN is_cut THEN frame_idx END) AS first_cut
        FROM c GROUP BY id ORDER BY id""")),

    Q("m10_gif_scene_cuts",
      // scene-cut detection over REAL animated-GIF decode — the second
      // genuinely-decodable video container beside MJPEG (stock
      // ImageIO, no codec): frames compose per the GIF89a model
      // (descriptor offsets + disposal) and carry REAL per-frame
      // delays, so the tick sampler walks the cumulative timeline.
      // Same declared-cut fixture shape as m08 (+2 gray pan, +100 at
      // frame 4 + id%3); the decoded frame grain persists and the
      // oracle re-derives every delta, flag, and per-clip rollup.
      (s, _) => {
        val vids = Multimodal.syntheticGifSceneCorpus(s, 100)
        val media = {
          import s.implicits._
          vids.as[(Long, Array[Byte])].map { case (id, bytes) =>
            Multimodal.MediaRow(id, bytes,
              Multimodal.MediaMeta("video", "gif", 32, 32, 0L))
          }
        }
        val feats = Multimodal.frameFeatures(
          Multimodal.sampleFrames(media, intervalMs = 250L))
          .select(col("id"), col("frame_idx"),
            round(col("mean_intensity"), 6).as("mi"))
        feats.coalesce(2).write.mode("overwrite")
          .parquet(freshState(s, "m10") + "/frames")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("frame_idx")
        val cuts = feats
          .withColumn("delta",
            round(abs(col("mi") - lag(col("mi"), 1).over(w)), 6))
          .withColumn("is_cut",
            coalesce(col("delta") > 0.1, lit(false)))
        cuts.groupBy("id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
            min(when(col("is_cut"), col("frame_idx"))).as("first_cut"))
          .orderBy("id")
      },
      Some("""WITH f AS (SELECT id, frame_idx, mi FROM read_parquet(
            '/tmp/graft_qstate/m10/frames/*.parquet')),
        d AS (SELECT id, frame_idx,
            ROUND(ABS(mi - LAG(mi) OVER (PARTITION BY id
              ORDER BY frame_idx)), 6) AS delta
          FROM f),
        c AS (SELECT id, frame_idx,
            COALESCE(delta > 0.1, FALSE) AS is_cut FROM d)
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_frames,
          CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cuts,
          MIN(CASE WHEN is_cut THEN frame_idx END) AS first_cut
        FROM c GROUP BY id ORDER BY id""")),

    Q("m11_y4m_scene_cuts",
      // scene-cut detection over Y4M (YUV4MPEG2) — the THIRD genuinely
      // decodable video container and the only one needing NO codec at
      // all: a plain-text stream header + raw planar frames, the format
      // ffmpeg emits for uncompressed video. The luma plane IS the
      // intensity signal (r=g=b=Y, no colorspace transform), so decoded
      // means are exact, not JPEG-approximate. Same declared-cut
      // fixture shape as m08/m10 (+2 luma pan, +100 at frame 4 + id%3);
      // the decoded frame grain persists and the oracle re-derives
      // every delta, flag, and per-clip rollup.
      (s, _) => {
        val vids = Multimodal.syntheticY4mSceneCorpus(s, 100)
        val media = {
          import s.implicits._
          vids.as[(Long, Array[Byte])].map { case (id, bytes) =>
            Multimodal.MediaRow(id, bytes,
              Multimodal.MediaMeta("video", "y4m", 32, 32, 0L))
          }
        }
        val feats = Multimodal.frameFeatures(
          Multimodal.sampleFrames(media, intervalMs = 250L))
          .select(col("id"), col("frame_idx"),
            round(col("mean_intensity"), 6).as("mi"))
        feats.coalesce(2).write.mode("overwrite")
          .parquet(freshState(s, "m11") + "/frames")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("frame_idx")
        val cuts = feats
          .withColumn("delta",
            round(abs(col("mi") - lag(col("mi"), 1).over(w)), 6))
          .withColumn("is_cut",
            coalesce(col("delta") > 0.1, lit(false)))
        cuts.groupBy("id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
            min(when(col("is_cut"), col("frame_idx"))).as("first_cut"))
          .orderBy("id")
      },
      Some("""WITH f AS (SELECT id, frame_idx, mi FROM read_parquet(
            '/tmp/graft_qstate/m11/frames/*.parquet')),
        d AS (SELECT id, frame_idx,
            ROUND(ABS(mi - LAG(mi) OVER (PARTITION BY id
              ORDER BY frame_idx)), 6) AS delta
          FROM f),
        c AS (SELECT id, frame_idx,
            COALESCE(delta > 0.1, FALSE) AS is_cut FROM d)
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_frames,
          CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cuts,
          MIN(CASE WHEN is_cut THEN frame_idx END) AS first_cut
        FROM c GROUP BY id ORDER BY id""")),

    Q("m06_asset_manifest",
      // unified multimodal catalog: one mixed blob table (PNG images,
      // WAV clips, MJPEG/AVI videos, plus junk bytes) through ONE
      // map-only manifest pass — format sniff + the type-appropriate
      // byte-parsed metadata + decodable flag. The per-asset manifest
      // persists (byte parsers aren't SQL) and the oracle replays the
      // per-format rollup over it, so the aggregation and the NULL
      // lanes (an image has no sample_rate) are both pinned.
      (s, _) => {
        val state = freshState(s, "m06")
        import s.implicits._
        val imgs = Multimodal.syntheticImageCorpus(s, groups = 20)
        val auds = Multimodal.syntheticAudioCorpus(s, n = 40)
          .select((col("id") + 1000L).as("id"), col("bytes"))
        val vids = Multimodal.syntheticVideoCorpus(s, n = 20)
          .select((col("id") + 2000L).as("id"), col("bytes"))
        val junk = Seq((3000L, "not media at all".getBytes("UTF-8")))
          .toDF("id", "bytes")
        val blobs = imgs.unionByName(auds).unionByName(vids)
          .unionByName(junk)
        Multimodal.assetManifest(blobs).write.mode("overwrite")
          .parquet(state + "/manifest")
        s.read.parquet(state + "/manifest")
          .groupBy("format")
          .agg(count(lit(1)).as("n_assets"),
            sum(when(col("decodable"), 1L).otherwise(0L))
              .as("n_decodable"),
            sum("n_bytes").as("total_bytes"),
            max("width").as("max_width"),
            max("duration_ms").as("max_duration_ms"),
            countDistinct("sample_rate").as("n_sample_rates"))
          .orderBy("format")
      },
      Some("""SELECT format, CAST(COUNT(*) AS BIGINT) AS n_assets,
          CAST(SUM(CASE WHEN decodable THEN 1 ELSE 0 END) AS BIGINT)
            AS n_decodable,
          CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
          MAX(width) AS max_width,
          MAX(duration_ms) AS max_duration_ms,
          CAST(COUNT(DISTINCT sample_rate) AS BIGINT) AS n_sample_rates
        FROM read_parquet('/tmp/graft_qstate/m06/manifest/*.parquet')
        GROUP BY format ORDER BY format""")),

    Q("m05_image_phash",
      // DCT perceptual hash over the same decoded-pixel corpus — the
      // global-spectrum second opinion next to m01's gradient dHash
      // (pHash survives brightness ramps and small crops that flip
      // dHash bits). Deterministic double DCT over integer pixel
      // pools, so the hash is JVM-stable; same signature-replay oracle
      // as m01 over the persisted (id, phash) frame.
      (s, _) => {
        val state = freshState(s, "m05")
        val imgs = Multimodal.syntheticImageCorpus(s, groups = 60)
        val sigs = Multimodal.pHashSignatures(imgs).cache()
        sigs.write.mode("overwrite").parquet(state + "/signatures")
        Dedup.hammingNearDuplicates(sigs,
            "id", "phash", maxHamming = 4, maxBucketSize = Int.MaxValue)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sig AS (SELECT id, phash
          FROM read_parquet('/tmp/graft_qstate/m05/signatures/*.parquet')),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
            bit_count(xor(a.phash, b.phash)) AS h
          FROM sig a JOIN sig b ON a.id < b.id)
        SELECT id_a, id_b, CAST(h AS INT) AS hamming
        FROM pairs WHERE h <= 4 ORDER BY id_a, id_b""")),

    Q("m02_audio_features",
      // audio-quality aggregates over REAL WAV PCM decode of a
      // deterministic synthetic corpus: Spark persists the decoded
      // (id, idx, v) sample grain and DuckDB replays the aggregation —
      // rms / peak / silent / clipped over identical doubles, so the
      // decode is pinned by spec and the distributed aggregation by the
      // oracle (the d04 replay pattern, sample-level instead of
      // signature-level).
      (s, _) => {
        val clips = Multimodal.syntheticAudioCorpus(s, 200)
        val samples = clips.select(col("id"),
          posexplode(Multimodal.audioSamples(col("bytes"))))
          .select(col("id"), col("pos").as("idx"),
            col("col").cast("double").as("v"))
        samples.write.mode("overwrite")
          .parquet(freshState(s, "m02") + "/samples")
        samples.groupBy("id").agg(
          count(lit(1)).as("n_samples"),
          round(sqrt(avg(col("v") * col("v"))), 6).as("rms"),
          round(max(abs(col("v"))), 6).as("peak"),
          sum(when(col("v") === 0.0, 1L).otherwise(0L)).as("silent_samples"),
          sum(when(abs(col("v")) > 0.999, 1L).otherwise(0L))
            .as("clipped_samples"))
          .orderBy("id")
      },
      Some("""SELECT id, COUNT(*) AS n_samples,
          ROUND(sqrt(AVG(v * v)), 6) AS rms,
          ROUND(MAX(abs(v)), 6) AS peak,
          CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS silent_samples,
          CAST(SUM(CASE WHEN abs(v) > CAST(0.999 AS DOUBLE) THEN 1 ELSE 0 END)
            AS BIGINT) AS clipped_samples
        FROM read_parquet('/tmp/graft_qstate/m02/samples/*.parquet')
        GROUP BY id ORDER BY id""")),

    Q("m09_silence_trim",
      // audio silence trimming (the speech-corpus preprocessing step:
      // leading/trailing silence is storage and compute paid for
      // nothing): over REAL WAV PCM decode, find each clip's first
      // and last sample above the 1e-3 amplitude gate and report the
      // trim points + retained fraction. The synthetic corpus's
      // id%5-length silence prefixes are exactly what the trimmer
      // must find. Sample grain persists (the m02 replay pattern) and
      // the oracle re-derives every trim point in SQL.
      (s, _) => {
        val clips = Multimodal.syntheticAudioCorpus(s, 200)
        val samples = clips.select(col("id"),
          posexplode(Multimodal.audioSamples(col("bytes"))))
          .select(col("id"), col("pos").as("idx"),
            col("col").cast("double").as("v"))
        samples.write.mode("overwrite")
          .parquet(freshState(s, "m09") + "/samples")
        samples.groupBy("id").agg(
            count(lit(1)).as("n_samples"),
            min(when(abs(col("v")) > 0.001, col("idx")))
              .as("first_voiced"),
            max(when(abs(col("v")) > 0.001, col("idx")))
              .as("last_voiced"))
          .withColumn("retained_ppm",
            when(col("first_voiced").isNull, 0L)
              .otherwise(round(lit(1e6) *
                (col("last_voiced") - col("first_voiced") + 1) /
                col("n_samples"), 0).cast("long")))
          .orderBy("id")
      },
      Some("""SELECT id, COUNT(*) AS n_samples,
          MIN(CASE WHEN abs(v) > CAST(0.001 AS DOUBLE) THEN idx END)
            AS first_voiced,
          MAX(CASE WHEN abs(v) > CAST(0.001 AS DOUBLE) THEN idx END)
            AS last_voiced,
          CASE WHEN MIN(CASE WHEN abs(v) > CAST(0.001 AS DOUBLE)
              THEN idx END) IS NULL THEN 0
            ELSE CAST(ROUND(1e6 *
              (MAX(CASE WHEN abs(v) > CAST(0.001 AS DOUBLE)
                THEN idx END)
               - MIN(CASE WHEN abs(v) > CAST(0.001 AS DOUBLE)
                THEN idx END) + 1)
              / COUNT(*), 0) AS BIGINT) END AS retained_ppm
        FROM read_parquet('/tmp/graft_qstate/m09/samples/*.parquet')
        GROUP BY id ORDER BY id""")),

    Q("m03_video_frames",
      // video-frame aggregates over REAL MJPEG-in-AVI decode of a
      // deterministic synthetic corpus: the AVI container walk yields
      // per-frame JPEG payloads, ImageIO decodes pixels, and Spark
      // persists the (id, frame_idx, ts_ms, mean_intensity) frame grain
      // that DuckDB re-aggregates — the m02 sample-replay pattern at the
      // frame level, so the distributed explode+decode+agg is oracle-
      // gated while the pixel decode itself is pinned by spec.
      (s, _) => {
        val vids = Multimodal.syntheticVideoCorpus(s, 120)
        val media = {
          import s.implicits._
          vids.as[(Long, Array[Byte])].map { case (id, bytes) =>
            Multimodal.MediaRow(id, bytes,
              Multimodal.MediaMeta("video", "avi", 32, 32, 0L))
          }
        }
        val feats = Multimodal.frameFeatures(
          Multimodal.sampleFrames(media, intervalMs = 250L))
          .select(col("id"), col("frame_idx"), col("ts_ms"),
            round(col("mean_intensity"), 6).as("mean_intensity"))
        feats.write.mode("overwrite")
          .parquet(freshState(s, "m03") + "/frames")
        feats.groupBy("id").agg(
          count(lit(1)).as("n_frames"),
          max(col("ts_ms")).as("last_ts_ms"),
          round(avg(col("mean_intensity")), 6).as("avg_intensity"),
          round(min(col("mean_intensity")), 6).as("min_intensity"),
          round(max(col("mean_intensity")), 6).as("max_intensity"))
          .orderBy("id")
      },
      Some("""SELECT id, COUNT(*) AS n_frames,
          MAX(ts_ms) AS last_ts_ms,
          ROUND(AVG(mean_intensity), 6) AS avg_intensity,
          ROUND(MIN(mean_intensity), 6) AS min_intensity,
          ROUND(MAX(mean_intensity), 6) AS max_intensity
        FROM read_parquet('/tmp/graft_qstate/m03/frames/*.parquet')
        GROUP BY id ORDER BY id""")),

    Q("m04_incremental_image_dedup",
      // the d10 ingest shape for the image family: a persisted dHash
      // signature store covers the standing corpus (id < 198); a new
      // slice (id ≥ 198, straddling group 49 so true near-dup pairs
      // cross the ingest boundary) appends its signatures and matches
      // via the 16-bit chunk-keyed cross join + within-slice hamming —
      // old images are never re-decoded. Replay oracle over the
      // persisted post-append store (pigeonhole: hamming ≤ 3 ⇒ a
      // shared chunk, so candidates ≡ all-pairs).
      (s, _) => {
        val state = freshState(s, "m04")
        val imgs = Multimodal.syntheticImageCorpus(s, groups = 60)
        val sigs = Multimodal.imageSignatures(imgs).cache()
        sigs.filter(col("id") < 198).write.mode("overwrite")
          .parquet(state + "/signatures")
        sigs.filter(col("id") >= 198).write.mode("append")
          .parquet(state + "/signatures")
        val persisted = s.read.parquet(state + "/signatures")
        Dedup.incrementalHammingNearDuplicates(
            persisted.filter(col("id") < 198),
            persisted.filter(col("id") >= 198),
            "id", "dhash", maxHamming = 3, maxBucketSize = Int.MaxValue)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sig AS (
          SELECT id, dhash
          FROM read_parquet('/tmp/graft_qstate/m04/signatures/*.parquet')),
        pairs AS (
          SELECT n.id AS id_a, o.id AS id_b,
            bit_count(xor(n.dhash, o.dhash)) AS h
          FROM sig n JOIN sig o
            ON n.id >= 198 AND (o.id < 198 OR o.id > n.id))
        SELECT id_a, id_b, CAST(h AS INT) AS hamming
        FROM pairs WHERE h <= 3 ORDER BY id_a, id_b""")),

    Q("d05_dup_clusters",
      // connected components over a deterministic candidate-pair graph
      // (chains of 5 docs: n→n+1 when n%10<4), checked against DuckDB's
      // recursive-CTE transitive closure — verifies multi-hop merging
      // (A~B, B~C ⇒ one cluster) that pairwise output alone can't show
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 10 < 4)
          .join(ids.select(col("doc_id").as("next_id")),
            col("doc_id") + 1 === col("next_id"))
          .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
        Dedup.duplicateClusters(pairs).orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
        pairs AS (
          SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
          WHERE doc_id % 10 < 4
            AND (doc_id + 1) IN (SELECT doc_id FROM documents)),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS doc_id,
          CAST(LEAST(src, MIN(dst)) AS BIGINT) AS cluster_id
        FROM reach GROUP BY src ORDER BY doc_id""")),

    Q("d16_cluster_sizes",
      // dedup's pre-commit diagnostic: the cluster SIZE distribution
      // (is the removal policy about to cut 1% or 40%?). The derived
      // pair graph makes the histogram non-trivial — chain length
      // cycles 2..5 with the block index (doc_id%10 < 1+(doc_id/10)%4)
      // — and the oracle replays transitive closure + both rollups.
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val pairs = ids
          .filter(expr("doc_id % 10 < 1 + (doc_id div 10) % 4"))
          .join(ids.select(col("doc_id").as("next_id")),
            col("doc_id") + 1 === col("next_id"))
          .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
        Dedup.clusterSizeProfile(Dedup.duplicateClusters(pairs))
          .orderBy("cluster_size")
      },
      Some("""WITH RECURSIVE
        pairs AS (
          SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
          WHERE doc_id % 10 < 1 + (doc_id // 10) % 4
            AND (doc_id + 1) IN (SELECT doc_id FROM documents)),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src),
        sizes AS (
          SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM clust GROUP BY cluster_id)
        SELECT cluster_size,
          CAST(COUNT(*) AS BIGINT) AS n_clusters,
          CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
          CAST(SUM(cluster_size - 1) AS BIGINT) AS n_removed_keep_min
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size""")),

    Q("x95_token_truncate",
      // max-sequence-length enforcement — the context-window trim
      // applied before packing: keep each doc's first 64 whitespace
      // tokens, report the budget manifest (count, bite flag, kept
      // tokens/chars, md5 of the truncated text). Pure expression
      // chain, map-only; the oracle recomputes the whole surgery
      // independently from the raw text.
      (s, d) => TextAnalysis.truncateToTokenBudget(
          t(s, d, "documents"), maxTokens = 64)
        .orderBy("doc_id"),
      // COALESCE(text, ''): the Spark side degrades null text to the
      // empty doc (0 tokens, md5 of ''); DuckDB's string_split_regex
      // would otherwise propagate NULL and mismatch on a null-text row
      Some("""WITH t AS (SELECT doc_id,
            list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
              x -> len(x) > 0) AS toks
          FROM documents)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          len(toks) > 64 AS truncated,
          CAST(LEAST(len(toks), 64) AS BIGINT) AS kept_tokens,
          CAST(LENGTH(array_to_string(toks[1:64], ' ')) AS BIGINT)
            AS kept_chars,
          md5(array_to_string(toks[1:64], ' ')) AS trunc_md5
        FROM t ORDER BY doc_id""")),

    Q("x96_rendezvous_shards",
      // rendezvous (highest-random-weight) sharding stability audit:
      // assign every doc under S=8 and S=9 shards and roll up the
      // movement matrix. The property under test is what makes HRW
      // the resharding-safe choice at fleet scale: going S -> S+1
      // moves only ~1/(S+1) of the keys and every moved key lands on
      // the NEW shard — mod-N resharding would reshuffle nearly
      // everything and invalidate every materialized shard. Map-only
      // double assignment (one md5 per (doc, shard), inside a single
      // array expression — no explode, no shuffle) + one
      // metadata-sized groupBy. The oracle recomputes both
      // assignments from scratch (md5 is engine-portable).
      (s, d) => Sampling.rendezvousChurn(
        t(s, d, "documents"), "doc_id", fromShards = 8, toShards = 9),
      Some("""WITH sh8 AS (SELECT range AS s FROM range(0, 8)),
        sh9 AS (SELECT range AS s FROM range(0, 9)),
        a AS (SELECT doc_id, CAST(arg_max(s,
            md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)))
            AS INT) AS shard_from
          FROM documents, sh8 GROUP BY doc_id),
        b AS (SELECT doc_id, CAST(arg_max(s,
            md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)))
            AS INT) AS shard_to
          FROM documents, sh9 GROUP BY doc_id)
        SELECT shard_from, shard_to,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          shard_from <> shard_to AS moved
        FROM a JOIN b USING (doc_id)
        GROUP BY 1, 2, 4 ORDER BY shard_from, shard_to""")),

    Q("x97_t_closeness",
      // t-closeness (Li/Li/Venkatasubramanian) — closes the privacy
      // release triad over the x60/x65 quasi-identifiers: a class
      // whose BALANCE-BUCKET distribution sits far (ordered-EMD) from
      // the table-wide distribution leaks even when k-anonymous and
      // l-diverse. EMD in pure integer arithmetic, floor-quantized to
      // ppm, so both engines reproduce it bit-for-bit.
      (s, d) => graft.pipeline.Privacy.tClosenessViolations(
          t(s, d, "customer").withColumn("bal_bucket",
            when(col("c_acctbal") < 0, 0)
              .when(col("c_acctbal") < 2000, 1)
              .when(col("c_acctbal") < 5000, 2)
              .when(col("c_acctbal") < 8000, 3)
              .otherwise(4)),
          Seq("c_nationkey", "c_mktsegment"), "bal_bucket",
          numBuckets = 5, tPpm = 150000L)
        .withColumn("c_nationkey", col("c_nationkey").cast("int")),
      Some("""WITH b AS (SELECT c_nationkey, c_mktsegment,
            CASE WHEN c_acctbal < 0 THEN 0
                 WHEN c_acctbal < 2000 THEN 1
                 WHEN c_acctbal < 5000 THEN 2
                 WHEN c_acctbal < 8000 THEN 3
                 ELSE 4 END AS bk
          FROM customer),
        cls AS (SELECT c_nationkey, c_mktsegment,
            CAST(COUNT(*) AS BIGINT) AS class_size,
            CAST(SUM(CASE WHEN bk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
            CAST(SUM(CASE WHEN bk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN bk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
            CAST(SUM(CASE WHEN bk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
          FROM b GROUP BY 1, 2),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS gt,
            CAST(SUM(CASE WHEN bk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
            CAST(SUM(CASE WHEN bk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
            CAST(SUM(CASE WHEN bk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
            CAST(SUM(CASE WHEN bk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS g3
          FROM b),
        e AS (SELECT c_nationkey, c_mktsegment, class_size,
            (ABS(c0 * gt - g0 * class_size)
             + ABS((c0 + c1) * gt - (g0 + g1) * class_size)
             + ABS((c0 + c1 + c2) * gt - (g0 + g1 + g2) * class_size)
             + ABS((c0 + c1 + c2 + c3) * gt
                 - (g0 + g1 + g2 + g3) * class_size)) AS num,
            gt
          FROM cls, g)
        SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_mktsegment,
          class_size,
          CAST(num * 1000000 // (class_size * gt * 4) AS BIGINT)
            AS emd_ppm
        FROM e
        WHERE num * 1000000 // (class_size * gt * 4) > 150000
        ORDER BY emd_ppm DESC, c_nationkey, c_mktsegment""")),

    Q("x98_cdc_chunks",
      // content-defined chunking (Gear/FastCDC): the storage-dedup
      // grain of the dedup family — chunk every doc's UTF-8 bytes at
      // content-defined cuts (boundaries survive insertions, unlike
      // fixed-width), persist the chunk frame, and price per source
      // what a content-addressed store would save. The Gear hash is
      // not SQL — the chunk frame persists and DuckDB replays the
      // whole dedup rollup over it (the x04/d04 hash-replay pattern);
      // the chunker itself is pinned by CdcChunkSpec (shift resync,
      // bounds, byte-exact md5s).
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x98")
        Dedup.cdcChunks(docs)
          .write.mode("overwrite").parquet(state + "/chunks")
        Dedup.cdcDedupStats(docs, s.read.parquet(state + "/chunks"))
      },
      Some("""WITH c AS (SELECT * FROM read_parquet(
            '/tmp/graft_qstate/x98/chunks/*.parquet')),
        j AS (SELECT c.chunk_md5, c.len, d.source
          FROM c JOIN documents d USING (doc_id)),
        pre AS (SELECT source, chunk_md5,
            CAST(COUNT(*) AS BIGINT) AS occ,
            CAST(MIN(len) AS BIGINT) AS len
          FROM j GROUP BY 1, 2)
        SELECT source, CAST(SUM(occ) AS BIGINT) AS n_chunks,
          CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
          CAST(SUM(occ * len) AS BIGINT) AS total_bytes,
          CAST(SUM((occ - 1) * len) AS BIGINT) AS dup_bytes,
          CAST(SUM((occ - 1) * len) * 1000000 // SUM(occ * len)
            AS BIGINT) AS dedup_savings_ppm
        FROM pre GROUP BY source ORDER BY source""")),

    Q("x99_corpus_diff",
      // corpus snapshot diff with rename attribution — the dataset-
      // versioning report between two crawl snapshots: v2 is derived
      // from documents by pinned rules (every 7th id gone, every
      // (11k+3)rd re-crawled under a new id with identical bytes,
      // every remaining 5th revised in place, 50 brand-new docs), and
      // the diff must partition id-level churn into content-level
      // stories: unchanged / modified / removed_gone / added_new /
      // renamed (same md5 moved to a new id — what a naive id-diff
      // double-counts as churn). One id-keyed full-outer join carrying
      // (id, md5, len) + a churn-sized md5 pairing; the oracle
      // rebuilds v2 from the same rules and replays every class.
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"),
            coalesce(col("text"), lit("")).as("text"))
        val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
        val id = col("doc_id")
        val keep = docs.filter(id % 7 =!= 0 && id % 11 =!= 3 &&
          id % 5 =!= 0)
        val revised = docs.filter(id % 7 =!= 0 && id % 11 =!= 3 &&
            id % 5 === 0)
          .select(id, concat(col("text"), lit(" rev2")).as("text"))
        val moved = docs.filter(id % 7 =!= 0 && id % 11 === 3)
          .select((id + off).as("doc_id"), col("text"))
        val fresh = s.range(50)
          .select((lit(2L * off) + col("id")).as("doc_id"),
            concat(lit("brand new doc "), col("id").cast("string"))
              .as("text"))
        val v2 = keep.unionByName(revised).unionByName(moved)
          .unionByName(fresh)
        graft.pipeline.CorpusDiff.diffSummary(docs, v2)
      },
      Some("""WITH mx AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
        v1 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        v2 AS (
          SELECT doc_id, text FROM v1
            WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 3 AND doc_id % 5 <> 0
          UNION ALL
          SELECT doc_id, text || ' rev2' FROM v1
            WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 3 AND doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + (SELECT off FROM mx), text FROM v1
            WHERE doc_id % 7 <> 0 AND doc_id % 11 = 3
          UNION ALL
          SELECT 2 * (SELECT off FROM mx) + k, 'brand new doc ' || k
          FROM (SELECT range AS k FROM range(0, 50))),
        cls AS (
          SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
            CASE WHEN v1.doc_id IS NULL THEN 'added'
                 WHEN v2.doc_id IS NULL THEN 'removed'
                 WHEN md5(v1.text) = md5(v2.text) THEN 'unchanged'
                 ELSE 'modified' END AS change,
            md5(v1.text) AS h1, md5(v2.text) AS h2,
            CAST(COALESCE(LENGTH(v2.text), LENGTH(v1.text)) AS BIGINT)
              AS n_chars
          FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id),
        base AS (SELECT change, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM cls GROUP BY change),
        rh AS (SELECT h1 AS h, CAST(COUNT(*) AS BIGINT) AS nr,
            CAST(SUM(n_chars) AS BIGINT) AS br
          FROM cls WHERE change = 'removed' GROUP BY h1),
        ah AS (SELECT h2 AS h, CAST(COUNT(*) AS BIGINT) AS na,
            CAST(SUM(n_chars) AS BIGINT) AS ba
          FROM cls WHERE change = 'added' GROUP BY h2),
        ren AS (SELECT
            CAST(COALESCE(SUM(LEAST(nr, na)), 0) AS BIGINT) AS n_renamed,
            CAST(COALESCE(SUM(CAST(LEAST(nr, na) * (ba / na) AS BIGINT)),
              0) AS BIGINT) AS b_renamed
          FROM rh JOIN ah USING (h))
        SELECT change_out AS change, n_docs_out AS n_docs,
          chars_out AS total_chars FROM (
          SELECT CASE WHEN base.change = 'added' THEN 'added_new'
                      WHEN base.change = 'removed' THEN 'removed_gone'
                      ELSE base.change END AS change_out,
            CASE WHEN base.change IN ('added', 'removed')
              THEN base.n_docs - ren.n_renamed
              ELSE base.n_docs END AS n_docs_out,
            CASE WHEN base.change IN ('added', 'removed')
              THEN base.total_chars - ren.b_renamed
              ELSE base.total_chars END AS chars_out
          FROM base, ren
          UNION ALL
          SELECT 'renamed', n_renamed, b_renamed FROM ren)
        ORDER BY change""")),

    Q("x100_linkage_weights",
      // Fellegi–Sunter per-field m/u weight estimation — the
      // probabilistic layer over x58's deterministic entity
      // resolution: m = P(agree | match), u = P(agree | non-match)
      // per field, the two numbers whose ratio orders every linkage
      // decision. Labeled fixture from supplier: record 2k is the
      // original, 2k+1 its variant (name + ' inc'; nation re-registered
      // for every 3rd supplier, balance bucket shifted for every 4th),
      // so the true m vector is known by construction (name 1.0,
      // nation ~2/3, balance ~3/4) while u falls out of the
      // cross-pairs (nation collides at ~1/25). Candidates block
      // on a uniform suppkey residue — NOT a realistic blocking key,
      // chosen so match AND non-match pairs exist at every fixture
      // scale (md5-prefix blocking yields zero non-matches at
      // sf0.001, and u over an empty class is undefined). ONE
      // aggregate produces every field's counters; ppm by integer
      // floor division.
      (s, d) => {
        val base = t(s, d, "supplier").select(col("s_suppkey"),
          concat(substring(md5(col("s_suppkey").cast("string")), 1, 12),
            lit(" "), col("s_name")).as("name"),
          col("s_nationkey").cast("long").as("nation"),
          floor(col("s_acctbal") / 1000).cast("long").as("bal"))
        val recs = base.select(
            (col("s_suppkey") * 2).as("record_id"), col("name"),
            col("nation"), col("bal"),
            (col("s_suppkey") % 5).as("blk"))
          .unionByName(base.select(
            (col("s_suppkey") * 2 + 1).as("record_id"),
            concat(col("name"), lit(" inc")).as("name"),
            when(col("s_suppkey") % 3 === 0, col("nation") + 1L)
              .otherwise(col("nation")).as("nation"),
            when(col("s_suppkey") % 4 === 0, col("bal") + 1L)
              .otherwise(col("bal")).as("bal"),
            (col("s_suppkey") % 5).as("blk")))
        val a = recs.select(col("record_id").as("id_a"),
          col("name").as("na"), col("nation").as("nta"),
          col("bal").as("ba"), col("blk"))
        val b = recs.select(col("record_id").as("id_b"),
          col("name").as("nb"), col("nation").as("ntb"),
          col("bal").as("bb"), col("blk"))
        val pairs = a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b"))
          .select(
            expr("(id_a DIV 2) = (id_b DIV 2)").as("is_match"),
            (substring(col("na"), 1, 12) === substring(col("nb"), 1, 12))
              .as("agree_name"),
            (col("nta") === col("ntb")).as("agree_nation"),
            (col("ba") === col("bb")).as("agree_bal"))
        graft.pipeline.EntityResolution.linkageFieldWeights(
          pairs, "is_match", Seq("agree_name", "agree_nation",
            "agree_bal"))
      },
      Some("""WITH base AS (SELECT s_suppkey,
            substring(md5(CAST(s_suppkey AS VARCHAR)), 1, 12)
              || ' ' || s_name AS name,
            CAST(s_nationkey AS BIGINT) AS nation,
            CAST(FLOOR(s_acctbal / 1000) AS BIGINT) AS bal
          FROM supplier),
        recs AS (
          SELECT s_suppkey * 2 AS record_id, name, nation, bal,
            s_suppkey % 5 AS blk FROM base
          UNION ALL
          SELECT s_suppkey * 2 + 1, name || ' inc',
            CASE WHEN s_suppkey % 3 = 0 THEN nation + 1
              ELSE nation END,
            CASE WHEN s_suppkey % 4 = 0 THEN bal + 1 ELSE bal END,
            s_suppkey % 5 FROM base),
        pairs AS (
          SELECT (a.record_id // 2) = (b.record_id // 2) AS is_match,
            substring(a.name, 1, 12) = substring(b.name, 1, 12)
              AS agree_name,
            a.nation = b.nation AS agree_nation,
            a.bal = b.bal AS agree_bal
          FROM recs a JOIN recs b
            ON a.blk = b.blk AND a.record_id < b.record_id),
        agg AS (SELECT
            CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
              AS nm,
            CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END)
              AS BIGINT) AS nu,
            CAST(SUM(CASE WHEN is_match AND agree_name
              THEN 1 ELSE 0 END) AS BIGINT) AS am_name,
            CAST(SUM(CASE WHEN NOT is_match AND agree_name
              THEN 1 ELSE 0 END) AS BIGINT) AS au_name,
            CAST(SUM(CASE WHEN is_match AND agree_nation
              THEN 1 ELSE 0 END) AS BIGINT) AS am_nation,
            CAST(SUM(CASE WHEN NOT is_match AND agree_nation
              THEN 1 ELSE 0 END) AS BIGINT) AS au_nation,
            CAST(SUM(CASE WHEN is_match AND agree_bal
              THEN 1 ELSE 0 END) AS BIGINT) AS am_bal,
            CAST(SUM(CASE WHEN NOT is_match AND agree_bal
              THEN 1 ELSE 0 END) AS BIGINT) AS au_bal
          FROM pairs)
        SELECT field, n_matches, n_nonmatches, m_ppm, u_ppm FROM (
          SELECT 'agree_bal' AS field, nm AS n_matches,
            nu AS n_nonmatches,
            CAST(am_bal * 1000000 // nm AS BIGINT) AS m_ppm,
            CAST(au_bal * 1000000 // nu AS BIGINT) AS u_ppm FROM agg
          UNION ALL
          SELECT 'agree_name', nm, nu,
            CAST(am_name * 1000000 // nm AS BIGINT),
            CAST(au_name * 1000000 // nu AS BIGINT) FROM agg
          UNION ALL
          SELECT 'agree_nation', nm, nu,
            CAST(am_nation * 1000000 // nm AS BIGINT),
            CAST(au_nation * 1000000 // nu AS BIGINT) FROM agg)
        ORDER BY field""")),

    Q("x101_label_propagation",
      // label-propagation communities (Raghavan et al.) — the
      // density-aware complement of d05's connected components: the
      // fixture builds 5-cliques (one per 20-id block) joined by thin
      // one-edge bridges; components would merge the whole chain of
      // cliques into one blob, LPA keeps each clique its own
      // community because 4 clique neighbors outvote 1 bridge
      // neighbor. Deterministic min-label tie-break, fixed 3
      // synchronous rounds — the oracle unrolls the identical
      // recurrence iteration by iteration.
      (s, d) => {
        val members = t(s, d, "documents")
          .filter(col("doc_id") % 20 < 5)
          .select(col("doc_id"), expr("doc_id DIV 20").as("blk"))
        val a = members.select(col("doc_id").as("src"), col("blk"))
        val b = members.select(col("doc_id").as("dst"), col("blk"))
        val clique = a.join(b, Seq("blk"))
          .filter(col("src") < col("dst")).select("src", "dst")
        val bridge = members.filter(col("doc_id") % 20 === 4)
          .select(col("doc_id").as("src"),
            (col("doc_id") + 16L).as("dst"))
          .join(members.select(col("doc_id").as("dst")), Seq("dst"))
          .select("src", "dst")
        LinkGraph.labelPropagation(
            clique.unionByName(bridge), iterations = 3)
          .select(col("node").as("doc_id"), col("community"))
          .orderBy("doc_id")
      },
      Some("""WITH members AS (SELECT doc_id, doc_id // 20 AS blk
          FROM documents WHERE doc_id % 20 < 5),
        cl AS (SELECT a.doc_id AS src, b.doc_id AS dst
          FROM members a JOIN members b
          ON a.blk = b.blk AND a.doc_id < b.doc_id),
        br AS (SELECT a.doc_id AS src, b.doc_id AS dst
          FROM members a JOIN members b ON b.doc_id = a.doc_id + 16
          WHERE a.doc_id % 20 = 4),
        e AS (SELECT src, dst FROM cl UNION ALL
          SELECT src, dst FROM br),
        und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
        c1 AS (SELECT u.src, l.label, COUNT(*) AS cnt
          FROM und u JOIN l0 l ON u.dst = l.node GROUP BY 1, 2),
        l1 AS (SELECT src AS node, label FROM (
          SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src
            ORDER BY cnt DESC, label ASC) AS rn FROM c1) WHERE rn = 1),
        c2 AS (SELECT u.src, l.label, COUNT(*) AS cnt
          FROM und u JOIN l1 l ON u.dst = l.node GROUP BY 1, 2),
        l2 AS (SELECT src AS node, label FROM (
          SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src
            ORDER BY cnt DESC, label ASC) AS rn FROM c2) WHERE rn = 1),
        c3 AS (SELECT u.src, l.label, COUNT(*) AS cnt
          FROM und u JOIN l2 l ON u.dst = l.node GROUP BY 1, 2),
        l3 AS (SELECT src AS node, label FROM (
          SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src
            ORDER BY cnt DESC, label ASC) AS rn FROM c3) WHERE rn = 1)
        SELECT node AS doc_id, CAST(label AS BIGINT) AS community
        FROM l3 ORDER BY doc_id""")),

    Q("x24_canonical_pick",
      // quality-aware dedup: over the d05 chain-cluster graph, keep each
      // cluster's LONGEST member (n_chars as the quality proxy, ties to
      // the smaller id) instead of the minimum id; singletons stay
      // canonical. Same recursive-closure oracle as d05 + a rank replay.
      (s, d) => {
        val docs = t(s, d, "documents")
        val ids = docs.select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 10 < 4)
          .join(ids.select(col("doc_id").as("next_id")),
            col("doc_id") + 1 === col("next_id"))
          .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
        Dedup.canonicalPick(docs, Dedup.duplicateClusters(pairs),
            scoreCol = "n_chars")
          .select(col("doc_id"), col("cluster_id").cast("long"),
            col("is_canonical"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
        pairs AS (
          SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
          WHERE doc_id % 10 < 4
            AND (doc_id + 1) IN (SELECT doc_id FROM documents)),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src),
        all_docs AS (
          SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
            d.n_chars
          FROM documents d LEFT JOIN clust c ON d.doc_id = c.doc_id),
        ranked AS (
          SELECT doc_id, cluster_id,
            ROW_NUMBER() OVER (PARTITION BY cluster_id
              ORDER BY n_chars DESC, doc_id) AS rk
          FROM all_docs)
        SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
          (rk = 1) AS is_canonical
        FROM ranked ORDER BY doc_id""")),

    Q("x102_script_mix",
      // declared-lang vs measured-script cross-tab (crawl label
      // hygiene): per-doc counts over four explicit BMP script blocks,
      // dominant-script argmax (profile order breaks ties, 'none' when
      // unscripted), mixed-script flag at >= 2 blocks present; id_sum
      // pins WHICH docs landed in each (lang, script) cell. Map-only
      // per-doc counts riding the scan + one metadata-sized rollup.
      (s, d) => TextAnalysis.scriptMix(t(s, d, "documents"))
        .orderBy("lang", "dominant_script"),
      Some("""WITH per AS (
          SELECT doc_id, lang,
            len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]'))
              AS latin,
            len(regexp_extract_all(COALESCE(text, ''),
              '[\x{4e00}-\x{9fff}]')) AS han,
            len(regexp_extract_all(COALESCE(text, ''),
              '[\x{0400}-\x{04ff}]')) AS cyr,
            len(regexp_extract_all(COALESCE(text, ''),
              '[\x{0600}-\x{06ff}]')) AS ara
          FROM documents),
        cls AS (
          SELECT doc_id, lang, latin, han,
            CASE
              WHEN GREATEST(latin, han, cyr, ara) = 0 THEN 'none'
              WHEN latin >= han AND latin >= cyr AND latin >= ara
                THEN 'latin'
              WHEN han >= cyr AND han >= ara THEN 'han'
              WHEN cyr >= ara THEN 'cyrillic'
              ELSE 'arabic' END AS dominant_script,
            CAST(latin > 0 AS INT) + CAST(han > 0 AS INT)
              + CAST(cyr > 0 AS INT) + CAST(ara > 0 AS INT) AS n_scripts
          FROM per)
        SELECT lang, dominant_script,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN n_scripts >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_mixed,
          CAST(SUM(latin) AS BIGINT) AS latin_chars,
          CAST(SUM(han) AS BIGINT) AS han_chars,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM cls GROUP BY lang, dominant_script
        ORDER BY lang, dominant_script""")),

    Q("x103_touch_attribution",
      // first/last-touch conversion attribution over the event log:
      // each purchase credits the user's first and last preceding
      // non-purchase events (ties broken by event_id; no prior touch
      // = '(direct)'), values summed per channel under both models
      // side by side. ONE user-keyed window sort, no self-join; the
      // oracle replays the identical running-window assignment.
      (s, d) => graft.operators.Funnel.touchAttribution(eventsTable(s, d))
        .orderBy("channel"),
      Some("""WITH ordered AS (
          SELECT user_id, ts, event_id, event_type, value,
            first_value(CASE WHEN event_type <> 'purchase'
                THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fc,
            last_value(CASE WHEN event_type <> 'purchase'
                THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
          FROM events),
        conv AS (
          SELECT COALESCE(fc, '(direct)') AS fch,
            COALESCE(lc, '(direct)') AS lch,
            CAST(value AS DECIMAL(28,6)) AS v
          FROM ordered WHERE event_type = 'purchase'),
        m AS (
          SELECT fch AS channel, 'first' AS model, v FROM conv
          UNION ALL SELECT lch, 'last', v FROM conv)
        SELECT channel,
          CAST(SUM(CASE WHEN model = 'first' THEN 1 ELSE 0 END)
            AS BIGINT) AS first_touch_conversions,
          CAST(SUM(CASE WHEN model = 'first' THEN v
            ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
            AS first_touch_value,
          CAST(SUM(CASE WHEN model = 'last' THEN 1 ELSE 0 END)
            AS BIGINT) AS last_touch_conversions,
          CAST(SUM(CASE WHEN model = 'last' THEN v
            ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
            AS last_touch_value
        FROM m GROUP BY channel ORDER BY channel""")),

    Q("x104_conversion_lag",
      // the latency half of the attribution story: per first-touch
      // channel, how long from journey start to conversion (n, min,
      // exact interpolated median/p90, max) — lags in integer
      // microseconds so everything but the interpolation is exact
      // cross-engine arithmetic; direct conversions (no prior touch)
      // have no journey start and are excluded by definition. Same
      // ONE user-keyed window pass as x103.
      (s, d) => graft.operators.Funnel.conversionLag(eventsTable(s, d))
        .orderBy("channel"),
      Some("""WITH ordered AS (
          SELECT user_id, ts, event_id, event_type,
            first_value(CASE WHEN event_type <> 'purchase'
                THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fch,
            first_value(CASE WHEN event_type <> 'purchase'
                THEN ts END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fts
          FROM events),
        lags AS (
          SELECT fch AS channel,
            epoch_us(ts) - epoch_us(fts) AS lag_us
          FROM ordered
          WHERE event_type = 'purchase' AND fch IS NOT NULL)
        SELECT channel,
          CAST(COUNT(*) AS BIGINT) AS n_conversions,
          CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
          ROUND(quantile_cont(lag_us, 0.5), 1) AS median_lag_us,
          ROUND(quantile_cont(lag_us, 0.9), 1) AS p90_lag_us,
          CAST(MAX(lag_us) AS BIGINT) AS max_lag_us
        FROM lags GROUP BY channel ORDER BY channel""")),


    Q("x105_mmr_rerank",
      // MMR diversified re-ranking (Carbonell & Goldstein 1998) — the
      // step between retrieval and context packing that stops a RAG
      // prompt from spending its budget on eight copies of the same
      // answer: greedy argmax of 0.7*rel - 0.3*max-sim-to-selected
      // over the bm25 top-32 page, k=8. Everything is integer (rel
      // normalized to ppm of the page max, shingle-Jaccard in floored
      // ppm, lambda in tenths, ties to the smaller id) so the oracle
      // replays the selection exactly as 8 unrolled argmax steps. The
      // greedy itself is driver-side BY DESIGN over the bounded page
      // (<= 32 rows + <= 496 sims — the BPE-vocab/probe-seed
      // contract); the distributed work is the bm25 top-k and the
      // shingle self-join, both proven shapes.
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val state = freshState(s, "x105")
        TextAnalysis.bm25TopK(docs, Seq("spark", "merge", "vector"),
            k = 32)
          .select(col("doc_id"),
            round(col("bm25") * 1e6).cast("long").as("rel_micro"))
          .coalesce(1).write.mode("overwrite").parquet(state + "/cand")
        val cand = s.read.parquet(state + "/cand").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
        val maxRel = cand.map(_._2).max
        require(maxRel > 0, "bm25 page has no scored candidates")
        val candPpm = cand.map { case (id, m) =>
          (id, m * 1000000L / maxRel) }
        val ids = candPpm.map(_._1)
        val pairsDF = (for { a <- ids; b <- ids if a < b } yield (a, b))
          .toDF("id_a", "id_b")
        val sims = Dedup.ngramJaccardPpm(docs, pairsDF).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
        TextAnalysis.mmrSelect(candPpm, sims, k = 8)
          .toDF("rank", "doc_id", "mmr_ppm", "rel_ppm", "max_sim_ppm")
          .orderBy("rank")
      },
      Some(duckMmrSql)),

    Q("x106_filter_ablation",
      // per-rule ablation of the Gopher quality gate: n_failing (the
      // rule's raw bite) vs n_sole_blocker (docs ONLY it drops — what
      // relaxing it would rescue). The report a threshold-tuning run
      // reads; redundant rules show large n_failing with ~zero
      // n_sole_blocker. Map-only flags + ONE 1-row global aggregate
      // exploded to 4 rows; the oracle re-derives every flag from raw
      // text through the proven x15 SQL.
      (s, d) => TextAnalysis.filterAblation(t(s, d, "documents"))
        .orderBy("rule"),
      Some(s"""WITH g AS ($duckGopherFilterSql),
        base AS (SELECT
          CAST(SUM(1 - wc_ok) AS BIGINT) AS f_wc,
          CAST(SUM(CASE WHEN wc_ok = 0
            AND (4 - wc_ok - mlen_ok - stop_ok - alpha_ok) = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS s_wc,
          CAST(SUM(1 - mlen_ok) AS BIGINT) AS f_mlen,
          CAST(SUM(CASE WHEN mlen_ok = 0
            AND (4 - wc_ok - mlen_ok - stop_ok - alpha_ok) = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS s_mlen,
          CAST(SUM(1 - stop_ok) AS BIGINT) AS f_stop,
          CAST(SUM(CASE WHEN stop_ok = 0
            AND (4 - wc_ok - mlen_ok - stop_ok - alpha_ok) = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS s_stop,
          CAST(SUM(1 - alpha_ok) AS BIGINT) AS f_alpha,
          CAST(SUM(CASE WHEN alpha_ok = 0
            AND (4 - wc_ok - mlen_ok - stop_ok - alpha_ok) = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS s_alpha,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(keep) AS BIGINT) AS k
          FROM g)
        SELECT 'alpha' AS rule, f_alpha AS n_failing,
            s_alpha AS n_sole_blocker, n AS n_docs, k AS n_kept
          FROM base
        UNION ALL SELECT 'mlen', f_mlen, s_mlen, n, k FROM base
        UNION ALL SELECT 'stop', f_stop, s_stop, n, k FROM base
        UNION ALL SELECT 'wc', f_wc, s_wc, n, k FROM base
        ORDER BY rule""")),

    Q("x107_retrieval_eval",
      // retrieval-quality eval closing the bm25→rrf→mmr lane: nDCG@10,
      // MRR, P@10, R@10 against term-coverage relevance grades derived
      // from the corpus itself. Labeling is map-only, the ideal ranking
      // is a distributed TakeOrdered(k), DCG gains micro-quantize
      // before summing — engine-exact, one row out.
      (s, d) => TextAnalysis.retrievalEval(t(s, d, "documents"),
        Seq("spark", "merge", "vector"), k = 10),
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents WHERE doc_id IS NOT NULL),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl),
        qtf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
          WHERE token IN ('spark', 'merge', 'vector') GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY 1),
        per_term AS (
          SELECT qtf.doc_id,
            CAST(ROUND(
              ln((CAST(stats.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
                * (qtf.tf * 2.2)
                / (qtf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                    / (CAST(stats.tl AS DOUBLE) / stats.n))))
                * 1e6, 0) AS BIGINT) AS micro
          FROM qtf JOIN df USING (token) JOIN dl USING (doc_id)
          CROSS JOIN stats),
        per_doc AS (SELECT doc_id, SUM(micro) AS score_micro
          FROM per_term GROUP BY 1),
        ranked AS (SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rank
          FROM per_doc),
        labels AS (SELECT doc_id,
            COALESCE(len(list_intersect(
              list_distinct(string_split_regex(lower(trim(text)), '\s+')),
              ['spark', 'merge', 'vector'])), 0) AS rel
          FROM documents WHERE doc_id IS NOT NULL),
        topk AS (SELECT r.rank, l.rel
          FROM ranked r JOIN labels l USING (doc_id) WHERE r.rank <= 10),
        got AS (SELECT
            SUM(CAST(ROUND((CAST(1 << rel AS DOUBLE) - 1)
              / (ln(rank + CAST(1.0 AS DOUBLE)) / ln(CAST(2.0 AS DOUBLE)))
              * 1e6, 0) AS BIGINT)) AS dcg,
            SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
            MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel
          FROM topk),
        ideal AS (SELECT rel,
            ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS r
          FROM labels),
        idcg AS (SELECT SUM(CAST(ROUND((CAST(1 << rel AS DOUBLE) - 1)
              / (ln(r + CAST(1.0 AS DOUBLE)) / ln(CAST(2.0 AS DOUBLE)))
              * 1e6, 0) AS BIGINT)) AS idcg
          FROM ideal WHERE r <= 10),
        tot AS (SELECT SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
            AS n_rel_total FROM labels)
        SELECT CAST(10 AS INT) AS k,
          CAST(tot.n_rel_total AS BIGINT) AS n_rel_total,
          CAST(got.hits AS BIGINT) AS n_rel_at_k,
          CASE WHEN idcg.idcg > 0
            THEN ROUND(CAST(got.dcg AS DOUBLE) / idcg.idcg, 6)
            ELSE CAST(0.0 AS DOUBLE) END AS ndcg,
          COALESCE(ROUND(CAST(1.0 AS DOUBLE) / got.first_rel, 6),
            CAST(0.0 AS DOUBLE)) AS mrr,
          ROUND(CAST(got.hits AS DOUBLE) / 10, 6) AS precision_at_k,
          CASE WHEN tot.n_rel_total > 0
            THEN ROUND(CAST(got.hits AS DOUBLE) / tot.n_rel_total, 6)
            ELSE CAST(0.0 AS DOUBLE) END AS recall_at_k
        FROM got, idcg, tot""")),

    Q("x108_pmi_collocations",
      // top-PMI word pairs (cross-doc collocation/template signal the
      // within-doc repetition gate can't see): gram-keyed + token-keyed
      // aggs, two keyed joins of the min-count-pruned bigram frame
      // against unigram counts (keyed, not broadcast — a 100 TB vocab
      // doesn't fit a driver), 1-row totals broadcast, micro-quantized
      // PMI before the top cut
      (s, d) => TextAnalysis.pmiCollocations(t(s, d, "documents"),
        minCount = 5, top = 50),
      Some("""WITH toks AS (
          SELECT string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        tok AS (SELECT unnest(w) AS token FROM toks WHERE len(w) >= 1),
        uni AS (SELECT token, COUNT(*) AS c FROM tok
          WHERE len(token) > 0 GROUP BY 1),
        nu AS (SELECT SUM(c) AS nu FROM uni),
        bi_all AS (
          SELECT w[i] || ' ' || w[i+1] AS ngram
          FROM (SELECT unnest(range(1, len(w))) AS i, w
                FROM toks WHERE len(w) >= 2)),
        nb AS (SELECT COUNT(*) AS nb FROM bi_all),
        bi AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM bi_all GROUP BY 1 HAVING COUNT(*) >= 5),
        j AS (SELECT bi.ngram, bi.cnt, u1.c AS c1, u2.c AS c2
          FROM bi
          JOIN uni u1 ON u1.token = string_split(bi.ngram, ' ')[1]
          JOIN uni u2 ON u2.token = string_split(bi.ngram, ' ')[2]),
        scored AS (SELECT ngram, cnt,
            CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
            CAST(ROUND(ln((CAST(cnt AS DOUBLE) * nu.nu * nu.nu)
              / (CAST(nb.nb AS DOUBLE) * c1 * c2)) * 1e6, 0) AS BIGINT)
              AS micro
          FROM j, nb, nu)
        SELECT ngram, cnt, c1, c2,
          ROUND(CAST(micro AS DOUBLE) / 1e6, 6) AS pmi
        FROM scored ORDER BY pmi DESC, ngram LIMIT 50""")),

    Q("x109_ngram_novelty",
      // per-doc novel-trigram ratio — the inverse of the containment
      // family: protects the unique long-tail, flags cross-doc template
      // mass below any pairwise near-dup threshold. Per-doc-distinct
      // grams BEFORE the explode, gram-keyed df agg, keyed join back,
      // doc-keyed rollup — linear, nothing driver-side
      (s, d) => TextAnalysis.ngramNovelty(t(s, d, "documents"), n = 3)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        g AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            AS ngram
          FROM (SELECT doc_id, unnest(range(1, len(w) - 1)) AS i, w
                FROM toks WHERE len(w) >= 3)),
        df AS (SELECT ngram, COUNT(*) AS ndocs FROM g GROUP BY 1)
        SELECT g.doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_grams,
          CAST(SUM(CASE WHEN df.ndocs = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_novel,
          ROUND(CAST(SUM(CASE WHEN df.ndocs = 1 THEN 1 ELSE 0 END)
              AS DOUBLE) / COUNT(*), 6) AS novelty
        FROM g JOIN df USING (ngram)
        GROUP BY 1 ORDER BY doc_id""")),

    Q("x110_adamic_adar",
      // Adamic-Adar link prediction over the x88 link graph: rank
      // missing edges by shared-neighbor weight 1/ln(deg). Pairs are
      // minted ONLY through shared centers (deg-capped self-join),
      // never all-pairs; nano-quantized weights make the top-20
      // engine-exact
      (s, d) => {
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"))
        val nDocs = ids.count()
        val edges = ids
          .select(col("doc_id").as("src"),
            explode(array(
              (col("doc_id") * 2 + 1) % nDocs,
              (col("doc_id") * 3 + 7) % nDocs,
              (col("doc_id") * 7 + 13) % nDocs)).as("dst"))
        LinkGraph.adamicAdar(edges, topN = 20, maxDegree = 1000)
      },
      Some("""WITH nn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        e0 AS (
          SELECT doc_id AS src, (doc_id*2 + 1) % nn.n AS dst
            FROM documents, nn
          UNION
          SELECT doc_id, (doc_id*3 + 7) % nn.n FROM documents, nn
          UNION
          SELECT doc_id, (doc_id*7 + 13) % nn.n FROM documents, nn),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b
          FROM e0 WHERE src <> dst),
        adj AS (SELECT a AS w, b AS x FROM und
          UNION ALL SELECT b, a FROM und),
        deg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS degw
          FROM adj GROUP BY 1),
        centers AS (SELECT adj.w, adj.x,
            CAST(ROUND(1e9 / ln(CAST(degw AS DOUBLE)), 0) AS BIGINT)
              AS aa_nano
          FROM adj JOIN deg USING (w)
          WHERE degw BETWEEN 2 AND 1000),
        pairs AS (SELECT l.x AS u, r.x AS v, l.aa_nano
          FROM centers l JOIN centers r ON l.w = r.w AND l.x < r.x),
        cand AS (SELECT u, v, aa_nano FROM pairs
          WHERE NOT EXISTS (SELECT 1 FROM und
            WHERE und.a = pairs.u AND und.b = pairs.v)),
        agg AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common,
            SUM(aa_nano) AS nano
          FROM cand GROUP BY 1, 2)
        SELECT u, v, n_common,
          ROUND(CAST(nano AS DOUBLE) / 1e9, 6) AS aa_score
        FROM agg ORDER BY aa_score DESC, u, v LIMIT 20""")),

    Q("x111_modularity",
      // Newman modularity of the x101 label-propagation communities —
      // the partition-quality score (per-community contributions, Q =
      // their sum): LPA runs on the same clique+bridge fixture graph,
      // the assignment PERSISTS (the multimodal replay pattern), and
      // the oracle rebuilds the graph and replays every e_c/d_c/m
      // term against the persisted communities
      (s, d) => {
        val members = t(s, d, "documents")
          .filter(col("doc_id") % 20 < 5)
          .select(col("doc_id"), expr("doc_id DIV 20").as("blk"))
        val a = members.select(col("doc_id").as("src"), col("blk"))
        val b = members.select(col("doc_id").as("dst"), col("blk"))
        val clique = a.join(b, Seq("blk"))
          .filter(col("src") < col("dst")).select("src", "dst")
        val bridge = members.filter(col("doc_id") % 20 === 4)
          .select(col("doc_id").as("src"),
            (col("doc_id") + 16L).as("dst"))
          .join(members.select(col("doc_id").as("dst")), Seq("dst"))
          .select("src", "dst")
        val edges = clique.unionByName(bridge)
        val state = freshState(s, "x111")
        LinkGraph.labelPropagation(edges, iterations = 3)
          .coalesce(1).write.mode("overwrite").parquet(state + "/comm")
        LinkGraph.modularity(edges, s.read.parquet(state + "/comm"))
      },
      Some("""WITH members AS (SELECT doc_id, doc_id // 20 AS blk
          FROM documents WHERE doc_id % 20 < 5),
        cl AS (SELECT a.doc_id AS src, b.doc_id AS dst
          FROM members a JOIN members b
          ON a.blk = b.blk AND a.doc_id < b.doc_id),
        br AS (SELECT a.doc_id AS src, b.doc_id AS dst
          FROM members a JOIN members b ON b.doc_id = a.doc_id + 16
          WHERE a.doc_id % 20 = 4),
        e AS (SELECT src, dst FROM cl UNION ALL SELECT src, dst FROM br),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b
          FROM e WHERE src <> dst),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
        comm AS (SELECT node, community
          FROM read_parquet('/tmp/graft_qstate/x111/comm/*.parquet')),
        lab AS (SELECT ca.community AS cca, cb.community AS ccb
          FROM und u JOIN comm ca ON u.a = ca.node
          JOIN comm cb ON u.b = cb.node),
        ein AS (SELECT cca AS community, CAST(COUNT(*) AS BIGINT) AS e_in
          FROM lab WHERE cca = ccb GROUP BY 1),
        deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
          (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY 1),
        byc AS (SELECT c.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
            CAST(COALESCE(SUM(d.deg), 0) AS BIGINT) AS d_tot
          FROM comm c LEFT JOIN deg d ON c.node = d.node GROUP BY 1),
        staged AS (SELECT byc.community, byc.n_nodes, byc.d_tot,
            CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
            CAST(byc.d_tot AS DOUBLE) / (2.0 * mm.m) AS r, mm.m AS m
          FROM byc LEFT JOIN ein USING (community), mm)
        SELECT community, n_nodes, e_in, d_tot,
          ROUND(CAST(CAST(ROUND((CAST(e_in AS DOUBLE) / m - r * r)
            * 1e9, 0) AS BIGINT) AS DOUBLE) / 1e9, 6) AS q_contrib
        FROM staged ORDER BY community""")),

    Q("x112_rfm_segments",
      // RFM customer-value grid over the purchase log: per-user
      // recency/frequency/monetary, each bucketed by its own exact
      // quartile edges (rounded 6 dp BEFORE the compare — the p45
      // boundary discipline), segment-grid rollup with decimal money
      (s, d) => graft.operators.Funnel.rfmSegments(eventsTable(s, d)),
      Some("""WITH p AS (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        anchor AS (SELECT MAX(CAST(ts AS DATE)) AS ad FROM p),
        u AS (SELECT user_id,
            CAST(date_diff('day', MAX(CAST(ts AS DATE)), anchor.ad)
              AS BIGINT) AS recency_days,
            CAST(COUNT(*) AS BIGINT) AS frequency,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS monetary
          FROM p, anchor GROUP BY user_id, anchor.ad),
        e AS (SELECT
            ROUND(quantile_cont(CAST(recency_days AS DOUBLE), 0.25), 6)
              AS r1,
            ROUND(quantile_cont(CAST(recency_days AS DOUBLE), 0.5), 6)
              AS r2,
            ROUND(quantile_cont(CAST(recency_days AS DOUBLE), 0.75), 6)
              AS r3,
            ROUND(quantile_cont(CAST(frequency AS DOUBLE), 0.25), 6)
              AS f1,
            ROUND(quantile_cont(CAST(frequency AS DOUBLE), 0.5), 6)
              AS f2,
            ROUND(quantile_cont(CAST(frequency AS DOUBLE), 0.75), 6)
              AS f3,
            ROUND(quantile_cont(CAST(monetary AS DOUBLE), 0.25), 6)
              AS m1,
            ROUND(quantile_cont(CAST(monetary AS DOUBLE), 0.5), 6)
              AS m2,
            ROUND(quantile_cont(CAST(monetary AS DOUBLE), 0.75), 6)
              AS m3
          FROM u),
        seg AS (SELECT
            1 + CAST(CAST(recency_days AS DOUBLE) > e.r1 AS INT)
              + CAST(CAST(recency_days AS DOUBLE) > e.r2 AS INT)
              + CAST(CAST(recency_days AS DOUBLE) > e.r3 AS INT) AS r_seg,
            1 + CAST(CAST(frequency AS DOUBLE) > e.f1 AS INT)
              + CAST(CAST(frequency AS DOUBLE) > e.f2 AS INT)
              + CAST(CAST(frequency AS DOUBLE) > e.f3 AS INT) AS f_seg,
            1 + CAST(CAST(monetary AS DOUBLE) > e.m1 AS INT)
              + CAST(CAST(monetary AS DOUBLE) > e.m2 AS INT)
              + CAST(CAST(monetary AS DOUBLE) > e.m3 AS INT) AS m_seg,
            monetary
          FROM u, e)
        SELECT r_seg, f_seg, m_seg,
          CAST(COUNT(*) AS BIGINT) AS n_users,
          CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE)
            AS total_monetary
        FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    Q("x113_basket_lift",
      // market-basket lift over order/part baskets — the transactional
      // twin of x108's PMI: pairs minted ONLY through a basket-keyed
      // self-join (mega-baskets excluded from pairing by the cap, the
      // d06/x110 move), support floor before the frequency joins,
      // micro-quantized lift before the top cut
      (s, d) => graft.operators.Basket.coOccurrenceLift(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2, top = 50),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
          FROM lineitem
          WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n FROM op),
        itemn AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni
          FROM op GROUP BY 1),
        sized AS (SELECT op.b, op.i FROM op
          JOIN (SELECT b FROM op GROUP BY b HAVING COUNT(*) <= 100) ok
          ON op.b = ok.b),
        pairs AS (SELECT l.i AS item_a, r.i AS item_b,
            CAST(COUNT(*) AS BIGINT) AS n_both
          FROM sized l JOIN sized r ON l.b = r.b AND l.i < r.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        j AS (SELECT p.item_a, p.item_b, p.n_both,
            ua.ni AS n_a, ub.ni AS n_b,
            CAST(ROUND((CAST(p.n_both AS DOUBLE) * nb.n)
              / (CAST(ua.ni AS DOUBLE) * ub.ni) * 1e6, 0) AS BIGINT)
              AS micro
          FROM pairs p
          JOIN itemn ua ON p.item_a = ua.i
          JOIN itemn ub ON p.item_b = ub.i, nb)
        SELECT item_a, item_b, n_both, n_a, n_b,
          ROUND(CAST(micro AS DOUBLE) / 1e6, 6) AS lift
        FROM j ORDER BY lift DESC, item_a, item_b LIMIT 50""")),

    Q("x114_event_transitions",
      // first-order Markov transition matrix over user journeys: one
      // user-keyed lead window with the (ts, event_id) tie-break, a
      // types^2-sized aggregate, integer-ppm row-normalized
      (s, d) => graft.operators.Funnel.eventTransitions(
        eventsTable(s, d)),
      Some(transitionsOracleSql)),

    Q("a22_theil_sen",
      // Theil-Sen robust trend slope per metric series (median of all
      // pairwise slopes — one outlier day CANNOT drag the trend the
      // way an OLS fit lets it): per-series pair stage is quadratic
      // and GUARDED by maxPoints (window the input — the d06 cap
      // discipline); the pair join is series-keyed equi, never
      // all-pairs across series
      (s, d) => graft.anomalies.Forecast.theilSen(
          eventsTable(s, d).groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          Seq("event_type"), "day", "cnt")
        .orderBy("event_type"),
      Some("""WITH s AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        pts AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', day) AS x, y
          FROM s),
        counts AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
            AS n_points FROM pts GROUP BY 1),
        sl AS (SELECT a.event_type,
            (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS sl
          FROM pts a JOIN pts b
          ON a.event_type = b.event_type AND a.x < b.x),
        slopes AS (SELECT event_type, median(sl) AS slope,
            CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM sl GROUP BY 1),
        ic AS (SELECT p.event_type,
            median(p.y - sl2.slope * p.x) AS intercept
          FROM pts p JOIN slopes sl2 USING (event_type) GROUP BY 1)
        SELECT event_type, n_points, n_pairs,
          ROUND(slope, 6) AS slope, ROUND(intercept, 6) AS intercept
        FROM counts JOIN slopes USING (event_type)
        JOIN ic USING (event_type)
        ORDER BY event_type""")),

    Q("a23_proportion_alert",
      // Wilson-interval proportion anomaly: per-segment daily error
      // RATE flagged only when the exact-binomial interval excludes
      // the segment's pooled share — the small-n fix for the
      // false-alarm storm a z-score on p-hat throws on low-traffic
      // days (3/10 and 300/1000 share a p-hat, not evidence). All
      // literal arithmetic mirrored double-for-double in the oracle.
      (s, d) => Anomalies.proportionAnomaly(
          eventsTable(s, d).filter(col("user_id").isNotNull)
            .withColumn("segment", pmod(col("user_id"), lit(4)))
            .withColumn("day", to_date(col("ts"))),
          Seq("segment"), "day", col("event_type") === "error")
        .select(col("segment"), col("day"), col("k"), col("n"),
          round(col("p_hat"), 6).as("p_hat"),
          round(col("wilson_lo"), 6).as("wilson_lo"),
          round(col("wilson_hi"), 6).as("wilson_hi"),
          round(col("baseline_p"), 6).as("baseline_p"),
          col("is_anomalous"))
        .orderBy("segment", "day"),
      Some("""WITH e AS (
          SELECT user_id % 4 AS segment, CAST(ts AS DATE) AS day,
            CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
          FROM events WHERE user_id IS NOT NULL),
        pb AS (SELECT segment, day, CAST(SUM(is_err) AS BIGINT) AS k,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2),
        pool AS (SELECT segment,
            CAST(SUM(k) AS DOUBLE) / SUM(n) AS baseline_p
          FROM pb GROUP BY 1),
        w AS (SELECT pb.segment, pb.day, pb.k, pb.n, pool.baseline_p,
            CAST(pb.k AS DOUBLE) / pb.n AS p,
            CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
          FROM pb JOIN pool USING (segment)),
        b AS (SELECT segment, day, k, n, baseline_p, p,
            (p + z2 / (CAST(2.0 AS DOUBLE) * n))
              / (CAST(1.0 AS DOUBLE) + z2 / n)
              AS center,
            (CAST(1.96 AS DOUBLE) * SQRT(
                p * (CAST(1.0 AS DOUBLE) - p) / n
                  + z2 / (CAST(4.0 AS DOUBLE) * n * n)))
              / (CAST(1.0 AS DOUBLE) + z2 / n)
              AS half
          FROM w)
        SELECT segment, day, k, n,
          ROUND(p, 6) AS p_hat,
          ROUND(center - half, 6) AS wilson_lo,
          ROUND(center + half, 6) AS wilson_hi,
          ROUND(baseline_p, 6) AS baseline_p,
          baseline_p < center - half OR baseline_p > center + half
            AS is_anomalous
        FROM b ORDER BY segment, day""")),

    Q("a24_theil_sen_sampled",
      // a22 past the maxPoints refusal: randomized Theil–Sen — slope
      // = median of a deterministic hash-seeded pair SAMPLE, linear
      // in pairsPerSeries where the exact form is quadratic (the
      // standard answer for the 10k-point series a22's guard refuses;
      // a22 stays the exact arm on windowed input). Convergence is
      // the oracle-gated product: the sampled slopes persist, DuckDB
      // re-derives the exact slopes from raw events, and within_tol
      // is pinned TRUE at |sampled − exact| ≤ 0.6 (≈2× the max
      // observed gap at 300 pairs on all three fixtures) — a
      // sampling-lane regression goes hash-red, not silently biased.
      (s, d) => {
        val ev = eventsTable(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("cnt"))
          .localCheckpoint() // keyspace-sized; feeds exact + sampled
        val state = freshState(s, "a24")
        graft.anomalies.Forecast
          .theilSenSampled(ev, Seq("event_type"), "day", "cnt",
            pairsPerSeries = 300, seed = 7)
          .select(col("event_type"), col("n_pairs_sampled"),
            col("slope").as("slope_sampled"))
          .write.mode("overwrite").parquet(state + "/sampled")
        graft.anomalies.Forecast
          .theilSen(ev, Seq("event_type"), "day", "cnt")
          .select(col("event_type"), col("n_points"),
            col("slope").as("slope_exact"))
          .join(s.read.parquet(state + "/sampled"), Seq("event_type"))
          .withColumn("abs_diff",
            round(abs(col("slope_sampled") - col("slope_exact")), 6))
          .withColumn("within_tol", col("abs_diff") <= lit(0.6))
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        pts AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', day) AS x, y
          FROM s),
        counts AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
            AS n_points FROM pts GROUP BY 1),
        sl AS (SELECT a.event_type,
            (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS sl
          FROM pts a JOIN pts b
          ON a.event_type = b.event_type AND a.x < b.x),
        slopes AS (SELECT event_type, ROUND(median(sl), 6) AS slope_exact
          FROM sl GROUP BY 1),
        samp AS (SELECT event_type,
            CAST(n_pairs_sampled AS BIGINT) AS n_pairs_sampled,
            slope_sampled
          FROM read_parquet('/tmp/graft_qstate/a24/sampled/*.parquet'))
        SELECT counts.event_type, counts.n_points, slopes.slope_exact,
          samp.n_pairs_sampled, samp.slope_sampled,
          ROUND(ABS(samp.slope_sampled - slopes.slope_exact), 6)
            AS abs_diff,
          TRUE AS within_tol
        FROM counts JOIN slopes USING (event_type)
        JOIN samp USING (event_type)
        ORDER BY counts.event_type""")),

    Q("x118_rank_correlation",
      // Kendall tau between two bm25 parameterizations (k1/b sweep) —
      // does the retuning actually REORDER results or just rescale
      // scores? Pair counting over the top-20 intersection: the self-
      // join is page-bounded (k^2) by construction (PlanAudit
      // whitelist carries the justification — the lineage cut erases
      // Catalyst's maxRows proof)
      (s, d) => {
        val docs = t(s, d, "documents")
        val terms = Seq("spark", "merge", "vector")
        TextAnalysis.rankCorrelation(
          TextAnalysis.bm25TopK(docs, terms, k = 20),
          TextAnalysis.bm25TopK(docs, terms, k = 20, k1 = 2.0, b = 0.25))
      },
      Some {
        def arm(sfx: String, k1: Double, b: Double): String = {
          val tfNum = (k1 + 1.0).toString
          val oneMinusB = (1.0 - b).toString
          s"""per_term$sfx AS (
             |  SELECT qtf.doc_id,
             |    CAST(ROUND(
             |      ln((CAST(stats.n AS DOUBLE) - df.df + 0.5)
             |          / (df.df + 0.5) + 1.0)
             |        * (qtf.tf * $tfNum)
             |        / (qtf.tf + $k1 * ($oneMinusB
             |          + $b * (CAST(dl.dl AS DOUBLE)
             |            / (CAST(stats.tl AS DOUBLE) / stats.n))))
             |        * 1e6, 0) AS BIGINT) AS micro
             |  FROM qtf JOIN df USING (token) JOIN dl USING (doc_id)
             |  CROSS JOIN stats),
             |per_doc$sfx AS (SELECT doc_id, SUM(micro) AS score_micro
             |  FROM per_term$sfx GROUP BY 1),
             |ranked$sfx AS (SELECT doc_id,
             |    ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id)
             |      AS rank
             |  FROM per_doc$sfx)""".stripMargin
        }
        """WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents WHERE doc_id IS NOT NULL),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl),
        qtf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
          WHERE token IN ('spark', 'merge', 'vector') GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY 1),
        """ + arm("_a", 1.2, 0.75) + ",\n" + arm("_b", 2.0, 0.25) + """,
        j AS (SELECT a.doc_id, a.rank AS ra, b.rank AS rb
          FROM (SELECT * FROM ranked_a WHERE rank <= 20) a
          JOIN (SELECT * FROM ranked_b WHERE rank <= 20) b
          USING (doc_id)),
        pc AS (SELECT
            CAST(SUM(CASE WHEN (l.ra < r.ra) = (l.rb < r.rb)
              THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
            CAST(SUM(CASE WHEN (l.ra < r.ra) <> (l.rb < r.rb)
              THEN 1 ELSE 0 END) AS BIGINT) AS discordant
          FROM j l JOIN j r ON l.doc_id < r.doc_id),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM j)
        SELECT nc.n_common,
          COALESCE(pc.concordant, 0) + COALESCE(pc.discordant, 0)
            AS n_pairs,
          COALESCE(pc.concordant, 0) AS concordant,
          COALESCE(pc.discordant, 0) AS discordant,
          CASE WHEN COALESCE(pc.concordant, 0)
              + COALESCE(pc.discordant, 0) > 0
            THEN ROUND(CAST(pc.concordant - pc.discordant AS DOUBLE)
              / (pc.concordant + pc.discordant), 6)
            ELSE CAST(0.0 AS DOUBLE) END AS tau
        FROM pc, nc"""
      }),

    Q("x119_margin_reliability",
      // margin-calibration curve for the NB classifier: log2-spaced
      // margin buckets via integer BIT LENGTH (never float log2, whose
      // libm rounding could flip a power-of-two boundary between
      // engines) with per-bucket accuracy against held-out truth —
      // the curve that calibrates "how big a margin before
      // auto-accepting this label at 100 TB"
      (s, d) => {
        val docs = t(s, d, "documents")
        val heldout = docs.filter(col("doc_id") % 5 === 0)
        val model = graft.pipeline.Classify.trainNaiveBayes(
          docs.filter(col("doc_id") % 5 =!= 0), "text", "source")
        graft.pipeline.Classify.reliabilityByMargin(
            graft.pipeline.Classify.scoreWithMargin(model, heldout),
            heldout.select(col("doc_id"), col("source")),
            labelCol = "source")
          .orderBy("margin_bucket")
      },
      Some(nbOracleCtes(
        "SELECT * FROM documents WHERE doc_id % 5 = 0", None) + """,
        margins AS (
          SELECT doc_id,
            MAX(CASE WHEN rk = 1 THEN label END) AS predicted,
            MAX(CASE WHEN rk = 1 THEN score_micro END)
              - MAX(CASE WHEN rk = 2 THEN score_micro END) AS margin_micro
          FROM ranked WHERE rk <= 2 GROUP BY doc_id),
        joined AS (
          SELECT m.margin_micro, m.predicted, t.source AS actual
          FROM margins m JOIN test t USING (doc_id))
        SELECT CAST(length(bin(margin_micro + 1)) AS INT)
            AS margin_bucket,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
          CAST(MIN(margin_micro) AS BIGINT) AS min_margin,
          CAST(MAX(margin_micro) AS BIGINT) AS max_margin,
          ROUND(CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*), 6) AS accuracy
        FROM joined GROUP BY 1 ORDER BY margin_bucket""")),

    Q("x121_canonical_dedup",
      // normalize-BEFORE-dedup: byte-different, visually-identical
      // variants (curly quotes, NBSP, doubled spaces, case) are
      // invisible to raw exact dedup and recovered by
      // TextAnalysis.canonicalizeText (fold -> collapse -> trim ->
      // lower, the order being part of the contract). Every 4th doc
      // gets an injected messy variant (upper + NBSP-doubled spaces);
      // canonical_gain counts exactly the recovered variants per
      // source. Map-only expression chain + one groupBy.
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "source", "text")
        val variants = docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("source"),
            regexp_replace(upper(col("text")), " ",
              "\u00A0  ").as("text")) // NBSP + doubled space
        docs.unionByName(variants)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("text")).as("distinct_raw"),
            countDistinct(TextAnalysis.canonicalizeText(col("text")))
              .as("distinct_canonical"))
          .withColumn("canonical_gain",
            col("distinct_raw") - col("distinct_canonical"))
          .orderBy("source")
      },
      Some("""WITH docs AS (
          SELECT doc_id, source, text FROM documents
          UNION ALL
          SELECT doc_id + 10000000, source,
            regexp_replace(upper(text), ' ', chr(160) || '  ', 'g')
          FROM documents WHERE doc_id % 4 = 0),
        canon AS (
          SELECT source, text,
            lower(trim(regexp_replace(
              translate(text,
                chr(8216) || chr(8217) || chr(8220) || chr(8221)
                  || chr(8211) || chr(8212) || chr(160),
                '''''""-- '),
              '\s+', ' ', 'g'))) AS ctext
          FROM docs)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_raw,
          CAST(COUNT(DISTINCT ctext) AS BIGINT) AS distinct_canonical,
          CAST(COUNT(DISTINCT text) - COUNT(DISTINCT ctext) AS BIGINT)
            AS canonical_gain
        FROM canon GROUP BY source ORDER BY source""")),

    Q("x120_temperature_mix",
      // temperature (alpha) mixture weights, the mT5/CC-100
      // rebalancing: per-source weight ∝ share^alpha with the
      // repeat-exposure consequence (implied_epochs at a 10%-of-corpus
      // token budget) — the audit a data-constrained run does before
      // picking alpha. DERIVES weights from the corpus (x54's
      // water-filling takes them as input). One corpus scan into a
      // sources-sized frame; everything after is metadata arithmetic.
      (s, d) => Sampling.temperatureMixtureAtFraction(
          t(s, d, "documents"), Seq(0.3, 0.5, 0.7),
          budgetFraction = 0.10)
        .orderBy("source", "alpha"),
      Some("""WITH tokd AS (
          SELECT source, CASE WHEN LENGTH(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
          FROM documents WHERE source IS NOT NULL),
        tok AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens
          FROM tokd GROUP BY source),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
            CAST(FLOOR(0.10 * SUM(n_tokens)) AS BIGINT) AS b FROM tok),
        al AS (SELECT * FROM (VALUES (CAST(0.3 AS DOUBLE)),
            (CAST(0.5 AS DOUBLE)), (CAST(0.7 AS DOUBLE))) AS a(alpha)),
        sc AS (SELECT t.source, a.alpha, t.n_tokens,
            CAST(t.n_tokens AS DOUBLE) / tot.total AS share,
            POW(CAST(t.n_tokens AS DOUBLE) / tot.total, a.alpha) AS num,
            tot.b AS b
          FROM tok t CROSS JOIN tot CROSS JOIN al a),
        den AS (SELECT alpha, SUM(num) AS den FROM sc GROUP BY alpha)
        SELECT sc.source, sc.alpha, sc.n_tokens,
          ROUND(share, 6) AS share,
          ROUND(num / den, 6) AS weight,
          ROUND(num / den * b / sc.n_tokens, 6) AS implied_epochs
        FROM sc JOIN den USING (alpha)
        ORDER BY sc.source, sc.alpha""")),

    Q("x117_incremental_bm25",
      // persisted BM25 index: the standing corpus signs once into
      // (token, id, tf) postings + (id, dl) lengths, a delta slice
      // APPENDS without re-reading old text, and the query touches
      // only its terms' postings + the id-keyed metadata — never the
      // corpus. The oracle is the FRESH batch computation over the
      // full corpus (x36's SQL): incremental path = recompute, the
      // contract every store in this engine is held to
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x117")
        TextAnalysis.bm25StoreCreate(
          docs.filter(col("doc_id") < 400), state + "/bm25")
        TextAnalysis.bm25StoreAppend(
          state + "/bm25", docs.filter(col("doc_id") >= 400))
        TextAnalysis.bm25StoreQuery(s, state + "/bm25",
          Seq("spark", "merge", "vector"), k = 10)
      },
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents WHERE doc_id IS NOT NULL),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl),
        qtf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
          WHERE token IN ('spark', 'merge', 'vector') GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY 1),
        per_term AS (
          SELECT qtf.doc_id,
            CAST(ROUND(
              ln((CAST(stats.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
                * (qtf.tf * 2.2)
                / (qtf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                    / (CAST(stats.tl AS DOUBLE) / stats.n))))
                * 1e6, 0) AS BIGINT) AS micro
          FROM qtf JOIN df USING (token) JOIN dl USING (doc_id)
          CROSS JOIN stats),
        per_doc AS (
          SELECT doc_id, SUM(micro) AS score_micro,
            CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM per_term GROUP BY 1),
        ranked AS (
          SELECT doc_id, n_terms, score_micro,
            ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rank
          FROM per_doc)
        SELECT doc_id, CAST(rank AS INT) AS rank,
          ROUND(CAST(score_micro AS DOUBLE) / 1e6, 6) AS bm25, n_terms
        FROM ranked WHERE rank <= 10 ORDER BY rank""")),

    Q("x116_edit_distance_verify",
      // character-grain confirm of the LSH candidate pairs: banded
      // minhash proposes (never all-pairs), Levenshtein on maxChars
      // prefixes verifies at the character level — catching the
      // whitespace/punct-only and find-and-replace cases token-grain
      // Jaccard mis-scores. The candidate frame PERSISTS (its
      // generation is d03's already-oracled shape) and the oracle
      // recomputes every distance and verdict from raw text
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x116")
        val sigs = Dedup.minhashSignatures(docs,
          numHashes = 128, numBands = 32)
        Dedup.lshCandidatePairs(sigs).select("id_a", "id_b")
          .coalesce(1).write.mode("overwrite").parquet(state + "/cands")
        Dedup.editDistanceVerify(docs, s.read.parquet(state + "/cands"))
      },
      Some("""WITH p AS (SELECT id_a, id_b
          FROM read_parquet('/tmp/graft_qstate/x116/cands/*.parquet')),
        t AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
        j AS (SELECT p.id_a, p.id_b,
            substring(ta.t, 1, 2000) AS sa, substring(tb.t, 1, 2000) AS sb
          FROM p JOIN t ta ON p.id_a = ta.doc_id
          JOIN t tb ON p.id_b = tb.doc_id),
        l AS (SELECT id_a, id_b,
            CAST(levenshtein(sa, sb) AS BIGINT) AS lev,
            CAST(GREATEST(len(sa), len(sb)) AS BIGINT) AS max_len
          FROM j),
        r AS (SELECT id_a, id_b, lev, max_len,
            CAST(CASE WHEN max_len > 0 THEN lev * 1000000 // max_len
              ELSE 0 END AS BIGINT) AS edit_ratio_ppm
          FROM l)
        SELECT id_a, id_b, lev, max_len, edit_ratio_ppm,
          edit_ratio_ppm <= 300000 AS is_near_dup
        FROM r ORDER BY id_a, id_b""")),

    Q("x115_dp_counts",
      // SEEDED Laplace per-source counts — the Laplace mechanism's
      // testable core (sensitivity-1 count noise), NOT a DP release:
      // the draw is a deterministic function of (seed, group), so the
      // oracle replays it exactly (x06 portable-hash discipline);
      // micro-quantized before adding. The guarantee-carrying mode is
      // Privacy.dpGroupCountsFresh (fresh rand(), spec-pinned
      // distributionally — unreplayable by construction)
      (s, d) => graft.pipeline.Privacy.seededLaplaceCounts(
          t(s, d, "documents"), "source",
        epsilon = 1.0),
      Some("""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents WHERE source IS NOT NULL GROUP BY source),
        h AS (SELECT source, n,
            CAST(('0x' || substring(
              md5('dp-v1:' || CAST(source AS VARCHAR)), 1, 8))
              AS BIGINT) AS hh
          FROM c),
        u AS (SELECT source, n,
            (CAST(hh AS DOUBLE) + 0.5) / 4294967296.0 AS uu
          FROM h),
        nz AS (SELECT source, n,
            CAST(ROUND((-1.0 * sign(uu - 0.5)
              * ln(1.0 - 2.0 * abs(uu - 0.5))) * 1e6, 0) AS BIGINT)
              AS nm
          FROM u)
        SELECT source, CAST(1.0 AS DOUBLE) AS epsilon,
          ROUND(CAST(n AS DOUBLE) + CAST(nm AS DOUBLE) / 1e6, 6)
            AS noisy_count
        FROM nz ORDER BY source""")),

    Q("d07_cross_dedup",
      // document-level decontamination: training docs (id ≥ 10) that
      // near-duplicate any benchmark doc (id < 10) — banded-LSH
      // candidates ACROSS the corpora only, exact shingle-Jaccard
      // verify; one planted clone spans the boundary in this fixture
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.crossCorpusNearDuplicates(
            docs.filter(col("doc_id") >= 10),
            docs.filter(col("doc_id") < 10),
            threshold = 0.5)
          .orderBy("corpus_id", "ref_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS w
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM toks WHERE len(w) >= 3),
        p AS (
          SELECT c.doc_id AS corpus_id, r.doc_id AS ref_id,
            CAST(len(list_intersect(c.s, r.s)) AS DOUBLE)
              / len(list_distinct(list_concat(c.s, r.s))) AS j
          FROM sh c JOIN sh r ON c.doc_id >= 10 AND r.doc_id < 10)
        SELECT corpus_id, ref_id, ROUND(j, 6) AS jaccard
        FROM p WHERE j >= CAST(0.5 AS DOUBLE)
        ORDER BY corpus_id, ref_id""")),

    Q("d08_span_dedup",
      // exact duplicate-span removal (Lee et al. 2022 substring dedup):
      // every 9-token window occurring >1 time corpus-wide is removed
      // except its first (doc_id, pos) occurrence; docs keep uncovered
      // tokens. Catches boilerplate INSIDE otherwise-unique docs.
      (s, d) => Dedup.duplicateSpanRemoval(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS w
          FROM documents),
        sp AS (
          SELECT doc_id,
            unnest(range(1, len(w) - 7)) - 1 AS spos,
            unnest(list_transform(range(1, len(w) - 7),
              i -> list_aggregate(w[i:i+8], 'string_agg', ' '))) AS span
          FROM toks WHERE len(w) >= 9),
        dup AS (
          SELECT doc_id, spos FROM (
            SELECT doc_id, spos,
              ROW_NUMBER() OVER (PARTITION BY span
                ORDER BY doc_id, spos) AS rn
            FROM sp) WHERE rn > 1),
        cov AS (
          SELECT DISTINCT doc_id, tpos FROM (
            SELECT doc_id, unnest(range(spos, spos + 9)) AS tpos FROM dup)),
        tok AS (
          SELECT doc_id, unnest(range(1, len(w) + 1)) - 1 AS tpos,
            unnest(w) AS tok
          FROM toks),
        kept AS (
          SELECT t.doc_id, t.tpos, t.tok FROM tok t
          ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.tpos = c.tpos),
        reb AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
            string_agg(tok, ' ' ORDER BY tpos) AS cleaned
          FROM kept GROUP BY 1)
        SELECT toks.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(len(w) - COALESCE(kept_tokens, 0) AS BIGINT) AS removed_tokens,
          COALESCE(cleaned, '') AS cleaned_text
        FROM toks LEFT JOIN reb ON toks.doc_id = reb.doc_id
        ORDER BY toks.doc_id""")),

    Q("d09_string_id_dedup",
      // string-keyed corpora (URLs/UUIDs) run the SAME dedup stack:
      // duplicateClusters dictionary-encodes the ids to dense longs
      // (denseIdDictionary — bucketed rank, no global sort), clusters
      // on longs, then decodes and relabels each cluster to its
      // minimum member id in STRING space — which is exactly what the
      // oracle can express without ever seeing the dictionary.
      // End-to-end: exact dups + LSH near-dups → components → keep set.
      (s, d) => {
        // fixture capped at 500 docs at ANY SF: the query exercises the
        // string-id encode/cluster/decode plumbing, which doesn't need
        // corpus scale — and the REPLAY oracle is all-pairs trigram
        // Jaccard, which at sf0.1's 5000 docs cost DuckDB ~45 min
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val sdocs = docs.select(
          concat(lit("doc-"),
            lpad(col("doc_id").cast("string"), 6, "0")).as("sid"),
          col("text"))
        Dedup.dedupCorpus(sdocs, idCol = "sid")
          .select(col("sid")).orderBy("sid")
      },
      Some("""WITH RECURSIVE sdocs AS (
          SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS sid,
            text
          FROM documents WHERE doc_id < 500),
        eg AS (
          SELECT text, MIN(sid) AS head FROM sdocs
          WHERE text IS NOT NULL GROUP BY text HAVING COUNT(*) > 1),
        epairs AS (
          SELECT eg.head AS id_a, s.sid AS id_b
          FROM eg JOIN sdocs s ON s.text = eg.text AND s.sid != eg.head),
        words AS (
          SELECT sid, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS w
          FROM sdocs),
        sh AS (
          SELECT sid, list_distinct(list_transform(
            range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM words WHERE len(w) >= 3),
        npairs AS (
          SELECT a.sid AS id_a, b.sid AS id_b
          FROM sh a JOIN sh b ON a.sid < b.sid
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= CAST(0.9 AS DOUBLE)),
        allp AS (
          SELECT id_a, id_b FROM epairs
          UNION SELECT id_a, id_b FROM npairs),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM allp
          UNION SELECT id_b AS src, id_a AS dst FROM allp),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS sid, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src)
        SELECT s.sid FROM sdocs s
        WHERE s.sid NOT IN
          (SELECT sid FROM clust WHERE sid != cluster_id)
        ORDER BY sid""")),

    Q("d10_incremental_minhash",
      // the daily-ingest shape: a persisted signature store covers the
      // standing corpus (doc_id < 450); a new slice (doc_id ≥ 450) is
      // signed with the STORE's parameters, matched against the store
      // via a band-keyed cross join + within-slice LSH, and appended —
      // old text is never re-read, old signatures never recomputed.
      // Replay oracle (d04 pattern): DuckDB recomputes signature
      // agreement over the persisted post-append store for every pair
      // touching the slice; at threshold 0.9 with 128 hashes / 32
      // bands the pigeonhole makes banded candidates EQUAL all-pairs,
      // so both engines see the identical pair set.
      (s, d) => {
        val docs = t(s, d, "documents")
        val stateDir = freshState(s, "d10")
        // proportional ingest boundary (last 10% of ids are the "new"
        // slice) so the small-slice shape — and the oracle's pair
        // count — holds at EVERY SF: a fixed literal flipped 90% of a
        // bigger corpus into the slice and made the sf0.1 replay
        // oracle quadratic in the whole corpus. Integer arithmetic
        // matches DuckDB's // exactly.
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val cut = 9L * (maxId + 1L) / 10L
        Dedup.minhashStoreSave(
          Dedup.minhashStoreCreate(docs.filter(col("doc_id") < cut),
            numBands = 32),
          stateDir)
        Dedup.minhashStoreAppend(stateDir, docs.filter(col("doc_id") >= cut))
        // compute from the PERSISTED post-append table (what the
        // oracle replays), split back at the ingest boundary
        val full = Dedup.minhashStoreLoad(s, stateDir)
        Dedup.incrementalNearDuplicatesFromSignatures(
            full.copy(sigs = full.sigs.filter(col("doc_id") < cut)),
            full.sigs.filter(col("doc_id") >= cut),
            threshold = 0.9, maxBucketSize = Int.MaxValue)
          .select(col("id_a"), col("id_b"),
            round(col("est_jaccard"), 6).as("est_jaccard"))
          .orderBy("id_a", "id_b")
      },
      // oracle NOTE: agreement counted through a (position, value)
      // equi-join — a pair's agreeing positions surface as join hits —
      // instead of the literal slice×corpus nested loop with a
      // 128-element list_filter per pair (32 s at sf0.1 → 0.2 s,
      // verified identical output). Pairs at est ≥ 0.9 always agree
      // somewhere, so the grouped join sees every qualifying pair.
      Some("""WITH sig AS (
          SELECT doc_id, signature
          FROM read_parquet('/tmp/graft_qstate/d10/signatures/*.parquet')),
        cut AS (
          SELECT 9 * (MAX(doc_id) + 1) // 10 AS c FROM sig),
        p AS (
          SELECT doc_id, s['i'] AS i, s['v'] AS v FROM (
            SELECT doc_id, unnest(list_transform(
              range(1, len(signature) + 1),
              i -> struct_pack(i := i, v := signature[i]))) AS s
            FROM sig)),
        m AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(COUNT(*) AS DOUBLE) / 128.0 AS est
          FROM p a JOIN p b ON a.i = b.i AND a.v = b.v
          WHERE a.doc_id >= (SELECT c FROM cut)
            AND (b.doc_id < (SELECT c FROM cut) OR b.doc_id > a.doc_id)
          GROUP BY 1, 2)
        SELECT id_a, id_b, ROUND(est, 6) AS est_jaccard
        FROM m WHERE est >= CAST(0.9 AS DOUBLE)
        ORDER BY id_a, id_b""")),

    Q("x77_sketch_calibration",
      // MinHash-estimator calibration (d12 measures the candidate
      // set's P/R; this measures the ESTIMATOR itself): over the LSH
      // candidate pairs, signature-agreement estimates vs exact
      // n-gram Jaccard, rolled up as mean absolute error per exact-
      // Jaccard decile — the curve that tells you whether 128 hashes
      // are enough BEFORE a 100 TB signing run commits to them.
      // Signatures + candidates persist; the oracle re-derives every
      // estimate, every exact value, and the rollup. Errors quantize
      // to micro before the per-bucket integer sums.
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x77")
        val sigs = Dedup.minhashSignatures(docs,
          numHashes = 128, numBands = 32)
        sigs.select("doc_id", "signature")
          .coalesce(2).write.mode("overwrite")
          .parquet(state + "/signatures")
        Dedup.lshCandidatePairs(sigs)
          .coalesce(2).write.mode("overwrite")
          .parquet(state + "/candidates")
        val cands = s.read.parquet(state + "/candidates")
        val sg = s.read.parquet(state + "/signatures")
        val est = cands
          .join(sg.select(col("doc_id").as("id_a"),
            col("signature").as("__sa")), "id_a")
          .join(sg.select(col("doc_id").as("id_b"),
            col("signature").as("__sb")), "id_b")
          .withColumn("est", round(expr(
            """size(filter(sequence(0, 127),
              |i -> element_at(__sa, i + 1) = element_at(__sb, i + 1)))
              |""".stripMargin).cast("double") / 128.0, 6))
          .select("id_a", "id_b", "est")
        val exact = Dedup.ngramJaccard(docs, cands)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("exact"))
        est.join(exact, Seq("id_a", "id_b"))
          .withColumn("bucket",
            least(floor(col("exact") * 10).cast("int"), lit(9)))
          .withColumn("__ae",
            round(abs(col("est") - col("exact")) * 1e6, 0).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_pairs"),
            round(sum("__ae").cast("double") / count(lit(1)) / 1e6, 6)
              .as("mae"))
          .orderBy("bucket")
      },
      Some("""WITH sig AS (SELECT doc_id, signature FROM read_parquet(
            '/tmp/graft_qstate/x77/signatures/*.parquet')),
        cand AS (SELECT id_a, id_b FROM read_parquet(
            '/tmp/graft_qstate/x77/candidates/*.parquet')),
        est AS (
          SELECT c.id_a, c.id_b,
            ROUND(CAST(len(list_filter(range(1, 129),
              i -> a.signature[i] = b.signature[i])) AS DOUBLE)
              / 128.0, 6) AS est
          FROM cand c
          JOIN sig a ON a.doc_id = c.id_a
          JOIN sig b ON b.doc_id = c.id_b),
        words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
            AS w
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM words WHERE len(w) >= 3),
        ex AS (
          SELECT c.id_a, c.id_b,
            ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
              AS exact
          FROM cand c
          JOIN sh a ON a.doc_id = c.id_a
          JOIN sh b ON b.doc_id = c.id_b),
        j AS (
          SELECT LEAST(CAST(FLOOR(ex.exact * 10) AS INT), 9) AS bucket,
            CAST(ROUND(ABS(est.est - ex.exact) * 1e6, 0) AS BIGINT)
              AS ae
          FROM est JOIN ex USING (id_a, id_b))
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          ROUND(CAST(SUM(ae) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mae
        FROM j GROUP BY bucket ORDER BY bucket""")),

    Q("x79_canary_scan",
      // contamination-canary scan: literal canary strings (raw
      // 40-char spans lifted from every 29th doc — spanning token
      // boundaries and punctuation, which the n-gram contamination
      // path x08 cannot see) searched as RAW substrings over the
      // whole corpus through ONE Aho–Corasick pass per document —
      // O(chars) regardless of canary count, where the naive
      // contains() plan is a BNLJ whose cost multiplies by the canary
      // list. The oracle recomputes the same needle set and replays
      // the scan with DuckDB's contains join.
      (s, d) => {
        val docs = t(s, d, "documents")
        val canaries = docs.filter(col("doc_id") % 29 === 0 &&
            length(col("text")) >= 60)
          .select(substring(col("text"), 10, 40).as("c"))
          .distinct().orderBy("c")
          .collect().map(_.getString(0)).toSeq
        TextAnalysis.canaryScan(docs, canaries).orderBy("canary")
      },
      Some("""WITH needles AS (
          SELECT DISTINCT substring(text, 10, 40) AS canary
          FROM documents WHERE doc_id % 29 = 0 AND length(text) >= 60),
        hits AS (
          SELECT n.canary, d.doc_id
          FROM needles n JOIN documents d ON contains(d.text, n.canary)),
        agg AS (SELECT canary, CAST(COUNT(*) AS BIGINT) AS n_docs,
            MIN(doc_id) AS first_doc
          FROM hits GROUP BY 1)
        SELECT n.canary, COALESCE(a.n_docs, 0) AS n_docs, a.first_doc
        FROM needles n LEFT JOIN agg a USING (canary)
        ORDER BY n.canary""")),

    Q("x86_canary_inject",
      // the WRITE side of the canary lane (secret-sharer membership
      // probe): plant a deterministic md5-derived marker in every
      // 37th doc, then prove the loop closes — the Aho–Corasick scan
      // over the injected corpus finds every planted canary. The
      // manifest is DERIVED (id+salt), so the oracle replays
      // injection, scan and rollup with no persisted state at all.
      (s, d) => {
        val docs = t(s, d, "documents")
        val injected = TextAnalysis.injectCanaries(docs)
        val manifest = TextAnalysis.canaryManifest(docs)
        val canaries = manifest.select("canary").orderBy("canary")
          .collect().map(_.getString(0)).toSeq
        TextAnalysis.canaryScan(injected, canaries)
          .join(broadcast(manifest), Seq("canary"))
          .select(col("canary"), col("injected_doc"), col("n_docs"),
            col("first_doc"))
          .orderBy("canary")
      },
      Some("""WITH man AS (SELECT doc_id AS injected_doc,
            'canary:' || md5(CAST(doc_id AS VARCHAR) || ':graft')
              AS canary
          FROM documents WHERE doc_id % 37 = 0),
        inj AS (SELECT d.doc_id,
            CASE WHEN d.doc_id % 37 = 0
              THEN d.text || ' canary:' ||
                md5(CAST(d.doc_id AS VARCHAR) || ':graft')
              ELSE d.text END AS text
          FROM documents d),
        hits AS (SELECT m.canary, i.doc_id
          FROM man m JOIN inj i ON contains(i.text, m.canary)),
        agg AS (SELECT canary, CAST(COUNT(*) AS BIGINT) AS n_docs,
            MIN(doc_id) AS first_doc
          FROM hits GROUP BY 1)
        SELECT m.canary, m.injected_doc,
          COALESCE(a.n_docs, 0) AS n_docs, a.first_doc
        FROM man m LEFT JOIN agg a USING (canary)
        ORDER BY m.canary""")),

    Q("x87_compression_quality",
      // Deflate compression ratio as a whole-document repetitiveness
      // gate (template spam and degenerate generations compress far
      // below natural prose; Deflate's 32 KB window sees document-
      // scale structure the n-gram repetition signal can't). Map-only,
      // one Deflater per partition. Byte-level codecs aren't SQL, so
      // the per-doc frame persists (the multimodal replay pattern) and
      // the oracle re-derives the per-source rollup: mean/min/max
      // ratio from integer ppm counts, the sub-15% template-suspect
      // count, and the corpus byte totals.
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x87")
        TextAnalysis.compressionRatio(docs)
          .join(docs.select(col("doc_id").cast("long").as("doc_id"),
            col("source")), Seq("doc_id"))
          .coalesce(2).write.mode("overwrite")
          .parquet(state + "/ratios")
        val r = s.read.parquet(state + "/ratios")
        r.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            floor(sum("ratio_ppm") / count(lit(1))).cast("long")
              .as("mean_ratio_ppm"),
            min("ratio_ppm").as("min_ratio_ppm"),
            max("ratio_ppm").as("max_ratio_ppm"),
            sum(when(col("ratio_ppm") < 150000L, 1L).otherwise(0L))
              .as("n_template_suspect"),
            sum("n_bytes").as("total_bytes"),
            sum("n_compressed").as("total_compressed"))
          .orderBy("source")
      },
      Some("""WITH r AS (SELECT source, ratio_ppm, n_bytes, n_compressed
          FROM read_parquet('/tmp/graft_qstate/x87/ratios/*.parquet'))
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(FLOOR(CAST(SUM(ratio_ppm) AS DOUBLE) / COUNT(*))
            AS BIGINT) AS mean_ratio_ppm,
          MIN(ratio_ppm) AS min_ratio_ppm,
          MAX(ratio_ppm) AS max_ratio_ppm,
          CAST(SUM(CASE WHEN ratio_ppm < 150000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_template_suspect,
          CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
          CAST(SUM(n_compressed) AS BIGINT) AS total_compressed
        FROM r GROUP BY source ORDER BY source""")),

    Q("x88_pagerank",
      // PageRank over a link graph — the crawl-frontier/seed-quality
      // prior a web-scale pipeline ranks pages with BEFORE deciding
      // what to fetch or up-weight. One iteration = one src-keyed
      // equi-join + one dst-keyed aggregation; rank state is
      // nodes-sized, never edges-sized; 3 unrolled iterations keep the
      // computation a static DAG. Integer-nanos ranks with floor
      // division at every step make all 3 iterations engine-exact —
      // the oracle unrolls the identical integer recurrence in SQL.
      // The corpus ships no link column, so edges derive
      // deterministically from doc ids (three affine rules mod n —
      // ids are 0..n-1 contiguous, every node has out-edges).
      (s, d) => {
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"))
        val nDocs = ids.count()
        val edges = ids
          .select(col("doc_id").as("src"),
            explode(array(
              (col("doc_id") * 2 + 1) % nDocs,
              (col("doc_id") * 3 + 7) % nDocs,
              (col("doc_id") * 7 + 13) % nDocs)).as("dst"))
        LinkGraph.pageRank(edges, iterations = 3)
          .orderBy("node")
      },
      Some("""WITH nn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        e0 AS (
          SELECT doc_id AS src, (doc_id*2 + 1) % nn.n AS dst
            FROM documents, nn
          UNION
          SELECT doc_id, (doc_id*3 + 7) % nn.n FROM documents, nn
          UNION
          SELECT doc_id, (doc_id*7 + 13) % nn.n FROM documents, nn),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM e0 GROUP BY src),
        r0 AS (SELECT doc_id AS node,
            (SELECT 1000000000 // n FROM nn) AS rank
          FROM documents),
        i1 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r0 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        r1 AS (SELECT r0.node,
            (SELECT 150000000 // n FROM nn)
              + (85 * COALESCE(i1.inflow, 0)) // 100 AS rank
          FROM r0 LEFT JOIN i1 ON r0.node = i1.node),
        i2 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r1 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        r2 AS (SELECT r1.node,
            (SELECT 150000000 // n FROM nn)
              + (85 * COALESCE(i2.inflow, 0)) // 100 AS rank
          FROM r1 LEFT JOIN i2 ON r1.node = i2.node),
        i3 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r2 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        r3 AS (SELECT r2.node,
            (SELECT 150000000 // n FROM nn)
              + (85 * COALESCE(i3.inflow, 0)) // 100 AS rank
          FROM r2 LEFT JOIN i3 ON r2.node = i3.node)
        SELECT node, CAST(rank AS BIGINT) AS rank_nanos
        FROM r3 ORDER BY node""")),

    Q("x94_pagerank_dangling",
      // full-crawl PageRank: real crawl graphs are ~30% dangling pages
      // (fetched but not yet parsed, PDFs, leaf documents), and the
      // default leak-their-mass simplification visibly shrinks total
      // rank there. This query exercises the r13 redistribution option:
      // each iteration's dangling mass (a 1-row broadcast aggregate —
      // the P15 pattern) is shared equally inside the damped term, so
      // Σ rank_nanos stays ≈ 1e9 minus floor losses. The derived graph
      // makes dangling structural, not incidental: only EVEN doc ids
      // emit edges — one even→even rule keeps flow among sources, one
      // even→odd rule makes every odd node a genuine dangling sink.
      // Same integer-nanos floor-division recurrence as x88; the
      // oracle unrolls it with the per-round dangling sum in SQL.
      (s, d) => {
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"))
        val nDocs = ids.count()
        val edges = ids.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id").as("src"),
            explode(array(
              (col("doc_id") * 2 + 1) % nDocs,
              (col("doc_id") + 2) % nDocs)).as("dst"))
        LinkGraph.pageRank(edges, iterations = 3,
            redistributeDangling = true)
          .orderBy("node")
      },
      Some("""WITH nd AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        e0 AS (
          SELECT doc_id AS src, (doc_id*2 + 1) % nd.n AS dst
            FROM documents, nd WHERE doc_id % 2 = 0
          UNION
          SELECT doc_id, (doc_id + 2) % nd.n FROM documents, nd
            WHERE doc_id % 2 = 0),
        nodes AS (SELECT src AS node FROM e0
          UNION SELECT dst FROM e0),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM e0 GROUP BY src),
        r0 AS (SELECT node,
            (SELECT 1000000000 // n FROM nn) AS rank FROM nodes),
        i1 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r0 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        d1 AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r0
          WHERE node NOT IN (SELECT src FROM deg)),
        r1 AS (SELECT r0.node,
            (SELECT 150000000 // n FROM nn)
              + (85 * (COALESCE(i1.inflow, 0)
                + (SELECT dm FROM d1) // (SELECT n FROM nn))) // 100
              AS rank
          FROM r0 LEFT JOIN i1 ON r0.node = i1.node),
        i2 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r1 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        d2 AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r1
          WHERE node NOT IN (SELECT src FROM deg)),
        r2 AS (SELECT r1.node,
            (SELECT 150000000 // n FROM nn)
              + (85 * (COALESCE(i2.inflow, 0)
                + (SELECT dm FROM d2) // (SELECT n FROM nn))) // 100
              AS rank
          FROM r1 LEFT JOIN i2 ON r1.node = i2.node),
        i3 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r2 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        d3 AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r2
          WHERE node NOT IN (SELECT src FROM deg)),
        r3 AS (SELECT r2.node,
            (SELECT 150000000 // n FROM nn)
              + (85 * (COALESCE(i3.inflow, 0)
                + (SELECT dm FROM d3) // (SELECT n FROM nn))) // 100
              AS rank
          FROM r2 LEFT JOIN i3 ON r2.node = i3.node)
        SELECT node, CAST(rank AS BIGINT) AS rank_nanos
        FROM r3 ORDER BY node""")),

    Q("x89_personalized_pagerank",
      // seed-set expansion — the graph-side "find more like my
      // trusted sources" curation move: teleport mass returns ONLY to
      // the seed set, so rank concentrates in the seeds' link
      // neighborhood instead of spreading globally (the prior for
      // up-weighting pages near known-good domains). Same x88 link
      // graph and integer-nanos recurrence; seeds are every 101st doc
      // (curated-list-sized, broadcast). The oracle unrolls the
      // identical seeded recurrence.
      (s, d) => {
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"))
        val nDocs = ids.count()
        val seeds = ids.filter(col("doc_id") % 101 === 0)
          .collect().map(_.getLong(0)).toSeq
        val edges = ids
          .select(col("doc_id").as("src"),
            explode(array(
              (col("doc_id") * 2 + 1) % nDocs,
              (col("doc_id") * 3 + 7) % nDocs,
              (col("doc_id") * 7 + 13) % nDocs)).as("dst"))
        LinkGraph.personalizedPageRank(edges, seeds, iterations = 3)
          .orderBy("node")
      },
      Some("""WITH nn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        seeds AS (SELECT doc_id AS node FROM documents
          WHERE doc_id % 101 = 0),
        ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM seeds),
        e0 AS (
          SELECT doc_id AS src, (doc_id*2 + 1) % nn.n AS dst
            FROM documents, nn
          UNION
          SELECT doc_id, (doc_id*3 + 7) % nn.n FROM documents, nn
          UNION
          SELECT doc_id, (doc_id*7 + 13) % nn.n FROM documents, nn),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM e0 GROUP BY src),
        r0 AS (SELECT d.doc_id AS node,
            CASE WHEN s.node IS NOT NULL
              THEN (SELECT 1000000000 // s FROM ns) ELSE 0 END AS rank
          FROM documents d LEFT JOIN seeds s ON d.doc_id = s.node),
        i1 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r0 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        r1 AS (SELECT r0.node,
            CASE WHEN s.node IS NOT NULL
              THEN (SELECT 150000000 // s FROM ns) ELSE 0 END
              + (85 * COALESCE(i1.inflow, 0)) // 100 AS rank
          FROM r0 LEFT JOIN seeds s ON r0.node = s.node
          LEFT JOIN i1 ON r0.node = i1.node),
        i2 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r1 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        r2 AS (SELECT r1.node,
            CASE WHEN s.node IS NOT NULL
              THEN (SELECT 150000000 // s FROM ns) ELSE 0 END
              + (85 * COALESCE(i2.inflow, 0)) // 100 AS rank
          FROM r1 LEFT JOIN seeds s ON r1.node = s.node
          LEFT JOIN i2 ON r1.node = i2.node),
        i3 AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow
          FROM e0 e JOIN r2 r ON e.src = r.node
          JOIN deg d ON e.src = d.src GROUP BY e.dst),
        r3 AS (SELECT r2.node,
            CASE WHEN s.node IS NOT NULL
              THEN (SELECT 150000000 // s FROM ns) ELSE 0 END
              + (85 * COALESCE(i3.inflow, 0)) // 100 AS rank
          FROM r2 LEFT JOIN seeds s ON r2.node = s.node
          LEFT JOIN i3 ON r2.node = i3.node)
        SELECT node, CAST(rank AS BIGINT) AS rank_nanos
        FROM r3 ORDER BY node""")),

    Q("d14_threshold_curve",
      // dedup-threshold sensitivity curve (the tuning sweep run BEFORE
      // committing a 100 TB corpus to one threshold): exact n-gram
      // Jaccard over the LSH candidate set, rolled up per threshold —
      // pairs surviving and docs that would drop under the min-id
      // canonical at each cut. One scoring pass; the sweep is a
      // 5-row broadcast cross join, not 5 rescans. Candidates persist
      // (the d03 replay shape) and the oracle re-derives every exact
      // jaccard and the whole curve.
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "d14")
        val sigs = Dedup.minhashSignatures(docs,
          numHashes = 128, numBands = 32)
        Dedup.lshCandidatePairs(sigs)
          .coalesce(2).write.mode("overwrite")
          .parquet(state + "/candidates")
        val scored = Dedup.ngramJaccard(docs,
            s.read.parquet(state + "/candidates"))
          .filter(col("jaccard") >= 0.5)
        val ths = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
        import s.implicits._
        scored.crossJoin(broadcast(ths.toDF("threshold")))
          .filter(col("jaccard") >= col("threshold"))
          .groupBy("threshold")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("id_b")).as("n_docs_dropped"))
          .orderBy("threshold")
      },
      Some("""WITH cand AS (SELECT id_a, id_b FROM read_parquet(
            '/tmp/graft_qstate/d14/candidates/*.parquet')),
        words AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
            AS w
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM words WHERE len(w) >= 3),
        j AS (
          SELECT c.id_a, c.id_b,
            CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              AS jaccard
          FROM cand c
          JOIN sh a ON a.doc_id = c.id_a
          JOIN sh b ON b.doc_id = c.id_b),
        ths AS (SELECT CAST(t AS DOUBLE) AS threshold
          FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) v(t))
        SELECT ths.threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(COUNT(DISTINCT j.id_b) AS BIGINT) AS n_docs_dropped
        FROM j CROSS JOIN ths
        WHERE j.jaccard >= CAST(0.5 AS DOUBLE)
          AND j.jaccard >= ths.threshold
        GROUP BY 1 ORDER BY 1""")),

    Q("d15_line_dedup",
      // line-grain exact dedup (the C4/RefinedWeb recipe: discard any
      // line occurring in ≥2 docs corpus-wide, keeping its globally
      // first occurrence) — the line-boundary complement of d08's
      // token spans. The corpus has no natural multi-line docs, so the
      // fixture composes them deterministically FROM the documents
      // table: m = 3n/10 docs of 5 lines each, line j of doc c being
      // base text (c*7 + j*13) mod n — ~half the base texts land in
      // ≥2 slots, so real cross-doc duplicate lines exist and the
      // oracle recomposes the identical corpus in pure SQL. Manifest
      // covers EVERY composed doc (zero counts where untouched).
      (s, d) => {
        // any newline inside a base text would shift line indices vs
        // the oracle's j-grain recomposition — flatten defensively
        val base = t(s, d, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id").cast("long").as("bid"),
            regexp_replace(col("text"), "\n", " ").as("text"))
        val n = base.count() // fixture modulus: metadata-sized action
        val m = math.max(n * 3 / 10, 10L)
        val grid = s.range(m).select(col("id").as("cid"))
          .select(col("cid"),
            explode(sequence(lit(0), lit(4))).as("j"))
          .withColumn("bid", (col("cid") * 7 + col("j") * 13) % n)
        val composed = grid.join(base, Seq("bid"))
          .groupBy("cid")
          .agg(array_join(transform(array_sort(collect_list(
            struct(col("j"), col("text")))),
            x => x.getField("text")), "\n").as("text"))
        Dedup.lineDedup(composed, "cid", "text").orderBy("cid")
      },
      Some("""WITH base AS (
          SELECT doc_id AS bid, replace(text, chr(10), ' ') AS text
          FROM documents WHERE doc_id < 500),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        mm AS (SELECT GREATEST((n*3)//10, 10) AS m FROM nn),
        grid AS (
          SELECT g.cid, j.j, (g.cid*7 + j.j*13) % nn.n AS bid
          FROM (SELECT unnest(range((SELECT m FROM mm))) AS cid) g,
               (SELECT unnest(range(5)) AS j) j, nn),
        lines AS (
          -- rank j within cid so a hypothetically-missing bid can
          -- never desync indices from the engine's split renumbering
          SELECT grid.cid,
            ROW_NUMBER() OVER (PARTITION BY grid.cid ORDER BY grid.j)
              - 1 AS line_idx,
            base.text AS line
          FROM grid JOIN base ON grid.bid = base.bid),
        keyed AS (
          SELECT cid, line_idx, line,
            CASE WHEN length(trim(line)) >= 15
              THEN md5(trim(line)) END AS k
          FROM lines),
        perdoc AS (
          SELECT k, cid, MIN(cid*1000000 + line_idx) AS docmin
          FROM keyed WHERE k IS NOT NULL GROUP BY k, cid),
        dict AS (
          SELECT k, MIN(docmin) AS canon
          FROM perdoc GROUP BY k HAVING COUNT(*) >= 2),
        dropped AS (
          SELECT keyed.cid, keyed.line_idx, length(keyed.line) AS lc
          FROM keyed JOIN dict ON keyed.k = dict.k
          WHERE keyed.cid*1000000 + keyed.line_idx <> dict.canon),
        kept AS (
          SELECT l.cid, l.line_idx, l.line FROM keyed l
          ANTI JOIN dropped d
            ON l.cid = d.cid AND l.line_idx = d.line_idx),
        reb AS (
          SELECT cid,
            COALESCE(string_agg(line, chr(10) ORDER BY line_idx), '')
              AS cleaned
          FROM kept GROUP BY cid),
        rem AS (
          SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_removed,
            CAST(SUM(lc) AS BIGINT) AS removed_chars
          FROM dropped GROUP BY cid),
        docs AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_lines
          FROM lines GROUP BY cid)
        SELECT docs.cid, docs.n_lines,
          CAST(COALESCE(rem.n_removed, 0) AS BIGINT) AS n_lines_removed,
          CAST(COALESCE(rem.removed_chars, 0) AS BIGINT)
            AS removed_chars,
          CAST(length(COALESCE(reb.cleaned, '')) AS BIGINT)
            AS cleaned_len,
          md5(COALESCE(reb.cleaned, '')) AS cleaned_md5
        FROM docs
        LEFT JOIN rem ON docs.cid = rem.cid
        LEFT JOIN reb ON docs.cid = reb.cid
        ORDER BY docs.cid""")),

    Q("d06_ngram_jaccard",
      // exact word-3-gram Jaccard over the whole corpus via the inverted
      // index (posting-list self-join) — never all-pairs; the oracle
      // mirrors the same index shape in SQL. Explicitly uncapped: the
      // oracle pins the EXACT form (the public default caps stop-phrase
      // posting lists at 1000)
      (s, d) => Dedup.jaccardSimilarPairs(t(s, d, "documents"),
          maxShingleDocFreq = Int.MaxValue)
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS ts
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT id_a, id_b, inter,
            ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, jaccard
        FROM j WHERE jaccard >= CAST(0.5 AS DOUBLE)
        ORDER BY id_a, id_b""")),

    Q("x25_containment",
      // asymmetric near-dup (a short doc quoted inside a long one):
      // containment = inter / min(|A|,|B|) over the SAME single-scan
      // inverted index as d06 (uncapped: exact form for the oracle) —
      // symmetric Jaccard misses these pairs
      (s, d) => Dedup.containmentPairs(t(s, d, "documents"),
          threshold = 0.2, maxShingleDocFreq = Int.MaxValue)
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS ts
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT id_a, id_b, inter,
            ROUND(CAST(inter AS DOUBLE) / LEAST(sa.sz, sb.sz), 6)
              AS containment,
            ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
              AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, containment,
          jaccard
        FROM j WHERE containment >= CAST(0.2 AS DOUBLE)
        ORDER BY id_a, id_b""")),

    Q("x27_corpus_diff",
      // corpus version diff (reprocessing trigger): two synthetic
      // snapshots of the fixture — 1/7 of ids dropped, 1/5 added back
      // differently, 1/11 edited — rolled up per status. The wide join
      // carries (id, md5) only, never bodies.
      (s, d) => {
        val docs = t(s, d, "documents")
        val oldC = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("text"))
        val newC = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0,
              concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text"))
        Curation.corpusDiff(oldC, newC)
          .groupBy("status")
          .agg(count(lit(1)).as("docs"),
            sum(col("doc_id")).cast("long").as("id_sum"))
          .orderBy("status")
      },
      Some("""WITH old AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        new AS (
          SELECT doc_id,
            CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END
              AS text
          FROM documents WHERE doc_id % 5 <> 0),
        d AS (
          SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
            CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
              ELSE 'changed' END AS status
          FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
        SELECT status, CAST(COUNT(*) AS BIGINT) AS docs,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM d GROUP BY status ORDER BY status""")),

    Q("x28_weighted_sample",
      // deterministic weighted sampling without replacement (A-ES keys
      // from the stable md5 draw): 50 docs weighted by length; DuckDB
      // replays the exact draw, so the SET is pinned, not just its size
      (s, d) => Sampling.weightedSample(t(s, d, "documents"),
          idCol = "doc_id", weightCol = "n_chars", k = 50)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""WITH keyed AS (
          SELECT doc_id, n_chars,
            ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) + 1) / 4294967296.0)
              / CAST(n_chars AS DOUBLE) AS wkey
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, n_chars FROM (
          SELECT doc_id, n_chars FROM keyed
          ORDER BY wkey DESC, doc_id LIMIT 50)
        ORDER BY doc_id""")),

    Q("x26_zorder_value",
      // Z-order layout kernel: equal-width bucket + Morton bit
      // interleave as a pure codegen'd expression (the portable form of
      // the rank-bucketed production path). z_sum pins every row's
      // 16-bit z-value; the layout win (per-file min/max pruning) is
      // asserted in LayoutSpec.
      (s, d) => t(s, d, "orders")
        .select(graft.sources.Layout.zvalueEqualWidth(
          col("o_custkey"), 0.0, 1500.0,
          col("o_totalprice"), 0.0, 500000.0, bits = 8).as("z"))
        .agg(count(lit(1)).as("n"),
          sum(col("z")).cast("long").as("z_sum"),
          min(col("z")).cast("long").as("z_min"),
          max(col("z")).cast("long").as("z_max"),
          countDistinct(col("z")).as("z_distinct")),
      Some("""WITH b AS (
          SELECT
            LEAST(255, GREATEST(0, CAST(FLOOR(
              (CAST(o_custkey AS DOUBLE) - 0.0) / 1500.0 * 256)
              AS BIGINT))) AS ba,
            LEAST(255, GREATEST(0, CAST(FLOOR(
              (CAST(o_totalprice AS DOUBLE) - 0.0) / 500000.0 * 256)
              AS BIGINT))) AS bb
          FROM orders),
        z AS (SELECT CAST(list_sum(list_transform(range(0, 8),
            i -> (((ba >> i) & 1) << (2*i+1)) + (((bb >> i) & 1) << (2*i))))
            AS BIGINT) AS z
          FROM b)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(z) AS BIGINT) AS z_sum,
          CAST(MIN(z) AS BIGINT) AS z_min,
          CAST(MAX(z) AS BIGINT) AS z_max,
          CAST(COUNT(DISTINCT z) AS BIGINT) AS z_distinct
        FROM z""")),

    Q("e01_embedding_profile",
      (s, d) => Similarity.profileEmbeddings(t(s, d, "embeddings")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
          CAST(COUNT(*) - COUNT(embedding) AS BIGINT) AS null_vectors,
          CAST(MIN(len(embedding)) AS INT) AS min_dims,
          CAST(MAX(len(embedding)) AS INT) AS max_dims,
          ROUND(MIN(nrm), 6) AS min_norm,
          ROUND(MAX(nrm), 6) AS max_norm,
          ROUND(AVG(nrm), 6) AS avg_norm,
          CAST(COUNT(CASE WHEN nrm = 0 THEN 1 END) AS BIGINT) AS zero_vectors
        FROM (SELECT embedding,
          SQRT(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM embeddings)""")),

    Q("e02_knn_brute_force",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
        Similarity.bruteForceTopK(emb, queries, k = 10)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("x50_contrastive_mine",
      // contrastive training-pair mining: per anchor, the most-similar
      // SAME-label neighbor (positive) + the 5 most-similar DIFFERENT-
      // label neighbors (hard negatives — the confusable examples that
      // actually move a contrastive loss). e02's exact shape with a
      // label lane, so the whole miner replays in SQL; strict label
      // equality means NULL-labeled rows only ever serve as negatives
      // in both engines.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.contrastiveMine(emb, emb.filter(col("vec_id") < 5),
            kNeg = 5)
          .select(col("query_id"), col("kind"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "kind", "rank")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
            label AS ql
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce, label AS cl
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            CASE WHEN c.cl = q.ql THEN 'positive'
              ELSE 'hard_negative' END AS kind,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        ranked AS (
          SELECT query_id, kind, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id, kind
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, kind, neighbor_id, ROUND(cos, 6) AS cosine,
          CAST(rank AS INT) AS rank
        FROM ranked
        WHERE (kind = 'hard_negative' AND rank <= 5)
           OR (kind = 'positive' AND rank = 1)
        ORDER BY query_id, kind, rank""")),

    Q("x51_training_shards",
      // reproducible epoch shuffle: every doc gets a (shard, pos)
      // address from the seeded md5 order — same epoch ⇒ identical
      // layout on every run and engine, next epoch reshuffles. Shard =
      // first hex byte (instr-decoded, engine-portable) mod 8; pos
      // ranks within the shard only, so no global sort exists at any
      // scale. Full replay oracle.
      (s, d) => graft.pipeline.Sampling.trainingShards(
          t(s, d, "documents").select("doc_id"),
          numShards = 8, epoch = "ep0")
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy("shard", "pos"),
      Some("""WITH k AS (
          SELECT doc_id, md5('ep0:' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        sh AS (
          SELECT doc_id, h,
            ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % 8
              AS shard
          FROM k)
        SELECT CAST(shard AS INT) AS shard,
          CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h)
            AS BIGINT) AS pos,
          doc_id
        FROM sh ORDER BY shard, pos""")),

    Q("x52_nb_classifier",
      // trainable quality/domain classifier (the CCNet/fastText shape):
      // Multinomial NB trained on the %5≠0 docs (label = source),
      // scoring the held-out %5=0 docs. Training is ONE (label, token)
      // groupBy; scoring is ONE token-keyed join — no iteration, no
      // driver math. Integer micro-nat quantization before every sum
      // makes the argmax engine-exact, so the oracle replays the whole
      // model: counts, Laplace smoothing, priors, unseen mass, argmax.
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = graft.pipeline.Classify.trainNaiveBayes(
          docs.filter(col("doc_id") % 5 =!= 0), "text", "source")
        graft.pipeline.Classify.scoreNaiveBayes(model,
            docs.filter(col("doc_id") % 5 === 0))
          .orderBy("doc_id")
      },
      Some(nbOracleSql)),

    Q("x53_nb_incremental",
      // the same model trained the way a 100 TB pipeline actually
      // trains it: per-slice sufficient-statistic states (counts),
      // PERSISTED, merged by exact re-aggregation, finished into a
      // model without re-reading either slice's text. Counts add, so
      // the merged model is bit-identical to batch training — the
      // oracle is x52's full-corpus replay, which only passes if the
      // incremental path loses nothing.
      (s, d) => {
        val docs = t(s, d, "documents")
        val train = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("text"), col("source"))
        val state = freshState(s, "x53")
        graft.pipeline.Classify.nbStateSave(
          graft.pipeline.Classify.nbState(
            train.filter(col("doc_id") % 2 === 0), "text", "source"),
          state + "/day1")
        graft.pipeline.Classify.nbStateSave(
          graft.pipeline.Classify.nbState(
            train.filter(col("doc_id") % 2 =!= 0), "text", "source"),
          state + "/day2")
        val merged = graft.pipeline.Classify.nbMerge(Seq(
          graft.pipeline.Classify.nbStateLoad(s, state + "/day1", "source"),
          graft.pipeline.Classify.nbStateLoad(s, state + "/day2", "source")))
        graft.pipeline.Classify.scoreNaiveBayes(
            graft.pipeline.Classify.modelFromState(merged),
            docs.filter(col("doc_id") % 5 === 0))
          .orderBy("doc_id")
      },
      Some(nbOracleSql)),

    Q("x54_budget_mixture",
      // budget-constrained mixture with epoch caps: water-filling in
      // closed form (sorted saturation points + exact integer window
      // sums). Budget = 10% of corpus tokens, every source capped at
      // 0.5 epochs (src3 overridden to 0.25), exactly-representable
      // weights summing to 1 — high-weight sources saturate and the
      // overflow cascades to the tail; unweighted sources pass through
      // at 0. The oracle re-solves the whole thing with window
      // functions and HUGEINT arithmetic.
      (s, d) => {
        val docs = t(s, d, "documents")
        val total = docs.filter(col("source").isNotNull)
          .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")))
          .head().getLong(0)
        Sampling.budgetMixture(docs,
          weights = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.125,
            "src4" -> 0.0625, "src5" -> 0.03125, "src6" -> 0.015625,
            "src7" -> 0.0078125, "src8" -> 0.0078125),
          tokenBudget = math.floor(0.10 * total).toLong,
          maxEpochs = 0.5,
          epochCaps = Map("src3" -> 0.25))
          .orderBy("source")
      },
      Some("""WITH tok AS (
          SELECT source, CASE WHEN LENGTH(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
          FROM documents WHERE source IS NOT NULL),
        agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n) AS BIGINT) AS tokens
          FROM tok GROUP BY 1),
        tot AS (SELECT CAST(FLOOR(0.10 * SUM(n)) AS BIGINT) AS b FROM tok),
        w AS (SELECT * FROM (VALUES
            ('src1', CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)),
            ('src2', CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE)),
            ('src3', CAST(0.125 AS DOUBLE), CAST(0.25 AS DOUBLE)),
            ('src4', CAST(0.0625 AS DOUBLE), CAST(0.5 AS DOUBLE)),
            ('src5', CAST(0.03125 AS DOUBLE), CAST(0.5 AS DOUBLE)),
            ('src6', CAST(0.015625 AS DOUBLE), CAST(0.5 AS DOUBLE)),
            ('src7', CAST(0.0078125 AS DOUBLE), CAST(0.5 AS DOUBLE)),
            ('src8', CAST(0.0078125 AS DOUBLE), CAST(0.5 AS DOUBLE)))
          t(source, weight, ecap)),
        stats AS (
          SELECT agg.source, n_docs, tokens,
            COALESCE(w.weight, 0) AS weight,
            CAST(ROUND(COALESCE(w.weight, 0) * 1e9, 0) AS BIGINT) AS wn,
            CAST(FLOOR(tokens * COALESCE(w.ecap, 0.5)) AS BIGINT)
              AS cap_tokens
          FROM agg LEFT JOIN w ON agg.source = w.source),
        active AS (SELECT * FROM stats WHERE wn > 0 AND cap_tokens > 0),
        ranked AS (
          SELECT *,
            ROW_NUMBER() OVER (ORDER BY CAST(cap_tokens AS DOUBLE)/wn,
              source) AS rn,
            COALESCE(SUM(cap_tokens) OVER (
              ORDER BY CAST(cap_tokens AS DOUBLE)/wn, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS scap_prev,
            SUM(wn) OVER (ORDER BY CAST(cap_tokens AS DOUBLE)/wn, source
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS wsuf
          FROM active),
        unsat AS (
          SELECT MIN(rn) AS k, MIN_BY(scap_prev, rn) AS scap_k,
            MIN_BY(wsuf, rn) AS wsuf_k
          FROM ranked CROSS JOIN tot
          WHERE CAST(cap_tokens AS HUGEINT) * wsuf >=
            CAST(tot.b - scap_prev AS HUGEINT) * wn),
        solved AS (
          SELECT r.source, r.n_docs, r.tokens, r.weight, r.cap_tokens,
            CASE WHEN u.k IS NULL OR r.rn < u.k THEN r.cap_tokens
              ELSE GREATEST(CAST(0 AS BIGINT),
                CAST((CAST(t.b - u.scap_k AS HUGEINT) * r.wn) // u.wsuf_k
                  AS BIGINT)) END AS alloc_tokens
          FROM ranked r CROSS JOIN unsat u CROSS JOIN tot t),
        final AS (
          SELECT source, n_docs, tokens, ROUND(weight, 6) AS weight,
            cap_tokens, alloc_tokens,
            alloc_tokens = cap_tokens AS saturated
          FROM solved
          UNION ALL
          SELECT source, n_docs, tokens, ROUND(weight, 6) AS weight,
            cap_tokens, CAST(0 AS BIGINT) AS alloc_tokens,
            FALSE AS saturated
          FROM stats WHERE NOT (wn > 0 AND cap_tokens > 0))
        SELECT source, n_docs, tokens, weight, cap_tokens, alloc_tokens,
          saturated,
          ROUND(CAST(alloc_tokens AS DOUBLE) / tokens, 6) AS epochs
        FROM final ORDER BY source""")),

    Q("d11_takedown",
      // removal propagation (the copyright / right-to-be-forgotten op):
      // takedown list = doc_id % 97 = 0; removing a listed doc must
      // also remove every member of its duplicate cluster (d05's chain
      // graph), while listed docs outside any cluster go alone. The
      // oracle replays the transitive closure with a recursive CTE and
      // re-derives the manifest — including the listed-vs-propagated
      // reason tag — independently.
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 10 < 4)
          .join(ids.select(col("doc_id").as("next_id")),
            col("doc_id") + 1 === col("next_id"))
          .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
        Dedup.takedownPropagate(pairs,
            ids.filter(col("doc_id") % 97 === 0))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
        pairs AS (
          SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
          WHERE doc_id % 10 < 4
            AND (doc_id + 1) IN (SELECT doc_id FROM documents)),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src),
        listed AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
        flagged AS (
          SELECT DISTINCT c.cluster_id
          FROM clust c JOIN listed l ON c.doc_id = l.doc_id),
        via AS (
          SELECT c.doc_id, c.cluster_id
          FROM clust c JOIN flagged f ON c.cluster_id = f.cluster_id),
        singles AS (
          SELECT l.doc_id, l.doc_id AS cluster_id FROM listed l
          WHERE l.doc_id NOT IN (SELECT doc_id FROM clust)),
        manifest AS (
          SELECT * FROM via UNION ALL SELECT * FROM singles)
        SELECT m.doc_id, CAST(m.cluster_id AS BIGINT) AS cluster_id,
          CASE WHEN m.doc_id IN (SELECT doc_id FROM listed)
            THEN 'listed' ELSE 'propagated' END AS reason
        FROM manifest m ORDER BY m.doc_id""")),

    Q("d13_incremental_clusters",
      // incremental cluster maintenance: day 1 clusters the chain-graph
      // pairs among doc_id < 250 and PERSISTS the assignments; day 2
      // folds in the remaining pairs — including the boundary edges
      // that BRIDGE day-1 clusters into day-2 ones — via the star-edge
      // graph (|clustered| + |new pairs| edges, never the full pair
      // history). The oracle closes over the FULL union pair set with
      // the d11 recursive CTE, so the incremental labels must equal a
      // from-scratch re-cluster.
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 10 < 4)
          .join(ids.select(col("doc_id").as("next_id")),
            col("doc_id") + 1 === col("next_id"))
          .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
        val state = freshState(s, "d13")
        Dedup.duplicateClusters(pairs.filter(col("id_a") < 250))
          .write.mode("overwrite").parquet(state + "/day1")
        Dedup.incrementalClusters(
            s.read.parquet(state + "/day1"),
            pairs.filter(col("id_a") >= 250))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
        pairs AS (
          SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
          WHERE doc_id % 10 < 4
            AND (doc_id + 1) IN (SELECT doc_id FROM documents)),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src)
        SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
        FROM clust ORDER BY doc_id""")),

    Q("d12_dedup_eval",
      // dedup-pipeline quality measurement: precision/recall/F1 of the
      // raw LSH candidate set (128 hashes × 32 bands of 4 rows, the
      // d03 config) against exact
      // Jaccard ≥ 0.5 ground truth. The fixture corpus is bimodal
      // (≥ 0.9 or < 0.2), where every config saturates at 1.0, so the
      // eval corpus adds a 60%-prefix variant of every doc (id + 1e5)
      // whose Jaccard to its source straddles the threshold — the
      // metrics then show the real S-curve trade-off. Candidates
      // persist; the oracle rebuilds the derived corpus and the
      // ground truth from scratch (d06's SQL shape) and recomputes
      // every metric over the persisted predictions — the dedup twin
      // of e17's ANN recall.
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
        val derived = base
          .withColumn("__ts",
            filter(split(lower(trim(col("text"))), "\\s+"),
              t => t =!= ""))
          .select((col("doc_id") + 100000L).as("doc_id"),
            array_join(expr(
              "slice(__ts, 1, (3 * size(__ts) + 4) div 5)"), " ")
              .as("text"))
        // cached: the corpus feeds TWO full shingle passes (signing
        // and the exact-truth side) and the truth pair frame feeds two
        // actions inside the eval (its count and the hit join) — each
        // would otherwise re-run the whole posting-list pipeline
        val corpus = base.unionByName(derived).cache()
        val state = freshState(s, "d12")
        Dedup.lshCandidatePairs(
            Dedup.minhashSignatures(corpus, numHashes = 128, numBands = 32))
          .write.mode("overwrite").parquet(state + "/predicted")
        // the PRODUCTION posting-list cap (df ≤ 1000): identical to
        // uncapped at gate scale (no shingle is that common in 1000
        // docs), and the reason the truth side stays near-linear at a
        // replicated-soak 10× corpus where stop-shingle lists explode
        val truth = Dedup.jaccardSimilarPairs(corpus, threshold = 0.5)
          .cache()
        Dedup.nearDupEval(truth, s.read.parquet(state + "/predicted"))
      },
      Some("""WITH toks0 AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS ts
          FROM documents),
        toks AS (
          SELECT doc_id, ts FROM toks0
          UNION ALL
          SELECT doc_id + 100000, ts[1:(3 * len(ts) + 4) // 5]
          FROM toks0),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        -- mirror the production posting-list cap: shingles with
        -- 2..1000 docs feed the intersection; sizes stay UNCAPPED
        live AS (SELECT shingle FROM sh GROUP BY shingle
          HAVING COUNT(*) BETWEEN 2 AND 1000),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle
            AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM live)
          GROUP BY 1, 2),
        truth AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.5),
        pred AS (SELECT DISTINCT id_a, id_b FROM
          read_parquet('/tmp/graft_qstate/d12/predicted/*.parquet')),
        hit AS (SELECT * FROM pred JOIN truth USING (id_a, id_b)),
        c AS (SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pred) AS n_pred,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit)
        SELECT n_truth, n_pred, n_hit,
          CASE WHEN n_pred = 0 THEN NULL
            ELSE ROUND(CAST(n_hit AS DOUBLE) / n_pred, 6) END AS precision,
          CASE WHEN n_truth = 0 THEN NULL
            ELSE ROUND(CAST(n_hit AS DOUBLE) / n_truth, 6) END AS recall,
          CASE WHEN n_pred + n_truth = 0 THEN NULL
            ELSE ROUND(CAST(2 AS DOUBLE) * n_hit / (n_pred + n_truth), 6)
            END AS f1
        FROM c""")),

    Q("e15_margin_mining",
      // margin-based pair mining (bitext/alignment shape): left side =
      // vec_id < 50, right = the rest; a pair is mined only when its
      // cosine clearly beats both sides' k-NN average (ratio margin,
      // Artetxe & Schwenk) — integer micro-cosines and one floor
      // division make the mined set engine-exact, and the oracle
      // re-solves the whole pipeline: cosines, both top-k
      // neighbourhood sums, margins, per-left argmax, threshold.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.marginMining(
            emb.filter(col("vec_id") < 50),
            emb.filter(col("vec_id") >= 50),
            k = 4, minMarginPpm = 1200000L)
          .orderBy("left_id")
      },
      Some("""WITH l AS (
          SELECT vec_id AS left_id, embedding AS le
          FROM embeddings WHERE vec_id < 50),
        r AS (
          SELECT vec_id AS right_id, embedding AS re
          FROM embeddings WHERE vec_id >= 50),
        scored AS (
          SELECT left_id, right_id,
            CAST(ROUND(
              list_sum(list_transform(range(1, len(le) + 1),
                i -> CAST(le[i] AS DOUBLE) * CAST(re[i] AS DOUBLE))) /
              (SQRT(list_sum(list_transform(le,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
               SQRT(list_sum(list_transform(re,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              * 1e6, 0) AS BIGINT) AS cm
          FROM l CROSS JOIN r),
        suml AS (
          SELECT left_id, SUM(cm) AS sl FROM (
            SELECT left_id, cm, ROW_NUMBER() OVER (PARTITION BY left_id
              ORDER BY cm DESC, right_id) AS rn
            FROM scored)
          WHERE rn <= 4 GROUP BY left_id),
        sumr AS (
          SELECT right_id, SUM(cm) AS sr FROM (
            SELECT right_id, cm, ROW_NUMBER() OVER (PARTITION BY right_id
              ORDER BY cm DESC, left_id) AS rn
            FROM scored)
          WHERE rn <= 4 GROUP BY right_id),
        m AS (
          SELECT s.left_id, s.right_id, s.cm,
            CAST((8 * CAST(s.cm AS HUGEINT) * 1000000) // (sl + sr)
              AS BIGINT) AS margin_ppm
          FROM scored s JOIN suml USING (left_id)
          JOIN sumr USING (right_id)
          WHERE sl + sr > 0),
        best AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY left_id
            ORDER BY margin_ppm DESC, right_id) AS rk
          FROM m)
        SELECT left_id, right_id,
          ROUND(CAST(cm AS DOUBLE) / 1e6, 6) AS cosine, margin_ppm
        FROM best WHERE rk = 1 AND margin_ppm >= 1200000
        ORDER BY left_id""")),

    Q("e16_embedding_drift",
      // embedding-distribution drift between slices (retrain trigger):
      // ref = first half of ids, cur = second half. Per-dim integer
      // micro-sums (exact, order-independent) feed decimal dot/norm
      // products, so the centroid cosine and mean-L2 shift are
      // engine-exact; the oracle re-derives both from scratch with
      // unnest-with-ordinality and HUGEINT arithmetic.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.embeddingDrift(
          emb.filter(col("vec_id") < 250),
          emb.filter(col("vec_id") >= 250))
      },
      Some("""WITH px AS (
          SELECT CASE WHEN vec_id < 250 THEN 'ref' ELSE 'cur' END AS side,
            i - 1 AS dim,
            CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT)
              AS xm
          FROM embeddings,
            unnest(range(1, len(embedding) + 1)) AS t(i)),
        sums AS (
          SELECT dim,
            SUM(xm) FILTER (side = 'ref') AS s_ref,
            COUNT(*) FILTER (side = 'ref') AS n_ref,
            SUM(xm) FILTER (side = 'cur') AS s_cur,
            COUNT(*) FILTER (side = 'cur') AS n_cur
          FROM px GROUP BY dim),
        shifted AS (
          SELECT *,
            (CAST(s_ref AS DOUBLE) / n_ref
              - CAST(s_cur AS DOUBLE) / n_cur) / 1e6 AS shift
          FROM sums)
        SELECT CAST(MAX(n_ref) AS BIGINT) AS n_ref,
          CAST(MAX(n_cur) AS BIGINT) AS n_cur,
          ROUND(CAST(SUM(CAST(s_ref AS HUGEINT) * s_cur) AS DOUBLE) /
            (SQRT(CAST(SUM(CAST(s_ref AS HUGEINT) * s_ref) AS DOUBLE)) *
             SQRT(CAST(SUM(CAST(s_cur AS HUGEINT) * s_cur) AS DOUBLE))), 6)
            AS centroid_cosine,
          ROUND(SQRT(CAST(SUM(CAST(ROUND(shift * shift * 1e12, 0)
            AS BIGINT)) AS DOUBLE) / 1e12), 6) AS mean_l2_shift
        FROM shifted""")),

    Q("e12_incremental_embedding_dedup",
      // the d10/m04 ingest shape for the cosine family: the standing
      // corpus's banded hyperplane signatures are PERSISTED; a new
      // slice (last 10% of ids) signs at O(slice), candidates come
      // from the band-keyed cross join vs the store plus within-slice
      // buckets, exact cosine verifies. Candidate-replay oracle (e03
      // pattern): the candidate set is persisted and DuckDB re-scores
      // it — threshold 0.2 because this fixture's max cosine is ~0.51
      // (e04 pins the ≥0.99 lane at zero rows).
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val state = freshState(s, "e12")
        val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
        val cut = 9L * (maxId + 1L) / 10L
        val store = emb.filter(col("vec_id") < cut)
        val slice = emb.filter(col("vec_id") >= cut)
        Similarity.embeddingBandSignatures(store).write.mode("overwrite")
          .parquet(state + "/store_sigs")
        val storeSigs = s.read.parquet(state + "/store_sigs")
        // persist the exact candidate set the verifier scores (the
        // generators are seed-deterministic, so the incremental call
        // below sees the identical pairs)
        Similarity.incrementalEmbeddingCandidates(storeSigs,
            Similarity.embeddingBandSignatures(slice))
          .unionByName(Similarity.embeddingCandidatePairs(slice))
          .write.mode("overwrite").parquet(state + "/candidates")
        Similarity.incrementalNearDuplicateEmbeddings(storeSigs, store,
            slice, threshold = 0.2)
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH cand AS (
          SELECT id_a, id_b
          FROM read_parquet('/tmp/graft_qstate/e12/candidates/*.parquet')),
        e AS (SELECT vec_id, embedding FROM embeddings),
        scored AS (
          SELECT cand.id_a, cand.id_b,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM cand
          JOIN e a ON a.vec_id = cand.id_a
          JOIN e b ON b.vec_id = cand.id_b)
        SELECT id_a, id_b, ROUND(cos, 6) AS cosine
        FROM scored WHERE cos >= CAST(0.2 AS DOUBLE)
        ORDER BY id_a, id_b""")),

    Q("e13_incremental_ivf",
      // IVF index MAINTENANCE under daily ingest: the standing corpus's
      // index is persisted (cell-partitioned assignment table); the new
      // slice (last 10% of ids) is assigned to its nearest EXISTING
      // centroids map-side and appended into the cell partitions — no
      // re-clustering, old vectors never re-read. The probe then runs
      // against the post-append index and must surface new-slice
      // neighbors. Same candidate-replay oracle as e05: the probed-cell
      // pair set is persisted, DuckDB re-scores exact cosine top-k.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val state = freshState(s, "e13")
        val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
        val cut = 9L * (maxId + 1L) / 10L
        Similarity.ivfSave(
          Similarity.ivfBuild(
            emb.filter(col("vec_id") < cut).select("vec_id", "embedding"),
            k = 16),
          state + "/index")
        Similarity.ivfAppend(state + "/index",
          emb.filter(col("vec_id") >= cut).select("vec_id", "embedding"))
        val index = Similarity.ivfLoad(s, state + "/index")
        val queries = emb.filter(col("vec_id") < 5)
        val candPath = state + "/candidates"
        Similarity.ivfCandidates(index, queries, nprobe = 4)
          .write.mode("overwrite").parquet(candPath)
        Similarity.rankCandidates(emb, queries, s.read.parquet(candPath),
            k = 10)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH cand AS (SELECT query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e13/candidates/*.parquet')),
        e AS (SELECT vec_id, embedding FROM embeddings),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
            list_sum(list_transform(range(1, len(qe.embedding) + 1),
              i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ne.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ne ON ne.vec_id = cand.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("e04_embedding_neardup",
      // the fixture has no organic >=0.99 pairs (max cosine 0.60 at
      // sf0.1), so both sides plant 20 exact-duplicate vectors
      // (vec_id+100000 copies of vec_id<20): identical vectors share
      // every band signature, so LSH recall on them is deterministic,
      // and the brute-force oracle attests "exactly the 20 planted
      // pairs, nothing else" — non-vacuous recall AND zero false
      // positives in one row set.
      (s, d) => {
        val emb = t(s, d, "embeddings").select("vec_id", "embedding")
        // the +100000 planted-id offset assumes organic ids stay below
        // it (max 1999 today). A larger fixture reaching that range
        // would collide planted with organic rows on BOTH sides at
        // once — the oracle would still match while the pair semantics
        // silently changed — so the assumption is asserted, not hoped.
        val maxId = emb.agg(max(col("vec_id")).cast("long")).head.getLong(0)
        require(maxId < 100000L,
          s"e04 planted-id offset collides: max vec_id=$maxId >= 100000")
        val planted = emb.filter(col("vec_id") < 20)
          .select((col("vec_id") + lit(100000L)).as("vec_id"),
            col("embedding"))
        Similarity.nearDuplicateEmbeddings(
            emb.unionByName(planted), threshold = 0.99)
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, embedding
          FROM embeddings WHERE vec_id < 20),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_sum(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, ROUND(cos, 6) AS cosine
        FROM pairs WHERE cos >= 0.99 ORDER BY id_a, id_b""")),

    Q("e03_knn_lsh",
      // candidate-replay oracle: the hyperplane hash family is not
      // SQL-portable, but the verification stage is — Spark persists
      // the band-collision candidate pairs and DuckDB replays the
      // exact-cosine + per-query top-k over that set. Spark ranks the
      // SAME persisted frame, so both sides verify identical
      // candidates. Recall vs brute force stays pinned in ScalaTest.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
        val candPath = freshState(s, "e03") + "/candidates"
        Similarity.lshCandidates(emb, queries)
          .write.mode("overwrite").parquet(candPath)
        Similarity.rankCandidates(emb, queries, s.read.parquet(candPath),
            k = 10)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH cand AS (SELECT query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e03/candidates/*.parquet')),
        e AS (SELECT vec_id, embedding FROM embeddings),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
            list_sum(list_transform(range(1, len(qe.embedding) + 1),
              i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ne.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ne ON ne.vec_id = cand.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("e05_knn_ivf",
      // the clustered-corpus ANN scale path: coarse cells from a
      // bounded-scan centroid sample, nprobe-cell search. Same
      // candidate-replay oracle shape as e03: the probed-cell pair set
      // is persisted and DuckDB replays the exact-cosine top-k.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
        val index = Similarity.ivfBuild(emb, k = 16)
        val candPath = freshState(s, "e05") + "/candidates"
        Similarity.ivfCandidates(index, queries, nprobe = 4)
          .write.mode("overwrite").parquet(candPath)
        Similarity.rankCandidates(emb, queries, s.read.parquet(candPath),
            k = 10)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH cand AS (SELECT query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e05/candidates/*.parquet')),
        e AS (SELECT vec_id, embedding FROM embeddings),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
            list_sum(list_transform(range(1, len(qe.embedding) + 1),
              i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ne.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ne ON ne.vec_id = cand.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("e22_semantic_decontamination",
      // SEMANTIC decontamination — the paraphrase-robust complement to
      // the n-gram legs (x08/d07/x79): benchmark items are tail-
      // redacted derivatives of every 83rd corpus vector (8 of 64 dims
      // zeroed — the embedding analog of a reworded eval question: no
      // shared-n-gram signal, high cosine), and the detector must
      // surface exactly the corpus items still within 0.9 cosine of
      // one. Candidates come from the cross-corpus banded hyperplane
      // join only (never corpus×corpus); both sides' band signatures
      // persist and the oracle replays the capped band collision, the
      // exact cosine and the threshold from them.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val bench = emb.filter(col("vec_id") % 83 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            concat(slice(col("embedding"), 1, 56),
              array_repeat(lit(0.0f), 8)).as("embedding"))
        val state = freshState(s, "e22")
        Similarity.embeddingBandSignatures(emb)
          .coalesce(2).write.mode("overwrite").parquet(state + "/csig")
        Similarity.embeddingBandSignatures(bench)
          .coalesce(1).write.mode("overwrite").parquet(state + "/bsig")
        Similarity.semanticDecontaminate(emb, bench, threshold = 0.9)
          .select(col("corpus_id"), col("bench_id"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("corpus_id", "bench_id")
      },
      Some("""WITH cs AS (SELECT vec_id AS id_a, band_idx, sig
          FROM read_parquet('/tmp/graft_qstate/e22/csig/*.parquet')),
        bs AS (SELECT vec_id AS id_b, band_idx, sig
          FROM read_parquet('/tmp/graft_qstate/e22/bsig/*.parquet')),
        cc AS (SELECT band_idx, sig FROM cs
          GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
        bc AS (SELECT band_idx, sig FROM bs
          GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
        cands AS (
          SELECT DISTINCT a.id_a, b.id_b
          FROM cs a
          JOIN cc ON a.band_idx = cc.band_idx AND a.sig = cc.sig
          JOIN bs b ON a.band_idx = b.band_idx AND a.sig = b.sig
          JOIN bc ON b.band_idx = bc.band_idx AND b.sig = bc.sig),
        bench AS (
          SELECT vec_id + 1000000 AS id_b,
            list_concat(embedding[1:56],
              [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) AS be
          FROM embeddings WHERE vec_id % 83 = 0),
        scored AS (
          SELECT c.id_a AS corpus_id, c.id_b AS bench_id,
            list_sum(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(b.be[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * SQRT(list_sum(list_transform(b.be,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM cands c
          JOIN embeddings e ON e.vec_id = c.id_a
          JOIN bench b ON b.id_b = c.id_b)
        SELECT corpus_id, bench_id, ROUND(cos, 6) AS cosine
        FROM scored WHERE cos >= CAST(0.9 AS DOUBLE)
        ORDER BY corpus_id, bench_id""")),

    Q("e24_ivf_nprobe_curve",
      // the IVF tuning curve — recall@10 as a function of nprobe
      // (1/2/4/8 cells probed), the measurement that picks the
      // recall/cost point BEFORE a 100 TB index serves traffic
      // (nprobe is THE knob: cells probed scale cost linearly while
      // recall saturates). Completes the calibration-curve family
      // (d14 MinHash threshold sweep, x77 sketch calibration, e17
      // single-point recall). The four approx top-10 sets persist
      // under their nprobe label; the oracle re-derives exact ground
      // truth from scratch and replays every hit count. The curve
      // must be monotone non-decreasing in nprobe by construction
      // (probed cell sets are nested) — a non-monotone row is an
      // index bug, not noise.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 25)
        val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        val index = Similarity.ivfBuild(emb, k = 16)
        val approx = Seq(1, 2, 4, 8).map(np =>
            Similarity.ivfTopK(index, queries, k = 10, nprobe = np)
              .select(lit(np).as("nprobe"), col("query_id"),
                col("neighbor_id")))
          .reduce(_ unionByName _)
        val state = freshState(s, "e24")
        approx.write.mode("overwrite").parquet(state + "/approx")
        val ap = s.read.parquet(state + "/approx")
        val hits = ap
          .join(exact.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("nprobe").agg(count(lit(1)).as("n_hits"))
        ap.groupBy("nprobe").agg(count(lit(1)).as("n_returned"))
          .join(hits, Seq("nprobe"), "left")
          .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
          .crossJoin(broadcast(
            exact.agg(count(lit(1)).as("n_exact"))))
          .withColumn("recall_ppm",
            expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)"))
          .select("nprobe", "n_returned", "n_hits", "n_exact",
            "recall_ppm")
          .orderBy("nprobe")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact),
        ap AS (SELECT nprobe, query_id, neighbor_id FROM read_parquet(
          '/tmp/graft_qstate/e24/approx/*.parquet')),
        tot AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_returned
          FROM ap GROUP BY nprobe),
        hit AS (SELECT ap.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM ap JOIN exact USING (query_id, neighbor_id)
          GROUP BY ap.nprobe)
        SELECT tot.nprobe, tot.n_returned,
          COALESCE(hit.n_hits, 0) AS n_hits, ne.n_exact,
          CAST(COALESCE(hit.n_hits, 0) * 1000000 // ne.n_exact
            AS BIGINT) AS recall_ppm
        FROM tot LEFT JOIN hit ON tot.nprobe = hit.nprobe, ne
        ORDER BY tot.nprobe""")),

    Q("e26_hnsw_ef_curve",
      // the HNSW tuning curve — recall@10 as a function of efSearch
      // (10/16/24/48 beam width at layer 0), e24's twin for the graph
      // lane: efSearch is THE serving knob (hops scale ~linearly,
      // recall saturates), and this measurement picks the operating
      // point BEFORE a shard fleet serves traffic. One build, four
      // searches; the labeled approx sets persist and the oracle
      // re-derives exact ground truth and every hit count. Unlike
      // IVF's nested probe sets the beam is not provably monotone,
      // but a recall DROP at higher ef on fixture data still smells
      // like a kernel bug — eyeball the curve when it changes.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 25)
        val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        val index = graft.pipeline.Hnsw.build(emb, m = 8,
          efConstruction = 64, shards = 4)
        // one shard materialization answers all four beam widths —
        // per-ef topK calls would reload every shard graph 4x
        val approx = graft.pipeline.Hnsw.topKMulti(index, queries,
            k = 10, efSearches = Seq(10, 16, 24, 48))
          .select(col("ef_search"), col("query_id"), col("neighbor_id"))
        val state = freshState(s, "e26")
        approx.write.mode("overwrite").parquet(state + "/approx")
        val ap = s.read.parquet(state + "/approx")
        val hits = ap
          .join(exact.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("ef_search").agg(count(lit(1)).as("n_hits"))
        ap.groupBy("ef_search").agg(count(lit(1)).as("n_returned"))
          .join(hits, Seq("ef_search"), "left")
          .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
          .crossJoin(broadcast(
            exact.agg(count(lit(1)).as("n_exact"))))
          .withColumn("recall_ppm",
            expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)"))
          .select("ef_search", "n_returned", "n_hits", "n_exact",
            "recall_ppm")
          .orderBy("ef_search")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact),
        ap AS (SELECT ef_search, query_id, neighbor_id FROM read_parquet(
          '/tmp/graft_qstate/e26/approx/*.parquet')),
        tot AS (SELECT ef_search, CAST(COUNT(*) AS BIGINT) AS n_returned
          FROM ap GROUP BY ef_search),
        hit AS (SELECT ap.ef_search, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM ap JOIN exact USING (query_id, neighbor_id)
          GROUP BY ap.ef_search)
        SELECT tot.ef_search, tot.n_returned,
          COALESCE(hit.n_hits, 0) AS n_hits, ne.n_exact,
          CAST(COALESCE(hit.n_hits, 0) * 1000000 // ne.n_exact
            AS BIGINT) AS recall_ppm
        FROM tot LEFT JOIN hit ON tot.ef_search = hit.ef_search, ne
        ORDER BY tot.ef_search""")),

    Q("e27_hnsw_takedown",
      // the ANN-store takedown lifecycle, oracle-gated end to end:
      // build the full index, REMOVE every vec_id % 7 == 0 (the
      // GDPR/DMCA batch), search the survivor graph. Ground truth is
      // brute force over the REMAINING corpus only — so a ghost
      // (removed id still reachable via a stale node row or neighbor
      // list) either surfaces as a returned neighbor that exact
      // ground truth doesn't contain (recall drops, hash-red) or
      // as an n_returned mismatch; and the removed_count row pins
      // the excision arithmetic itself.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val state = freshState(s, "e27")
        graft.pipeline.Hnsw.save(
          graft.pipeline.Hnsw.build(emb, m = 8, efConstruction = 64,
            shards = 4), state + "/index")
        val nRemoved = graft.pipeline.Hnsw.remove(state + "/index",
          emb.filter(col("vec_id") % 7 === 0).select("vec_id"))
        val survivors = emb.filter(col("vec_id") % 7 =!= 0)
        val queries = survivors.filter(col("vec_id") < 30)
        val exact = Similarity.bruteForceTopK(survivors, queries, k = 10)
        graft.pipeline.Hnsw
          .topK(graft.pipeline.Hnsw.load(s, state + "/index"),
            queries, k = 10, efSearch = 48)
          .select(lit("hnsw_post_takedown").as("method"),
            col("query_id"), col("neighbor_id"))
          .write.mode("overwrite").parquet(state + "/approx")
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .withColumn("removed_count", lit(nRemoved))
          .orderBy("method", "query_id")
      },
      Some("""WITH surv AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id % 7 <> 0),
        q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM surv WHERE vec_id < 30),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM surv),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        nex AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1),
        ap AS (SELECT DISTINCT method, query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e27/approx/*.parquet')),
        hits AS (SELECT method, query_id,
            CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM ap JOIN exact USING (query_id, neighbor_id) GROUP BY 1, 2),
        m AS (SELECT DISTINCT method FROM ap),
        rc AS (SELECT CAST(COUNT(*) AS BIGINT) AS removed_count
          -- mirror the index's admission filter (build drops NULL
          -- id/embedding rows), so this counts exactly the ids the
          -- index held and remove() excised
          FROM embeddings
          WHERE vec_id % 7 = 0 AND vec_id IS NOT NULL
            AND embedding IS NOT NULL)
        SELECT m.method, nex.query_id, nex.n_exact,
          COALESCE(hits.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / nex.n_exact, 6)
            AS recall,
          rc.removed_count
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id, rc
        ORDER BY m.method, nex.query_id""")),

    Q("e17_ann_recall",
      // ANN index-quality evaluation: recall@10 of the LSH (e03) and
      // IVF (e05) candidate generators against brute-force ground
      // truth — the measurement loop that tunes bands/nprobe BEFORE a
      // 100 TB index build commits. The approx top-10 sets persist and
      // the oracle re-derives exact ground truth from scratch (e02's
      // cross-join shape), then recomputes every hit count and recall
      // by SQL set intersection.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 25)
        val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        val approx = Similarity.lshTopK(emb, queries, k = 10)
          .select(lit("lsh").as("method"), col("query_id"),
            col("neighbor_id"))
          .unionByName(
            Similarity.ivfTopK(Similarity.ivfBuild(emb, k = 16), queries,
              k = 10, nprobe = 4)
              .select(lit("ivf").as("method"), col("query_id"),
                col("neighbor_id")))
        val state = freshState(s, "e17")
        approx.write.mode("overwrite").parquet(state + "/approx")
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .orderBy("method", "query_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        nex AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1),
        ap AS (SELECT DISTINCT method, query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e17/approx/*.parquet')),
        hits AS (SELECT method, query_id,
            CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM ap JOIN exact USING (query_id, neighbor_id) GROUP BY 1, 2),
        m AS (SELECT DISTINCT method FROM ap)
        SELECT m.method, nex.query_id, nex.n_exact,
          COALESCE(hits.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / nex.n_exact, 6)
            AS recall
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id
        ORDER BY m.method, nex.query_id""")),

    Q("e25_hnsw_recall",
      // graph ANN (sharded HNSW) recall@10 — the industry-default ANN
      // family beside IVF/PQ/LSH/JL, pinned the e17 way: the approx
      // top-10 sets persist and the oracle re-derives exact ground
      // truth and every recall by SQL set intersection. The arm under
      // test is the full store lifecycle: build on the first half,
      // APPEND the second half into the persisted adjacency store
      // (touched shards rewrite, untouched shards never read), then
      // search the loaded index — so a silent append corruption (lost
      // nodes, broken layers) shows up as a recall collapse in a
      // hash-gated artifact. Brute-force arm is ground truth only
      // (PlanAudit-whitelisted); the HNSW probe path is graph hops,
      // O(shards · ef · log n), never a corpus scan.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 25)
        val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        val state = freshState(s, "e25")
        val half = emb.agg(max("vec_id")).head().getLong(0) / 2
        graft.pipeline.Hnsw.save(
          graft.pipeline.Hnsw.build(emb.filter(col("vec_id") <= half),
            m = 8, efConstruction = 64, shards = 4),
          state + "/index")
        graft.pipeline.Hnsw.append(state + "/index",
          emb.filter(col("vec_id") > half))
        graft.pipeline.Hnsw
          .topK(graft.pipeline.Hnsw.load(s, state + "/index"),
            queries, k = 10, efSearch = 48)
          .select(lit("hnsw").as("method"), col("query_id"),
            col("neighbor_id"))
          .write.mode("overwrite").parquet(state + "/approx")
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .orderBy("method", "query_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        nex AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1),
        ap AS (SELECT DISTINCT method, query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e25/approx/*.parquet')),
        hits AS (SELECT method, query_id,
            CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM ap JOIN exact USING (query_id, neighbor_id) GROUP BY 1, 2),
        m AS (SELECT DISTINCT method FROM ap)
        SELECT m.method, nex.query_id, nex.n_exact,
          COALESCE(hits.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / nex.n_exact, 6)
            AS recall
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id
        ORDER BY m.method, nex.query_id""")),

    Q("e18_truncated_ann",
      // dimension-budget recall (the Matryoshka/MRL question): how much
      // recall@10 survives searching on only the first 16 / 32 of 64
      // dims? Pure composition — truncated brute-force arms against
      // full-dim ground truth through the e17 recall evaluator; the
      // truncated top-10 sets persist and the oracle re-derives the
      // full-dim truth and every recall itself.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 25)
        def trunc(df: DataFrame, n: Int) =
          df.withColumn("embedding", slice(col("embedding"), 1, n))
        val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        val approx = Seq(16, 32).map { n =>
          Similarity.bruteForceTopK(trunc(emb, n), trunc(queries, n),
              k = 10)
            .select(lit(s"dim$n").as("method"), col("query_id"),
              col("neighbor_id"))
        }.reduce(_ unionByName _)
        val state = freshState(s, "e18")
        approx.write.mode("overwrite").parquet(state + "/approx")
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .orderBy("method", "query_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        nex AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1),
        ap AS (SELECT DISTINCT method, query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e18/approx/*.parquet')),
        hits AS (SELECT method, query_id,
            CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM ap JOIN exact USING (query_id, neighbor_id) GROUP BY 1, 2),
        m AS (SELECT DISTINCT method FROM ap)
        SELECT m.method, nex.query_id, nex.n_exact,
          COALESCE(hits.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / nex.n_exact, 6)
            AS recall
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id
        ORDER BY m.method, nex.query_id""")),

    Q("e19_ivf_balance",
      // IVF index health check (the balance audit BEFORE a 100 TB
      // build commits to a centroid set): per-cell populations with
      // broadcast global lanes — share, max/mean imbalance, empty-cell
      // count. Empty cells emit n=0 explicitly (a literal all-cells
      // frame), because paid-for-but-unused capacity is exactly what
      // the audit exists to surface. The assignment persists and the
      // oracle recomputes every count and ppm lane from it.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val index = Similarity.ivfBuild(emb, k = 16)
        val path = freshState(s, "e19") + "/assign"
        index.assigned.select(col("vec_id"), col("__cell").as("cell"))
          .coalesce(4).write.mode("overwrite").parquet(path)
        Similarity.ivfBalance(index).orderBy("cell")
      },
      Some("""WITH a AS (SELECT cell FROM read_parquet(
            '/tmp/graft_qstate/e19/assign/*.parquet')),
        counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n
          FROM a GROUP BY 1),
        cells AS (SELECT CAST(range AS INT) AS cell FROM range(0, 16)),
        pc AS (SELECT cells.cell, COALESCE(counts.n, 0) AS n
          FROM cells LEFT JOIN counts USING (cell)),
        st AS (SELECT SUM(n) AS total, MAX(n) AS max_n,
          CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS empty_cells FROM pc)
        SELECT pc.cell, pc.n,
          CAST(ROUND(1e6 * pc.n / st.total, 0) AS BIGINT) AS share_ppm,
          CAST(ROUND(1e6 * st.max_n * 16 / st.total, 0) AS BIGINT)
            AS max_over_mean_ppm,
          st.empty_cells
        FROM pc, st ORDER BY pc.cell""")),

    Q("e20_random_projection",
      // Johnson–Lindenstrauss recall: project 64 → 16 dims through a
      // SEEDED Gaussian matrix and measure recall@10 against full-dim
      // ground truth — the e18 question for projection instead of
      // truncation (a trained-rotation-free MRL baseline). The
      // projected top-10 sets persist and the oracle re-derives the
      // full-dim truth and every recall (the projection itself is
      // spec-pinned: deterministic seed, norm scale).
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 25)
        val pEmb = Similarity.randomProjection(emb, 64, 16, seed = 7L)
        val pQ = Similarity.randomProjection(queries, 64, 16, seed = 7L)
        val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        val approx = Similarity.bruteForceTopK(pEmb, pQ, k = 10)
          .select(lit("jl16").as("method"), col("query_id"),
            col("neighbor_id"))
        val state = freshState(s, "e20")
        approx.coalesce(1).write.mode("overwrite")
          .parquet(state + "/approx")
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .orderBy("method", "query_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
          FROM embeddings),
        scored AS (
          SELECT q.query_id, c.neighbor_id,
            list_sum(list_transform(range(1, len(qe) + 1),
              i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) /
            (SQRT(list_sum(list_transform(qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(list_sum(list_transform(ce,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM q, c WHERE q.query_id <> c.neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 10),
        nex AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1),
        ap AS (SELECT DISTINCT method, query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e20/approx/*.parquet')),
        hits AS (SELECT method, query_id,
            CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM ap JOIN exact USING (query_id, neighbor_id)
          GROUP BY 1, 2),
        m AS (SELECT DISTINCT method FROM ap)
        SELECT m.method, nex.query_id, nex.n_exact,
          COALESCE(hits.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / nex.n_exact, 6)
            AS recall
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id
        ORDER BY m.method, nex.query_id""")),

    Q("e21_pq_distortion",
      // PQ reconstruction-distortion audit — the third index-quality
      // lane beside e17's recall and e19's balance: per subquantizer,
      // the mean squared distance between each vector's sub-segment
      // and its assigned centroid (what ADC error is MADE of; a hot
      // subquantizer tells you where to spend more codebook bits).
      // Computed FROM the persisted codes+codebooks with higher-order
      // functions — the identical arithmetic the oracle replays over
      // the same parquet. Per-vector distortions quantize to micro
      // before the per-sub integer sums.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val state = freshState(s, "e21")
        Similarity.pqSave(Similarity.pqBuild(emb, m = 8, ks = 16), state)
        val cb = s.read.parquet(state + "/codebooks")
          .select(col("sub").as("cb_sub"), col("code").as("cb_code"),
            col("centroid"))
        val assigned = s.read.parquet(state + "/codes")
          .select(col("vec_id"),
            posexplode(col("code")).as(Seq("sub", "cd")))
          .join(emb, "vec_id")
          .join(cb, col("sub") === col("cb_sub") &&
            col("cd") === col("cb_code"))
        val dist = expr(
          """aggregate(zip_with(
            |  slice(embedding, sub * 8 + 1, 8), centroid,
            |  (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
            |  0D, (acc, x) -> acc + x)""".stripMargin)
        assigned
          .withColumn("__d_micro", round(dist * 1e6, 0).cast("long"))
          .groupBy(col("sub"))
          .agg(count(lit(1)).as("n_vectors"),
            round(sum("__d_micro").cast("double") / count(lit(1)) / 1e6, 6)
              .as("mse"))
          .orderBy("sub")
      },
      Some("""WITH cb AS (SELECT sub, code, centroid
          FROM read_parquet('/tmp/graft_qstate/e21/codebooks/*.parquet')),
        codes AS (SELECT vec_id, code
          FROM read_parquet('/tmp/graft_qstate/e21/codes/*.parquet')),
        ex AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS sub,
            code[CAST(t.i AS INT)] AS cd
          FROM codes, range(1, 9) t(i)),
        j AS (SELECT ex.vec_id, ex.sub,
            CAST(ROUND(list_sum(list_transform(range(1, 9),
              i -> (CAST(e.embedding[ex.sub * 8 + i] AS DOUBLE)
                      - cb.centroid[i])
                 * (CAST(e.embedding[ex.sub * 8 + i] AS DOUBLE)
                      - cb.centroid[i]))) * 1e6, 0) AS BIGINT)
              AS d_micro
          FROM ex
          JOIN embeddings e ON e.vec_id = ex.vec_id
          JOIN cb ON cb.sub = ex.sub AND cb.code = ex.cd)
        SELECT sub, CAST(COUNT(*) AS BIGINT) AS n_vectors,
          ROUND(CAST(SUM(d_micro) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mse
        FROM j GROUP BY sub ORDER BY sub""")),

    Q("e07_semantic_dedup",
      // SemDeDup: coarse cells (8 fixed centroids = the first 8 vectors,
      // normalized — deterministic, so DuckDB replays the exact
      // assignment) + within-cell cosine ≥ 0.3 drop rule: a vector is a
      // dup iff a smaller-id same-cell neighbor is that similar. The
      // quadratic step never leaves a cell.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cents = emb.filter(col("vec_id") < 8).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          .map { v =>
            val n = math.sqrt(v.map(x => x * x).sum)
            if (n == 0) v else v.map(_ / n)
          }
        Similarity.semanticDedup(emb, cents, tau = 0.3)
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        c AS (
          SELECT vec_id AS cid,
            list_transform(embedding, x -> CAST(x AS DOUBLE) /
              SQRT(list_sum(list_transform(embedding,
                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS cv
          FROM e WHERE vec_id < 8),
        dots AS (
          SELECT e.vec_id, c.cid,
            list_sum(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i])) AS dt
          FROM e CROSS JOIN c),
        assign AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dt DESC, cid) AS rk
            FROM dots) WHERE rk = 1),
        pairs AS (
          SELECT bb.vec_id AS id_b
          FROM assign aa JOIN assign bb ON aa.cell = bb.cell
            AND aa.vec_id < bb.vec_id
          JOIN e ea ON ea.vec_id = aa.vec_id
          JOIN e eb ON eb.vec_id = bb.vec_id
          WHERE list_sum(list_transform(range(1, 65),
              i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(ea.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * SQRT(list_sum(list_transform(eb.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            >= 0.3),
        dups AS (SELECT DISTINCT id_b FROM pairs)
        SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
          (d.id_b IS NOT NULL) AS is_dup
        FROM assign a LEFT JOIN dups d ON a.vec_id = d.id_b
        ORDER BY a.vec_id""")),

    Q("e08_quantize_int8",
      // symmetric int8 quantization (4× smaller ANN scoring reads):
      // q = floor(x·127/max|x| + 0.5), scale = max|x|/127 — map-only
      // array expressions DuckDB replays bit-for-bit
      (s, d) => Similarity.quantizeEmbeddings(t(s, d, "embeddings"))
        .select(col("vec_id"),
          aggregate(col("qvec"), lit(0L),
            (acc, v) => acc + v.cast("long")).as("q_sum"),
          // codes are tinyint since the byte-code change; widen the
          // emitted extrema to INT for oracle schema parity
          array_min(col("qvec")).cast("int").as("q_min"),
          array_max(col("qvec")).cast("int").as("q_max"),
          round(col("scale"), 9).as("scale"))
        .orderBy("vec_id"),
      Some("""WITH q AS (
          SELECT vec_id, embedding,
            list_max(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE)))) AS ma
          FROM embeddings),
        v AS (
          SELECT vec_id,
            CASE WHEN ma = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / ma + 0.5)
                  AS INT)) END AS qv,
            ma / 127.0 AS scale
          FROM q)
        SELECT vec_id,
          CAST(list_sum(qv) AS BIGINT) AS q_sum,
          CAST(list_min(qv) AS INT) AS q_min,
          CAST(list_max(qv) AS INT) AS q_max,
          ROUND(scale, 9) AS scale
        FROM v ORDER BY vec_id""")),

    Q("e09_knn_pq",
      // product quantization, the memory-bound ANN scale path: 8
      // subspaces × 16 sampled centroids compress 64 float dims to 8
      // small codes (~32× less scored data per row), ADC top-k is a
      // pure table-lookup scan. Replay oracle: codes + codebooks are
      // persisted and DuckDB recomputes the SAME asymmetric distances
      // from them — quantizer and scorer verified end-to-end.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val index = Similarity.pqBuild(emb, m = 8, ks = 16)
        Similarity.pqSave(index, freshState(s, "e09"))
        // rank on the ROUNDED distance: vectors sharing a code word are
        // exact ties in Spark's fixed-order sum but can differ by 1 ulp
        // under DuckDB's per-group accumulation order — ranking on the
        // quantized value keeps the tiebreak (neighbor_id) identical in
        // both engines
        Similarity.pqTopK(index, emb.filter(col("vec_id") < 5), k = 10,
            rankOnRounded = Some(6))
          .select(col("query_id"), col("neighbor_id"),
            col("adc_dist"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH cb AS (SELECT sub, code, centroid
          FROM read_parquet('/tmp/graft_qstate/e09/codebooks/*.parquet')),
        codes AS (SELECT vec_id, code
          FROM read_parquet('/tmp/graft_qstate/e09/codes/*.parquet')),
        q AS (SELECT vec_id AS query_id, embedding FROM embeddings
          WHERE vec_id < 5),
        dt AS (
          SELECT q.query_id, cb.sub, cb.code,
            list_sum(list_transform(range(1, 9),
              i -> (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.centroid[i])
                 * (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.centroid[i])))
              AS dist
          FROM q CROSS JOIN cb),
        exploded AS (
          SELECT vec_id, CAST(t.i AS INT) - 1 AS sub, code[CAST(t.i AS INT)] AS cd
          FROM codes, range(1, 9) t(i)),
        scored AS (
          SELECT dt.query_id, e.vec_id AS neighbor_id,
            ROUND(SUM(dt.dist), 6) AS adc
          FROM exploded e JOIN dt ON dt.sub = e.sub AND dt.code = e.cd
          GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, neighbor_id, adc,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc, neighbor_id) AS rank
          FROM scored WHERE neighbor_id != query_id)
        SELECT query_id, neighbor_id, adc AS adc_dist,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("e14_incremental_pq",
      // PQ index MAINTENANCE under daily ingest (e13's twin for the
      // memory-bound path): codebooks train on the standing corpus
      // only; the new slice (last 10% of ids) encodes with the
      // PERSISTED codebooks in one map-side pass and its codes append
      // — no re-training, old codes never recomputed. The ADC scan
      // then scores old + appended codes alike. Same replay oracle as
      // e09, over the POST-APPEND persisted codes.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val state = freshState(s, "e14")
        val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
        val cut = 9L * (maxId + 1L) / 10L
        Similarity.pqSave(
          Similarity.pqBuild(emb.filter(col("vec_id") < cut),
            m = 8, ks = 16),
          state)
        Similarity.pqAppend(state, emb.filter(col("vec_id") >= cut))
        val index = Similarity.pqLoad(s, state)
        Similarity.pqTopK(index, emb.filter(col("vec_id") < 5), k = 10,
            rankOnRounded = Some(6))
          .select(col("query_id"), col("neighbor_id"),
            col("adc_dist"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH cb AS (SELECT sub, code, centroid
          FROM read_parquet('/tmp/graft_qstate/e14/codebooks/*.parquet')),
        codes AS (SELECT vec_id, code
          FROM read_parquet('/tmp/graft_qstate/e14/codes/*.parquet')),
        q AS (SELECT vec_id AS query_id, embedding FROM embeddings
          WHERE vec_id < 5),
        dt AS (
          SELECT q.query_id, cb.sub, cb.code,
            list_sum(list_transform(range(1, 9),
              i -> (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.centroid[i])
                 * (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.centroid[i])))
              AS dist
          FROM q CROSS JOIN cb),
        exploded AS (
          SELECT vec_id, CAST(t.i AS INT) - 1 AS sub, code[CAST(t.i AS INT)] AS cd
          FROM codes, range(1, 9) t(i)),
        scored AS (
          SELECT dt.query_id, e.vec_id AS neighbor_id,
            ROUND(SUM(dt.dist), 6) AS adc
          FROM exploded e JOIN dt ON dt.sub = e.sub AND dt.code = e.cd
          GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, neighbor_id, adc,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc, neighbor_id) AS rank
          FROM scored WHERE neighbor_id != query_id)
        SELECT query_id, neighbor_id, adc AS adc_dist,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("e10_knn_ivfpq",
      // IVF-PQ composition, the big-corpus ANN path: coarse cells prune
      // the candidate set (e05's verified stage), ADC scores ONLY those
      // candidates from their codes (e09's verified stage) — no raw
      // vector is read during scoring. The oracle replays both stages
      // from the persisted candidates + codes + codebooks.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
        val ivf = Similarity.ivfBuild(emb, k = 16)
        val pq = Similarity.pqBuild(emb, m = 8, ks = 16)
        val base = freshState(s, "e10")
        Similarity.pqSave(pq, base)
        Similarity.ivfCandidates(ivf, queries, nprobe = 6)
          .write.mode("overwrite").parquet(base + "/candidates")
        Similarity.ivfPqTopK(ivf, pq, queries, k = 10, nprobe = 6,
            rankOnRounded = Some(6))
          .orderBy("query_id", "rank")
      },
      Some("""WITH cb AS (SELECT sub, code, centroid
          FROM read_parquet('/tmp/graft_qstate/e10/codebooks/*.parquet')),
        codes AS (SELECT vec_id, code
          FROM read_parquet('/tmp/graft_qstate/e10/codes/*.parquet')),
        cand AS (SELECT query_id, neighbor_id
          FROM read_parquet('/tmp/graft_qstate/e10/candidates/*.parquet')),
        q AS (SELECT vec_id AS query_id, embedding FROM embeddings
          WHERE vec_id < 5),
        dt AS (
          SELECT q.query_id, cb.sub, cb.code,
            list_sum(list_transform(range(1, 9),
              i -> (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.centroid[i])
                 * (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.centroid[i])))
              AS dist
          FROM q CROSS JOIN cb),
        exploded AS (
          SELECT c.query_id, c.neighbor_id,
            CAST(t.i AS INT) - 1 AS sub, k.code[CAST(t.i AS INT)] AS cd
          FROM cand c JOIN codes k ON k.vec_id = c.neighbor_id,
            range(1, 9) t(i)),
        scored AS (
          SELECT e.query_id, e.neighbor_id, ROUND(SUM(dt.dist), 6) AS adc
          FROM exploded e JOIN dt ON dt.query_id = e.query_id
            AND dt.sub = e.sub AND dt.code = e.cd
          GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, neighbor_id, adc,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, adc AS adc_dist,
          CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    Q("e11_kmeans_clusters",
      // full-dim Lloyd k-means (corpus organization: topic cells,
      // curriculum buckets). Deterministic build — hash-ordered seed +
      // 3 aggregated Lloyd passes with 9 dp-rounded means (the e09
      // machinery with one whole-vector subspace). Replay oracle:
      // centroids + assignments are persisted and DuckDB recomputes
      // every vector's squared distance to its assigned centroid from
      // the raw embeddings, then re-aggregates size + inertia — the
      // distance math and the reduction are verified end-to-end;
      // nearest-centroid optimality is pinned by SimilaritySparkSpec.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val model = Similarity.kmeansBuild(emb, k = 8)
        val base = freshState(s, "e11")
        import s.implicits._
        model.assignments.write.mode("overwrite")
          .parquet(base + "/assignments")
        model.centroids.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("cluster", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(base + "/centroids")
        Similarity.kmeansStats(emb, model).orderBy("cluster")
      },
      Some("""WITH cent AS (SELECT cluster, centroid
          FROM read_parquet('/tmp/graft_qstate/e11/centroids/*.parquet')),
        asg AS (SELECT vec_id, cluster
          FROM read_parquet('/tmp/graft_qstate/e11/assignments/*.parquet')),
        d AS (
          SELECT a.cluster,
            CAST(ROUND(list_sum(list_transform(range(1, 65),
              i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
                 * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])))
              * 1e6, 0) AS BIGINT) AS micro
          FROM embeddings e
          JOIN asg a ON a.vec_id = e.vec_id
          JOIN cent c ON c.cluster = a.cluster)
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS size,
          ROUND(CAST(SUM(micro) AS DOUBLE) / 1e6, 6) AS inertia
        FROM d GROUP BY cluster ORDER BY cluster""")),

    Q("e06_label_centroids",
      // per-label mean embedding (class prototypes / IVF cell stats):
      // pipelined posexplode + map-side-combined (label, dim) aggregate
      (s, d) => Similarity.labelCentroids(t(s, d, "embeddings"))
        .orderBy("label", "dim"),
      Some("""SELECT label, CAST(idx AS INT) AS dim,
          CAST(COUNT(*) AS BIGINT) AS n,
          ROUND(CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1e9, 0) AS BIGINT))
            AS DOUBLE) / 1e9 / COUNT(*), 6) AS mean_v
        FROM (SELECT label, unnest(embedding) AS v,
            generate_subscripts(embedding, 1) AS idx
          FROM embeddings WHERE embedding IS NOT NULL)
        GROUP BY label, idx ORDER BY label, dim""")),

    Q("x01_text_profile",
      (s, d) => TextAnalysis.profileText(t(s, d, "documents"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_subwords").cast("long").as("n_subwords"),
          col("alpha_ratio"), col("punct_ratio"), col("stopword_ratio"),
          col("quality_score"), col("lang_detected"))
        .orderBy("doc_id"),
      Some(duckTextProfileSql)),

    Q("x02_lang_histogram",
      // languageId alone, NOT profileText: the histogram needs no other
      // ratio columns, so the scan stays a single map-only expression.
      (s, d) => t(s, d, "documents")
        .groupBy(TextAnalysis.languageId(col("text")).as("lang_detected"))
        .agg(count(lit(1)).as("doc_count"))
        .orderBy("lang_detected"),
      Some(s"""SELECT lang_detected, CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM ($duckTextProfileSql) GROUP BY lang_detected
        ORDER BY lang_detected""")),

    Q("x03_token_stats",
      (s, d) => {
        val docs = t(s, d, "documents")
        val tok = TextAnalysis.tokenCount(col("text")).cast("long")
        docs.agg(
          coalesce(sum(tok), lit(0L)).as("total_tokens"),
          min(tok).as("min_tokens"),
          max(tok).as("max_tokens"),
          (sum(tok).cast("double") / count(lit(1))).as("avg_tokens"))
      },
      Some("""WITH t AS (SELECT CASE WHEN LENGTH(trim(text)) = 0 THEN 0
          ELSE len(string_split_regex(trim(text), '\s+')) END AS n
          FROM documents)
        SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
          CAST(MIN(n) AS BIGINT) AS min_tokens,
          CAST(MAX(n) AS BIGINT) AS max_tokens,
          CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_tokens
        FROM t""")),

    Q("x05_vocabulary",
      // vocabulary build: top tokens by total count with doc frequency —
      // one token-keyed shuffle, deterministic (count desc, token asc) cut
      (s, d) => TextAnalysis.vocabulary(t(s, d, "documents"), top = 100)
        .orderBy(col("total_count").desc, col("token")),
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS total_count,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_count
        FROM toks WHERE len(token) > 0
        GROUP BY token ORDER BY total_count DESC, token LIMIT 100""")),

    Q("x07_bigram_counts",
      // word-bigram frequencies: codegen'd transform/slice window over
      // the token array, one ngram-keyed shuffle, deterministic top cut
      (s, d) => TextAnalysis.ngramCounts(t(s, d, "documents"),
        n = 2, top = 100)
        .orderBy(col("cnt").desc, col("ngram")),
      Some("""WITH toks AS (
          SELECT string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        idx AS (
          SELECT unnest(range(1, len(w))) AS i, w
          FROM toks WHERE len(w) >= 2)
        SELECT w[i] || ' ' || w[i+1] AS ngram,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM idx GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 100""")),

    Q("x09_repetition",
      // Gopher-style within-doc repetition: duplicated-bigram fraction,
      // a pure per-row array expression (no explode, no shuffle)
      (s, d) => TextAnalysis.repetitionRatio(t(s, d, "documents"))
        .select("doc_id", "repetition")
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        g AS (
          SELECT doc_id, len(w) AS nw,
            [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS grams
          FROM toks)
        SELECT doc_id,
          CASE WHEN nw >= 2 THEN ROUND(CAST(1.0 AS DOUBLE)
              - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
            ELSE CAST(0.0 AS DOUBLE) END AS repetition
        FROM g ORDER BY doc_id""")),

    Q("x08_decontamination",
      // benchmark-contamination check: docs 0-9 play the "benchmark";
      // every doc reports what fraction of its distinct bigrams appear
      // in the benchmark's bigram set (broadcast join, one corpus pass)
      (s, d) => {
        val docs = t(s, d, "documents")
        val bench = TextAnalysis.wordNgrams(
          docs.filter(col("doc_id") < 10)).select("ngram")
        TextAnalysis.contamination(docs, bench).orderBy("doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS ngram
          FROM (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM toks WHERE len(w) >= 2)),
        bench AS (SELECT DISTINCT ngram FROM grams WHERE doc_id < 10),
        per AS (
          SELECT g.doc_id,
            CAST(COUNT(*) AS BIGINT) AS total_ngrams,
            CAST(COUNT(b.ngram) AS BIGINT) AS matched_ngrams
          FROM grams g LEFT JOIN bench b USING (ngram)
          GROUP BY g.doc_id)
        SELECT doc_id, total_ngrams, matched_ngrams,
          ROUND(CAST(matched_ngrams AS DOUBLE) / total_ngrams, 6)
            AS contamination
        FROM per ORDER BY doc_id""")),

    Q("x06_hash_split",
      // deterministic train/val/test split: stable md5 bucketing, so the
      // same doc lands in the same split on every run and every engine —
      // DuckDB reproduces the exact assignment from the same md5
      (s, d) => Sampling.hashSplit(t(s, d, "documents"))
        .groupBy("split").agg(count(lit(1)).as("doc_count"))
        .orderBy("split"),
      Some("""WITH b AS (
          SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) % 1000 AS bucket
          FROM documents)
        SELECT CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
          CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM b GROUP BY 1 ORDER BY split""")),

    // corpus rebalancing: the fixture corpus is English-dominant —
    // downsample 'en' to 30%, 'zh' to 50%, pass the rest. Per-stratum
    // deterministic fractions (the sampleBy analog) whose survivors are
    // auditable from any engine: DuckDB recomputes the same md5
    // thresholds row for row.
    Q("x10_stratified_sample",
      (s, d) => Sampling.stratifiedSampleBy(t(s, d, "documents"),
        idCol = "doc_id", stratumCol = "lang",
        fractions = Map("en" -> 0.3, "zh" -> 0.5))
        .groupBy("lang").agg(count(lit(1)).as("doc_count"))
        .orderBy("lang"),
      Some("""WITH b AS (
          SELECT lang,
            CAST(('0x' || substring(md5(lang || '|' ||
              CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
          FROM documents)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM b
        WHERE bucket < CASE lang WHEN 'en' THEN 300
          WHEN 'zh' THEN 500 ELSE 1000 END
        GROUP BY lang ORDER BY lang""")),

    // sequence packing: documents → fixed-budget training sequences
    // (contiguous fill per hash bucket, never splitting a document);
    // the oracle replays the same bucket hash + per-bucket running sum
    Q("x11_sequence_packing",
      (s, d) => Sampling.packSequences(t(s, d, "documents"),
        idCol = "doc_id", sizeCol = "n_chars", budget = 4000L,
        numBuckets = 8)
        .groupBy("pack_bucket", "seq_id")
        .agg(count(lit(1)).as("doc_count"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("pack_bucket", "seq_id"),
      Some("""WITH b AS (
          SELECT doc_id, n_chars,
            CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS pack_bucket
          FROM documents),
        c AS (
          SELECT pack_bucket, n_chars,
            SUM(n_chars) OVER (PARTITION BY pack_bucket ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM b)
        SELECT CAST(pack_bucket AS INT) AS pack_bucket,
          CAST(FLOOR(CAST(cum - n_chars AS DOUBLE) / 4000) AS BIGINT)
            AS seq_id,
          CAST(COUNT(*) AS BIGINT) AS doc_count,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM c GROUP BY 1, 2 ORDER BY pack_bucket, seq_id""")),

    Q("x19_source_mix",
      // temperature-based corpus rebalancing (w ∝ p^0.5): per-source mix
      // plan + deterministically realized counts; one scan, cell-sized
      // shuffles, md5-bucket thresholds shared with x06/x10
      (s, d) => Sampling.temperatureResample(t(s, d, "documents"),
          idCol = "doc_id", stratumCol = "source", alpha = 0.5)
        .orderBy("stratum"),
      Some("""WITH d AS (
          SELECT source, doc_id,
            CAST(('0x' || substring(md5(source || '|' ||
              CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
          FROM documents WHERE source IS NOT NULL),
        s AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY source),
        t AS (SELECT SUM(ns) AS n FROM s),
        w AS (SELECT source, ns, n, CAST(ns AS DOUBLE) / n AS p,
            POW(CAST(ns AS DOUBLE) / n, 0.5) AS pw
          FROM s CROSS JOIN t),
        sp AS (SELECT SUM(CAST(ROUND(pw * 1e9, 0) AS BIGINT)) AS spn FROM w),
        r AS (SELECT source, ns, n, p, pw,
            pw / (CAST(spn AS DOUBLE) / 1e9) AS wt
          FROM w CROSS JOIN sp),
        f AS (SELECT source, ns, p, wt,
            LEAST(1.0, wt * n / ns) AS kr,
            CAST(FLOOR(LEAST(1.0, wt * n / ns) * 1000) AS INT) AS thr
          FROM r)
        SELECT f.source AS stratum, CAST(f.ns AS BIGINT) AS n_docs,
          ROUND(f.p, 6) AS share, ROUND(f.wt, 6) AS weight,
          ROUND(f.kr, 6) AS keep_rate,
          CAST(f.thr AS INT) AS keep_threshold,
          CAST(SUM(CASE WHEN d.bucket < f.thr THEN 1 ELSE 0 END) AS BIGINT)
            AS n_sampled
        FROM f JOIN d ON d.source = f.source
        GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY stratum""")),

    Q("x20_funnel",
      // loose-ordering funnel view → click → purchase: one user-keyed
      // shuffle collecting per-step sorted ts arrays; chained step times
      // are array expressions, summary is a tiny explode
      (s, d) => graft.operators.Funnel.funnel(eventsTable(s, d),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("step_idx"),
      Some("""WITH u AS (
          SELECT user_id,
            list_sort(list(ts) FILTER (WHERE event_type = 'view')) AS a0,
            list_sort(list(ts) FILTER (WHERE event_type = 'click')) AS a1,
            list_sort(list(ts) FILTER (WHERE event_type = 'purchase')) AS a2
          FROM events GROUP BY user_id),
        c0 AS (SELECT user_id, a1, a2, a0[1] AS t0 FROM u),
        c1 AS (SELECT user_id, a2, t0,
            list_min(list_filter(a1, x -> x >= t0)) AS t1 FROM c0),
        c2 AS (SELECT user_id, t0, t1,
            list_min(list_filter(a2, x -> x >= t1)) AS t2 FROM c1),
        s AS (
          SELECT 1 AS step_idx, 'view' AS step, COUNT(t0) AS users FROM c2
          UNION ALL SELECT 2, 'click', COUNT(t1) FROM c2
          UNION ALL SELECT 3, 'purchase', COUNT(t2) FROM c2),
        f AS (SELECT MAX(CASE WHEN step_idx = 1 THEN users END) AS fu
          FROM s)
        SELECT step_idx, step, CAST(users AS BIGINT) AS users,
          CASE WHEN fu > 0 THEN ROUND(CAST(users AS DOUBLE) / fu, 6)
            ELSE NULL END AS conversion
        FROM s CROSS JOIN f ORDER BY step_idx""")),

    Q("x21_retention",
      // cohort retention: first-seen date per user + co-partitioned join
      // back, then one (cohort, offset) distinct-user aggregate
      (s, d) => graft.operators.Funnel.retentionCohorts(
          eventsTable(s, d), "user_id", "ts", maxDays = 30)
        .orderBy("cohort_date", "day_offset"),
      Some("""WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
          FROM events GROUP BY user_id),
        d AS (SELECT e.user_id, CAST(e.ts AS DATE) AS day, f.cohort_date
          FROM events e JOIN f ON e.user_id = f.user_id)
        SELECT cohort_date,
          CAST(date_diff('day', cohort_date, day) AS INT) AS day_offset,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM d WHERE date_diff('day', cohort_date, day) <= 30
        GROUP BY 1, 2 ORDER BY cohort_date, day_offset""")),

    Q("x35_leak_safe_split",
      // leakage-safe split over the d05 chain clusters: every cluster
      // member hashes by its cluster head, so no near-dup pair straddles
      // train/test; the oracle replays closure + bucket assignment
      (s, d) => {
        val docs = t(s, d, "documents")
        val ids = docs.select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 10 < 4)
          .join(ids.select(col("doc_id").as("next_id")),
            col("doc_id") + 1 === col("next_id"))
          .select(col("doc_id").as("id_a"), col("next_id").as("id_b"))
        Sampling.leakSafeSplit(docs, Dedup.duplicateClusters(pairs))
          .groupBy("split")
          .agg(count(lit(1)).as("doc_count"),
            sum(col("doc_id")).cast("long").as("id_sum"))
          .orderBy("split")
      },
      Some("""WITH RECURSIVE
        pairs AS (
          SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
          WHERE doc_id % 10 < 4
            AND (doc_id + 1) IN (SELECT doc_id FROM documents)),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src),
        keyed AS (
          SELECT d.doc_id,
            COALESCE(c.cluster_id, d.doc_id) AS k
          FROM documents d LEFT JOIN clust c ON d.doc_id = c.doc_id),
        b AS (
          SELECT doc_id,
            CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000 AS bucket
          FROM keyed)
        SELECT CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
          CAST(COUNT(*) AS BIGINT) AS doc_count,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM b GROUP BY 1 ORDER BY split""")),

    Q("x22_domain_cap",
      // per-source cap (the web-pipeline "per-domain cap"): keep at most
      // 10 docs per source, chosen by stable md5 order — WindowGroupLimit
      // turns the row_number filter into a map-side per-stratum top-k, so
      // the shuffle never carries the corpus. kept_id_sum pins WHICH rows
      // survived, not just how many.
      (s, d) => Sampling.capPerStratum(t(s, d, "documents"),
          idCol = "doc_id", stratumCol = "source", maxPerStratum = 10)
        .groupBy("source")
        .agg(count(lit(1)).as("doc_count"),
          sum(col("doc_id")).cast("long").as("kept_id_sum"))
        .orderBy("source"),
      Some("""WITH r AS (
          SELECT source, doc_id,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)))
              AS rk
          FROM documents)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS doc_count,
          CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
        FROM r WHERE rk <= 10 GROUP BY source ORDER BY source""")),

    Q("x23_boilerplate",
      // corpus boilerplate share per doc (the "duplicated line" filter
      // analog): trigrams in ≥5 docs are boilerplate; one corpus pass —
      // gram df rides a window over the gram key, no self-join
      (s, d) => TextAnalysis.boilerplateShare(t(s, d, "documents"),
          n = 3, minDocs = 5L)
        .filter(col("doc_id") < 100)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT DISTINCT doc_id,
            w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ngram
          FROM (SELECT doc_id, unnest(range(1, len(w) - 1)) AS i, w
                FROM toks WHERE len(w) >= 3)),
        bp AS (SELECT ngram FROM grams GROUP BY ngram
               HAVING COUNT(*) >= 5),
        per AS (
          SELECT g.doc_id,
            CAST(COUNT(*) AS BIGINT) AS total_ngrams,
            CAST(COUNT(b.ngram) AS BIGINT) AS boilerplate_ngrams
          FROM grams g LEFT JOIN bp b USING (ngram)
          GROUP BY g.doc_id)
        SELECT doc_id, total_ngrams, boilerplate_ngrams,
          ROUND(CAST(boilerplate_ngrams AS DOUBLE) / total_ngrams, 6)
            AS boilerplate_share
        FROM per WHERE doc_id < 100 ORDER BY doc_id""")),

    Q("x29_chunk_windows",
      // overlapping token-window chunking (embedding/RAG prep): 20-token
      // windows every 10 tokens, map-only split+transform+explode;
      // chunk text md5 pins exact content per window
      (s, d) => TextAnalysis.chunkDocuments(t(s, d, "documents"),
          chunkTokens = 20, strideTokens = 10)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0) AS w
          FROM documents WHERE doc_id < 40),
        st AS (
          SELECT doc_id, w, unnest(range(0, len(w), 10)) AS s
          FROM toks WHERE len(w) > 0)
        SELECT doc_id, CAST(s / 10 AS INT) AS chunk_idx,
          CAST(LEAST(20, len(w) - s) AS INT) AS n_tokens,
          md5(array_to_string(list_slice(w, s + 1, s + 20), ' '))
            AS chunk_md5
        FROM st ORDER BY doc_id, chunk_idx""")),

    Q("x30_event_rollup",
      // native ROLLUP: (type, day) cells + per-type subtotals + grand
      // total in one Expand+hash-agg job — three dashboard
      // granularities for one shuffle
      (s, d) => graft.operators.Funnel.eventVolumeRollup(eventsTable(s, d))
        // subtotal NULLs → explicit '(all)' sentinels: the compare layer
        // can't equate null dates, and the sentinel reads better anyway;
        // grouping flags keep subtotals distinct from genuine null data
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("day").cast("string"), lit("(all)")).as("day"),
          col("type_total"), col("day_total"),
          col("events"), col("value_sum"))
        .orderBy("event_type", "day"),
      Some("""SELECT COALESCE(event_type, '(all)') AS event_type,
          COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), '(all)') AS day,
          CAST(GROUPING(event_type) AS INT) AS type_total,
          CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS day_total,
          CAST(COUNT(*) AS BIGINT) AS events,
          ROUND(SUM(value), 6) AS value_sum
        FROM events
        GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
        ORDER BY event_type, day""")),

    Q("x32_oov_rate",
      // OOV rate vs the corpus top-25 vocabulary (tokenizer domain-shift
      // signal): one exploded pass, broadcast vocab, one doc-keyed fold
      (s, d) => {
        val docs = t(s, d, "documents")
        TextAnalysis.oovRate(docs, TextAnalysis.vocabulary(docs, top = 25))
          .filter(col("doc_id") < 200)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        vocab AS (
          SELECT token FROM tok GROUP BY token
          ORDER BY COUNT(*) DESC, token LIMIT 25),
        per AS (
          SELECT t.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_tokens,
            CAST(COUNT(*) - COUNT(v.token) AS BIGINT) AS oov_tokens
          FROM tok t LEFT JOIN vocab v ON t.token = v.token
          GROUP BY t.doc_id)
        SELECT doc_id, n_tokens, oov_tokens,
          ROUND(CAST(oov_tokens AS DOUBLE) / n_tokens, 6) AS oov_rate
        FROM per WHERE doc_id < 200 ORDER BY doc_id""")),

    Q("x31_bigram_logprob",
      // bigram-LM quality: avg −ln P(w2|w1) per doc under the corpus ML
      // model — flags word salad with plausible unigrams; integer
      // micro-nat sums for exact cross-engine parity
      (s, d) => TextAnalysis.bigramLogProb(t(s, d, "documents"))
        .filter(col("doc_id") < 200)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS w
          FROM documents),
        occ AS (
          SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram, w[i] AS w1
          FROM (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM toks WHERE len(w) >= 2)),
        tf AS (SELECT doc_id, bigram, COUNT(*) AS tf
               FROM occ GROUP BY 1, 2),
        bm AS (SELECT bigram, COUNT(*) AS big_cnt FROM occ GROUP BY 1),
        sm AS (SELECT w1, COUNT(*) AS start_cnt FROM occ GROUP BY 1),
        j AS (
          SELECT tf.doc_id, tf.tf,
            CAST(ROUND(-ln(CAST(big_cnt AS DOUBLE) / start_cnt) * 1e6, 0)
              AS BIGINT) AS nlp
          FROM tf JOIN bm USING (bigram)
          JOIN sm ON sm.w1 = string_split(tf.bigram, ' ')[1])
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
          ROUND(CAST(SUM(tf * nlp) AS DOUBLE) / SUM(tf) / 1e6, 6)
            AS avg_neg_logprob
        FROM j WHERE doc_id < 200
        GROUP BY doc_id ORDER BY doc_id""")),

    Q("x72_kneser_ney",
      // interpolated Kneser–Ney bigram scoring (the smoothing real
      // n-gram LMs use): absolute discount off every observed bigram,
      // freed mass re-spent on CONTINUATION unigrams — separates
      // word salad built from frequent words (x31's ML estimate
      // scores those well) from fluent text. Integer counts, one
      // identically-parenthesized double formula, micro-nat
      // quantization before the per-doc integer sums.
      (s, d) => TextAnalysis.kneserNeyLogProb(t(s, d, "documents"))
        .filter(col("doc_id") < 200)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS w
          FROM documents),
        occ AS (
          SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
          FROM (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM toks WHERE len(w) >= 2)),
        tf AS (SELECT doc_id, bigram, COUNT(*) AS tf
               FROM occ GROUP BY 1, 2),
        bm AS (SELECT bigram, COUNT(*) AS big_cnt FROM occ GROUP BY 1),
        sm AS (SELECT string_split(bigram, ' ')[1] AS w1,
            CAST(SUM(big_cnt) AS BIGINT) AS start_cnt
          FROM bm GROUP BY 1),
        types AS (SELECT bigram,
            string_split(bigram, ' ')[1] AS w1,
            string_split(bigram, ' ')[2] AS w2
          FROM bm),
        n1p AS (SELECT w1, COUNT(*) AS n1plus FROM types GROUP BY 1),
        cont AS (SELECT w2, COUNT(*) AS cont_cnt FROM types GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM types),
        j AS (SELECT tf.doc_id, tf.tf,
            CAST(ROUND(-ln(
              (GREATEST(CAST(bm.big_cnt AS DOUBLE) - 0.75, 0.0)
                / sm.start_cnt) +
              ((0.75 * n1p.n1plus) / sm.start_cnt) *
                (CAST(cont.cont_cnt AS DOUBLE) / tot.t)
            ) * 1e6, 0) AS BIGINT) AS nlp
          FROM tf JOIN bm USING (bigram)
          JOIN sm ON sm.w1 = string_split(tf.bigram, ' ')[1]
          JOIN n1p ON n1p.w1 = string_split(tf.bigram, ' ')[1]
          JOIN cont ON cont.w2 = string_split(tf.bigram, ' ')[2], tot)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
          ROUND(CAST(SUM(tf * nlp) AS DOUBLE) / SUM(tf) / 1e6, 6)
            AS avg_kn_neg_logprob
        FROM j WHERE doc_id < 200
        GROUP BY doc_id ORDER BY doc_id""")),

    Q("x73_vocab_growth",
      // vocabulary-growth curve over three ordered slices (Heaps'-law
      // empirics, the tokenizer-staleness signal): per slice — token
      // occurrences, distinct types, types FIRST seen there, and the
      // occurrence mass the new types carry. One (slice, token)
      // aggregation + a token-keyed min-slice join.
      (s, d) => {
        val docs = t(s, d, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val third = (maxId + 1L) / 3L
        TextAnalysis.vocabGrowth(
            docs.withColumn("slice_id",
              concat(lit("s"),
                least(col("doc_id") / third, lit(2L)).cast("long")
                  .cast("string"))),
            "slice_id")
          .orderBy("slice_id")
      },
      Some("""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        d AS (SELECT 's' || CAST(LEAST(doc_id // ((m + 1) // 3), 2)
            AS VARCHAR) AS slice_id, text
          FROM documents, mx),
        tok AS (SELECT slice_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0)) AS token
          FROM d),
        ps AS (SELECT slice_id, token, CAST(COUNT(*) AS BIGINT) AS occ
          FROM tok GROUP BY 1, 2),
        f AS (SELECT token, MIN(slice_id) AS first_slice
          FROM ps GROUP BY 1)
        SELECT ps.slice_id,
          CAST(SUM(ps.occ) AS BIGINT) AS n_occurrences,
          CAST(COUNT(*) AS BIGINT) AS n_types,
          CAST(SUM(CASE WHEN f.first_slice = ps.slice_id
            THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
          CAST(SUM(CASE WHEN f.first_slice = ps.slice_id
            THEN ps.occ ELSE 0 END) AS BIGINT) AS new_occ,
          CAST(ROUND(1e6 * SUM(CASE WHEN f.first_slice = ps.slice_id
            THEN ps.occ ELSE 0 END) / SUM(ps.occ), 0) AS BIGINT)
            AS new_occ_ppm
        FROM ps JOIN f USING (token)
        GROUP BY ps.slice_id ORDER BY ps.slice_id""")),

    Q("x75_zipf_fit",
      // Zipf power-law fit (the one-number corpus fingerprint:
      // natural text sits near slope −1; templated corpora drift
      // shallow, truncation artifacts steep): least-squares of
      // ln(freq) on ln(rank) over the top-100 tokens. The count pass
      // is the only corpus-bound stage; ln values quantize to micro
      // units before the integer moment sums, so both engines derive
      // slope and intercept from identical integers.
      (s, d) => TextAnalysis.zipfFit(t(s, d, "documents"), top = 100),
      Some("""WITH tok AS (
          SELECT unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0)) AS token
          FROM documents),
        freqs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok GROUP BY 1
          ORDER BY cnt DESC, token LIMIT 100),
        pts AS (SELECT
            CAST(ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC,
              token) AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
            CAST(ROUND(ln(CAST(cnt AS DOUBLE)) * 1e6, 0) AS BIGINT)
              AS y
          FROM freqs),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM pts)
        SELECT n AS n_points,
          ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
            AS zipf_slope,
          ROUND((sy - ((CAST(n AS DOUBLE) * sxy
              - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
              * sx) / n / 1e6, 6) AS ln_intercept
        FROM mm""")),

    Q("x76_overlap_matrix",
      // the full pairwise source-overlap matrix (the release audit
      // "which sources duplicate each other") from per-source KMV
      // sketches: one shingle pass builds all N sketches, every pair
      // estimates from the bottom-k of its sketch union — O(N·k)
      // sketch rows, never N² corpus passes. md5-deterministic, so
      // the oracle replays every estimate exactly (x48's contract,
      // matrix-wide). Pairs with zero sampled intersection are
      // dropped to keep the pinned result meaningful.
      (s, d) => Dedup.kmvOverlapMatrix(t(s, d, "documents"), k = 256)
        .filter(col("sample_inter") > 0)
        .orderBy("src_a", "src_b"),
      Some("""WITH toks AS (
          SELECT source AS src, string_split_regex(lower(trim(text)),
            '\s+') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT src, md5(s) AS h FROM (
            SELECT src, unnest(list_distinct(list_transform(
              range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
            FROM toks WHERE len(w) >= 3)),
        sk AS (SELECT src, h FROM (
            SELECT src, h, ROW_NUMBER() OVER (PARTITION BY src
              ORDER BY h) AS r FROM sh) WHERE r <= 256),
        srcs AS (SELECT DISTINCT src FROM sk),
        pairs AS (SELECT a.src AS src_a, b.src AS src_b
          FROM srcs a, srcs b WHERE a.src < b.src),
        u AS (
          SELECT p.src_a, p.src_b, s.h,
            MAX(CASE WHEN s.src = p.src_a THEN 1 ELSE 0 END) AS ia,
            MAX(CASE WHEN s.src = p.src_b THEN 1 ELSE 0 END) AS ib
          FROM pairs p JOIN sk s
            ON s.src = p.src_a OR s.src = p.src_b
          GROUP BY 1, 2, 3),
        ranked AS (SELECT src_a, src_b, ia, ib,
            ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h)
              AS r
          FROM u)
        SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS sample_k,
          CAST(SUM(ia * ib) AS BIGINT) AS sample_inter,
          ROUND(CAST(SUM(ia * ib) AS DOUBLE) / COUNT(*), 6)
            AS jaccard_est
        FROM ranked WHERE r <= 256
        GROUP BY 1, 2 HAVING SUM(ia * ib) > 0
        ORDER BY 1, 2""")),

    Q("x74_incremental_vocab",
      // x73's daily-ingest twin: the standing corpus (first third of
      // ids) signs ONCE into a persisted distinct-token store; each
      // later slice measures its new-type mass with one token-keyed
      // anti-join at O(slice) and appends only its new tokens — old
      // text never re-read, the store grows with the VOCABULARY.
      // Growth lanes must equal the from-scratch x73 math, which is
      // exactly what the oracle computes over the full corpus.
      (s, d) => {
        val docs = t(s, d, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val third = (maxId + 1L) / 3L
        val store = freshState(s, "x74") + "/vocab"
        TextAnalysis.vocabStoreCreate(
          docs.filter(col("doc_id") < third), store)
        val r1 = TextAnalysis.vocabStoreIngest(store,
          docs.filter(col("doc_id") >= third &&
            col("doc_id") < 2 * third), "s1")
        val r2 = TextAnalysis.vocabStoreIngest(store,
          docs.filter(col("doc_id") >= 2 * third), "s2")
        r1.unionByName(r2).orderBy("slice_id")
      },
      Some("""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        d AS (SELECT 's' || CAST(LEAST(doc_id // ((m + 1) // 3), 2)
            AS VARCHAR) AS slice_id, text
          FROM documents, mx),
        tok AS (SELECT slice_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0)) AS token
          FROM d),
        ps AS (SELECT slice_id, token, CAST(COUNT(*) AS BIGINT) AS occ
          FROM tok GROUP BY 1, 2),
        f AS (SELECT token, MIN(slice_id) AS first_slice
          FROM ps GROUP BY 1)
        SELECT ps.slice_id,
          CAST(SUM(ps.occ) AS BIGINT) AS n_occurrences,
          CAST(COUNT(*) AS BIGINT) AS n_types,
          CAST(SUM(CASE WHEN f.first_slice = ps.slice_id
            THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
          CAST(SUM(CASE WHEN f.first_slice = ps.slice_id
            THEN ps.occ ELSE 0 END) AS BIGINT) AS new_occ,
          CAST(ROUND(1e6 * SUM(CASE WHEN f.first_slice = ps.slice_id
            THEN ps.occ ELSE 0 END) / SUM(ps.occ), 0) AS BIGINT)
            AS new_occ_ppm
        FROM ps JOIN f USING (token)
        WHERE ps.slice_id IN ('s1', 's2')
        GROUP BY ps.slice_id ORDER BY ps.slice_id""")),

    Q("x12_tfidf_keywords",
      // TF-IDF keyword extraction: top-3 terms per doc, idf over the FULL
      // corpus (token-keyed partial aggs, vocab-sized join), output
      // restricted to the first 30 docs to keep the pinned result compact
      (s, d) => TextAnalysis.tfidfKeywords(t(s, d, "documents"), top = 3)
        .filter(col("doc_id") < 30)
        .orderBy("doc_id", "rk"),
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
          FROM tok GROUP BY 1, 2),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df
          FROM tok GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf,
            ROUND(ln(CAST(n.n AS DOUBLE) / df.df), 6) AS idf
          FROM tf JOIN df USING (token) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, token, ROUND(tf * idf, 6) AS tfidf,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tf * idf DESC, token) AS rk
          FROM scored)
        SELECT doc_id, CAST(rk AS INT) AS rk, token, tfidf
        FROM ranked WHERE rk <= 3 AND doc_id < 30
        ORDER BY doc_id, rk""")),

    Q("x36_bm25_topk",
      // BM25 lexical retrieval (the keyword side of a RAG/eval stack,
      // next to e02's ANN side): postings prune to the query terms
      // BEFORE df/scoring so everything past the corpus scan is
      // |terms|-bounded; per-term scores quantize to integer micro-
      // units before the per-doc sum (x13's discipline) so ranking is
      // engine-exact; ties break on doc_id
      (s, d) => TextAnalysis.bm25TopK(t(s, d, "documents"),
          Seq("spark", "merge", "vector"), k = 10)
        .orderBy("rank"),
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl),
        qtf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
          WHERE token IN ('spark', 'merge', 'vector') GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY 1),
        per_term AS (
          SELECT qtf.doc_id,
            CAST(ROUND(
              ln((CAST(stats.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
                * (qtf.tf * 2.2)
                / (qtf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                    / (CAST(stats.tl AS DOUBLE) / stats.n))))
                * 1e6, 0) AS BIGINT) AS micro
          FROM qtf JOIN df USING (token) JOIN dl USING (doc_id)
          CROSS JOIN stats),
        per_doc AS (
          SELECT doc_id, SUM(micro) AS score_micro,
            CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM per_term GROUP BY 1),
        ranked AS (
          SELECT doc_id, n_terms, score_micro,
            ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rank
          FROM per_doc)
        SELECT doc_id, CAST(rank AS INT) AS rank,
          ROUND(CAST(score_micro AS DOUBLE) / 1e6, 6) AS bm25, n_terms
        FROM ranked WHERE rank <= 10 ORDER BY rank""")),

    Q("x13_unigram_logprob",
      // CCNet-style unigram LM quality score: corpus unigram model in one
      // token-keyed agg, per-doc weighted average -ln p(token)
      (s, d) => TextAnalysis.unigramLogProb(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        tok AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
          FROM tok GROUP BY 1, 2),
        model AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
        tot AS (SELECT SUM(cnt) AS t FROM model)
        SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(tf.tf * CAST(ROUND(
              -ln(CAST(model.cnt AS DOUBLE) / tot.t) * 1e6, 0) AS BIGINT))
            AS DOUBLE) / SUM(tf.tf) / 1e6, 6) AS avg_neg_logprob
        FROM tf JOIN model USING (token) CROSS JOIN tot
        GROUP BY tf.doc_id ORDER BY tf.doc_id""")),

    Q("x14_pii_scan",
      // PII detect + redact; the sf corpus carries no real PII, so
      // deterministic fixtures are injected from doc_id the same way on
      // both engines (the p21 recipe); redacted_md5 pins the exact
      // redaction output without carrying text through the result
      (s, d) => {
        val id = col("doc_id")
        val inj = concat(
          col("text"),
          when(id % 3 === 0, concat(lit(" contact user"),
            id.cast("string"), lit("@example.com"))).otherwise(""),
          when(id % 5 === 0, concat(lit(" call (415) 555-"),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(""),
          when(id % 7 === 0, concat(lit(" from 10."),
            (id % 200).cast("string"), lit("."),
            (id % 250).cast("string"), lit("."),
            (id % 100).cast("string"))).otherwise(""),
          when(id % 11 === 0, concat(lit(" ssn 123-45-"),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(""))
        Pii.piiScan(t(s, d, "documents").withColumn("text", inj))
          .orderBy("doc_id")
      },
      Some("""WITH injected AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 5 = 0
                 THEN ' call (415) 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.' || (doc_id % 200) || '.'
                   || (doc_id % 250) || '.' || (doc_id % 100) ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                 THEN ' ssn 123-45-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
            AS n_email,
          CAST(len(regexp_extract_all(t,
            '\([0-9]{3}\) [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
          CAST(len(regexp_extract_all(t,
            '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
          CAST(len(regexp_extract_all(t,
            '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn,
          md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\([0-9]{3}\) [0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
            '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
            '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g')) AS redacted_md5
        FROM injected ORDER BY doc_id""")),

    Q("x15_quality_filter",
      // Gopher-style keep/drop verdicts: explicit per-rule booleans (as
      // 0/1 ints for comparator safety) + the composed keep flag
      (s, d) => TextAnalysis.gopherFilter(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some(duckGopherFilterSql)),

    Q("x04_fingerprint",
      // hash-replay oracle: the Karp–Rabin family is not SQL-portable,
      // but the winnowing SELECTION is — Spark persists the
      // per-position hash stream and DuckDB replays the non-overlapping
      // 16-wide window minima + xor fold (short docs: one min over all,
      // the same contract winnowedMins applies)
      (s, d) => {
        val docs = t(s, d, "documents")
        TextAnalysis.fingerprintHashes(docs).write.mode("overwrite")
          .parquet(freshState(s, "x04") + "/hashes")
        TextAnalysis.fingerprint(docs)
          .select("doc_id", "fingerprint")
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x04/hashes/*.parquet')),
        n AS (SELECT doc_id, COUNT(*) AS len FROM h GROUP BY 1),
        mins AS (
          SELECT h.doc_id,
            CASE WHEN n.len < 16 THEN 0 ELSE pos // 16 END AS w,
            MIN(hash) AS m
          FROM h JOIN n ON h.doc_id = n.doc_id
          WHERE n.len < 16 OR (pos // 16) * 16 <= n.len - 16
          GROUP BY 1, 2)
        SELECT doc_id, CAST(bit_xor(m) AS BIGINT) AS fingerprint
        FROM mins GROUP BY doc_id ORDER BY doc_id""")),

    Q("x80_substring_spans",
      // exact substring-SPAN dedup (span-grain, not doc-grain): the
      // character ranges of each doc that occur verbatim in >=1 OTHER
      // doc, as the union of shared 40-char rolling-hash windows —
      // whole-doc dedup misses a unique article embedding a copied
      // paragraph; this reports the paragraph. Karp–Rabin gram stream
      // persists (the x04 replay shape) and DuckDB replays the
      // 2..maxDf df cap, the interval union window chain and the
      // min-span cut.
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "x80") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        // span pass reads the stream it just signed — the hashing UDF
        // runs once, and this IS the persisted-signature scale shape
        Dedup.substringSpansFromGrams(s.read.parquet(gramsPath))
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x80/grams/*.parquet')),
        dfok AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
          WHERE df BETWEEN 2 AND 1000),
        sh AS (SELECT g.doc_id, g.pos FROM g JOIN dfok USING (hash)),
        fl AS (SELECT doc_id, pos,
            MAX(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS cummax
          FROM sh),
        isl AS (SELECT doc_id, pos,
            SUM(CASE WHEN cummax IS NULL OR pos > cummax
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
          FROM fl),
        sp AS (SELECT doc_id,
            CAST(MIN(pos) AS BIGINT) AS span_start,
            CAST(MAX(pos) + 40 AS BIGINT) AS span_end,
            CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM isl GROUP BY doc_id, span_id)
        SELECT doc_id, span_start, span_end,
          span_end - span_start AS span_len, n_grams
        FROM sp WHERE span_end - span_start >= 60
        ORDER BY doc_id, span_start""")),

    Q("x81_duplicated_mass",
      // per-source duplicated-text mass (the curation dashboard
      // number "which of my sources is mostly copies"): covered
      // chars = sum of x80's disjoint spans, over the source's total
      // normalized chars, ppm-quantized. Same persisted gram stream,
      // whole rollup replayed.
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "x81") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        Dedup.duplicatedMassFromSpans(docs,
            Dedup.substringSpansFromGrams(s.read.parquet(gramsPath)))
          .orderBy("source")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x81/grams/*.parquet')),
        dfok AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
          WHERE df BETWEEN 2 AND 1000),
        sh AS (SELECT g.doc_id, g.pos FROM g JOIN dfok USING (hash)),
        fl AS (SELECT doc_id, pos,
            MAX(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS cummax
          FROM sh),
        isl AS (SELECT doc_id, pos,
            SUM(CASE WHEN cummax IS NULL OR pos > cummax
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
          FROM fl),
        sp AS (SELECT doc_id,
            CAST(MAX(pos) + 40 - MIN(pos) AS BIGINT) AS span_len
          FROM isl GROUP BY doc_id, span_id),
        perdoc AS (SELECT doc_id,
            CAST(SUM(span_len) AS BIGINT) AS covered
          FROM sp WHERE span_len >= 60 GROUP BY doc_id),
        base AS (SELECT d.doc_id, d.source,
            CAST(length(regexp_replace(lower(d.text), '\s+', ' ', 'g'))
              AS BIGINT) AS n_norm,
            p.covered
          FROM documents d LEFT JOIN perdoc p USING (doc_id))
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(covered) AS BIGINT) AS n_docs_with_spans,
          CAST(COALESCE(SUM(covered), 0) AS BIGINT) AS covered_chars,
          CAST(SUM(n_norm) AS BIGINT) AS total_chars,
          CAST(ROUND(1e6 * COALESCE(SUM(covered), 0) / SUM(n_norm), 0)
            AS BIGINT) AS dup_mass_ppm
        FROM base GROUP BY source ORDER BY source""")),

    Q("x82_span_removal",
      // the APPLY step of exact substring dedup: cut x80's shared
      // spans out of the normalized text and emit the surgery
      // manifest for EVERY doc (span-free docs pass through, zero
      // counts) — cleaned md5/length pin the reassembly char-exact.
      // Same persisted gram stream; DuckDB replays spans AND the
      // string surgery.
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "x82") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        Dedup.removeSpans(docs,
            Dedup.substringSpansFromGrams(s.read.parquet(gramsPath)))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x82/grams/*.parquet')),
        dfok AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
          WHERE df BETWEEN 2 AND 1000),
        sh AS (SELECT g.doc_id, g.pos FROM g JOIN dfok USING (hash)),
        fl AS (SELECT doc_id, pos,
            MAX(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS cummax
          FROM sh),
        isl AS (SELECT doc_id, pos,
            SUM(CASE WHEN cummax IS NULL OR pos > cummax
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
          FROM fl),
        sp AS (SELECT doc_id,
            CAST(MIN(pos) AS BIGINT) AS span_start,
            CAST(MAX(pos) + 40 AS BIGINT) AS span_end
          FROM isl GROUP BY doc_id, span_id),
        spf AS (SELECT * FROM sp WHERE span_end - span_start >= 60),
        nrm AS (SELECT doc_id,
            regexp_replace(lower(text), '\s+', ' ', 'g') AS t
          FROM documents),
        pre AS (SELECT doc_id,
            COALESCE(LAG(span_end) OVER (PARTITION BY doc_id
              ORDER BY span_start), 0) AS seg_start,
            span_start AS seg_end
          FROM spf),
        pd AS (SELECT doc_id, MAX(span_end) AS tail_start,
            CAST(SUM(span_end - span_start) AS BIGINT)
              AS removed_chars,
            CAST(COUNT(*) AS BIGINT) AS n_spans
          FROM spf GROUP BY doc_id),
        tl AS (SELECT p.doc_id, p.tail_start AS seg_start,
            CAST(length(n.t) AS BIGINT) AS seg_end
          FROM pd p JOIN nrm n USING (doc_id)),
        segs AS (SELECT * FROM pre UNION ALL SELECT * FROM tl),
        reb AS (SELECT s.doc_id,
            string_agg(substring(n.t, CAST(s.seg_start + 1 AS INT),
              CAST(s.seg_end - s.seg_start AS INT)), ''
              ORDER BY s.seg_start) AS cleaned
          FROM segs s JOIN nrm n USING (doc_id) GROUP BY s.doc_id)
        SELECT n.doc_id,
          COALESCE(pd.n_spans, 0) AS n_spans_removed,
          COALESCE(pd.removed_chars, 0) AS removed_chars,
          CAST(length(COALESCE(reb.cleaned, n.t)) AS BIGINT)
            AS cleaned_len,
          md5(COALESCE(reb.cleaned, n.t)) AS cleaned_md5
        FROM nrm n LEFT JOIN reb USING (doc_id)
          LEFT JOIN pd USING (doc_id)
        ORDER BY n.doc_id""")),

    Q("x83_contamination_spans",
      // span-grain eval decontamination: every 50th doc plays the
      // benchmark (their duplicate-family twins stay in the corpus,
      // so leaked spans EXIST at every SF — the doc<10 fixture went
      // empty at sf0.1), and every corpus doc reports the exact
      // character ranges it shares verbatim with the bench —
      // presence in the bench hash set qualifies (minDf=1), corpus
      // df > 1000 is boilerplate and drops. One dumped gram stream;
      // DuckDB replays the split, the broadcast-shaped hash match,
      // and the interval union.
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "x83") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        val g = s.read.parquet(gramsPath)
        Dedup.contaminationSpansFromGrams(
            g.filter(col("doc_id") % 50 =!= 0),
            g.filter(col("doc_id") % 50 === 0))
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x83/grams/*.parquet')),
        bh AS (SELECT DISTINCT hash FROM g WHERE doc_id % 50 = 0),
        hits AS (SELECT g.doc_id, g.pos, g.hash
          FROM g JOIN bh USING (hash) WHERE g.doc_id % 50 <> 0),
        dfok AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT doc_id) AS df
            FROM hits GROUP BY 1)
          WHERE df <= 1000),
        sh AS (SELECT h.doc_id, h.pos FROM hits h JOIN dfok USING (hash)),
        fl AS (SELECT doc_id, pos,
            MAX(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS cummax
          FROM sh),
        isl AS (SELECT doc_id, pos,
            SUM(CASE WHEN cummax IS NULL OR pos > cummax
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
          FROM fl),
        sp AS (SELECT doc_id,
            CAST(MIN(pos) AS BIGINT) AS span_start,
            CAST(MAX(pos) + 40 AS BIGINT) AS span_end,
            CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM isl GROUP BY doc_id, span_id)
        SELECT doc_id, span_start, span_end,
          span_end - span_start AS span_len, n_grams
        FROM sp WHERE span_end - span_start >= 60
        ORDER BY doc_id, span_start""")),

    Q("x84_contamination_attribution",
      // the leak-investigation report: WHICH benchmark doc leaked
      // into which corpus doc — (corpus, bench) pairs by shared
      // verbatim windows, both sides df-capped, bench side broadcast.
      // Same every-50th-doc fixture and gram dump as x83.
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "x84") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        val g = s.read.parquet(gramsPath)
        Dedup.contaminationAttribution(
            g.filter(col("doc_id") % 50 =!= 0),
            g.filter(col("doc_id") % 50 === 0))
          .orderBy("doc_id", "bench_id")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x84/grams/*.parquet')),
        c AS (SELECT doc_id, pos, hash FROM g WHERE doc_id % 50 <> 0),
        b0 AS (SELECT DISTINCT doc_id AS bench_id, hash
          FROM g WHERE doc_id % 50 = 0),
        cdf AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT doc_id) AS df
            FROM c GROUP BY 1) WHERE df <= 1000),
        bdf AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT bench_id) AS df
            FROM b0 GROUP BY 1) WHERE df <= 1000),
        hits AS (SELECT c.doc_id, c.pos, b0.bench_id
          FROM c JOIN cdf USING (hash) JOIN bdf USING (hash)
          JOIN b0 USING (hash))
        SELECT doc_id, bench_id,
          CAST(COUNT(*) AS BIGINT) AS n_grams,
          CAST(MIN(pos) AS BIGINT) AS first_pos,
          CAST(MAX(pos) + 40 AS BIGINT) AS last_end
        FROM hits GROUP BY doc_id, bench_id
        HAVING COUNT(*) >= 3
        ORDER BY doc_id, bench_id""")),

    Q("x85_sampled_spans",
      // the span family's 100 TB knob: content-defined 1/8 sampling
      // of the SAME gram stream (hash ≡ 0 mod 8 — position-free, so
      // sampled windows align across docs), union gap 4·8 bridges
      // sampling gaps inside one region. The oracle replays the
      // sampling arithmetic, the widened union and the real-extent
      // span bounds.
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "x85") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        Dedup.substringSpansSampled(s.read.parquet(gramsPath),
            sampleMod = 8)
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/x85/grams/*.parquet')
          WHERE ((hash % 8) + 8) % 8 = 0),
        dfok AS (SELECT hash FROM (
            SELECT hash, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
          WHERE df BETWEEN 2 AND 1000),
        sh AS (SELECT g.doc_id, g.pos FROM g JOIN dfok USING (hash)),
        fl AS (SELECT doc_id, pos,
            MAX(pos + 72) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS cummax
          FROM sh),
        isl AS (SELECT doc_id, pos,
            SUM(CASE WHEN cummax IS NULL OR pos > cummax
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
          FROM fl),
        sp AS (SELECT doc_id,
            CAST(MIN(pos) AS BIGINT) AS span_start,
            CAST(MAX(pos) + 40 AS BIGINT) AS span_end,
            CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM isl GROUP BY doc_id, span_id)
        SELECT doc_id, span_start, span_end,
          span_end - span_start AS span_len, n_grams
        FROM sp WHERE span_end - span_start >= 60
        ORDER BY doc_id, span_start""")),

    Q("e23_embedding_outliers",
      // embedding-space outlier pruning: nearest-of-8-fixed-centroids
      // cells (the e07 deterministic assignment DuckDB replays
      // exactly) + bottom-10%-of-cell flag by ppm-quantized
      // cosine-to-centroid — the cheap map-side gate that runs BEFORE
      // SemDeDup's within-cell quadratic pass.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cents = emb.filter(col("vec_id") < 8).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          .map { v =>
            val n = math.sqrt(v.map(x => x * x).sum)
            if (n == 0) v else v.map(_ / n)
          }
        Similarity.embeddingOutliers(emb, cents)
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        c AS (
          SELECT vec_id AS cid,
            list_transform(embedding, x -> CAST(x AS DOUBLE) /
              SQRT(list_sum(list_transform(embedding,
                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS cv
          FROM e WHERE vec_id < 8),
        dots AS (
          SELECT e.vec_id, c.cid,
            list_sum(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i])) AS dt
          FROM e CROSS JOIN c),
        assign AS (
          SELECT vec_id, cid AS cell, dt FROM (
            SELECT vec_id, cid, dt,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dt DESC, cid) AS rk
            FROM dots) WHERE rk = 1),
        normed AS (
          SELECT a.vec_id, a.cell,
            CASE WHEN n.nrm = 0 THEN 0.0 ELSE a.dt / n.nrm END AS cosv
          FROM assign a JOIN (
            SELECT vec_id, SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM e) n USING (vec_id)),
        wr AS (
          SELECT vec_id, cell, cosv,
            ROW_NUMBER() OVER (PARTITION BY cell
              ORDER BY CAST(ROUND(cosv * 1e6, 0) AS BIGINT), vec_id)
              AS cell_rank,
            COUNT(*) OVER (PARTITION BY cell) AS n
          FROM normed)
        SELECT vec_id, CAST(cell AS INT) AS cell,
          ROUND(cosv, 6) AS cos_centroid,
          CAST(cell_rank AS INT) AS cell_rank,
          cell_rank <= CAST(FLOOR(n * 100000 / 1000000.0) AS BIGINT)
            AS is_outlier
        FROM wr ORDER BY vec_id""")))

  /** DuckDB mirror of Catalog.keyIntegrity — every check rebuilt in SQL
   *  from the SAME declared sidecar keys, so the constants can't drift
   *  between engine and oracle. */
  private lazy val duckKeyIntegritySql: String = {
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
  private lazy val duckCorrelationsSql: String = {
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
  private lazy val duckGopherFilterSql: String = {
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
  private val sloOracleSql: String = """WITH h AS (
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

  private lazy val duckMmrSql: String = {
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

  private lazy val duckTextProfileSql: String = {
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

  private def sourceQueries: Seq[Q] = Seq(
    Q("p41_mergeable_hll",
      // the HLL leg of the mergeable slice-state family (p37 quantile
      // sketches, p38 heavy hitters, x48 KMV, x64 samples): three
      // disjoint lineitem slices each persist ONE DataSketches HLL
      // sketch per column; the any-range distinct answer is a
      // lossless sketch union over states — no rescan. Emitted: the
      // EXACT distinct twin (which the oracle recomputes) and a
      // tolerance verdict the oracle pins TRUE — a broken sketch or a
      // lossy merge hash-mismatches. 3σ at lgK=12 ≈ 5%.
      (s, d) => {
        import graft.profiler.HllStates
        val li = t(s, d, "lineitem")
        val state = freshState(s, "p41") + "/states"
        (0 to 2).foreach { i =>
          HllStates.sliceState(li.filter(col("l_orderkey") % 3 === i),
              Seq("l_orderkey", "l_partkey"), s"slice$i")
            .coalesce(1).write.mode("append").parquet(state)
        }
        val merged = HllStates.mergedDistinct(s.read.parquet(state))
        val exact = broadcast(li.agg(
          countDistinct(col("l_orderkey")).as("__e_ok"),
          countDistinct(col("l_partkey")).as("__e_pk")))
        merged.crossJoin(exact)
          .withColumn("exact_distinct",
            when(col("column") === "l_orderkey", col("__e_ok"))
              .otherwise(col("__e_pk")))
          .select(col("column"), col("exact_distinct"),
            (abs(col("approx_distinct").cast("double") -
              col("exact_distinct").cast("double")) <=
              greatest(col("exact_distinct").cast("double") * 0.05,
                lit(10.0))).as("merged_within_tol"))
          .orderBy("column")
      },
      Some("""SELECT 'l_orderkey' AS "column",
          CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
          TRUE AS merged_within_tol FROM lineitem
        UNION ALL SELECT 'l_partkey',
          CAST(COUNT(DISTINCT l_partkey) AS BIGINT), TRUE FROM lineitem
        ORDER BY "column"""")),

    Q("p42_mergeable_cms",
      // the count-min leg of the mergeable slice-state family: three
      // disjoint lineitem slices each persist a sparse (row, cell,
      // cnt) grid of EXACT cell counts; states merge by cell-wise
      // ADDITION and a point frequency is the min over the value's d
      // cells. xxhash64 has no SQL mirror, so the state and the probe
      // positions persist and the oracle replays everything
      // downstream of the hash: the merge, every min-estimate, the
      // exact twin, and the CMS bound (exact ≤ est ≤ exact + ⌈e·N/w⌉)
      // pinned TRUE.
      (s, d) => {
        import graft.profiler.CountMin
        val li = t(s, d, "lineitem")
        val state = freshState(s, "p42")
        (0 to 2).foreach { i =>
          CountMin.sliceState(li.filter(col("l_orderkey") % 3 === i),
              "l_partkey", s"slice$i")
            .coalesce(1).write.mode("append")
            .parquet(state + "/states")
        }
        val merged = CountMin.merge(s.read.parquet(state + "/states"))
        merged.coalesce(1).write.mode("overwrite")
          .parquet(state + "/merged")
        val queries = li.select(col("l_partkey").as("value"))
          .filter(col("value") <= 20).distinct()
        CountMin.probePositions(queries).coalesce(1)
          .write.mode("overwrite").parquet(state + "/probes")
        val est = CountMin.estimate(
          s.read.parquet(state + "/merged"), queries)
        val exact = li.filter(col("l_partkey") <= 20)
          .groupBy(col("l_partkey").as("value"))
          .agg(count(lit(1)).as("exact_count"))
        val n = li.count()
        val bound = math.ceil(math.E * n / 256.0).toLong
        est.join(exact, Seq("value"))
          .select(col("value"), col("est_count"), col("exact_count"),
            (col("est_count") >= col("exact_count") &&
              col("est_count") <= col("exact_count") + bound)
              .as("within_bound"))
          .orderBy("value")
      },
      Some("""WITH st AS (SELECT row, cell, cnt FROM read_parquet(
            '/tmp/graft_qstate/p42/merged/*.parquet')),
        probes AS (SELECT value, row, cell FROM read_parquet(
            '/tmp/graft_qstate/p42/probes/*.parquet')),
        est AS (SELECT p.value,
            CAST(MIN(COALESCE(st.cnt, 0)) AS BIGINT) AS est_count
          FROM probes p LEFT JOIN st USING (row, cell) GROUP BY 1),
        ex AS (SELECT l_partkey AS value,
            CAST(COUNT(*) AS BIGINT) AS exact_count
          FROM lineitem WHERE l_partkey <= 20 GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM lineitem)
        SELECT e.value, est.est_count, e.exact_count,
          (est.est_count >= e.exact_count AND
           est.est_count <= e.exact_count +
             CAST(CEIL(2.718281828459045 * n.n / 256.0) AS BIGINT))
            AS within_bound
        FROM ex e JOIN est USING (value), n ORDER BY e.value""")),

    Q("p44_key_skew",
      // shuffle-key skew audit: the pre-flight check before a groupBy/
      // join key is trusted at cluster scale. documents.lang is the
      // corpus's genuinely skewed key (en carries ~2x the average
      // language's rows), so the advisory is non-vacuous: salt 2-3 for
      // en, 1 for the rest. Integer ppm/ceiling arithmetic — the
      // advisory is engine-exact, not a float estimate.
      (s, d) => graft.operators.SkewAudit.keySkew(
        t(s, d, "documents"), Seq("lang"), topK = 10),
      Some("""WITH counts AS (SELECT lang,
            CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM documents GROUP BY lang),
        g AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
            CAST(COUNT(*) AS BIGINT) AS nk FROM counts)
        SELECT lang, n_rows,
          CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm,
          CAST(GREATEST(1, (n_rows * nk + total - 1) // total)
            AS BIGINT) AS salt_suggested
        FROM counts, g ORDER BY n_rows DESC, lang LIMIT 10""")),

    Q("p45_robust_stats",
      // outlier-robust location stats (5% winsorized + trimmed mean):
      // the profile number to trust when a column carries fat tails or
      // sensor garbage that poisons the plain mean. Quantile bounds are
      // rounded to 6 dp BEFORE clamping (p08 proves 6-dp quantile
      // parity) so the boundary row set is engine-exact; means are
      // exact decimal(28,6) sums over a clamped projection (the p05
      // order-independence discipline) — one quantile pass + one
      // clamped agg pass, both scan-bound
      (s, d) => {
        val li = t(s, d, "lineitem")
        val q = li.agg(
          round(expr("percentile(l_extendedprice, 0.05)"), 6).as("__q05"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("__q95"))
        val x = col("l_extendedprice")
        val inb = x.between(col("__q05"), col("__q95"))
        li.crossJoin(broadcast(q)).agg(
          min(col("__q05")).as("p05"),
          min(col("__q95")).as("p95"),
          (sum(greatest(least(x, col("__q95")), col("__q05"))
            .cast("decimal(28,6)")).cast("double") / count(lit(1)))
            .as("winsor_mean"),
          (sum(when(inb, x.cast("decimal(28,6)"))).cast("double") /
            sum(when(inb, 1L).otherwise(0L))).as("trimmed_mean"),
          coalesce(sum(when(!inb, 1L).otherwise(0L)), lit(0L))
            .as("n_clamped"))
      },
      Some("""WITH q AS (SELECT
            ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS q05,
            ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS q95
          FROM lineitem)
        SELECT MIN(q05) AS p05, MIN(q95) AS p95,
          CAST(SUM(CAST(GREATEST(LEAST(l_extendedprice, q95), q05)
              AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS winsor_mean,
          CAST(SUM(CASE WHEN l_extendedprice BETWEEN q05 AND q95
              THEN CAST(l_extendedprice AS DECIMAL(28,6)) END) AS DOUBLE)
            / SUM(CASE WHEN l_extendedprice BETWEEN q05 AND q95
              THEN 1 ELSE 0 END) AS trimmed_mean,
          CAST(SUM(CASE WHEN NOT (l_extendedprice BETWEEN q05 AND q95)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
        FROM lineitem, q""")),

    Q("p46_fd_discovery",
      // pairwise FD discovery sweep (x34 checks a NAMED dependency;
      // this proposes them): one agg pass, |cols|^2 exact distinct
      // counts via null-as-group structs, A->B holds iff
      // |distinct A| = |distinct (A,B)|, near-FD strength in ppm
      (s, d) => Profiler.fdDiscovery(t(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"))
        .orderBy("determinant", "dependent"),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority")
        val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
        val dSel = cols.map(c =>
          s"""(SELECT CAST(COUNT(*) AS BIGINT)
             |   FROM (SELECT DISTINCT $c FROM orders)) AS d_$c"""
            .stripMargin)
        val pSel = pairs.map { case (a, b) =>
          s"""(SELECT CAST(COUNT(*) AS BIGINT)
             |   FROM (SELECT DISTINCT $a, $b FROM orders)) AS p_${a}__$b"""
            .stripMargin
        }
        val rows = pairs.map { case (a, b) =>
          s"""SELECT '$a' AS determinant, '$b' AS dependent,
             |  d_$a AS n_det, p_${a}__$b AS n_pairs,
             |  p_${a}__$b = d_$a AS holds,
             |  (p_${a}__$b - d_$a) * 1000000 // d_$a AS violation_ppm
             |FROM d""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH d AS (SELECT
           |${(dSel ++ pSel).mkString(",\n")})
           |$rows
           |ORDER BY determinant, dependent""".stripMargin
      }),

    Q("p43_benford",
      // Benford first-significant-digit audit (fabricated-data /
      // broken-generator detector for multi-magnitude numerics): one
      // map-only first-digit projection + a 9-row-per-column groupBy,
      // scan-bound at any scale. Digits come from the DECIMAL → string
      // rendering (never float log10, which flaps at power-of-ten
      // boundaries); expected masses are the PINNED published 6-dp
      // table; chi-square parts self-multiply (libm pow need not be
      // bit-identical across engines).
      (s, d) => graft.profiler.Benford.digitProfile(
          t(s, d, "lineitem"), Seq("l_extendedprice", "l_quantity"))
        .select(col("column").as("column_name"), col("digit"), col("n"),
          col("obs_freq"), col("exp_freq"), col("chi2_part"))
        .orderBy("column_name", "digit"),
      Some("""WITH vals AS (
          SELECT 'l_extendedprice' AS column_name,
            regexp_extract(CAST(l_extendedprice AS VARCHAR), '[1-9]') AS fd
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity',
            regexp_extract(CAST(l_quantity AS VARCHAR), '[1-9]')
          FROM lineitem),
        counts AS (SELECT column_name, CAST(fd AS INT) AS digit,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM vals WHERE fd <> '' GROUP BY 1, 2),
        tot AS (SELECT column_name, SUM(n) AS total FROM counts GROUP BY 1),
        expt AS (SELECT * FROM (VALUES (1, 0.301030), (2, 0.176091),
          (3, 0.124939), (4, 0.096910), (5, 0.079181), (6, 0.066947),
          (7, 0.057992), (8, 0.051153), (9, 0.045757)) AS t(digit, ef))
        SELECT c.column_name, c.digit, c.n,
          ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS obs_freq,
          ROUND(CAST(e.ef AS DOUBLE), 6) AS exp_freq,
          ROUND((CAST(c.n AS DOUBLE) - e.ef * t.total) *
                (CAST(c.n AS DOUBLE) - e.ef * t.total) /
                (e.ef * t.total), 6) AS chi2_part
        FROM counts c JOIN tot t USING (column_name)
        JOIN expt e USING (digit)
        ORDER BY column_name, digit""")),

    Q("p48_nullity_correlation",
      // which columns go null TOGETHER (the missingno-matrix
      // question): observed both-null vs independence as lift + the
      // null-set Jaccard. The corpus ships null-free, so correlated
      // nullity is INJECTED (props-null ⊂ user_id-null — one upstream
      // cause; value-null independent) and the sweep must read the
      // structure back: lift >> 1 and jaccard > 0 for the coupled
      // pair, lift ~ 1 for the independent ones. One agg pass,
      // schema-bounded, exploded to pair rows — the p46 shape.
      (s, d) => {
        val ev = eventsTable(s, d)
          .withColumn("user_id",
            when(pmod(col("event_id"), lit(7)) < 2, lit(null))
              .otherwise(col("user_id")))
          .withColumn("props",
            when(pmod(col("event_id"), lit(7)) < 1, lit(null))
              .otherwise(col("props")))
          .withColumn("value",
            when(pmod(col("event_id"), lit(5)) === 0, lit(null))
              .otherwise(col("value")))
        Profiler.nullityCorrelation(ev, Seq("props", "user_id", "value"))
          .orderBy("col_a", "col_b")
      },
      Some("""WITH e AS (SELECT
            CASE WHEN event_id % 7 < 2 THEN NULL ELSE user_id END
              AS user_id,
            CASE WHEN event_id % 7 < 1 THEN NULL ELSE props END AS props,
            CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value
          FROM events),
        a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS na_props,
            CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS na_user,
            CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS na_value,
            CAST(SUM(CASE WHEN props IS NULL AND user_id IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nb_pu,
            CAST(SUM(CASE WHEN props IS NULL AND value IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nb_pv,
            CAST(SUM(CASE WHEN user_id IS NULL AND value IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nb_uv
          FROM e),
        rows_ AS (
          SELECT 'props' AS col_a, 'user_id' AS col_b, n_rows,
            na_props AS null_a, na_user AS null_b, nb_pu AS null_both
          FROM a
          UNION ALL
          SELECT 'props', 'value', n_rows, na_props, na_value, nb_pv
          FROM a
          UNION ALL
          SELECT 'user_id', 'value', n_rows, na_user, na_value, nb_uv
          FROM a)
        SELECT col_a, col_b, n_rows, null_a, null_b, null_both,
          ROUND(CAST(null_a AS DOUBLE) * null_b / n_rows, 6)
            AS expected_both,
          CASE WHEN null_a > 0 AND null_b > 0
            THEN ROUND(CAST(null_both AS DOUBLE) * n_rows
              / (null_a * null_b), 6) END AS lift,
          CASE WHEN null_a + null_b - null_both > 0
            THEN ROUND(CAST(null_both AS DOUBLE)
              / (null_a + null_b - null_both), 6)
            ELSE CAST(0.0 AS DOUBLE) END AS null_jaccard
        FROM rows_ ORDER BY col_a, col_b""")),

    Q("s20_bucketed_join",
      // bucketed co-located join — THE shuffle-elimination lane for a
      // fact table joined repeatedly on the same key at 100 TB: write
      // lineitem and orders bucketed (and sorted) by the order key,
      // and the join plans with ZERO exchanges on either side (the
      // bucketed scans are already hash-distributed AND sorted — the
      // sort-merge join consumes them in place; Round14bSpec pins the
      // no-Exchange, no-Sort plan shape). Every subsequent same-key
      // join/aggregation over these tables inherits the free
      // co-location — the amortized win bucketing exists for. The
      // oracle computes the same rollup from the raw parquet: results
      // must be layout-independent.
      (s, d) => {
        val state = freshState(s, "s20")
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_orderpriority")
        li.write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", state + "/li")
          .saveAsTable("graft_s20_li")
        ord.write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", state + "/ord")
          .saveAsTable("graft_s20_ord")
        // merge hint: at fixture scale the planner would BROADCAST the
        // orders side (correct for 8 MB, but it disables bucketed
        // reads); the strategy under test is the one a 100 TB join
        // has no choice about — sort-merge over co-bucketed scans
        s.table("graft_s20_li").hint("merge")
          .join(s.table("graft_s20_ord"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(28,6)"))
              .cast("double").as("sum_qty"),
            round(sum(col("l_extendedprice").cast("decimal(28,6)"))
              .cast("double"), 2).as("sum_price"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
          CAST(COUNT(*) AS BIGINT) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
            AS sum_qty,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
            AS DOUBLE), 2) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    Q("s21_rowgroup_audit",
      // parquet layout-health audit from FOOTERS alone (the before-
      // anything-else tool on a 100 TB lake): per-column value/null
      // counts and compressed/uncompressed bytes per row-group chunk,
      // read at O(files) footer cost with zero data-page IO. The
      // engine writes documents to state (2 files) and audits its OWN
      // output; the oracle reads the SAME footers through DuckDB's
      // independent parquet_metadata() — a disagreement means one
      // side is misreading the format, the strongest parity check a
      // metadata path can get.
      (s, d) => {
        val state = freshState(s, "s21")
        t(s, d, "documents").coalesce(2).write
          .parquet(state + "/data")
        graft.sources.ParquetAudit.rowGroupChunks(s, state + "/data")
          .groupBy("column_name")
          .agg(count(lit(1)).as("n_chunks"),
            sum("num_values").as("n_values"),
            sum("null_count").as("n_nulls"),
            sum("compressed_bytes").as("compressed_bytes"),
            sum("uncompressed_bytes").as("uncompressed_bytes"))
          .withColumn("compression_ratio",
            round(col("uncompressed_bytes").cast("double")
              / col("compressed_bytes"), 6))
          .orderBy("column_name")
      },
      Some("""SELECT path_in_schema AS column_name,
          CAST(COUNT(*) AS BIGINT) AS n_chunks,
          CAST(SUM(num_values) AS BIGINT) AS n_values,
          CAST(SUM(stats_null_count) AS BIGINT) AS n_nulls,
          CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
          CAST(SUM(total_uncompressed_size) AS BIGINT)
            AS uncompressed_bytes,
          ROUND(CAST(SUM(total_uncompressed_size) AS DOUBLE)
            / SUM(total_compressed_size), 6) AS compression_ratio
        FROM parquet_metadata('/tmp/graft_qstate/s21/data/*.parquet')
        GROUP BY 1 ORDER BY 1""")),

    Q("s22_rowgroup_audit_partitioned",
      // s21's partitioned twin — lakes PARTITION, so the footer audit
      // must recurse (fs.listFiles(recursive)) and attribute chunks to
      // their partition. The engine writes documents lang-partitioned
      // (Spark leaves the partition column OUT of the data files —
      // only the path carries it), audits its own tree, and both sides
      // recover the partition from their own file paths; the oracle
      // reads the SAME footers through DuckDB's parquet_metadata()
      // over a two-level glob. Physical columns per file are the four
      // non-partition ones — a partition column leaking INTO the files
      // (or a partition dir skipped by the listing) breaks parity.
      (s, d) => {
        val state = freshState(s, "s22")
        t(s, d, "documents").repartition(col("lang")).write
          .partitionBy("lang").parquet(state + "/data")
        graft.sources.ParquetAudit.rowGroupChunks(s, state + "/data")
          .withColumn("lang",
            regexp_extract(col("file_name"), "lang=([^/]+)", 1))
          .groupBy("lang", "column_name")
          .agg(count(lit(1)).as("n_chunks"),
            sum("num_values").as("n_values"),
            sum("null_count").as("n_nulls"),
            sum("compressed_bytes").as("compressed_bytes"))
          .orderBy("lang", "column_name")
      },
      Some("""SELECT regexp_extract(file_name, 'lang=([^/]+)', 1) AS lang,
          path_in_schema AS column_name,
          CAST(COUNT(*) AS BIGINT) AS n_chunks,
          CAST(SUM(num_values) AS BIGINT) AS n_values,
          CAST(SUM(stats_null_count) AS BIGINT) AS n_nulls,
          CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes
        FROM parquet_metadata('/tmp/graft_qstate/s22/data/*/*.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q("s19_orc_roundtrip",
      // ORC — the fifth source leg (parquet/JSONL/JDBC/CSV/ORC), for
      // Hive/Trino-era lakes: documents writes as lang-partitioned
      // zstd ORC and reads back through Spark's native vectorized ORC
      // scan with a partition filter + pushed predicate
      // (OrcSourceSpec asserts both in the plan). DuckDB has no ORC
      // reader, so the oracle recomputes from the parquet SOURCE —
      // any type/NULL/partition-value corruption in the roundtrip
      // breaks the per-(lang, source) aggregates.
      (s, d) => {
        val state = freshState(s, "s19")
        graft.sources.OrcSource.writePartitioned(
          t(s, d, "documents"), state + "/orc", Seq("lang"))
        graft.sources.OrcSource.read(s, state + "/orc")
          .filter(col("lang").isin("en", "zh") && col("n_chars") > 100)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            sum(length(col("text"))).as("sum_text_len"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
        FROM documents WHERE lang IN ('en', 'zh') AND n_chars > 100
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q("s18_partition_pruning",
      // Hive-style partition pruning (the third scan-skipping leg
      // beside zone maps s11 and bloom filters s12): events written
      // partitioned BY DAY, a 7-day window read back — the planner
      // must open only 7 of 30 directories (PartitionPruningSpec
      // asserts PartitionFilters in the scan), and the pruned result
      // must equal the plain filter over the unpartitioned table,
      // which is exactly what the oracle computes.
      (s, d) => {
        val state = freshState(s, "s18p")
        eventsTable(s, d)
          .withColumn("day", to_date(col("ts")))
          .select("day", "event_type", "user_id")
          .write.partitionBy("day").mode("overwrite")
          .parquet(state + "/by_day")
        s.read.parquet(state + "/by_day")
          .filter(col("day") >= lit("2024-01-11") &&
            col("day") <= lit("2024-01-17"))
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("day", "event_type")
      },
      Some("""SELECT CAST(ts AS DATE) AS day, event_type,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-11'
          AND DATE '2024-01-17'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q("s17_schema_merge",
      // schema-evolution reader: two snapshots of the same table that
      // drifted — v1 has INT keys, FLOAT prices and no priority
      // column; v2 the widened types plus the new column. Spark's own
      // mergeSchema REFUSES int-vs-long; readEvolved widens at READ
      // (byte<short<int<long, int×float→double) and null-fills, so
      // history needn't rewrite. The oracle re-reads BOTH persisted
      // snapshots with the same casts and must see identical
      // aggregates — v1's rows land in the NULL priority group.
      (s, d) => {
        val state = freshState(s, "s17")
        val o = t(s, d, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").cast("int").as("o_orderkey"),
            col("o_custkey"),
            col("o_totalprice").cast("float").as("o_totalprice"))
          .coalesce(2).write.mode("overwrite").parquet(state + "/v1")
        o.filter(col("o_orderkey") % 2 =!= 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"),
            col("o_orderpriority"))
          .coalesce(2).write.mode("overwrite").parquet(state + "/v2")
        graft.sources.Evolution.readEvolved(
            s, Seq(state + "/v1", state + "/v2"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            round(min(col("o_totalprice")), 2).as("price_min"),
            round(max(col("o_totalprice")), 2).as("price_max"))
          .orderBy(col("o_orderpriority").asc_nulls_first)
      },
      Some("""WITH v1 AS (SELECT CAST(o_orderkey AS BIGINT)
            AS o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
            CAST(NULL AS VARCHAR) AS o_orderpriority
          FROM read_parquet('/tmp/graft_qstate/s17/v1/*.parquet')),
        v2 AS (SELECT o_orderkey, o_totalprice, o_orderpriority
          FROM read_parquet('/tmp/graft_qstate/s17/v2/*.parquet')),
        u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
          ROUND(MIN(o_totalprice), 2) AS price_min,
          ROUND(MAX(o_totalprice), 2) AS price_max
        FROM u GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""")),

    Q("s04_table_list",
      (s, d) => {
        import s.implicits._
        Catalog(s, d).listTables().toDF("table_name").orderBy("table_name")
      },
      Some {
        Seq("customer", "documents", "embeddings", "events", "lineitem",
          "nation", "orders", "part", "region", "supplier")
          .map(t => s"SELECT '$t' AS table_name").mkString(" UNION ALL ") +
          " ORDER BY table_name"
      }),

    Q("s05_column_metadata",
      (s, d) => {
        import s.implicits._
        Catalog(s, d).columns("lineitem")
          .map(c => (c.name, c.dataType, c.nullable))
          .toDF("column_name", "data_type", "nullable")
          .orderBy("column_name")
      },
      Some("""SELECT column_name,
          CASE lower(column_type)
            WHEN 'bigint' THEN 'bigint' WHEN 'integer' THEN 'int'
            WHEN 'double' THEN 'double' WHEN 'float' THEN 'float'
            WHEN 'varchar' THEN 'string' WHEN 'boolean' THEN 'boolean'
            ELSE CASE WHEN lower(column_type) LIKE 'timestamp%' THEN 'timestamp_ntz'
              ELSE lower(column_type) END END AS data_type,
          TRUE AS nullable
        FROM (DESCRIBE lineitem) ORDER BY column_name""")),

    Q("s06_key_integrity",
      // S6: the PK/FK sidecar validated AGAINST the data — duplicate
      // PK tuples and FK orphan counts per declared constraint, one
      // unioned job (key-only left-anti joins, distinct-count aggs).
      // The oracle rebuilds every check from the same declared keys.
      (s, d) => Catalog(s, d).keyIntegrity()
        .orderBy("table_name", "constraint_name"),
      Some(duckKeyIntegritySql)),

    Q("s07_preview",
      (s, d) => Catalog(s, d)
        .preview("nation", Seq("n_nationkey", "n_name"), 50)
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name FROM nation
        ORDER BY n_nationkey LIMIT 50""")),

    Q("s09_usage_patterns",
      // S9 usage half (collector.py:281-320): access_count + last_accessed
      // per table from a query log. The log is synthesized from events —
      // query_text mentions an event_type-named "table", ~70% SELECTs —
      // and ALL tables aggregate in one scan (vs one QUERY_HISTORY scan
      // per table in the reference).
      (s, d) => {
        val log = eventsTable(s, d).select(
          concat(lit("SELECT * FROM "), col("event_type")).as("query_text"),
          when(col("event_id") % 10 < 7, "SELECT").otherwise("INSERT")
            .as("query_type"),
          col("ts").as("start_time"))
        graft.sources.UsageLog.usagePatterns(log,
          Seq("click", "error", "purchase", "signup", "view"))
          .select(col("table_name"), col("access_count"),
            date_format(col("last_accessed"), "yyyy-MM-dd HH:mm:ss")
              .as("last_accessed"))
          .orderBy("table_name")
      },
      Some("""WITH log AS (
          SELECT concat('SELECT * FROM ', event_type) AS query_text,
            CASE WHEN event_id % 10 < 7 THEN 'SELECT' ELSE 'INSERT' END
              AS query_type,
            ts AS start_time
          FROM events),
        tabs AS (SELECT unnest(['click','error','purchase','signup','view'])
          AS table_name)
        SELECT t.table_name,
          CAST(COUNT(l.start_time) AS BIGINT) AS access_count,
          strftime(MAX(l.start_time), '%Y-%m-%d %H:%M:%S') AS last_accessed
        FROM tabs t LEFT JOIN log l
          ON l.query_type = 'SELECT'
          AND contains(lower(l.query_text), lower(t.table_name))
        GROUP BY t.table_name ORDER BY t.table_name""")),

    Q("s11_zonemap_pruned_scan",
      // file-level zone-map data skipping (metastore-less Delta/Iceberg
      // stats): events range-partitioned by ts into 8 files, a per-file
      // min/max map built in one _metadata.file_path pass, then a
      // 4-day window scan that reads ONLY the files whose zone
      // intersects the window (the real predicate still applies after —
      // pruning is a superset guarantee). Oracle = the plain filter
      // over the original table; ZoneMapSpec asserts files were
      // actually skipped.
      (s, d) => {
        val base = freshState(s, "s11")
        eventsTable(s, d).repartitionByRange(8, col("ts"))
          .write.parquet(base + "/data")
        val zm = graft.sources.ZoneMap.build(s, base + "/data", Seq("ts"))
        val lo = lit("2024-01-08 00:00:00").cast("timestamp")
        val hi = lit("2024-01-12 00:00:00").cast("timestamp")
        graft.sources.ZoneMap.prunedRead(s, base + "/data", zm, "ts", lo, hi)
          .filter(col("ts") >= lo && col("ts") < hi)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value").cast("decimal(28,6)")).cast("double"), 6)
              .as("total_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
            AS total_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-12 00:00:00'
        GROUP BY event_type ORDER BY event_type""")),

    Q("s12_bloom_pruned_lookup",
      // per-file Bloom-filter data skipping: the point-lookup
      // complement of s11's zone maps. Events are HASH-partitioned on
      // event_id, so every file's min/max range spans the whole domain
      // and zone maps prune nothing — the per-file bloom sidecar still
      // claims only the file(s) that can hold the key (no false
      // negatives), and the lookup opens those alone. Oracle = the
      // plain point query over the original table; BloomSkipSpec
      // asserts files were actually skipped.
      (s, d) => {
        val base = freshState(s, "s12")
        eventsTable(s, d).repartition(8, col("event_id"))
          .write.parquet(base + "/data")
        // the sidecar is the artifact: build once, persist, probe the
        // persisted copy — probing must never rescan the data files
        graft.sources.BloomSkip.build(s, base + "/data", "event_id")
          .write.parquet(base + "/blooms")
        val blooms = s.read.parquet(base + "/blooms")
        val keys = Seq(11L, 222L, 3333L)
        keys.map { k =>
          graft.sources.BloomSkip.prunedRead(s, base + "/data", blooms,
              lit(k))
            .filter(col("event_id") === k)
        }.reduce(_ unionAll _)
          .select(col("event_id"), col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            round(col("value"), 6).as("value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type,
          strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
          ROUND(value, 6) AS value
        FROM events WHERE event_id IN (11, 222, 3333)
        ORDER BY event_id""")),

    Q("s13_compaction",
      // small-file compaction (the OPTIMIZE half of table maintenance,
      // x26's z-order being the CLUSTER half): 64 deliberately tiny
      // files bin-pack into right-sized ones via a shuffle-free
      // coalesce — driver sees file metadata only, never rows. Oracle
      // = the compacted copy reads back as EXACTLY the original table
      // (compaction must move bytes, not change them); LayoutSpec
      // asserts the file-count contract.
      (s, d) => {
        val base = freshState(s, "s13")
        t(s, d, "orders").repartition(64)
          .write.parquet(base + "/small")
        graft.sources.Layout.compact(s, base + "/small",
          base + "/compacted", targetBytes = 512L * 1024 * 1024)
        s.read.parquet(base + "/compacted").orderBy("o_orderkey")
      },
      Some("SELECT * FROM orders ORDER BY o_orderkey")),

    Q("s14_json_flatten",
      // semi-structured ingestion: a JSONL payload column (built
      // deterministically from doc fields so both engines see the same
      // objects) is schema-inferred, parsed with from_json, and its
      // nested structs flattened to typed a_b columns — the
      // raw-crawl-dump onboarding shape. Map-only: inference samples,
      // parse + flatten are pure projections.
      (s, d) => {
        val js = t(s, d, "documents").select(col("doc_id"),
          to_json(struct(col("doc_id").as("id"),
            struct(col("lang"), col("source").as("src")).as("meta"),
            struct(col("n_chars").as("chars")).as("stats"))).as("payload"))
        graft.sources.JsonSource.parseJson(js, "payload")
          .orderBy("doc_id")
      },
      Some("""WITH j AS (
          -- per-field COALESCE mirrors Spark to_json's null-field
          -- OMISSION: a NULL lang/source/n_chars drops just that key,
          -- it does not null the whole payload
          SELECT doc_id,
            '{"id":' || doc_id || ',"meta":{'
              || COALESCE('"lang":"' || lang || '"', '')
              || CASE WHEN lang IS NOT NULL AND source IS NOT NULL
                   THEN ',' ELSE '' END
              || COALESCE('"src":"' || source || '"', '')
              || '},"stats":{'
              || COALESCE('"chars":' || n_chars, '')
              || '}}' AS payload
          FROM documents)
        SELECT doc_id,
          CAST(json_extract(payload, '$.id') AS BIGINT) AS id,
          json_extract_string(payload, '$.meta.lang') AS meta_lang,
          json_extract_string(payload, '$.meta.src') AS meta_src,
          CAST(json_extract(payload, '$.stats.chars') AS BIGINT)
            AS stats_chars
        FROM j ORDER BY doc_id""")),

    Q("s16_store_retention",
      // retention sweep (the VACUUM / expire-snapshots analog for the
      // date-partitioned history stores): partitions strictly older
      // than the cutoff are DIRECTORY deletes — metadata-only,
      // O(expired partitions), no read or rewrite of survivors. The
      // pre-sweep rows persist separately, so the oracle independently
      // states what must survive; a sweep that deletes too much or too
      // little breaks the per-date aggregates.
      (s, d) => {
        val state = freshState(s, "s16")
        val rows = dailySeries(s, d).withColumn("date", col("day"))
        rows.write.mode("overwrite").parquet(state + "/input")
        rows.write.mode("overwrite").partitionBy("date")
          .parquet(state + "/store")
        val report = graft.history.Retention.expirePartitions(
          s, state + "/store", java.time.LocalDate.parse("2024-01-15"))
        require(report.dropped.nonEmpty, "retention dropped nothing")
        s.read.parquet(state + "/store")
          .groupBy(col("date").cast("string").as("date"))
          .agg(count(lit(1)).as("n_rows"),
            sum("value").cast("long").as("sum_value"))
          .orderBy("date")
      },
      Some("""SELECT CAST(day AS VARCHAR) AS date,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(value) AS BIGINT) AS sum_value
        FROM read_parquet('/tmp/graft_qstate/s16/input/*.parquet')
        WHERE day >= DATE '2024-01-15'
        GROUP BY day ORDER BY date""")),

    Q("s15_csv_roundtrip",
      // delimited-text ingestion, the fourth source leg (parquet/JSONL/
      // JDBC/CSV): documents — with injected separators and quotes in
      // the text — write as RFC-4180 CSV (doubled-quote escaping, NOT
      // Spark's backslash default) and read back through the pinned-
      // schema splittable scan. The oracle reads THE SAME files with
      // DuckDB's independent CSV parser and must see identical rows —
      // quoting bugs on either side break the per-source aggregates.
      (s, d) => {
        import org.apache.spark.sql.types._
        val state = freshState(s, "s15")
        val docs = t(s, d, "documents")
          .withColumn("text",
            concat(lit("a,\"b\" c,, "), col("text")))
        graft.sources.CsvSource.write(docs, state + "/csv")
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType),
          StructField("lang", StringType), StructField("source", StringType),
          StructField("n_chars", LongType)))
        graft.sources.CsvSource.read(s, state + "/csv", schema)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            sum(length(col("text"))).as("sum_text_len"),
            countDistinct("lang").as("n_langs"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM read_csv('/tmp/graft_qstate/s15/csv/*.csv', header = true,
          columns = {'doc_id': 'BIGINT', 'text': 'VARCHAR',
            'lang': 'VARCHAR', 'source': 'VARCHAR', 'n_chars': 'BIGINT'})
        GROUP BY source ORDER BY source""")))

  // ------------------------------------------------------------------
  // J-series: custom operators beyond Spark's built-ins
  // ------------------------------------------------------------------

  /** As-of join, checked against DuckDB's NATIVE ASOF JOIN: each event
    * attaches the latest per-type daily summary at-or-before its ts. */
  private def operatorQueries: Seq[Q] = Seq(
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

  /** Shared by j07 (batch asof+check) and st23 (stream-static
   *  enrichment): the gap-injected daily version table — per-type
   *  daily summaries with 1-day validity, every third day REMOVED so
   *  real validity gaps exist. */
  private def pitVersionHist(s: SparkSession, d: String): DataFrame =
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
  private val pitOracleSql: String =
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
  private def schemaQueries: Seq[Q] = Seq(
    Q("j03_interval_join",
      // interval-overlap join (bucketed equi-join, single-emission via
      // the overlap-start bucket — no distinct): synthetic per-event
      // intervals of 1-7 hours, self-joined per user; the oracle is the
      // naive theta join
      (s, d) => {
        val iv = eventsTable(s, d)
          .select(col("event_id"), col("user_id"), col("ts").as("start"),
            expr("timestampadd(MINUTE, CAST((event_id % 7 + 1) * 60 AS INT), ts)")
              .as("end"))
        graft.operators.RangeJoin.intervalJoin(iv, iv, Seq("user_id"),
            bucketSec = 4 * 3600L)
          .filter(col("event_id") < col("r_event_id"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("pairs"),
            sum(col("event_id")).cast("long").as("a_sum"),
            sum(col("r_event_id")).cast("long").as("b_sum"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (
          SELECT event_id, user_id, ts AS s,
            ts + (event_id % 7 + 1) * INTERVAL 60 MINUTE AS e
          FROM events),
        p AS (
          SELECT a.user_id, a.event_id AS ia, b.event_id AS ib
          FROM iv a JOIN iv b ON a.user_id = b.user_id
            AND a.event_id < b.event_id AND a.s < b.e AND b.s < a.e)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS pairs,
          CAST(SUM(ia) AS BIGINT) AS a_sum,
          CAST(SUM(ib) AS BIGINT) AS b_sum
        FROM p GROUP BY user_id ORDER BY user_id""")),

    Q("j02_range_join",
      // bucketed band join (equi-join on (key, time-bucket) + exact band
      // filter — never a nested-loop theta join): prior-24h same-user
      // click count for every error event, zeros kept
      (s, d) => {
        val ev = eventsTable(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select("event_id", "user_id", "ts")
        val clk = ev.filter(col("event_type") === "click")
          .select("user_id", "ts")
        graft.operators.RangeJoin.rangeJoinCount(err, clk, Seq("user_id"),
            lowerSec = 86400L, upperSec = 0L, countName = "n_prior_clicks")
          .select(col("event_id"), col("user_id"), col("n_prior_clicks"))
          .orderBy("event_id")
      },
      Some("""WITH err AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        clk AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        SELECT e.event_id, e.user_id,
          CAST(COUNT(c.ts) AS BIGINT) AS n_prior_clicks
        FROM err e LEFT JOIN clk c ON c.user_id = e.user_id
          AND epoch_us(c.ts) >= epoch_us(e.ts) - 86400000000
          AND epoch_us(c.ts) < epoch_us(e.ts)
        GROUP BY 1, 2 ORDER BY event_id""")),

    Q("j05_bloom_join",
      // bloom-reduced join (the runtime row-level filter made
      // explicit): urgent orders are ~20% of keys, so a driver-built
      // Bloom filter over their keys pre-filters lineitem BEFORE its
      // shuffle — false positives only admit extra candidates into
      // the exact hash join, so the result must equal the plain join
      // (the s11/s12 pruned≡plain pattern, applied to shuffles
      // instead of scans).
      (s, d) => {
        val urgent = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority"))
        graft.pipeline.Skew.bloomReducedJoin(
            t(s, d, "lineitem"), urgent, "l_orderkey",
            expectedItems = 100000L)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity").cast("decimal(28,6)"))
            .cast("double").as("qty_sum"),
            count(lit(1)).as("n_items"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
            AS qty_sum,
          CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1 ORDER BY 1""")),

    Q("j04_salted_join",
      // salted equi-join for the skew AQE can't fix (hot key inside a
      // sort-merge join, build side too big to broadcast but cheap to
      // replicate): small side replicates saltFactor ways, big side
      // salts deterministically, a hot key's rows spread over
      // saltFactor reducers. Oracle = the plain join — salting must
      // redistribute work without changing one row.
      (s, d) => {
        val big = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey").as("pk"), col("l_quantity"))
        val small = t(s, d, "part")
          .select(col("p_partkey").as("pk"), col("p_name"))
        graft.pipeline.Skew.saltedJoin(big, small, "pk", saltFactor = 8)
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey AS pk,
          l_quantity, p_name
        FROM lineitem JOIN part ON p_partkey = l_partkey
        ORDER BY l_orderkey, l_linenumber""")),

    Q("x38_adaptive_salted_join",
      // differential salting: ONLY the hot keys (detected by a one-agg
      // census) pay the replication tax — hot big rows spread over
      // saltFactor reducers, cold rows join unsalted. Oracle = the
      // plain join, again: redistribution must never change a row.
      (s, d) => {
        val big = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_suppkey").as("sk"), col("l_extendedprice"))
        val small = t(s, d, "supplier")
          .select(col("s_suppkey").as("sk"), col("s_name"))
        val hot = graft.pipeline.Skew.hotKeys(big, "sk", minCount = 600L)
        graft.pipeline.Skew.adaptiveSaltedJoin(big, small, "sk", hot,
            saltFactor = 8)
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_suppkey AS sk,
          l_extendedprice, s_name
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        ORDER BY l_orderkey, l_linenumber""")),

    Q("x39_perplexity_buckets",
      // CCNet-style corpus partitioning (Wenzek et al. 2019): per-doc
      // unigram-LM score (x13's exact micro-nat machinery) → tertile
      // head/middle/tail buckets. Threshold-replay oracle: the LM pass
      // runs ONCE and persists scores, the interpolated tertile cut
      // points are float-fragile to recompute bit-identically across
      // engines, so Spark persists its raw-precision (t1, t2) row and
      // DuckDB re-labels every persisted score against those same bits
      // — the bucketing comparisons and labels are fully verified; the
      // threshold computation itself is pinned by TextAnalysisSparkSpec.
      (s, d) => {
        val base = freshState(s, "x39")
        val scoresPath = base + "/scores"
        TextAnalysis.unigramLogProb(t(s, d, "documents"))
          .write.mode("overwrite").parquet(scoresPath)
        val scored = s.read.parquet(scoresPath)
        val thPath = base + "/thresholds"
        TextAnalysis.perplexityThresholds(scored)
          .write.mode("overwrite").parquet(thPath)
        TextAnalysis.perplexityBuckets(scored, s.read.parquet(thPath))
          .select(col("doc_id"), col("n_tokens"),
            col("avg_neg_logprob"), col("bucket"))
          .orderBy("doc_id")
      },
      Some("""SELECT s.doc_id, s.n_tokens, s.avg_neg_logprob,
          CASE WHEN s.avg_neg_logprob <= t.t1 THEN 'head'
               WHEN s.avg_neg_logprob <= t.t2 THEN 'middle'
               ELSE 'tail' END AS bucket
        FROM read_parquet('/tmp/graft_qstate/x39/scores/*.parquet') s
        CROSS JOIN read_parquet('/tmp/graft_qstate/x39/thresholds/*.parquet') t
        ORDER BY s.doc_id""")),

    Q("x40_normalized_dedup",
      // typography-insensitive exact dedup: NFD accent-strip +
      // lowercase + separator-collapse normalization, then md5-keyed
      // grouping (the exact-dedup plan — 16-byte keys shuffle, never
      // text). The ASCII corpus carries no typographic variants, so
      // deterministic ones are injected from doc_id the same way on
      // both engines (the p21/x14 recipe): accented + uppercased +
      // re-punctuated copies that normalize back onto their original.
      // The normalization pipeline itself is replayed in full by
      // DuckDB (nfc_normalize/strip_accents/lower + the same RE2
      // character classes), so the UDF semantics are oracle-verified,
      // not just pinned.
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val variants = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(upper(regexp_replace(col("text"), "a", "á")),
              lit(" !!")).as("text"))
        TextAnalysis.normalizedDupGroups(docs.union(variants))
          .orderBy("norm_md5")
      },
      Some("""WITH var AS (
          SELECT doc_id + 100000 AS doc_id,
            upper(replace(text, 'a', chr(225))) || ' !!' AS text
          FROM documents WHERE doc_id % 10 = 0),
        all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM var),
        norm AS (
          SELECT doc_id,
            md5(trim(regexp_replace(lower(strip_accents(nfc_normalize(text))),
              '[^\p{L}\p{Nd}]+', ' ', 'g'))) AS norm_md5
          FROM all_docs)
        SELECT norm_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(doc_id) AS canonical_id
        FROM norm GROUP BY 1 HAVING COUNT(*) >= 2
        ORDER BY norm_md5""")),

    Q("x41_corpus_overlap",
      // corpus-LEVEL shingle overlap (no pairs materialized): split
      // documents into odd/even halves as two "snapshots" and measure
      // distinct-trigram counts, common count, Jaccard, containment —
      // the "is B a re-crawl of A / does the benchmark leak" one-row
      // answer, linear in distinct shingles
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.corpusShingleOverlap(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1))
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS ts
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        tagged AS (
          SELECT shingle,
            MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
            MAX(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS b
          FROM sh GROUP BY 1)
        SELECT CAST(SUM(a) AS BIGINT) AS shingles_a,
          CAST(SUM(b) AS BIGINT) AS shingles_b,
          CAST(SUM(a * b) AS BIGINT) AS common,
          ROUND(CAST(SUM(a * b) AS DOUBLE)
            / (SUM(a) + SUM(b) - SUM(a * b)), 6) AS jaccard,
          ROUND(CAST(SUM(a * b) AS DOUBLE)
            / LEAST(SUM(a), SUM(b)), 6) AS containment
        FROM tagged""")),

    Q("x42_mojibake_scan",
      // encoding-damage scan: U+FFFD, C1 controls, Ã/Â+Latin-1 pairs,
      // â€-triples — the wrong-charset artifacts every web crawl
      // carries. The ASCII corpus is clean, so deterministic damage is
      // injected from doc_id identically on both engines (the x14/x40
      // recipe); the regexes are shared RE2/Java syntax and run
      // verbatim in DuckDB, so the detector itself is oracle-verified
      (s, d) => {
        val id = col("doc_id")
        val damaged = t(s, d, "documents").select(id, concat(
          col("text"),
          when(id % 4 === 0, " cafÃ©").otherwise(""),
          when(id % 6 === 0, " donâ€™t").otherwise(""),
          when(id % 9 === 0, " x�y").otherwise(""),
          when(id % 10 === 0, "\u0085ok").otherwise("")).as("text"))
        TextAnalysis.mojibakeScan(damaged)
          .filter(col("mojibake_chars") > 0)
          .orderBy("doc_id")
      },
      Some("""WITH damaged AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 4 = 0
                 THEN ' caf' || chr(195) || chr(169) ELSE '' END
            || CASE WHEN doc_id % 6 = 0
                 THEN ' don' || chr(226) || chr(8364) || chr(8482) || 't'
                 ELSE '' END
            || CASE WHEN doc_id % 9 = 0
                 THEN ' x' || chr(65533) || 'y' ELSE '' END
            || CASE WHEN doc_id % 10 = 0
                 THEN chr(133) || 'ok' ELSE '' END AS text
          FROM documents),
        scanned AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, chr(65533))) AS INTEGER)
              AS replacement_chars,
            CAST(len(regexp_extract_all(text, '[\x{80}-\x{9F}]')) AS INTEGER)
              AS c1_controls,
            CAST(len(regexp_extract_all(text,
              '[' || chr(195) || chr(194) || '][\x{A0}-\x{BF}\x{80}-\x{9F}]'))
              AS INTEGER) AS latin1_pairs,
            CAST(len(regexp_extract_all(text, chr(226) || chr(8364) || '.'))
              AS INTEGER) AS punct_triples
          FROM damaged)
        SELECT doc_id, replacement_chars, c1_controls, latin1_pairs,
          punct_triples,
          replacement_chars + c1_controls + latin1_pairs + punct_triples
            AS mojibake_chars
        FROM scanned
        WHERE replacement_chars + c1_controls + latin1_pairs
          + punct_triples > 0
        ORDER BY doc_id""")),

    Q("x43_mixture_plan",
      // token-budgeted data-mixing plan: exactly-representable
      // normalized weights (.5/.25/.125/.125 — identical double
      // literals on both engines), 1M-token budget; unweighted sources
      // report rate 0. One source-keyed agg, k-row result.
      (s, d) => Sampling.mixturePlan(t(s, d, "documents"),
          weights = Map("src0" -> 0.5, "src1" -> 0.25,
            "src2" -> 0.125, "src3" -> 0.125),
          tokenBudget = 1000000L)
        .orderBy("source"),
      Some("""WITH tok AS (
          SELECT source,
            CASE WHEN LENGTH(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
          FROM documents WHERE source IS NOT NULL),
        agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n) AS BIGINT) AS tokens
          FROM tok GROUP BY 1),
        w AS (SELECT * FROM (VALUES
            ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.25 AS DOUBLE)),
            ('src2', CAST(0.125 AS DOUBLE)), ('src3', CAST(0.125 AS DOUBLE)))
          t(source, weight))
        SELECT agg.source, n_docs, tokens,
          ROUND(COALESCE(weight, 0), 6) AS weight,
          CAST(ROUND(1000000 * COALESCE(weight, 0), 0) AS BIGINT)
            AS target_tokens,
          ROUND(LEAST(CAST(1 AS DOUBLE),
            ROUND(1000000 * COALESCE(weight, 0), 0) / tokens), 6)
            AS sample_rate,
          ROUND(ROUND(1000000 * COALESCE(weight, 0), 0) / tokens, 6)
            AS epochs
        FROM agg LEFT JOIN w ON agg.source = w.source
        ORDER BY agg.source""")),

    Q("x44_language_id",
      // multilingual two-tier language ID (script blocks, then stopword
      // profiles). Score-replay oracle (the x04 pattern): Spark persists
      // the per-(doc, candidate) score frame, DuckDB replays the argmax
      // — tier-1 min prio with score>0, else tier-2 (max score, min
      // prio), else 'und' — so the pick logic itself is cross-checked.
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x44")
        TextAnalysis.languageScores(docs).write.mode("overwrite")
          .parquet(state + "/scores")
        // picks from the persisted frame (ONE corpus scoring pass; the
        // expression twin detectLanguage is pinned by LanguageIdSpec)
        TextAnalysis.languagePicks(
            s.read.parquet(state + "/scores"), docs)
          .orderBy("doc_id")
      },
      Some("""WITH sc AS (SELECT * FROM
          read_parquet('/tmp/graft_qstate/x44/scores/*.parquet')),
        t1 AS (SELECT doc_id, arg_min(lang, prio) AS lang
          FROM sc WHERE tier = 1 AND score > 0 GROUP BY doc_id),
        t2 AS (SELECT doc_id, lang FROM (
            SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, prio ASC) AS rn
            FROM sc WHERE tier = 2 AND score > 0) WHERE rn = 1)
        SELECT d.doc_id, COALESCE(t1.lang, t2.lang, 'und') AS lang
        FROM documents d
        LEFT JOIN t1 ON d.doc_id = t1.doc_id
        LEFT JOIN t2 ON d.doc_id = t2.doc_id
        ORDER BY d.doc_id""")),

    Q("x46_bpe_token_stats",
      // rank-greedy BPE piece counts under the pluggable merges table.
      // The tokenizer is not SQL-portable, so the per-doc counts are
      // persisted and the oracle replays the per-source aggregation
      // over the identical frame (the x04 replay pattern); the
      // tokenizer itself is pinned by BpeSpec fixtures.
      (s, d) => {
        val state = freshState(s, "x46")
        t(s, d, "documents").select(col("doc_id"), col("source"),
            TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
          .write.mode("overwrite")
          .parquet(state + "/counts")
        s.read.parquet(state + "/counts")
          .filter(col("source").isNotNull)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bpe_tokens").as("total_bpe_tokens"),
            (sum("n_bpe_tokens").cast("double") / count(lit(1)))
              .as("avg_bpe_tokens"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
        CAST(SUM(n_bpe_tokens) AS DOUBLE) / COUNT(*) AS avg_bpe_tokens
        FROM read_parquet('/tmp/graft_qstate/x46/counts/*.parquet')
        WHERE source IS NOT NULL
        GROUP BY source ORDER BY source""")),

    Q("x90_tokenizer_fertility",
      // tokenizer fertility per language (BPE pieces per whitespace
      // word) — the multilingual-parity audit run BEFORE a tokenizer
      // is frozen: a vocabulary trained on one language over-segments
      // the others, inflating their token budgets and effective cost
      // per document. Reuses x46's pluggable-merges counter; the
      // per-doc BPE counts persist (tokenizer isn't SQL) while the
      // WORD counts are recomputed independently by the oracle from
      // the raw text, so a broken word counter fails the compare
      // rather than hiding in the fixture. ppm from exact integer
      // sums.
      (s, d) => {
        val state = freshState(s, "x90")
        val docs = t(s, d, "documents")
        docs.select(col("doc_id"), col("lang"),
            TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
          .write.mode("overwrite").parquet(state + "/counts")
        val words = docs.select(col("doc_id"),
          size(filter(split(trim(col("text")), "\\s+"),
            w => length(w) > 0)).cast("long").as("n_words"))
        s.read.parquet(state + "/counts")
          .join(words, Seq("doc_id"))
          .filter(col("lang").isNotNull && col("n_words") > 0)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bpe_tokens").as("total_tokens"),
            sum("n_words").as("total_words"),
            floor(lit(1000000.0) * sum("n_bpe_tokens") / sum("n_words"))
              .cast("long").as("fertility_ppm"))
          .orderBy("lang")
      },
      Some("""WITH w AS (SELECT doc_id,
            CAST(len(list_filter(
              string_split_regex(trim(text), '\s+'),
              t -> len(t) > 0)) AS BIGINT) AS n_words
          FROM documents),
        c AS (SELECT doc_id, lang, n_bpe_tokens FROM read_parquet(
          '/tmp/graft_qstate/x90/counts/*.parquet'))
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_tokens,
          CAST(SUM(n_words) AS BIGINT) AS total_words,
          CAST(FLOOR(1000000.0 * SUM(n_bpe_tokens) / SUM(n_words))
            AS BIGINT) AS fertility_ppm
        FROM c JOIN w USING (doc_id)
        WHERE lang IS NOT NULL AND n_words > 0
        GROUP BY lang ORDER BY lang""")),

    Q("x92_readability",
      // Flesch reading-ease per source — the classic readability
      // prior quality classifiers lean on (very low = legalese/
      // boilerplate, implausibly high = word salad). The standard
      // surface approximation: words = whitespace tokens, sentences =
      // [.!?]+ runs (min 1), syllables = vowel-group runs (min 1) —
      // every count a regexp over the raw text, so the WHOLE signal
      // is SQL-expressible and the oracle recomputes it from scratch
      // (no persisted state). Scores quantize to milli via floor over
      // identical double expressions from exact integer counts.
      (s, d) => {
        val docs = t(s, d, "documents")
        val base = docs
          .filter(col("text").isNotNull && col("source").isNotNull)
          .select(col("source"),
            size(filter(split(trim(col("text")), "\\s+"),
              w => length(w) > 0)).cast("long").as("w"),
            greatest(size(regexp_extract_all(col("text"),
              lit("[.!?]+"), lit(0))), lit(1)).cast("long").as("sents"),
            greatest(size(regexp_extract_all(lower(col("text")),
              lit("[aeiouy]+"), lit(0))), lit(1)).cast("long").as("y"))
          .filter(col("w") > 0)
          .withColumn("flesch_milli",
            floor(lit(1000.0) * (lit(206.835)
              - lit(1.015) * col("w") / col("sents")
              - lit(84.6) * col("y") / col("w"))).cast("long"))
        base.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            floor(avg("flesch_milli")).cast("long")
              .as("mean_flesch_milli"),
            min("flesch_milli").as("min_flesch_milli"),
            max("flesch_milli").as("max_flesch_milli"))
          .orderBy("source")
      },
      Some("""WITH base AS (
          SELECT source,
            CAST(len(list_filter(
              string_split_regex(trim(text), '\s+'),
              t -> len(t) > 0)) AS BIGINT) AS w,
            CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sents,
            CAST(GREATEST(
              len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
              AS BIGINT) AS y
          FROM documents
          WHERE text IS NOT NULL AND source IS NOT NULL),
        scored AS (
          SELECT source,
            CAST(FLOOR(CAST(1000.0 AS DOUBLE) * (
              CAST(206.835 AS DOUBLE)
              - CAST(1.015 AS DOUBLE) * w / sents
              - CAST(84.6 AS DOUBLE) * y / w)) AS BIGINT)
              AS flesch_milli
          FROM base WHERE w > 0)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(FLOOR(AVG(flesch_milli)) AS BIGINT)
            AS mean_flesch_milli,
          MIN(flesch_milli) AS min_flesch_milli,
          MAX(flesch_milli) AS max_flesch_milli
        FROM scored GROUP BY source ORDER BY source""")),

    Q("x93_hits",
      // HITS hubs & authorities — the DIRECTED complement of x88's
      // PageRank (Kleinberg's mutual recursion): authorities are
      // pointed at by good hubs, hubs point at good authorities. For
      // curation the lanes separate content pages (authority) from
      // index/directory pages (hub) — different keep policies. Scores
      // in exact integer micro units, each half-step one edge join +
      // aggregate + a broadcast 1-row max-normalize, so the oracle
      // unrolls the identical recurrence (2 iterations).
      (s, d) => {
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"))
        val nDocs = ids.count()
        val edges = ids
          .select(col("doc_id").as("src"),
            explode(array(
              (col("doc_id") * 2 + 1) % nDocs,
              (col("doc_id") * 3 + 7) % nDocs,
              (col("doc_id") * 7 + 13) % nDocs)).as("dst"))
        LinkGraph.hits(edges, iterations = 2).orderBy("node")
      },
      Some("""WITH nn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        raw AS (
          SELECT doc_id AS src, (doc_id*2 + 1) % nn.n AS dst
            FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id*3 + 7) % nn.n FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id*7 + 13) % nn.n FROM documents, nn),
        e0 AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        nodes AS (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
        a1r AS (SELECT dst AS node,
            SUM(CAST(1000000 AS BIGINT)) AS v FROM e0 GROUP BY dst),
        a1 AS (SELECT n.node, COALESCE(a1r.v, 0) * 1000000
              // GREATEST((SELECT MAX(v) FROM a1r), 1) AS v
          FROM nodes n LEFT JOIN a1r ON n.node = a1r.node),
        h1r AS (SELECT e0.src AS node, SUM(a1.v) AS v
          FROM e0 JOIN a1 ON e0.dst = a1.node GROUP BY e0.src),
        h1 AS (SELECT n.node, COALESCE(h1r.v, 0) * 1000000
              // GREATEST((SELECT MAX(v) FROM h1r), 1) AS v
          FROM nodes n LEFT JOIN h1r ON n.node = h1r.node),
        a2r AS (SELECT e0.dst AS node, SUM(h1.v) AS v
          FROM e0 JOIN h1 ON e0.src = h1.node GROUP BY e0.dst),
        a2 AS (SELECT n.node, COALESCE(a2r.v, 0) * 1000000
              // GREATEST((SELECT MAX(v) FROM a2r), 1) AS v
          FROM nodes n LEFT JOIN a2r ON n.node = a2r.node),
        h2r AS (SELECT e0.src AS node, SUM(a2.v) AS v
          FROM e0 JOIN a2 ON e0.dst = a2.node GROUP BY e0.src),
        h2 AS (SELECT n.node, COALESCE(h2r.v, 0) * 1000000
              // GREATEST((SELECT MAX(v) FROM h2r), 1) AS v
          FROM nodes n LEFT JOIN h2r ON n.node = h2r.node)
        SELECT n.node, CAST(h2.v AS BIGINT) AS hub_micro,
          CAST(a2.v AS BIGINT) AS auth_micro
        FROM nodes n
        JOIN h2 ON n.node = h2.node
        JOIN a2 ON n.node = a2.node
        ORDER BY n.node""")),

    Q("x91_triangle_count",
      // per-node triangles + local clustering coefficient — the
      // graph-motif signal for link-spam/community structure (organic
      // neighborhoods close triangles; link farms are near-bipartite,
      // cc ~ 0 at high degree). Standard oriented-join algorithm:
      // every edge low->high, each triangle found exactly once via
      // the middle-vertex join, work bounded by forward degrees —
      // never degree squared. Same derived affine link graph as x88;
      // exact integers end-to-end, so the oracle replays the joins
      // and the ppm arithmetic cell-for-cell.
      (s, d) => {
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"))
        val nDocs = ids.count()
        val edges = ids
          .select(col("doc_id").as("src"),
            explode(array(
              (col("doc_id") * 2 + 1) % nDocs,
              (col("doc_id") * 3 + 7) % nDocs,
              (col("doc_id") * 7 + 13) % nDocs)).as("dst"))
        LinkGraph.triangleCounts(edges).orderBy("node")
      },
      Some("""WITH nn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        raw AS (
          SELECT doc_id AS src, (doc_id*2 + 1) % nn.n AS dst
            FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id*3 + 7) % nn.n FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id*7 + 13) % nn.n FROM documents, nn),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b
          FROM raw WHERE src <> dst),
        deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT a AS node FROM und
                UNION ALL SELECT b FROM und)
          GROUP BY node),
        tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM und e1
          JOIN und e2 ON e1.b = e2.a
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM (SELECT unnest([a, b, c]) AS node FROM tri)
          GROUP BY node)
        SELECT d.node, d.degree,
          CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
          CAST(CASE WHEN d.degree >= 2
            THEN (2 * COALESCE(p.n_triangles, 0) * 1000000)
              // (d.degree * (d.degree - 1))
            ELSE 0 END AS BIGINT) AS cc_ppm
        FROM deg d LEFT JOIN pern p ON d.node = p.node
        ORDER BY d.node""")),

    Q("x55_bpe_train",
      // BPE vocabulary TRAINING (x46 applies merges; this learns them):
      // one distributed word-count pass, bounded driver dictionary,
      // in-memory most-frequent-pair loop with asc-pair tie-break. The
      // learned table and the per-doc counts under it are persisted;
      // the oracle replays the per-source aggregation AND re-derives
      // merge #1 independently (SQL argmax over the char-pair counts
      // of the word dictionary) — the sentinel row only appears when
      // the learned rank-0 merge equals that argmax, so broken
      // learning fails the row-count compare. Deeper ranks are pinned
      // by BpeTrainSpec's hand-worked Sennrich example.
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val state = freshState(s, "x55")
        val merges = TextAnalysis.trainBpeMerges(docs, numMerges = 20)
        merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
          .toDF("rank", "m_left", "m_right")
          .coalesce(1).write.mode("overwrite").parquet(state + "/merges")
        docs.select(col("doc_id"), col("source"),
            TextAnalysis.bpeTokenCount(col("text"), merges)
              .as("n_bpe_tokens"))
          .write.mode("overwrite").parquet(state + "/counts")
        s.read.parquet(state + "/counts")
          .filter(col("source").isNotNull)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bpe_tokens").as("total_bpe_tokens"),
            (sum("n_bpe_tokens").cast("double") / count(lit(1)))
              .as("avg_bpe_tokens"))
          .unionByName(Seq(("__merge1_check", 1L, 1L, 1.0))
            .toDF("source", "n_docs", "total_bpe_tokens",
              "avg_bpe_tokens"))
          .orderBy("source")
      },
      Some("""WITH agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
            CAST(SUM(n_bpe_tokens) AS DOUBLE) / COUNT(*)
              AS avg_bpe_tokens
          FROM read_parquet('/tmp/graft_qstate/x55/counts/*.parquet')
          WHERE source IS NOT NULL GROUP BY source),
        words AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
          FROM documents),
        wf AS (
          SELECT w, COUNT(*) AS f FROM words WHERE len(w) > 1 GROUP BY w),
        pairs AS (
          SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, f
          FROM wf, unnest(range(1, len(w))) AS t(i)),
        pc AS (SELECT a, b, SUM(f) AS c FROM pairs GROUP BY a, b),
        top1 AS (SELECT a, b FROM pc ORDER BY c DESC, a, b LIMIT 1),
        m0 AS (
          SELECT m_left, m_right
          FROM read_parquet('/tmp/graft_qstate/x55/merges/*.parquet')
          WHERE rank = 0)
        SELECT * FROM agg
        UNION ALL
        SELECT '__merge1_check', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
          CAST(1 AS DOUBLE)
        WHERE EXISTS (SELECT 1 FROM top1 JOIN m0
          ON top1.a = m0.m_left AND top1.b = m0.m_right)
        ORDER BY source""")),

    Q("x56_dsir_selection",
      // DSIR data selection (Xie et al. 2023): pick the pool docs whose
      // hashed-bigram profile looks most like the target slice
      // (lang = 'en'). Two B-row smoothed feature models (one
      // map-side-combined groupBy each), scoring = per-doc feature tf
      // joined against the BROADCAST model grid, selection =
      // TakeOrdered top-50 — one doc-keyed shuffle total. md5 feature
      // hashing + micro-nat quantization before every sum make the
      // weights and the cut engine-exact; the oracle rebuilds both
      // models and every weight from scratch.
      (s, d) => graft.pipeline.Selection.dsirSelect(
          t(s, d, "documents"), col("lang") === "en", k = 50)
        .orderBy(col("weight_micro").desc, col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, lang,
            string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g
          FROM (SELECT doc_id, lang, unnest(range(1, len(w))) AS i, w
                FROM toks WHERE len(w) >= 2)),
        feat AS (
          SELECT doc_id, lang,
            CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % 4096
              AS bucket
          FROM grams WHERE g <> ''),
        tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
          FROM feat GROUP BY 1, 2),
        tcnt AS (SELECT bucket, COUNT(*) AS c FROM feat
          WHERE lang = 'en' GROUP BY 1),
        rcnt AS (SELECT bucket, COUNT(*) AS c FROM feat GROUP BY 1),
        tot AS (SELECT
          (SELECT COALESCE(SUM(c), 0) FROM tcnt) AS tt,
          (SELECT COALESCE(SUM(c), 0) FROM rcnt) AS rt),
        sc AS (
          SELECT r.bucket,
            CAST(ROUND(LN((COALESCE(t.c, 0) + 1)
              / CAST(tt + 4096 AS DOUBLE)) * 1e6, 0) AS BIGINT)
            - CAST(ROUND(LN((r.c + 1)
              / CAST(rt + 4096 AS DOUBLE)) * 1e6, 0) AS BIGINT) AS d
          FROM rcnt r LEFT JOIN tcnt t USING (bucket), tot),
        w AS (
          SELECT doc_id, SUM(tf) AS n_feat, SUM(tf * d) AS wmic
          FROM tf JOIN sc USING (bucket) GROUP BY 1)
        SELECT d.doc_id, CAST(COALESCE(w.n_feat, 0) AS BIGINT) AS n_feat,
          CAST(COALESCE(w.wmic, 0) AS BIGINT) AS weight_micro
        FROM documents d LEFT JOIN w USING (doc_id)
        ORDER BY weight_micro DESC, doc_id LIMIT 50""")),

    Q("x57_delivery_gaps",
      // feed-completeness SLA scan: which hours never arrived, per
      // series. The observed-hour frame is calendar-bounded (series ×
      // span hours), the expected spine explodes from one per-series
      // (min, max) row, holes fall out of a left-anti join, runs
      // collapse with the hour-minus-rank trick — nothing here scales
      // with raw event volume beyond the first distinct.
      (s, d) => graft.operators.Completeness.deliveryGaps(
          eventsTable(s, d))
        .orderBy("series", "gap_start"),
      Some("""WITH obs AS (
          SELECT DISTINCT event_type AS series,
            date_trunc('hour', ts) AS hour
          FROM events),
        span AS (SELECT series, MIN(hour) AS lo, MAX(hour) AS hi
          FROM obs GROUP BY 1),
        spine AS (
          SELECT series,
            unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
          FROM span),
        miss AS (
          SELECT s.series, s.hour FROM spine s
          LEFT JOIN obs o ON o.series = s.series AND o.hour = s.hour
          WHERE o.series IS NULL),
        runs AS (
          SELECT series, hour,
            CAST(epoch(hour) AS BIGINT) // 3600
              - ROW_NUMBER() OVER (PARTITION BY series ORDER BY hour)
              AS grp
          FROM miss)
        SELECT series,
          strftime(MIN(hour), '%Y-%m-%d %H:%M:%S') AS gap_start,
          strftime(MAX(hour), '%Y-%m-%d %H:%M:%S') AS gap_end,
          CAST(COUNT(*) AS BIGINT) AS n_missing_hours
        FROM runs GROUP BY series, grp
        ORDER BY series, gap_start""")),

    Q("x58_entity_resolution",
      // blocking-based entity resolution: records derived from supplier
      // (variant B appends ' inc' to an md5-salted name, so true pairs
      // sit at edit distance 3 while cross-records are md5-far), block
      // on the first 4 name chars, match at levenshtein ≤ 4, close
      // transitively. Pair generation is an EQUI-join on the block key
      // (Σ block² work, never corpus²); the closure reuses the dedup
      // label propagation. Oracle: same pairs via DuckDB's levenshtein
      // + the d11 recursive-CTE closure.
      (s, d) => {
        val sup = t(s, d, "supplier")
        val base = sup.select(col("s_suppkey"),
          concat(substring(md5(col("s_suppkey").cast("string")), 1, 12),
            lit(" "), col("s_name")).as("name"))
        val recs = base.select((col("s_suppkey") * 2).as("record_id"),
            col("name"))
          .unionByName(base.select(
            (col("s_suppkey") * 2 + 1).as("record_id"),
            concat(col("name"), lit(" inc")).as("name")))
        graft.pipeline.EntityResolution.resolve(recs,
            "record_id", "name", blockChars = 4, maxDistance = 4)
          .orderBy("record_id")
      },
      Some("""WITH RECURSIVE recs AS (
          SELECT s_suppkey * 2 AS record_id,
            substring(md5(CAST(s_suppkey AS VARCHAR)), 1, 12)
              || ' ' || s_name AS name
          FROM supplier
          UNION ALL
          SELECT s_suppkey * 2 + 1,
            substring(md5(CAST(s_suppkey AS VARCHAR)), 1, 12)
              || ' ' || s_name || ' inc'
          FROM supplier),
        blocked AS (SELECT record_id, name,
            lower(substring(name, 1, 4)) AS blk
          FROM recs),
        pairs AS (
          SELECT a.record_id AS id_a, b.record_id AS id_b
          FROM blocked a JOIN blocked b
            ON a.blk = b.blk AND a.record_id < b.record_id
          WHERE levenshtein(a.name, b.name) <= 4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        clust AS (
          SELECT src AS record_id, LEAST(src, MIN(dst)) AS cluster_id
          FROM reach GROUP BY src),
        assigned AS (
          SELECT r.record_id,
            COALESCE(c.cluster_id, r.record_id) AS cluster_id
          FROM recs r LEFT JOIN clust c ON c.record_id = r.record_id),
        sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM assigned GROUP BY 1)
        SELECT a.record_id, a.cluster_id, s.n_members
        FROM assigned a JOIN sizes s ON s.cluster_id = a.cluster_id
        ORDER BY a.record_id""")),

    Q("x61_dedup_weights",
      // dedup-aware sampling weights (down-weight duplicates instead of
      // dropping them): exact-dup clusters by content hash, member
      // weight s^(−α) at α = 1 and α = 0.5, ppm-quantized. One
      // cluster-keyed aggregation + one join — the text never moves.
      (s, d) => {
        val docs = t(s, d, "documents")
        val assignments = docs
          .select(col("doc_id"), md5(col("text").cast("binary")).as("__h"))
          .withColumn("cluster_id",
            min("doc_id").over(org.apache.spark.sql.expressions.Window
              .partitionBy("__h")))
          .select("doc_id", "cluster_id")
        graft.pipeline.Sampling.dedupWeights(docs, assignments)
          .orderBy("doc_id")
      },
      Some("""WITH cl AS (
          SELECT doc_id,
            MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id
          FROM documents),
        sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM cl GROUP BY 1)
        SELECT doc_id, cluster_id, sz AS cluster_size,
          CAST(ROUND(1e6 / sz, 0) AS BIGINT) AS weight_ppm,
          CAST(ROUND(1e6 / SQRT(CAST(sz AS DOUBLE)), 0) AS BIGINT)
            AS weight_sqrt_ppm
        FROM cl JOIN sz USING (cluster_id) ORDER BY doc_id""")),

    Q("x62_curriculum",
      // curriculum ordering (easy→hard): quality-score quartile bands
      // at EXACT percentile cutoffs (quantized to 6 decimals so the
      // boundary comparison is engine-exact), phase assignment is
      // map-only — no global sort — and the within-phase order key is
      // a deterministic md5 over (phase, id). The oracle re-derives
      // the scores, the cutoffs, every phase and every order key.
      (s, d) => {
        val prof = TextAnalysis.profileText(t(s, d, "documents"))
          .select(col("doc_id"), col("quality_score"))
        Sampling.curriculumPhases(prof, "quality_score", phases = 4)
          .orderBy("doc_id")
      },
      Some(s"""WITH prof AS (SELECT doc_id, quality_score
          FROM ($duckTextProfileSql)),
        cuts AS (SELECT
          ROUND(quantile_cont(quality_score, 0.25), 6) AS q1,
          ROUND(quantile_cont(quality_score, 0.50), 6) AS q2,
          ROUND(quantile_cont(quality_score, 0.75), 6) AS q3
          FROM prof)
        SELECT p.doc_id, p.quality_score,
          1 + CASE WHEN p.quality_score > c.q1 THEN 1 ELSE 0 END
            + CASE WHEN p.quality_score > c.q2 THEN 1 ELSE 0 END
            + CASE WHEN p.quality_score > c.q3 THEN 1 ELSE 0 END
            AS phase,
          md5(CAST(1 + CASE WHEN p.quality_score > c.q1 THEN 1 ELSE 0 END
            + CASE WHEN p.quality_score > c.q2 THEN 1 ELSE 0 END
            + CASE WHEN p.quality_score > c.q3 THEN 1 ELSE 0 END
            AS VARCHAR) || ':' || CAST(p.doc_id AS VARCHAR))
            AS order_key
        FROM prof p, cuts c ORDER BY p.doc_id""")),

    Q("x63_dataset_card",
      // the per-source datasheet a corpus release ships with
      // (mechanically-attestable lanes of "Datasheets for Datasets"):
      // docs, token volume, exact-integer mean quality (Σ score·1e6 is
      // order-independent), within-source exact-dup rate, and the
      // dominant language with a deterministic count-then-name argmax.
      // One source-keyed aggregation + one source×lang rollup.
      (s, d) => Curation.datasetCard(t(s, d, "documents"))
        .orderBy("source"),
      Some(s"""WITH prof AS (SELECT doc_id, n_tokens, quality_score
          FROM ($duckTextProfileSql)),
        dd AS (SELECT doc_id, source, lang, text FROM documents),
        ps AS (SELECT dd.source,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
            CAST(SUM(CAST(ROUND(p.quality_score * 1e6, 0) AS BIGINT))
              AS BIGINT) AS q_micro,
            CAST(COUNT(DISTINCT md5(dd.text)) AS BIGINT) AS dt
          FROM dd JOIN prof p USING (doc_id) GROUP BY 1),
        lt AS (SELECT source, lang AS top_lang, c AS top_lang_docs
          FROM (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c,
              ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY COUNT(*) DESC, lang) AS rn
            FROM dd GROUP BY source, lang) WHERE rn = 1)
        SELECT ps.source, ps.n_docs, ps.total_tokens,
          CAST(ROUND(CAST(ps.q_micro AS DOUBLE) / ps.n_docs, 0)
            AS BIGINT) AS mean_quality_ppm,
          CAST(ROUND(1e6 * (ps.n_docs - ps.dt) / ps.n_docs, 0)
            AS BIGINT) AS exact_dup_ppm,
          lt.top_lang, lt.top_lang_docs,
          CAST(ROUND(1e6 * lt.top_lang_docs / ps.n_docs, 0) AS BIGINT)
            AS top_lang_ppm
        FROM ps JOIN lt USING (source) ORDER BY ps.source""")),

    Q("x66_join_blowup",
      // pre-join cardinality audit (the number that decides broadcast
      // vs shuffle vs salt BEFORE a 100 TB join runs): per-key counts
      // both sides of an events self-join, exact per-key output
      // contribution n_left·n_right, top-10 blowup keys with the
      // one-row totals broadcast onto each. Two partial-aggregated
      // key counts + one key-frame join — never the join itself.
      (s, d) => {
        val ev = eventsTable(s, d)
        graft.pipeline.Skew.joinCardinality(ev, ev, "user_id", topK = 10)
          .orderBy(col("est_rows").desc, col("user_id"))
      },
      Some("""WITH c AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        per AS (SELECT user_id, n AS n_left, n AS n_right,
            n * n AS est_rows FROM c),
        tot AS (SELECT CAST(SUM(est_rows) AS BIGINT) AS total_est_rows,
            CAST(COUNT(*) AS BIGINT) AS n_join_keys FROM per)
        SELECT per.user_id, per.n_left, per.n_right, per.est_rows,
          tot.total_est_rows, tot.n_join_keys,
          CAST(ROUND(1e6 * per.est_rows / tot.total_est_rows, 0)
            AS BIGINT) AS share_ppm
        FROM per, tot
        ORDER BY per.est_rows DESC, per.user_id LIMIT 10""")),

    Q("x67_pack_efficiency",
      // packing-efficiency audit over the x11 first-fit pack: one
      // global utilization row — sequences, docs, fill vs capacity in
      // ppm, overflow sequences (a boundary-crossing doc stays in the
      // sequence where it started, pushing it past budget — the lane
      // makes that cost visible). The oracle replays the ENTIRE pack
      // (x11's cumulative-sum SQL) and the rollup.
      (s, d) => Sampling.packEfficiency(
        Sampling.packSequences(t(s, d, "documents"),
          idCol = "doc_id", sizeCol = "n_chars", budget = 4000L,
          numBuckets = 8),
        "n_chars", 4000L),
      Some("""WITH b AS (
          SELECT doc_id, n_chars,
            CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS pack_bucket
          FROM documents),
        c AS (
          SELECT pack_bucket, n_chars,
            SUM(n_chars) OVER (PARTITION BY pack_bucket ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM b),
        seqs AS (
          SELECT pack_bucket,
            CAST(FLOOR(CAST(cum - n_chars AS DOUBLE) / 4000) AS BIGINT)
              AS seq_id,
            CAST(COUNT(*) AS BIGINT) AS docs,
            CAST(SUM(n_chars) AS BIGINT) AS fill
          FROM c GROUP BY 1, 2),
        roll AS (SELECT
          CAST(COUNT(*) AS BIGINT) AS n_seqs,
          CAST(SUM(docs) AS BIGINT) AS n_docs,
          CAST(SUM(fill) AS BIGINT) AS total_units,
          CAST(SUM(CASE WHEN fill > 4000 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_overflow_seqs,
          CAST(MAX(fill) AS BIGINT) AS max_fill
          FROM seqs)
        SELECT n_seqs, n_docs, total_units, n_overflow_seqs, max_fill,
          n_seqs * 4000 AS capacity,
          CAST(ROUND(1e6 * total_units / (n_seqs * 4000), 0) AS BIGINT)
            AS utilization_ppm
        FROM roll""")),

    Q("x68_mergeable_card",
      // the dataset card as MERGEABLE slice states (x63's daily-ingest
      // twin, composing the whole mergeable family into the release
      // deliverable): three doc_id-sliced states each carry per-source
      // exact sums + one HLL sketch of content hashes; the card over
      // the union merges from states — no text re-read. Exact lanes
      // (docs/tokens/mean quality) the oracle replays; the distinct-
      // texts estimate vs the exact twin is a tolerance verdict pinned
      // TRUE (sparse-mode HLL is exact at these cardinalities, the
      // p41 pattern).
      (s, d) => {
        val docs = t(s, d, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val third = (maxId + 1L) / 3L
        val state = freshState(s, "x68") + "/states"
        (0 to 2).foreach { i =>
          val lo = i * third
          val hi = if (i == 2) maxId + 1L else (i + 1) * third
          Curation.cardSliceState(
              docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
              s"slice$i")
            .coalesce(1).write.mode("append").parquet(state)
        }
        val card = Curation.cardFromStates(s.read.parquet(state))
        val exact = docs.groupBy(col("source"))
          .agg(countDistinct(md5(col("text"))).as("__exact_distinct"))
        card.join(exact, Seq("source"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            col("mean_quality_ppm"),
            col("__exact_distinct").as("exact_distinct_texts"),
            (abs(col("approx_distinct_texts").cast("double") -
              col("__exact_distinct").cast("double")) <=
              greatest(col("__exact_distinct").cast("double") * 0.05,
                lit(5.0))).as("distinct_within_tol"))
          .orderBy("source")
      },
      Some(s"""WITH prof AS (SELECT doc_id, n_tokens, quality_score
          FROM ($duckTextProfileSql)),
        dd AS (SELECT doc_id, source, text FROM documents)
        SELECT dd.source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
          CAST(ROUND(CAST(SUM(CAST(ROUND(p.quality_score * 1e6, 0)
            AS BIGINT)) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
            AS mean_quality_ppm,
          CAST(COUNT(DISTINCT md5(dd.text)) AS BIGINT)
            AS exact_distinct_texts,
          TRUE AS distinct_within_tol
        FROM dd JOIN prof p USING (doc_id)
        GROUP BY dd.source ORDER BY dd.source""")),

    Q("x64_mergeable_sample",
      // mergeable deterministic uniform sample (bottom-k by md5(id) —
      // the KMV order-statistic idea keeping the ROWS): two slices
      // each persist a k-row sample state; merging the states equals
      // sampling the union directly, which is exactly what the oracle
      // computes — so the closure property itself is what's pinned.
      // Slice sampling is TakeOrdered (per-partition top-k, no global
      // sort); states are k rows regardless of slice size.
      (s, d) => {
        val docs = t(s, d, "documents")
        val half = docs.agg(max(col("doc_id"))).head().getLong(0) / 2L
        val state = freshState(s, "x64") + "/states"
        Sampling.bottomKSample(docs.filter(col("doc_id") <= half), 50)
          .select("doc_id", "rank_key")
          .coalesce(1).write.mode("append").parquet(state)
        Sampling.bottomKSample(docs.filter(col("doc_id") > half), 50)
          .select("doc_id", "rank_key")
          .coalesce(1).write.mode("append").parquet(state)
        Sampling.mergeBottomK(s.read.parquet(state), 50)
          .orderBy("rank_key")
      },
      Some("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS rank_key
        FROM documents ORDER BY rank_key LIMIT 50""")),

    Q("x65_l_diversity",
      // l-diversity audit (Machanavajjhala et al.) — the k-anonymity
      // companion x60 needs: a (nation, segment) class can be large
      // yet leak if every member shares the sensitive value (account
      // balance sign here). Classes with < 2 distinct sensitive
      // values, with size and distinct-l; one hash aggregate.
      (s, d) => graft.pipeline.Privacy.lDiversityViolations(
          t(s, d, "customer").withColumn("bal_sign",
            when(col("c_acctbal") < 0, "neg").otherwise("nonneg")),
          Seq("c_nationkey", "c_mktsegment"), "bal_sign", l = 2)
        .withColumn("c_nationkey", col("c_nationkey").cast("int")),
      Some("""WITH classes AS (
          SELECT c_nationkey, c_mktsegment,
            CAST(COUNT(*) AS BIGINT) AS class_size,
            CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
              ELSE 'nonneg' END) AS BIGINT) AS l_distinct
          FROM customer GROUP BY 1, 2)
        SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_mktsegment,
          class_size, l_distinct
        FROM classes WHERE l_distinct < 2
        ORDER BY l_distinct, class_size, c_nationkey, c_mktsegment""")),

    Q("x60_k_anonymity",
      // re-identification audit (Sweeney's k-anonymity) before a
      // customer-derived table feeds a corpus: equivalence classes on
      // the (nation, segment) quasi-identifiers below the k = 10
      // floor, each row carrying the table's k level. One hash
      // aggregate over the quasi columns; the class frame is
      // metadata-sized next to the table.
      (s, d) => graft.pipeline.Privacy.kAnonymityViolations(
          t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10)
        .withColumn("c_nationkey", col("c_nationkey").cast("int")),
      Some("""WITH classes AS (
          SELECT c_nationkey, c_mktsegment,
            CAST(COUNT(*) AS BIGINT) AS class_size
          FROM customer GROUP BY 1, 2),
        tk AS (SELECT MIN(class_size) AS table_k FROM classes)
        SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_mktsegment,
          class_size, tk.table_k
        FROM classes, tk WHERE class_size < 10
        ORDER BY class_size, c_nationkey, c_mktsegment""")),

    Q("x59_langid_eval",
      // classifier evaluation closing the eval family (e17 ANN recall,
      // d12 dedup P/R): per-class precision/recall/F1 of the x44
      // language-ID predictions against the corpus's lang labels.
      // Three label-keyed aggregations, label-count rows out. The
      // per-(doc, candidate) scores persist and the oracle re-derives
      // the PREDICTIONS (x44's argmax SQL) and every metric itself.
      (s, d) => {
        val docs = t(s, d, "documents")
        val state = freshState(s, "x59")
        TextAnalysis.languageScores(docs).write.mode("overwrite")
          .parquet(state + "/scores")
        val preds = TextAnalysis.languagePicks(
            s.read.parquet(state + "/scores"), docs)
          .withColumnRenamed("lang", "predicted")
        val scored = docs.select(col("doc_id"), col("lang").as("truth"))
          .join(preds, "doc_id")
        graft.pipeline.Classify.classificationReport(scored)
          .orderBy("class")
      },
      Some("""WITH sc AS (SELECT * FROM
          read_parquet('/tmp/graft_qstate/x59/scores/*.parquet')),
        t1 AS (SELECT doc_id, arg_min(lang, prio) AS lang
          FROM sc WHERE tier = 1 AND score > 0 GROUP BY doc_id),
        t2 AS (SELECT doc_id, lang FROM (
            SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, prio ASC) AS rn
            FROM sc WHERE tier = 2 AND score > 0) WHERE rn = 1),
        scored AS (
          SELECT d.lang AS truth,
            COALESCE(t1.lang, t2.lang, 'und') AS predicted
          FROM documents d
          LEFT JOIN t1 ON d.doc_id = t1.doc_id
          LEFT JOIN t2 ON d.doc_id = t2.doc_id),
        t AS (SELECT truth AS class, CAST(COUNT(*) AS BIGINT) AS n_truth
          FROM scored GROUP BY 1),
        p AS (SELECT predicted AS class,
            CAST(COUNT(*) AS BIGINT) AS n_pred
          FROM scored GROUP BY 1),
        c AS (SELECT truth AS class,
            CAST(COUNT(*) AS BIGINT) AS n_correct
          FROM scored WHERE truth = predicted GROUP BY 1),
        g AS (
          SELECT COALESCE(t.class, p.class) AS class,
            COALESCE(n_truth, 0) AS n_truth,
            COALESCE(n_pred, 0) AS n_pred
          FROM t FULL OUTER JOIN p ON t.class = p.class)
        SELECT g.class, g.n_truth, g.n_pred,
          COALESCE(c.n_correct, 0) AS n_correct,
          CASE WHEN g.n_pred = 0 THEN NULL
            ELSE ROUND(CAST(COALESCE(c.n_correct, 0) AS DOUBLE)
              / g.n_pred, 6) END AS precision,
          CASE WHEN g.n_truth = 0 THEN NULL
            ELSE ROUND(CAST(COALESCE(c.n_correct, 0) AS DOUBLE)
              / g.n_truth, 6) END AS recall,
          CASE WHEN g.n_pred + g.n_truth = 0 THEN NULL
            ELSE ROUND(CAST(2 AS DOUBLE) * COALESCE(c.n_correct, 0)
              / (g.n_pred + g.n_truth), 6) END AS f1
        FROM g LEFT JOIN c ON c.class = g.class
        ORDER BY g.class""")),

    Q("x45_hybrid_rrf",
      // hybrid retrieval: BM25 lexical arm (x36's scorer) + brute-force
      // cosine ANN arm (e02's scorer) fused with reciprocal-rank fusion.
      // Both arm rankings are persisted and the oracle recomputes RRF
      // from them (replay pattern), so the fusion arithmetic itself is
      // cross-checked; doc_id and vec_id share the id space by fixture
      // construction (embedding i belongs to document i).
      (s, d) => {
        val state = freshState(s, "x45")
        TextAnalysis.bm25TopK(t(s, d, "documents"),
            Seq("spark", "merge", "vector"), k = 20)
          .select(col("doc_id"), col("rank"))
          .write.mode("overwrite").parquet(state + "/bm25")
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 20)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
          .write.mode("overwrite").parquet(state + "/ann")
        TextAnalysis.rrfFuse(Seq(
            s.read.parquet(state + "/bm25"),
            s.read.parquet(state + "/ann")), topK = 10)
          .orderBy("rank")
      },
      Some("""WITH arms AS (
          SELECT doc_id, rank
          FROM read_parquet('/tmp/graft_qstate/x45/bm25/*.parquet')
          UNION ALL
          SELECT doc_id, rank
          FROM read_parquet('/tmp/graft_qstate/x45/ann/*.parquet')),
        sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_arms,
            CAST(SUM(CAST(ROUND(1e9 / (60 + rank), 0) AS BIGINT)) AS BIGINT)
              AS nano
          FROM arms GROUP BY 1),
        ranked AS (SELECT doc_id, n_arms, nano,
            ROW_NUMBER() OVER (ORDER BY nano DESC, doc_id) AS rank FROM sc)
        SELECT doc_id, CAST(rank AS INT) AS rank,
          ROUND(CAST(nano AS DOUBLE) / 1e9, 6) AS rrf_score, n_arms
        FROM ranked WHERE rank <= 10 ORDER BY rank""")),

    Q("x69_html_extract",
      // HTML → text extraction (raw-crawl onboarding): every document
      // wraps into a deterministic page — title, style block, a
      // script whose STRING contains a closing tag, a comment, entity
      // escapes — and the fixed regexp_replace chain strips it back
      // out (script/style WITH content, comments, tags, entity
      // decode with &amp; last, whitespace collapse). Codegen'd
      // column expressions, no UDF; the oracle rebuilds the same
      // pages and replays every step in RE2.
      (s, d) => {
        val docs = t(s, d, "documents")
        val page = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>p { color: #333; }</style>" +
            "<script>var t = \"</b>\"; if (1 < 2) { go(); }</script>" +
            "</head><body><h1>Doc "), col("doc_id").cast("string"),
          lit("</h1><!-- crawler note --><p>"), col("text"),
          lit("</p><div class=\"footer\">&amp;copy; Example " +
            "&lt;inc&gt;</div></body></html>"))
        docs.select(col("doc_id"),
            TextAnalysis.extractHtmlText(page).as("clean"))
          .withColumn("n_chars_clean", length(col("clean")))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          '</title><style>p { color: #333; }</style>' ||
          '<script>var t = "</b>"; if (1 < 2) { go(); }</script>' ||
          '</head><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
          '</h1><!-- crawler note --><p>' || text ||
          '</p><div class="footer">&amp;copy; Example ' ||
          '&lt;inc&gt;</div></body></html>' AS html
          FROM documents),
        c1 AS (SELECT doc_id, regexp_replace(html,
          '(?i)<script[^>]*>[\s\S]*?</script>', ' ', 'g') AS x FROM h),
        c2 AS (SELECT doc_id, regexp_replace(x,
          '(?i)<style[^>]*>[\s\S]*?</style>', ' ', 'g') AS x FROM c1),
        c3 AS (SELECT doc_id, regexp_replace(x,
          '<!--[\s\S]*?-->', ' ', 'g') AS x FROM c2),
        c4 AS (SELECT doc_id, regexp_replace(x,
          '<[^>]*>', ' ', 'g') AS x FROM c3),
        c5 AS (SELECT doc_id,
          replace(replace(replace(replace(replace(x,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
            '&#39;', ''''), '&amp;', '&') AS x FROM c4)
        SELECT doc_id,
          trim(regexp_replace(x, '\s+', ' ', 'g')) AS clean,
          CAST(LENGTH(trim(regexp_replace(x, '\s+', ' ', 'g')))
            AS INT) AS n_chars_clean
        FROM c5 ORDER BY doc_id""")),

    Q("x70_url_canonicalize",
      // URL canonicalization (the crawl-frontier/dedup normalizer):
      // the synthetic corpus holds no URLs (the x47 situation), so
      // each doc derives three deterministic raw variants — uppercase
      // host + default port + trailing slash, a tracking-param +
      // fragment twin, and a reordered-query API URL. Canonical form
      // lowercases scheme/host, strips the scheme's default port and
      // trailing slash, drops fragments and utm_*/fbclid/gclid
      // params, SORTS the survivors — the first two variants must
      // collapse to ONE canonical. Shared-regex column expressions
      // (no parse_url: it has no SQL mirror).
      (s, d) => {
        val docs = t(s, d, "documents")
        val urls = docs.select(explode(array(
          concat(lit("https://WWW."), col("source"),
            lit(".Example.co.uk:443/p/"), col("doc_id").cast("string"),
            lit("/")),
          concat(lit("https://www."), col("source"),
            lit(".example.co.uk/p/"), col("doc_id").cast("string"),
            lit("?utm_source=feed#frag")),
          concat(lit("http://api."), col("source"),
            lit(".example.com:80/v1?z=9&a=1")))).as("url"))
        urls
          .withColumn("canonical_url",
            TextAnalysis.canonicalizeUrl(col("url")))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_urls"),
            countDistinct(col("url")).as("n_variants"))
          .orderBy("canonical_url")
      },
      Some("""WITH vars AS (
          SELECT 'https://WWW.' || source || '.Example.co.uk:443/p/' ||
            CAST(doc_id AS VARCHAR) || '/' AS url FROM documents
          UNION ALL
          SELECT 'https://www.' || source || '.example.co.uk/p/' ||
            CAST(doc_id AS VARCHAR) || '?utm_source=feed#frag'
          FROM documents
          UNION ALL
          SELECT 'http://api.' || source || '.example.com:80/v1?z=9&a=1'
          FROM documents),
        parts AS (SELECT url,
            lower(regexp_extract(url, '^(https?)://', 1)) AS scheme,
            lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS hp,
            regexp_replace(regexp_extract(url,
              '^https?://[^/?#]+([^?#]*)', 1), '/+$', '') AS path,
            regexp_extract(url, '\?([^#]*)', 1) AS q
          FROM vars),
        norm AS (SELECT url, scheme,
            CASE WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '')
                 WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '')
                 ELSE hp END AS host,
            path,
            array_to_string(list_sort(list_filter(string_split(q, '&'),
              p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')
                AND p <> '')), '&') AS kept
          FROM parts),
        canon AS (SELECT url,
            scheme || '://' || host || path ||
            CASE WHEN kept <> '' THEN '?' || kept ELSE '' END
              AS canonical_url
          FROM norm)
        SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
          CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants
        FROM canon GROUP BY 1 ORDER BY 1""")),

    Q("x71_star_join",
      // the classic star-schema rollup (revenue by region/nation) —
      // the join-planning showcase: lineitem⋈orders⋈customer shuffle
      // on their keys, nation/region BROADCAST (25/5 rows — a shuffle
      // here would be a plan bug), money through DECIMAL(28,6).
      // At 100 TB this is the shape AQE + broadcast thresholds must
      // get right; the plan-shape spec asserts the broadcast side.
      (s, d) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(28,6)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
          CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q("x47_url_domains",
      // URL extraction → host → registered domain → per-domain mix
      // stats (the domain-cap prerequisite). The synthetic corpus holds
      // no URLs, so the query derives a deterministic URL-bearing
      // column from fixture data — the SAME derivation in the oracle —
      // and the extraction/psl/aggregation logic is what gets checked:
      // multi-label suffix folding (example.co.uk), port stripping, and
      // subdomain folding (cdnN.assets-example.com).
      (s, d) => {
        val urlText = concat(
          lit("see https://www."), col("source"),
          lit(".example.co.uk/p/"), col("doc_id"),
          lit(" mirror http://m."), col("source"),
          lit(".example.co.uk:8080/q"),
          lit(" and http://cdn"), pmod(col("doc_id"), lit(7)),
          lit(".assets-example.com/img.png"),
          lit(" via https://"), col("source"), lit("-host.net/a"))
        TextAnalysis.domainMix(
            t(s, d, "documents").withColumn("__text", urlText),
            textCol = "__text")
          .orderBy("registered_domain")
      },
      Some("""WITH d AS (SELECT doc_id,
            'see https://www.' || source || '.example.co.uk/p/'
              || CAST(doc_id AS VARCHAR)
              || ' mirror http://m.' || source || '.example.co.uk:8080/q'
              || ' and http://cdn' || CAST(doc_id % 7 AS VARCHAR)
              || '.assets-example.com/img.png'
              || ' via https://' || source || '-host.net/a' AS text
          FROM documents),
        u AS (SELECT doc_id, unnest(regexp_extract_all(text,
            'https?://[\w-]+(?:\.[\w-]+)*(?::\d+)?(?:/[^\s]*)?')) AS url
          FROM d),
        h AS (SELECT doc_id,
            lower(regexp_extract(url, '^https?://([^/:]+)', 1)) AS host
          FROM u),
        r AS (SELECT doc_id, host, string_split(host, '.') AS l FROM h),
        rd AS (SELECT doc_id,
            CASE WHEN len(l) >= 3 AND (l[-2] || '.' || l[-1]) IN
                ('co.uk','org.uk','gov.uk','ac.uk','com.au','net.au',
                 'org.au','co.jp','or.jp','ne.jp','com.br','com.cn',
                 'co.in','co.kr','com.mx','com.tr','co.za','com.sg')
              THEN l[-3] || '.' || l[-2] || '.' || l[-1]
              WHEN len(l) >= 2 THEN l[-2] || '.' || l[-1]
              ELSE host END AS registered_domain
          FROM r)
        SELECT registered_domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM rd GROUP BY 1 ORDER BY 1""")),

    Q("x48_kmv_overlap",
      // the 100 TB twin of x41: corpus overlap from K-minimum-values
      // sketches (k = 256 smallest md5 values of each side's distinct
      // shingles) instead of shuffling every distinct shingle of both
      // corpora. md5 keeps the sketch deterministic and engine-
      // portable, so the ENTIRE estimator replays exactly in DuckDB —
      // full row-hash oracle, not a pinned verdict — and the _ok
      // columns additionally bound the estimates against the exact
      // x41-style overlap (KMV standard error ≈ 1/√k ≈ 0.0625; the
      // 0.2 gate is >3σ).
      (s, d) => {
        val docs = t(s, d, "documents")
        val k = 256
        // each sketch is ≤ k rows but its subtree is a full shingle
        // scan + distinct; cache both since kmvOverlap reads each one
        // three times (union sample + two membership joins) — in
        // production the sketches are persisted per corpus
        val skA = Dedup.kmvShingleSketch(
          docs.filter(col("doc_id") % 2 === 0), k = k).cache()
        val skB = Dedup.kmvShingleSketch(
          docs.filter(col("doc_id") % 2 === 1), k = k).cache()
        val est = Dedup.kmvOverlap(skA, skB, k)
        val exact = Dedup.corpusShingleOverlap(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1))
          .select(
            (col("common").cast("double") /
              (col("shingles_a") + col("shingles_b") - col("common")))
              .as("__jx"),
            (col("common").cast("double") /
              least(col("shingles_a"), col("shingles_b"))).as("__cx"))
        est.crossJoin(exact) // 1 row × 1 row
          .select(
            col("sample_k"), col("sample_inter"),
            col("jaccard_est"), col("containment_est"),
            round(col("__jx"), 6).as("jaccard_exact"),
            round(col("__cx"), 6).as("containment_exact"),
            (abs(col("jaccard_est") - col("__jx")) <= 0.2).as("jaccard_ok"),
            (abs(col("containment_est") - col("__cx")) <= 0.2)
              .as("containment_ok"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0) AS ts
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
          FROM toks WHERE len(ts) >= 3),
        ska AS (SELECT DISTINCT md5(shingle) AS h FROM sh
          WHERE doc_id % 2 = 0 ORDER BY h LIMIT 256),
        skb AS (SELECT DISTINCT md5(shingle) AS h FROM sh
          WHERE doc_id % 2 = 1 ORDER BY h LIMIT 256),
        s AS (SELECT h FROM
          (SELECT h FROM ska UNION SELECT h FROM skb) ORDER BY h LIMIT 256),
        f AS (SELECT
            CAST(COUNT(*) AS BIGINT) AS sample_k,
            CAST(SUM(CASE WHEN h IN (SELECT h FROM ska)
              AND h IN (SELECT h FROM skb) THEN 1 ELSE 0 END) AS BIGINT)
              AS sample_inter,
            SUM(CASE WHEN h IN (SELECT h FROM ska) THEN 1 ELSE 0 END) AS sa,
            SUM(CASE WHEN h IN (SELECT h FROM skb) THEN 1 ELSE 0 END) AS sb
          FROM s),
        tagged AS (
          SELECT shingle,
            MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
            MAX(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS b
          FROM sh GROUP BY 1),
        exact AS (
          SELECT CAST(SUM(a * b) AS DOUBLE)
              / (SUM(a) + SUM(b) - SUM(a * b)) AS jx,
            CAST(SUM(a * b) AS DOUBLE) / LEAST(SUM(a), SUM(b)) AS cx
          FROM tagged)
        SELECT sample_k, sample_inter,
          ROUND(CAST(sample_inter AS DOUBLE) / sample_k, 6) AS jaccard_est,
          ROUND(CAST(sample_inter AS DOUBLE) / LEAST(sa, sb), 6)
            AS containment_est,
          ROUND(jx, 6) AS jaccard_exact,
          ROUND(cx, 6) AS containment_exact,
          ABS(CAST(sample_inter AS DOUBLE) / sample_k - jx) <= 0.2
            AS jaccard_ok,
          ABS(CAST(sample_inter AS DOUBLE) / LEAST(sa, sb) - cx) <= 0.2
            AS containment_ok
        FROM f, exact""")),

    Q("x37_salted_count",
      // two-phase salted aggregation: per-key counts where no reducer
      // ever receives a hot key whole — phase 1 groups by (key, salt),
      // phase 2 sums the partials. Oracle = the plain GROUP BY.
      (s, d) => graft.pipeline.Skew.saltedCount(
          t(s, d, "lineitem"), "l_suppkey", saltFactor = 16)
        .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, COUNT(*) AS count
        FROM lineitem GROUP BY 1 ORDER BY l_suppkey""")),

    Q("x16_sessionize",
      // gap-based sessionization (6 h): one shuffle on user_id, session
      // rollup reuses the same partitioning; integer epoch-micro gaps
      (s, d) => graft.operators.Sessionize.sessionize(
          eventsTable(s, d).select("user_id", "ts", "value"),
          gapSeconds = 21600L, valueCol = "value")
        .select(col("user_id"), col("session_idx"), col("n_events"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss")
            .as("session_end"),
          col("value_sum"))
        .orderBy("user_id", "session_idx"),
      Some("""WITH g AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS opens
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        a AS (
          SELECT user_id, ts, value,
            SUM(opens) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_idx
          FROM g)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
          CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
        FROM a GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx""")),

    Q("c02_schema_diff",
      (s, d) => {
        import s.implicits._
        val cat = Catalog(s, d)
        val current = cat.snapshot()
        val previous = current
          .removed("supplier")
          .updatedWith("lineitem")(_.map(m =>
            m.copy(columns = m.columns.filterNot(_.name == "l_tax"))))
          .updatedWith("orders")(_.map(m =>
            m.copy(columns = m.columns.map(c =>
              if (c.name == "o_totalprice") c.copy(dataType = "string") else c))))
          .updatedWith("region")(_.map(m =>
            m.copy(primaryKeys = Seq("r_name"))))
        graft.schemadiff.SchemaDiff.compare(current, previous)
          .map(c => (c.changeType, c.table, c.column.getOrElse(""), c.important))
          .toDF("change_type", "table_name", "column_name", "important")
          .orderBy("change_type", "table_name", "column_name")
      },
      Some("""SELECT * FROM (VALUES
          ('column_added', 'lineitem', 'l_tax', FALSE),
          ('column_type_changed', 'orders', 'o_totalprice', TRUE),
          ('primary_key_changed', 'region', '', TRUE),
          ('table_added', 'supplier', '', FALSE))
        AS t(change_type, table_name, column_name, important)
        ORDER BY change_type, table_name, column_name""")),

    // C8: changes-store listing + acknowledge end-to-end (app.py:
    // 3857-4058): two appended batches, one acknowledged type — the
    // crash-safe store rewrite must flip exactly the matching rows.
    Q("c09_reconcile",
      // column-level table reconciliation (the migration-validation
      // classic): old = customer, new = a DECLARED snapshot mutation
      // (every 13th key deleted, every 7th balance +100, every 17th
      // segment rewritten). One key-keyed full-outer join + ONE
      // aggregate stacking every column's equal/diff counters;
      // null-safe equality. The schema diff says "the column
      // changed"; this says how many VALUES changed.
      (s, d) => {
        val cust = t(s, d, "customer")
        val mutated = cust.filter(col("c_custkey") % 13 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100)
              .otherwise(col("c_acctbal")))
          .withColumn("c_mktsegment",
            when(col("c_custkey") % 17 === 0, lit("UPDATED"))
              .otherwise(col("c_mktsegment")))
        graft.schemadiff.Reconcile.tableReconcile(cust, mutated,
            Seq("c_custkey"),
            Seq("c_acctbal", "c_mktsegment", "c_name", "c_nationkey"))
          .orderBy("column")
      },
      Some("""WITH o AS (SELECT c_custkey, c_name, c_acctbal,
            c_mktsegment, c_nationkey FROM customer),
        n AS (SELECT c_custkey, c_name,
            CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
              ELSE c_acctbal END AS c_acctbal,
            CASE WHEN c_custkey % 17 = 0 THEN 'UPDATED'
              ELSE c_mktsegment END AS c_mktsegment,
            c_nationkey
          FROM customer WHERE c_custkey % 13 <> 0),
        j AS (SELECT o.c_custkey AS ko, n.c_custkey AS kn,
            o.c_acctbal AS oa, n.c_acctbal AS na,
            o.c_nationkey AS oc, n.c_nationkey AS nc,
            o.c_mktsegment AS om, n.c_mktsegment AS nm,
            o.c_name AS onm, n.c_name AS nnm
          FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey),
        t AS (SELECT
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS matched,
          CAST(SUM(CASE WHEN kn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS only_old,
          CAST(SUM(CASE WHEN ko IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS only_new,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND oa IS NOT DISTINCT FROM na THEN 1 ELSE 0 END)
            AS BIGINT) AS eq_a,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND NOT (oa IS NOT DISTINCT FROM na) THEN 1 ELSE 0 END)
            AS BIGINT) AS df_a,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND oc IS NOT DISTINCT FROM nc THEN 1 ELSE 0 END)
            AS BIGINT) AS eq_c,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND NOT (oc IS NOT DISTINCT FROM nc) THEN 1 ELSE 0 END)
            AS BIGINT) AS df_c,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND om IS NOT DISTINCT FROM nm THEN 1 ELSE 0 END)
            AS BIGINT) AS eq_m,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND NOT (om IS NOT DISTINCT FROM nm) THEN 1 ELSE 0 END)
            AS BIGINT) AS df_m,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND onm IS NOT DISTINCT FROM nnm THEN 1 ELSE 0 END)
            AS BIGINT) AS eq_n,
          CAST(SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
            AND NOT (onm IS NOT DISTINCT FROM nnm) THEN 1 ELSE 0 END)
            AS BIGINT) AS df_n
          FROM j)
        SELECT 'c_acctbal' AS "column", matched AS n_matched,
          eq_a AS n_equal, df_a AS n_diff,
          only_old AS n_only_old, only_new AS n_only_new FROM t
        UNION ALL SELECT 'c_mktsegment', matched, eq_m, df_m,
          only_old, only_new FROM t
        UNION ALL SELECT 'c_name', matched, eq_n, df_n,
          only_old, only_new FROM t
        UNION ALL SELECT 'c_nationkey', matched, eq_c, df_c,
          only_old, only_new FROM t
        ORDER BY "column"""")),

    Q("c08_changes_listing",
      (s, d) => {
        import graft.types.SchemaChange
        val store = new graft.history.ChangesStore(s,
          freshState(s, "c08") + "/changes")
        store.append(Seq(
          SchemaChange("column_added", "orders", Some("o_comment"),
            Map.empty, important = false),
          SchemaChange("table_removed", "supplier", None,
            Map.empty, important = true)),
          java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))
        store.append(Seq(
          SchemaChange("column_type_changed", "orders", Some("o_totalprice"),
            Map.empty, important = true)),
          java.sql.Timestamp.valueOf("2026-01-02 10:00:00"))
        store.acknowledge("table_removed", "supplier")
        store.list()
          .select(col("change_type"), col("table_name"),
            coalesce(col("column_name"), lit("")).as("column_name"),
            col("important"), col("acknowledged"),
            date_format(col("detected_at"), "yyyy-MM-dd HH:mm:ss")
              .as("detected_at"))
          .orderBy(col("detected_at").desc, col("change_type"))
      },
      Some("""SELECT * FROM (VALUES
          ('column_type_changed', 'orders', 'o_totalprice', TRUE, FALSE,
            '2026-01-02 10:00:00'),
          ('column_added', 'orders', 'o_comment', FALSE, FALSE,
            '2026-01-01 10:00:00'),
          ('table_removed', 'supplier', '', TRUE, TRUE,
            '2026-01-01 10:00:00'))
        AS t(change_type, table_name, column_name, important, acknowledged,
          detected_at)
        ORDER BY detected_at DESC, change_type""")),

    // Notifications: publish through the gate (anomaly severity routing
    // + important-automation filter, publisher.py:24-49) and read the
    // durable event feed back — the store keeps EVERY event including
    // the non-notifiable one.
    Q("n01_event_feed",
      (s, d) => {
        import graft.notifications.Notifications._
        val store = new graft.notifications.EventStore(s,
          freshState(s, "n01") + "/events")
        val pub = new NotificationPublisher(store, NotificationSettings(),
          sinks = Nil)
        pub.publish(GraftEvent("anomaly", "anomaly_detected", "default",
          Some("orders"),
          Map("anomaly_count" -> "3", "high_severity_count" -> "1",
            "medium_severity_count" -> "2", "low_severity_count" -> "0"),
          java.sql.Timestamp.valueOf("2026-01-01 08:00:00")))
        pub.publish(GraftEvent("automation", "validation_failures_detected",
          "default", Some("region"),
          Map("failed_count" -> "2", "total_rules" -> "9"),
          java.sql.Timestamp.valueOf("2026-01-01 09:00:00")))
        pub.publish(GraftEvent("automation", "automation_job_completed",
          "default", None, Map("job" -> "metadata_refresh"),
          java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
        store.feed()
          .select(col("event_type"), col("subtype"),
            coalesce(col("table_name"), lit("")).as("table_name"),
            col("data"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
          .orderBy(col("ts").desc)
      },
      Some("""SELECT * FROM (VALUES
          ('automation', 'automation_job_completed', '',
            'job=metadata_refresh', '2026-01-01 10:00:00'),
          ('automation', 'validation_failures_detected', 'region',
            'failed_count=2;total_rules=9', '2026-01-01 09:00:00'),
          ('anomaly', 'anomaly_detected', 'orders',
            'anomaly_count=3;high_severity_count=1;low_severity_count=0;medium_severity_count=2',
            '2026-01-01 08:00:00'))
        AS t(event_type, subtype, table_name, data, ts)
        ORDER BY ts DESC""")))

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
  private def eventsStream(s: SparkSession, dir: String): DataFrame =
    graft.operators.TsNorm.normalizeTs(
      streamOf(s, s"$dir/events.parquet"), "ts")

  private def streamingQueries: Seq[Q] = Seq(
    Q("st01_stream_window_agg",
      // watermarked per-window metric aggregation (the detectors' input
      // stage) run as an actual stream; complete mode drains every
      // window, so the sink must equal the batch per-day counts
      (s, d) => {
        val windows = graft.streaming.StreamingDetect.windowedSeries(
          eventsStream(s, d).select(col("event_type"), col("ts")),
          seriesCol = "event_type", windowLength = "1 day",
          watermark = "2 days")
        runBoundedStream(s, windows, "st01_sink", "complete")
          .select(col("series"), col("ts").cast("date").as("day"),
            col("value"))
          .orderBy("series", "day")
      },
      Some("""SELECT event_type AS series,
          CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS DATE) AS day,
          CAST(COUNT(*) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2 ORDER BY series, day""")),

    Q("st02_stream_dedup",
      // ingest-time exact dedup: one state bit per content hash, only
      // the first doc per hash passes; single-batch arrival makes
      // "first" = min doc_id, which DuckDB states as a group-by
      (s, d) => {
        import s.implicits._
        val docs = streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id").as("docId"), col("text"))
          .as[graft.streaming.StreamingDetect.Doc]
        val kept = graft.streaming.StreamingDetect.dedupStream(docs)
        runBoundedStream(s, kept.toDF(), "st02_sink", "append")
          .select(col("docId").as("doc_id"),
            md5(col("text").cast("binary")).as("content_hash"))
          .orderBy("doc_id")
      },
      Some("""SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash
        FROM documents GROUP BY md5(text) ORDER BY doc_id""")),

    Q("st03_stream_zscore",
      // the headline streaming detector: per-series rolling z-score in
      // flatMapGroupsWithState, fed the SAME daily series as batch a02
      // — so the emitted detections must match the batch rolling-window
      // SQL row for row (7-point warm-up, trailing-7 stats)
      (s, d) => {
        import s.implicits._
        val seriesPath = freshState(s, "st03_series") + "/series"
        dailySeries(s, d)
          .select(col("event_type").as("series"),
            col("day").cast("timestamp").as("ts"), col("value"))
          .write.mode("overwrite").parquet(seriesPath)
        val pts = streamOf(s, seriesPath)
          .as[graft.streaming.StreamingDetect.MetricEvent]
        val det = graft.streaming.StreamingDetect.zscoreStream(
          pts, windowSize = 7, sensitivity = 1.0)
        runBoundedStream(s, det.toDF(), "st03_sink", "append")
          .select(col("series").as("event_type"),
            col("ts").cast("date").as("day"), col("value"),
            round(col("score"), 6).as("score"),
            col("isAnomaly").as("is_anomaly"), col("threshold"),
            col("severity"))
          .orderBy("event_type", "day")
      },
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER w AS m, STDDEV_POP(value) OVER w AS sd,
          COUNT(value) OVER w AS cnt
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM st WHERE cnt = 7)
        SELECT event_type, day, value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly, CAST(3.0 AS DOUBLE) AS threshold,
          CASE WHEN raw_score > 5.0 THEN 'high'
            WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity
        FROM scored ORDER BY event_type, day""")),

    Q("st04_stream_sessionize",
      // native session_window sessionization as a real watermarked
      // stream: append mode emits exactly the sessions the final
      // watermark (max ts - 2 h) closed — the oracle re-derives the
      // same sessions with x16's lag/gap SQL and applies the SAME
      // emission cutoff, so watermark semantics are verified too
      (s, d) => {
        val sessions = graft.streaming.StreamingDetect.sessionizeStream(
          eventsStream(s, d).select(col("user_id"), col("ts"), col("value")),
          keyCol = "user_id", tsCol = "ts", valueCol = "value",
          gap = "6 hours", watermark = "2 hours")
        runBoundedStream(s, sessions, "st04_sink", "append")
          .select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
              .as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss")
              .as("session_end"),
            col("n_events"), col("value_sum"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH g AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
              THEN 1 ELSE 0 END AS opens
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        a AS (
          SELECT user_id, ts, value,
            SUM(opens) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_idx
          FROM g),
        sess AS (
          SELECT user_id,
            MIN(ts) AS session_start, MAX(ts) AS session_end,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
          FROM a GROUP BY user_id, session_idx)
        SELECT user_id,
          strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
          strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
          n_events, value_sum
        FROM sess
        WHERE session_end + INTERVAL 6 HOUR
          < (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
        ORDER BY user_id, session_start""")),

    Q("st05_stream_profile",
      // continuous profiling: per-day column stats as a streaming
      // aggregation whose rows are IncrementalProfile-mergeable slice
      // states; complete mode drains every slice, so the sink must
      // equal the batch per-day stats (HLL sketch column excluded —
      // binary sketch bytes are engine-specific)
      (s, d) => {
        val prof = graft.streaming.StreamingDetect.streamingProfile(
          eventsStream(s, d).select(col("ts"), col("value"),
            col("event_type")),
          tsCol = "ts", cols = Seq("event_type", "value"),
          windowLength = "1 day", watermark = "2 days")
        runBoundedStream(s, prof, "st05_sink", "complete")
          .select(col("slice_id"), col("column").as("col_name"),
            col("cnt"), col("nulls"), col("mn"), col("mx"),
            round(col("sm"), 6).as("sm"))
          .orderBy("slice_id", "col_name")
      },
      Some("""WITH w AS (
          SELECT CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS TIMESTAMP)
              AS slice_end, value, event_type
          FROM events),
        per AS (
          SELECT slice_end, 'event_type' AS col_name,
            CAST(COUNT(event_type) AS BIGINT) AS cnt,
            CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS nulls,
            CAST(NULL AS DOUBLE) AS mn, CAST(NULL AS DOUBLE) AS mx,
            CAST(NULL AS DOUBLE) AS sm
          FROM w GROUP BY slice_end
          UNION ALL
          SELECT slice_end, 'value' AS col_name,
            CAST(COUNT(value) AS BIGINT) AS cnt,
            CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS nulls,
            MIN(value) AS mn, MAX(value) AS mx,
            ROUND(SUM(value), 6) AS sm
          FROM w GROUP BY slice_end)
        SELECT strftime(slice_end, '%Y-%m-%d %H:%M:%S') AS slice_id,
          col_name, cnt, nulls, mn, mx, sm
        FROM per ORDER BY slice_id, col_name""")),

    Q("st06_stream_stream_join",
      // watermarked stream-stream interval join: purchases matched to
      // the same user's views in the preceding hour. Both sides carry
      // watermarks and the time-range condition bounds join state (a
      // view can be dropped once the purchase watermark passes
      // view_ts + 1 h) — the 100 TB/day shape for event-to-event
      // attribution. Inner-join matches emit as they arrive, so a
      // bounded run equals the batch join exactly.
      (s, d) => {
        val ev = eventsStream(s, d)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
            col("event_id").as("view_id"))
          .withWatermark("view_ts", "2 hours")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("user_id"),
            col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
          .withWatermark("purchase_ts", "2 hours")
        val joined = purchases.join(views,
          expr("""v_user = user_id AND view_ts <= purchase_ts
            AND view_ts >= purchase_ts - INTERVAL 1 HOUR"""))
        runBoundedStream(s, joined, "st06_sink", "append")
          .select(col("purchase_id"), col("view_id"), col("user_id"),
            date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss")
              .as("purchase_ts"),
            date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss")
              .as("view_ts"))
          .orderBy("purchase_id", "view_id")
      },
      Some("""SELECT p.event_id AS purchase_id, v.event_id AS view_id,
          p.user_id,
          strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
          strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
        FROM events p JOIN events v
          ON p.event_type = 'purchase' AND v.event_type = 'view'
          AND v.user_id = p.user_id
          AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY purchase_id, view_id""")),

    Q("st07_stream_persist",
      // the streaming → persistence glue end-to-end: rolling-zscore
      // detections stream into the SAME locked, date-partitioned
      // anomalies store the batch scans and dashboards read, via
      // per-micro-batch foreachBatch appends. The oracle replays the
      // detector math in SQL and checks the STORE's read-back —
      // lifecycle columns included (every streamed row lands 'open').
      (s, d) => {
        import s.implicits._
        val base = freshState(s, "st07")
        dailySeries(s, d)
          .select(col("event_type").as("series"),
            col("day").cast("timestamp").as("ts"), col("value"))
          .write.mode("overwrite").parquet(base + "/series")
        val pts = streamOf(s, base + "/series")
          .as[graft.streaming.StreamingDetect.MetricEvent]
        val store = new graft.history.AnomaliesStore(s, base + "/anoms")
        val q = graft.streaming.StreamingDetect.persistDetections(
          graft.streaming.StreamingDetect.zscoreStream(pts, windowSize = 7),
          store, java.sql.Timestamp.valueOf(NOW))
        try q.processAllAvailable() finally q.stop()
        store.list(anomaliesOnly = false)
          .select(col("metric_name"), col("ts").cast("date").as("day"),
            col("metric_value"), round(col("score"), 6).as("score"),
            col("is_anomaly"), col("severity"), col("status"),
            col("table_name"),
            date_format(col("run_at"), "yyyy-MM-dd HH:mm:ss").as("run_at"))
          .orderBy("metric_name", "day")
      },
      Some(s"""WITH series AS ($duckDailySeries),
        st AS (SELECT event_type, day, value,
          AVG(value) OVER w AS m, STDDEV_POP(value) OVER w AS sd,
          COUNT(value) OVER w AS cnt
          FROM series
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        scored AS (SELECT event_type, day, value,
          CASE WHEN sd = 0 THEN 0.0 ELSE ABS((value - m) / sd) END AS raw_score
          FROM st WHERE cnt = 7)
        SELECT event_type AS metric_name, day,
          value AS metric_value, ROUND(raw_score, 6) AS score,
          raw_score > 3.0 AS is_anomaly,
          CASE WHEN raw_score > 5.0 THEN 'high'
            WHEN raw_score > 3.5 THEN 'medium'
            ELSE 'low' END AS severity,
          'open' AS status, '__stream' AS table_name,
          '$NOW' AS run_at
        FROM scored ORDER BY metric_name, day""")),

    Q("st08_stream_neardup_bootstrap",
      // daily-ingest near-dup screening end to end: the standing corpus
      // (doc_id < cut) was SimHash-signed ONCE by the batch pipeline;
      // the new slice streams in and is screened against the corpus AND
      // earlier arrivals via per-chunk state BOOTSTRAPPED from the
      // persisted store (initial-state flatMapGroupsWithState) — no old
      // text re-read, no batch re-run. Replay oracle (d04 pattern):
      // DuckDB recomputes hamming ≤ 3 over the persisted signature
      // table for every pair touching the slice; pigeonhole makes the
      // 4-chunk candidates equal all-pairs at this threshold, and
      // docId-ordered processing pins emission direction to
      // (later, earlier).
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val cut = 9L * (maxId + 1L) / 10L // d10's proportional boundary
        val base = freshState(s, "st08")
        Dedup.simhashSignatures(docs).write.mode("overwrite")
          .parquet(base + "/signatures")
        docs.filter(col("doc_id") >= cut).select("doc_id", "text")
          .write.mode("overwrite").parquet(base + "/slice")
        val store = s.read.parquet(base + "/signatures")
          .filter(col("doc_id") < cut)
        val slice = streamOf(s, base + "/slice")
          .select(col("doc_id").as("docId"), col("text"))
          .as[graft.streaming.StreamingDetect.Doc]
        val det = graft.streaming.StreamingDetect.nearDupStreamWithStore(
          slice, store, maxHamming = 3, maxBucketSize = Int.MaxValue)
        runBoundedStream(s, det.toDF(), "st08_sink", "append")
          // a pair sharing two chunks emits twice (by design — cheaper
          // than cross-key coordination inside the stream)
          .dropDuplicates("docId", "dupOf")
          .select(col("docId").as("doc_id"), col("dupOf").as("dup_of"),
            col("hamming"))
          .orderBy("doc_id", "dup_of")
      },
      Some("""WITH sig AS (SELECT doc_id, simhash
          FROM read_parquet('/tmp/graft_qstate/st08/signatures/*.parquet')),
        cut AS (SELECT 9 * (MAX(doc_id) + 1) // 10 AS c FROM sig),
        pairs AS (
          SELECT n.doc_id AS doc_id, o.doc_id AS dup_of,
            bit_count(xor(n.simhash, o.simhash)) AS h
          FROM sig n JOIN sig o
            ON n.doc_id >= (SELECT c FROM cut) AND o.doc_id < n.doc_id)
        SELECT doc_id, dup_of, CAST(h AS INT) AS hamming
        FROM pairs WHERE h <= 3 ORDER BY doc_id, dup_of""")),

    Q("st09_stream_quantiles",
      // continuous quantile profiling: per-day LogSketch states stream
      // out of a watermarked window aggregation (the p37 sketch's
      // streaming twin, sink shape = SliceStateStore's quantile lane),
      // then per-day p50/p90 estimates come from the drained states
      // alone. Verification is p37's rank-check lane per window: the
      // batch fraction of that day's rows ≤ each streamed estimate
      // must sit near q (oracle pins the verdicts TRUE plus exact
      // per-day counts; windows under 100 rows are excluded — rank
      // granularity 1/n would dominate the tolerance, not the sketch).
      (s, d) => {
        import graft.profiler.LogSketch
        val alpha = 0.01
        val states = runBoundedStream(s,
          graft.streaming.StreamingDetect.streamingQuantiles(
            eventsStream(s, d).select(col("ts"), col("value")),
            "ts", "value", alpha,
            windowLength = "1 day", watermark = "2 days"),
          "st09_sink", "complete")
        val ests = LogSketch.quantiles(
          states.select(
            to_date(col("slice_id")).cast("string").as("column"),
            col("lane"), col("bucket"), col("cnt")),
          alpha, Seq(0.5, 0.9))
          .groupBy(col("column").as("day"))
          .agg(
            max(when(col("q") === 0.5, col("estimate"))).as("__e50"),
            max(when(col("q") === 0.9, col("estimate"))).as("__e90"),
            max(col("n")).as("n"))
        val ev = eventsTable(s, d)
          .select(date_add(col("ts").cast("date"), 1).cast("string")
            .as("day"), col("value").cast("double").as("__v"))
          .where(col("__v").isNotNull)
        ev.join(broadcast(ests), "day")
          .groupBy(col("day"), col("n"))
          .agg(
            (sum(when(col("__v") <= col("__e50"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("__f50"),
            (sum(when(col("__v") <= col("__e90"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("__f90"))
          .where(col("n") >= 100)
          .select(col("day").cast("date").as("day"), col("n"),
            (abs(col("__f50") - 0.5) <= 0.05).as("p50_ok"),
            (abs(col("__f90") - 0.9) <= 0.05).as("p90_ok"))
          .orderBy("day")
      },
      Some("""WITH d AS (
          SELECT CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS DATE) AS day,
            value
          FROM events WHERE value IS NOT NULL)
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
          TRUE AS p50_ok, TRUE AS p90_ok
        FROM d GROUP BY day HAVING COUNT(*) >= 100 ORDER BY day""")),

    Q("st10_stream_classify",
      // model-at-ingest: the NB classifier in its SERVING form — vocab
      // capped to the top-512 training tokens (compactModel), published
      // to the versioned ModelStore BY NAME, loaded back, collected to
      // a broadcast map, scoring a REAL document stream map-only (no
      // shuffle, no state store). The oracle replays the capped-vocab
      // model over the same full corpus, so the cap semantics, the
      // store round-trip AND the stream scoring arithmetic are all
      // pinned. (Stale-version resolution — an older version underneath
      // must lose to the latest — is ModelStoreSpec's
      // "latest-version-wins" test; the bench query trains ONE model.)
      (s, d) => {
        val docs = t(s, d, "documents")
        val store = new graft.pipeline.ModelStore(
          s, freshState(s, "st10m"))
        store.save("stream_gate",
          graft.pipeline.Classify.compactModel(
            graft.pipeline.Classify.nbState(
              docs.filter(col("doc_id") % 5 =!= 0), "text", "source"),
            maxVocab = 512),
          java.time.Instant.parse("2024-01-02T00:00:00Z"))
        val stream = streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id"), col("text"))
        val scored = graft.pipeline.Classify.scoreBroadcast(
          store.load("stream_gate"), stream)
        runBoundedStream(s, scored, "st10_sink", "append")
          .orderBy("doc_id")
      },
      Some(nbOracle("SELECT * FROM documents", Some(512)))),

    Q("st11_stream_topk",
      // continuous heavy hitters: per-day (window, value) count states
      // out of a watermarked window aggregation (the st09 pattern on
      // the top-K lane), drained, pruned to the MergeableTopK candidate
      // shape (k·cnt > n — integer cut) and merged — so "top values
      // over any window range" is metadata-only over the stream's
      // sink. The oracle replays the per-day counts, the candidate cut
      // and the bracket arithmetic in SQL.
      (s, d) => {
        import graft.profiler.MergeableTopK
        val k = 8
        val states = graft.streaming.StreamingDetect.streamingTopKStates(
          eventsStream(s, d).select(col("ts"), col("event_type")),
          "ts", "event_type")
        // parquet round-trip: the memory-sink view resolves to the SAME
        // attribute ids on both sides of the totals self-join (analyzer
        // "conflicting references"); persisting the per-window states is
        // also the operator's real contract (the store any-range merges
        // read)
        val statePath = freshState(s, "st11") + "/states"
        runBoundedStream(s, states, "st11_sink", "complete")
          .write.mode("overwrite").parquet(statePath)
        val sink = s.read.parquet(statePath)
        val totals = sink.groupBy("slice_id").agg(sum("cnt").as("n"))
        val mg = sink.join(totals, "slice_id")
          .where(col("cnt") * k > col("n"))
          .select("slice_id", "value", "cnt", "n")
          .unionByName(totals.select(col("slice_id"),
            lit(null).cast("string").as("value"), lit(0L).as("cnt"),
            col("n")))
        MergeableTopK.merge(mg, k)
          .orderBy(col("lower").desc, col("value"))
      },
      Some("""WITH states AS (
          SELECT CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS VARCHAR)
            AS slice_id, event_type AS value,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT slice_id, SUM(cnt) AS n FROM states GROUP BY 1),
        cand AS (
          SELECT s.slice_id, s.value, s.cnt, t.n
          FROM states s JOIN tot t USING (slice_id)
          WHERE s.cnt * 8 > t.n),
        miss AS (SELECT slice_id, n // 8 AS m FROM tot),
        missall AS (SELECT CAST(SUM(m) AS BIGINT) AS m_all FROM miss),
        agg AS (
          SELECT c.value, CAST(SUM(c.cnt) AS BIGINT) AS lower,
            CAST(SUM(c.n // 8) AS BIGINT) AS miss_present,
            CAST(COUNT(*) AS BIGINT) AS slices_present
          FROM cand c GROUP BY 1)
        SELECT a.value, a.lower,
          a.lower + missall.m_all - a.miss_present AS upper,
          a.slices_present
        FROM agg a, missall
        ORDER BY a.lower DESC, a.value""")),

    Q("st13_stream_slo",
      // the SLO burn-rate monitor in its CONTINUOUS form (what the
      // SRE pattern actually runs as): the stream pays for the one
      // data-bound stage — a watermarked hourly error/total rollup,
      // map-side combined into windowed state — and the trailing-
      // window/alert math (Slo.burnFromHourly, the SAME code as a19)
      // runs over the drained hours-sized sink. One oracle serves
      // both forms: stream and batch must agree to the hash.
      (s, d) => {
        val hourly = graft.streaming.StreamingDetect
          .streamingHourlyErrors(eventsStream(s, d))
        graft.anomalies.Slo.burnFromHourly(
            runBoundedStream(s, hourly, "st13_sink", "complete"))
          .orderBy("hour")
      },
      Some(sloOracleSql)),

    Q("st15_stream_decontam",
      // decontamination AT INGEST: the e22 semantic gate in its
      // streaming form — the benchmark's banded signature index +
      // vectors ride one UDF closure (eval-set-sized by contract) and
      // every arriving embedding scores MAP-ONLY: no shuffle, no state
      // store, append mode. Same seeded hyperplane family as the batch
      // operator, so the oracle replays the band collision, exact
      // cosine and threshold from the SAME persisted signature frames
      // (uncapped: the per-row gate has no bucket to cap).
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val bench = emb.filter(col("vec_id") % 83 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            concat(slice(col("embedding"), 1, 56),
              array_repeat(lit(0.0f), 8)).as("embedding"))
        val state = freshState(s, "st15")
        Similarity.embeddingBandSignatures(emb)
          .coalesce(2).write.mode("overwrite").parquet(state + "/csig")
        Similarity.embeddingBandSignatures(bench)
          .coalesce(1).write.mode("overwrite").parquet(state + "/bsig")
        val stream = streamOf(s, s"$d/embeddings.parquet")
        val gated = Similarity.semanticGate(stream, bench, threshold = 0.9)
        runBoundedStream(s, gated, "st15_sink", "append")
          .select(col("vec_id").as("corpus_id"), col("bench_id"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("corpus_id", "bench_id")
      },
      Some("""WITH cs AS (SELECT vec_id AS id_a, band_idx, sig
          FROM read_parquet('/tmp/graft_qstate/st15/csig/*.parquet')),
        bs AS (SELECT vec_id AS id_b, band_idx, sig
          FROM read_parquet('/tmp/graft_qstate/st15/bsig/*.parquet')),
        cands AS (
          SELECT DISTINCT a.id_a, b.id_b
          FROM cs a JOIN bs b
            ON a.band_idx = b.band_idx AND a.sig = b.sig),
        bench AS (
          SELECT vec_id + 1000000 AS id_b,
            list_concat(embedding[1:56],
              [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) AS be
          FROM embeddings WHERE vec_id % 83 = 0),
        scored AS (
          SELECT c.id_a AS corpus_id, c.id_b AS bench_id,
            list_sum(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(b.be[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * SQRT(list_sum(list_transform(b.be,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            AS cos
          FROM cands c
          JOIN embeddings e ON e.vec_id = c.id_a
          JOIN bench b ON b.id_b = c.id_b)
        SELECT corpus_id, bench_id, ROUND(cos, 6) AS cosine
        FROM scored WHERE cos >= CAST(0.9 AS DOUBLE)
        ORDER BY corpus_id, bench_id""")),

    Q("st16_stream_substring_gate",
      // the x83 span gate at INGEST: the benchmark's distinct window
      // hashes ride the UDF closure (eval-registry-sized, the st15
      // contract) and every arriving doc derives its shared spans
      // MAP-ONLY — no shuffle, no state store, append mode. Same
      // every-50th-doc fixture as x83; the oracle is x83's replay
      // minus the corpus-df cap a per-row gate cannot see (each
      // arrival is judged alone).
      (s, d) => {
        val docs = t(s, d, "documents")
        val gramsPath = freshState(s, "st16") + "/grams"
        TextAnalysis.fingerprintHashes(
            docs.filter(length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40),
            gram = 40)
          .coalesce(8).write.mode("overwrite").parquet(gramsPath)
        val benchHashes = s.read.parquet(gramsPath)
          .filter(col("doc_id") % 50 === 0)
          .select("hash").distinct()
          .collect().map(_.getLong(0)).toSet
        val stream = streamOf(s, s"$d/documents.parquet")
          .filter(col("doc_id") % 50 =!= 0 &&
            length(regexp_replace(lower(col("text")),
              "\\s+", " ")) >= 40)
        val gated = Dedup.substringGate(stream, benchHashes)
        runBoundedStream(s, gated, "st16_sink", "append")
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH g AS (SELECT doc_id, pos, hash
          FROM read_parquet('/tmp/graft_qstate/st16/grams/*.parquet')),
        bh AS (SELECT DISTINCT hash FROM g WHERE doc_id % 50 = 0),
        sh AS (SELECT g.doc_id, g.pos
          FROM g JOIN bh USING (hash) WHERE g.doc_id % 50 <> 0),
        fl AS (SELECT doc_id, pos,
            MAX(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS cummax
          FROM sh),
        isl AS (SELECT doc_id, pos,
            SUM(CASE WHEN cummax IS NULL OR pos > cummax
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
          FROM fl),
        sp AS (SELECT doc_id,
            CAST(MIN(pos) AS BIGINT) AS span_start,
            CAST(MAX(pos) + 40 AS BIGINT) AS span_end,
            CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM isl GROUP BY doc_id, span_id)
        SELECT doc_id, span_start, span_end,
          span_end - span_start AS span_len, n_grams
        FROM sp WHERE span_end - span_start >= 60
        ORDER BY doc_id, span_start""")),

    Q("st17_stream_line_gate",
      // d15's line dedup at INGEST: the standing corpus's duplicate-
      // line dictionary (d15's composed fixture through duplicateLines)
      // persists dictionary-sized and rides the UDF closure (the
      // st15/st16 contract); each arriving doc cuts its known-
      // boilerplate lines MAP-ONLY — no shuffle, no state store,
      // append mode. Arrivals are the raw documents (newline-flattened
      // like the fixture), so a doc whose text occupies >=2 slots of
      // the standing corpus gates to empty. The oracle replays the
      // persisted dictionary against the same arrivals.
      (s, d) => {
        val base = t(s, d, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id").cast("long").as("bid"),
            regexp_replace(col("text"), "\n", " ").as("text"))
        val n = base.count()
        val m = math.max(n * 3 / 10, 10L)
        val grid = s.range(m).select(col("id").as("cid"))
          .select(col("cid"),
            explode(sequence(lit(0), lit(4))).as("j"))
          .withColumn("bid", (col("cid") * 7 + col("j") * 13) % n)
        val composed = grid.join(base, Seq("bid"))
          .groupBy("cid")
          .agg(array_join(transform(array_sort(collect_list(
            struct(col("j"), col("text")))),
            x => x.getField("text")), "\n").as("text"))
        val dictPath = freshState(s, "st17") + "/dict"
        Dedup.duplicateLines(composed, "cid", "text")
          .coalesce(1).write.mode("overwrite").parquet(dictPath)
        val keys = s.read.parquet(dictPath).select("line_md5")
          .collect().map(_.getString(0)).toSet
        val stream = streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id"),
            regexp_replace(col("text"), "\n", " ").as("text"))
        val gated = Dedup.lineGate(stream, keys)
        runBoundedStream(s, gated, "st17_sink", "append")
          .orderBy("doc_id")
      },
      Some("""WITH dict AS (SELECT line_md5 FROM read_parquet(
            '/tmp/graft_qstate/st17/dict/*.parquet')),
        arrivals AS (
          SELECT doc_id, replace(text, chr(10), ' ') AS text
          FROM documents),
        j AS (
          SELECT doc_id, text,
            (length(trim(text)) >= 15 AND md5(trim(text)) IN
              (SELECT line_md5 FROM dict)) AS dropped
          FROM arrivals)
        SELECT doc_id,
          CAST(1 AS BIGINT) AS n_lines,
          CAST(CASE WHEN dropped THEN 1 ELSE 0 END AS BIGINT)
            AS n_lines_removed,
          CAST(CASE WHEN dropped THEN length(text) ELSE 0 END AS BIGINT)
            AS removed_chars,
          CAST(length(CASE WHEN dropped THEN '' ELSE text END)
            AS BIGINT) AS cleaned_len,
          md5(CASE WHEN dropped THEN '' ELSE text END) AS cleaned_md5
        FROM j ORDER BY doc_id""")),

    Q("st18_stream_asset_manifest",
      // m06's multimodal catalog at INGEST: assetManifest is a single
      // map-only select (magic-byte sniff + byte-parsed metadata UDFs),
      // so the SAME code runs unchanged on a blob stream — no shuffle,
      // no state store, append mode. The mixed fixture (PNG/WAV/
      // MJPEG-AVI/Y4M/junk) persists once; the BATCH manifest over it
      // persists as the oracle's input, and the drained stream sink's
      // per-format rollup must hash-equal the batch rollup — stream
      // and batch share one answer.
      (s, _) => {
        val state = freshState(s, "st18")
        import s.implicits._
        val imgs = Multimodal.syntheticImageCorpus(s, groups = 20)
        val auds = Multimodal.syntheticAudioCorpus(s, n = 40)
          .select((col("id") + 1000L).as("id"), col("bytes"))
        val vids = Multimodal.syntheticVideoCorpus(s, n = 20)
          .select((col("id") + 2000L).as("id"), col("bytes"))
        val y4ms = Multimodal.syntheticY4mSceneCorpus(s, n = 10)
          .select((col("id") + 4000L).as("id"), col("bytes"))
        val junk = Seq((3000L, "not media at all".getBytes("UTF-8")))
          .toDF("id", "bytes")
        val blobs = imgs.unionByName(auds).unionByName(vids)
          .unionByName(y4ms).unionByName(junk)
        blobs.write.mode("overwrite").parquet(state + "/blobs")
        Multimodal.assetManifest(s.read.parquet(state + "/blobs"))
          .write.mode("overwrite").parquet(state + "/manifest")
        val sink = runBoundedStream(s,
          Multimodal.assetManifest(streamOf(s, state + "/blobs")),
          "st18_sink", "append")
        sink.groupBy("format")
          .agg(count(lit(1)).as("n_assets"),
            sum(when(col("decodable"), 1L).otherwise(0L))
              .as("n_decodable"),
            sum("n_bytes").as("total_bytes"),
            max("width").as("max_width"),
            max("duration_ms").as("max_duration_ms"))
          .orderBy("format")
      },
      Some("""SELECT format, CAST(COUNT(*) AS BIGINT) AS n_assets,
          CAST(SUM(CASE WHEN decodable THEN 1 ELSE 0 END) AS BIGINT)
            AS n_decodable,
          CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
          MAX(width) AS max_width,
          MAX(duration_ms) AS max_duration_ms
        FROM read_parquet('/tmp/graft_qstate/st18/manifest/*.parquet')
        GROUP BY format ORDER BY format""")),

    Q("st19_stream_compression_gate",
      // x87's repetitiveness gate at INGEST: compressionRatio is a
      // partition-local mapPartitions (one Deflater per partition), so
      // the SAME code runs unchanged on a document stream — no
      // shuffle, no state store, append mode. The BATCH per-doc frame
      // over the same corpus persists as the oracle's input, and the
      // drained stream sink's verdict rollup must hash-equal the batch
      // rollup — stream and batch share one answer, per ratio bucket.
      (s, d) => {
        val state = freshState(s, "st19")
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        TextAnalysis.compressionRatio(docs)
          .write.mode("overwrite").parquet(state + "/ratios")
        val stream = TextAnalysis.compressionRatio(
          streamOf(s, s"$d/documents.parquet")
            .select(col("doc_id"), col("text")))
        val sink = runBoundedStream(s, stream, "st19_sink", "append")
        sink
          .withColumn("bucket",
            when(col("ratio_ppm") < 150000L, "template_suspect")
              .when(col("ratio_ppm") < 500000L, "normal")
              .otherwise("incompressible"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bytes").as("total_bytes"),
            min("ratio_ppm").as("min_ratio_ppm"),
            max("ratio_ppm").as("max_ratio_ppm"))
          .orderBy("bucket")
      },
      Some("""WITH r AS (SELECT * FROM read_parquet(
            '/tmp/graft_qstate/st19/ratios/*.parquet')),
        b AS (SELECT *,
            CASE WHEN ratio_ppm < 150000 THEN 'template_suspect'
                 WHEN ratio_ppm < 500000 THEN 'normal'
                 ELSE 'incompressible' END AS bucket
          FROM r)
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
          MIN(ratio_ppm) AS min_ratio_ppm,
          MAX(ratio_ppm) AS max_ratio_ppm
        FROM b GROUP BY bucket ORDER BY bucket""")),

    Q("st20_stream_langid_gate",
      // language-ID gate at INGEST: detectLanguage is a pure
      // expression chain (script blocks, then stopword profiles —
      // map-only), so the SAME scorer runs unchanged on a document
      // stream: no shuffle, no state store, append mode — the gate
      // every multilingual crawl pipeline applies before anything
      // heavier sees off-target text. Arrivals keep an allowlist
      // (en/de/fr); the drained sink rolls up kept/dropped per picked
      // language. The batch scorer's per-(doc, candidate) frame
      // persists as the oracle's input and DuckDB replays the x44
      // argmax AND the gate rollup — so the stream's expression twin
      // must agree with the batch pick logic to the hash, attesting
      // corpus-wide the equivalence LanguageIdSpec pins on fixtures.
      (s, d) => {
        val state = freshState(s, "st20")
        val docs = t(s, d, "documents")
        TextAnalysis.languageScores(docs)
          .write.mode("overwrite").parquet(state + "/scores")
        val stream = streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id"),
            TextAnalysis.detectLanguage(col("text")).as("lang"),
            length(col("text")).cast("long").as("n_chars"))
          .withColumn("kept", col("lang").isin("en", "de", "fr"))
        val sink = runBoundedStream(s, stream, "st20_sink", "append")
        sink.groupBy("lang", "kept")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"))
          .orderBy("lang")
      },
      Some("""WITH sc AS (SELECT * FROM read_parquet(
            '/tmp/graft_qstate/st20/scores/*.parquet')),
        t1 AS (SELECT doc_id, arg_min(lang, prio) AS lang
          FROM sc WHERE tier = 1 AND score > 0 GROUP BY doc_id),
        t2 AS (SELECT doc_id, lang FROM (
            SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, prio ASC) AS rn
            FROM sc WHERE tier = 2 AND score > 0) WHERE rn = 1),
        picks AS (SELECT d.doc_id,
            COALESCE(t1.lang, t2.lang, 'und') AS lang,
            LENGTH(d.text) AS n_chars
          FROM documents d
          LEFT JOIN t1 ON d.doc_id = t1.doc_id
          LEFT JOIN t2 ON d.doc_id = t2.doc_id)
        SELECT lang, lang IN ('en', 'de', 'fr') AS kept,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM picks GROUP BY 1, 2 ORDER BY lang""")),

    Q("st21_stream_pii_gate",
      // PII gate at INGEST: piiScan is a pure regex expression chain
      // (map-only), so the SAME scrubber runs unchanged on a document
      // stream — no shuffle, no state store, append mode: the scrub
      // every corpus pipeline applies before text leaves the landing
      // zone. The x14 fixture injection (the corpus carries no real
      // PII) rides the stream unchanged; the drained sink rolls up
      // per PII kind + the clean/total rows (the st14 shape), and the
      // oracle recomputes every count from the raw text — batch
      // regexes and the stream's must agree corpus-wide.
      (s, d) => {
        val id = col("doc_id")
        val inj = concat(
          col("text"),
          when(id % 3 === 0, concat(lit(" contact user"),
            id.cast("string"), lit("@example.com"))).otherwise(""),
          when(id % 5 === 0, concat(lit(" call (415) 555-"),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(""),
          when(id % 7 === 0, concat(lit(" from 10."),
            (id % 200).cast("string"), lit("."),
            (id % 250).cast("string"), lit("."),
            (id % 100).cast("string"))).otherwise(""),
          when(id % 11 === 0, concat(lit(" ssn 123-45-"),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(""))
        val stream = streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id"), col("text"))
          .withColumn("text", inj)
        val annotated = Pii.piiScan(stream)
        val sink = runBoundedStream(s, annotated, "st21_sink", "append")
        def kindRow(kind: String) = sink.agg(
          lit(kind).as("rule"),
          sum(when(col(s"n_$kind") > 0, 1L).otherwise(0L)).as("n_docs"),
          sum(col(s"n_$kind")).as("n_hits"))
        kindRow("email")
          .unionByName(kindRow("phone"))
          .unionByName(kindRow("ipv4"))
          .unionByName(kindRow("ssn"))
          .unionByName(sink.agg(lit("_docs_clean").as("rule"),
            sum(when(col("n_email") + col("n_phone") + col("n_ipv4") +
              col("n_ssn") === 0, 1L).otherwise(0L)).as("n_docs"),
            lit(0L).as("n_hits")))
          .unionByName(sink.agg(lit("_docs_total").as("rule"),
            count(lit(1)).as("n_docs"), lit(0L).as("n_hits")))
          .orderBy("rule")
      },
      Some("""WITH injected AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 5 = 0
                 THEN ' call (415) 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.' || (doc_id % 200) || '.'
                   || (doc_id % 250) || '.' || (doc_id % 100) ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                 THEN ' ssn 123-45-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
          FROM documents),
        counts AS (SELECT doc_id,
            CAST(len(regexp_extract_all(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
              AS n_email,
            CAST(len(regexp_extract_all(t,
              '\([0-9]{3}\) [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
            CAST(len(regexp_extract_all(t,
              '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
            CAST(len(regexp_extract_all(t,
              '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn
          FROM injected)
        SELECT rule, n_docs, n_hits FROM (
          SELECT 'email' AS rule,
            CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_docs,
            CAST(SUM(n_email) AS BIGINT) AS n_hits FROM counts
          UNION ALL SELECT 'phone',
            CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(SUM(n_phone) AS BIGINT) FROM counts
          UNION ALL SELECT 'ipv4',
            CAST(SUM(CASE WHEN n_ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(SUM(n_ipv4) AS BIGINT) FROM counts
          UNION ALL SELECT 'ssn',
            CAST(SUM(CASE WHEN n_ssn > 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(SUM(n_ssn) AS BIGINT) FROM counts
          UNION ALL SELECT '_docs_clean',
            CAST(SUM(CASE WHEN n_email + n_phone + n_ipv4 + n_ssn = 0
              THEN 1 ELSE 0 END) AS BIGINT),
            CAST(0 AS BIGINT) FROM counts
          UNION ALL SELECT '_docs_total',
            CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT) FROM counts)
        ORDER BY rule""")),

    Q("st14_stream_quarantine",
      // row quarantine at INGEST time: Quarantine.annotate is map-only,
      // so the SAME rules run unchanged on a document stream (v06's
      // batch pass, as arrivals). Defects injected deterministically
      // (every 13th text emptied, every 17th lang nulled); the drained
      // annotated sink rolls up per rule and the oracle replays the
      // whole thing — batch and stream must agree to the hash.
      (s, d) => {
        import graft.validations.Quarantine
        val stream = streamOf(s, s"$d/documents.parquet")
          .select(col("doc_id"), col("text"), col("lang"))
          .withColumn("text",
            when(col("doc_id") % 13 === 0, lit("")).otherwise(col("text")))
          .withColumn("lang",
            when(col("doc_id") % 17 === 0, lit(null).cast("string"))
              .otherwise(col("lang")))
        val rules = Seq(
          Quarantine.RowRule("text_nonempty", length(col("text")) > 0),
          Quarantine.RowRule("lang_present", col("lang").isNotNull))
        val annotated = Quarantine.annotate(stream, rules)
        val sink = runBoundedStream(s, annotated, "st14_sink", "append")
        sink.select(explode(col("violations")).as("rule"))
          .groupBy("rule").agg(count(lit(1)).as("n_rows"))
          .unionByName(sink.agg(
            lit("_rows_clean").as("rule"),
            sum(when(!col("quarantined"), 1L).otherwise(0L))
              .as("n_rows")))
          .unionByName(sink.agg(lit("_rows_total").as("rule"),
            count(lit(1)).as("n_rows")))
          .orderBy("rule")
      },
      Some("""WITH d AS (SELECT doc_id,
            CASE WHEN doc_id % 13 = 0 THEN '' ELSE text END AS text,
            CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END AS lang
          FROM documents),
        flags AS (SELECT
            CASE WHEN COALESCE(LENGTH(text) > 0, FALSE)
              THEN 0 ELSE 1 END AS v_text,
            CASE WHEN lang IS NOT NULL THEN 0 ELSE 1 END AS v_lang
          FROM d)
        SELECT rule, n_rows FROM (
          SELECT 'text_nonempty' AS rule,
            CAST(SUM(v_text) AS BIGINT) AS n_rows FROM flags
          UNION ALL SELECT 'lang_present',
            CAST(SUM(v_lang) AS BIGINT) FROM flags
          UNION ALL SELECT '_rows_clean',
            CAST(SUM(CASE WHEN v_text + v_lang = 0 THEN 1 ELSE 0 END)
              AS BIGINT) FROM flags
          UNION ALL SELECT '_rows_total',
            CAST(COUNT(*) AS BIGINT) FROM flags)
        ORDER BY rule""")),

    Q("st12_stream_cdc_history",
      // CDC change feed → SCD2 history, streaming: each event SETS the
      // key's current value; a change CLOSES the previous version and
      // emits it (append-honest — open versions live in O(keys) state).
      // Fed the events feed as (user_id, ts, event_type) changes; the
      // oracle derives the same closed intervals with run-collapse +
      // lead windows. The batch twin is t12's snapshot-grain merge;
      // this is the event-grain form that touches each change once.
      (s, d) => {
        import s.implicits._
        val changes = eventsStream(s, d)
          .select(col("user_id").as("key"), col("event_id").as("seq"),
            col("ts"), col("event_type").as("value"))
          .as[graft.streaming.StreamingDetect.CdcEvent]
        val hist = graft.streaming.StreamingDetect
          .cdcHistoryStream(changes).toDF()
        runBoundedStream(s, hist, "st12_sink", "append")
          .select(col("key").as("user_id"), col("value"),
            date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss")
              .as("valid_from"),
            date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss")
              .as("valid_to"))
          .orderBy("user_id", "valid_from", "value")
      },
      Some("""WITH o AS (
          SELECT user_id, event_id, event_type AS value, ts,
            LAG(event_type) OVER w AS prev
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        runs AS (
          SELECT user_id, event_id, value, ts FROM o
          WHERE prev IS NULL OR prev <> value),
        closed AS (
          SELECT user_id, value, ts AS vf,
            LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS vt
          FROM runs)
        SELECT user_id, value,
          strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
          strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to
        FROM closed WHERE vt IS NOT NULL
        ORDER BY user_id, valid_from, value""")),

    Q("st22_stream_transitions",
      // streaming twin of x114: per-user O(1) state (the last event)
      // emits one (from, to) row per consecutive pair as events
      // arrive, chaining across micro-batches; the Markov matrix is a
      // downstream types^2-sized rollup of the drained rows and must
      // equal the batch window computation exactly
      (s, d) => {
        import s.implicits._
        val changes = eventsStream(s, d)
          .filter(col("user_id").isNotNull)
          .select(col("user_id").as("key"), col("event_id").as("seq"),
            col("ts"), col("event_type").as("value"))
          .as[graft.streaming.StreamingDetect.CdcEvent]
        // the oracle equality below assumes NO cross-batch late drops
        // (per-user (ts, seq) order across micro-batches — true for
        // the bounded file source today); count drops so a parity
        // failure is a diagnosed contract break, not a silent skew
        val dropped = s.sparkContext.longAccumulator("st22_dropped_late")
        val tr = graft.streaming.StreamingDetect
          .transitionStream(changes, Some(dropped)).toDF()
        val counts = runBoundedStream(s, tr, "st22_sink", "append")
          .groupBy(col("fromType").as("from_type"),
            col("toType").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        // the drop count rides in the ARTIFACT (r15 verdict ask): the
        // oracle pins dropped_late = 0, so any cross-batch late drop
        // makes the row hash-red WITH its cause visible in the tracked
        // artifact — a require here would abort the query first and
        // leave only an err message (no row to read), which is exactly
        // the debugger-only failure mode the ask wanted closed
        if (dropped.value != 0L)
          System.err.println(s"[st22] ${dropped.value} cross-batch " +
            "late events dropped — stream/batch parity will hash-red " +
            "with the count in the dropped_late column")
        val tot = counts.groupBy("from_type").agg(sum(col("n")).as("__tot"))
        counts.join(tot, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 1000000 div __tot").as("p_ppm"),
            lit(dropped.value).as("dropped_late"))
          .orderBy("from_type", "to_type")
      },
      // x114's oracle plus the pinned-zero drop counter: any cross-
      // batch late drop makes the Spark column non-zero -> hash-red
      Some(s"""SELECT from_type, to_type, n, p_ppm,
          CAST(0 AS BIGINT) AS dropped_late
        FROM ($transitionsOracleSql)
        ORDER BY from_type, to_type""")),

    Q("st23_stream_pit_enrich",
      // point-in-time ENRICHMENT at ingest — j07's streaming twin: a
      // stream-static left join of arriving events against the
      // (broadcast, versions-sized) SCD2 daily version table with the
      // validity-window condition. Map-only per arrival: no shuffle,
      // no state store, append mode — the "attach the config/price
      // version valid at event time" step every enrichment pipeline
      // runs before landing. Gap events (every 3rd version day is
      // removed) must land NULL, never a stale version; the oracle is
      // j07's naive theta join, shared verbatim.
      (s, d) => {
        // static side computed ONCE (versions-sized localCheckpoint),
        // not re-derived per micro-batch
        val hist = pitVersionHist(s, d)
          .withColumnRenamed("event_type", "h_type")
          .localCheckpoint()
        val ev = eventsStream(s, d)
          .select(col("event_id"), col("event_type"), col("ts"))
        val enriched = ev.join(broadcast(hist),
            ev("event_type") === col("h_type") &&
              ev("ts") >= col("valid_from") && ev("ts") < col("valid_to"),
            "left")
          .select(col("event_id"), col("event_type"),
            date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss")
              .as("version_from"),
            col("daily_count"))
        runBoundedStream(s, enriched, "st23_sink", "append")
          .orderBy("event_id")
      },
      Some(pitOracleSql)))

  /** Shared by x114 (batch) and st22 (streaming): the two paths are
   *  the SAME contract, so any oracle fix applies to both at once. */
  private val transitionsOracleSql: String =
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
