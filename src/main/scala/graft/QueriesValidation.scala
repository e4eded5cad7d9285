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

/** V-series validations slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesValidation {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
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
}
