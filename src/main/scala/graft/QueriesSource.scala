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

/** S-series sources/catalog slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesSource {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
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
        val li = tS(s, d, "lineitem")
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
      (s, d) => Profiler.fdDiscovery(tS(s, d, "orders"),
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
        // independent snapshot writes to disjoint paths — one
        // wall-clock write, not two (guide §2.6, r19)
        inParallel(
          () => o.filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey").cast("int").as("o_orderkey"),
              col("o_custkey"),
              col("o_totalprice").cast("float").as("o_totalprice"))
            .coalesce(2).write.mode("overwrite").parquet(state + "/v1"),
          () => o.filter(col("o_orderkey") % 2 =!= 0)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice").cast("double").as("o_totalprice"),
              col("o_orderpriority"))
            .coalesce(2).write.mode("overwrite").parquet(state + "/v2"))
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
}
