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

/** B-series batch multiplexers slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesBatch {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
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
            SparkEntry.queries)
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
}
