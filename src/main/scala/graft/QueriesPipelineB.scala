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

/** D/E/M/X-series LLM data pipeline (2/3) slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesPipelineB {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
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
        Dedup.dedupCorpus(sdocs, idCol = "sid", spread = false)
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
        // the two day-state saves are independent writes to disjoint
        // paths — one wall-clock write, not two (guide §2.6, r19)
        inParallel(
          () => graft.pipeline.Classify.nbStateSave(
            graft.pipeline.Classify.nbState(
              train.filter(col("doc_id") % 2 === 0), "text", "source"),
            state + "/day1"),
          () => graft.pipeline.Classify.nbStateSave(
            graft.pipeline.Classify.nbState(
              train.filter(col("doc_id") % 2 =!= 0), "text", "source"),
            state + "/day2"))
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
        // independent fixture writes to disjoint paths — one wall-clock
        // write, not two (guide §2.6, r19)
        inParallel(
          () => Similarity.embeddingBandSignatures(emb)
            .coalesce(2).write.mode("overwrite").parquet(state + "/csig"),
          () => Similarity.embeddingBandSignatures(bench)
            .coalesce(1).write.mode("overwrite").parquet(state + "/bsig"))
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
          // pinned floor (the a24 within_tol pattern): the operating
          // beam (ef=48) must clear 0.85 recall — the engine computes
          // the bool, the oracle claims TRUE, so a kernel regression
          // that flattens the curve goes hash-red instead of both
          // sides agreeing on the same collapsed numbers
          .withColumn("recall_ok",
            col("ef_search") < lit(48) || col("recall_ppm") >= lit(850000L))
          .select("ef_search", "n_returned", "n_hits", "n_exact",
            "recall_ppm", "recall_ok")
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
            AS BIGINT) AS recall_ppm,
          TRUE AS recall_ok
        FROM tot LEFT JOIN hit ON tot.ef_search = hit.ef_search, ne
        ORDER BY tot.ef_search""")),

    Q("e27_hnsw_takedown",
      // the ANN-store takedown lifecycle, oracle-gated end to end:
      // build the full index, REMOVE every vec_id % 7 == 0 (the
      // GDPR/DMCA batch), search the survivor graph. Three claims are
      // genuinely PINNED (one side computes, the other claims the
      // literal): removed_count (engine reports, oracle re-counts the
      // admission-filtered doomed set), n_ghost (engine COUNTS removed
      // ids in its own persisted approx sets, oracle claims 0 — a
      // resurrection goes hash-red), and recall_ok (engine computes
      // recall >= 0.7 per query, oracle claims TRUE — corruption that
      // merely degrades the survivor graph goes hash-red too; recall
      // alone would not catch it, both sides derive it from the same
      // approx parquet).
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
        val ap = s.read.parquet(state + "/approx")
        val nGhost = ap
          .filter(pmod(col("neighbor_id"), lit(7L)) === 0).count()
        Similarity.recallAtK(exact, ap)
          .withColumn("removed_count", lit(nRemoved))
          .withColumn("n_ghost", lit(nGhost))
          .withColumn("recall_ok", col("recall") >= lit(0.7))
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
          rc.removed_count,
          CAST(0 AS BIGINT) AS n_ghost,
          TRUE AS recall_ok
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id, rc
        ORDER BY m.method, nex.query_id""")),

    Q("e28_filtered_ann",
      // filtered (predicate-constrained) ANN — the search surface
      // every production vector store needs (lang/license/date/source
      // filters): top-k among ids passing a metadata predicate
      // (label % 3 = 0, ~40% selectivity on the fixture). Post-
      // filtering a fixed top-k silently loses recall (a p-selective
      // filter leaves ~p·k survivors); both lanes here filter DURING
      // the search — the HNSW walk routes through failing nodes but
      // admits only passers to the beam (ef inflation under a visit
      // budget), and the IVF probe semi-joins the allowed ids UNDER
      // the cell scan. Oracle = the e17 contract with ground truth
      // over the FILTERED corpus, plus two genuinely pinned claims:
      // n_disallowed (engine claims the literal 0, oracle COUNTS
      // predicate violations in the persisted approx sets — a filter
      // leak goes hash-red) and recall_ok (engine computes recall >=
      // floor, oracle claims TRUE — a filtered-recall collapse goes
      // hash-red; the floors are method-specific: the graph walk must
      // clear 0.7, the nprobe=8 cell probe 0.2 — both sit well under
      // the measured per-query minima across all three fixture scales,
      // 1.0 and 0.3).
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val allowedPred = col("label") % 3 === 0
        val allowed = emb.filter(allowedPred).select("vec_id")
        val queries = emb.filter(col("vec_id") < 25)
        val exact = Similarity.bruteForceTopK(
          emb.filter(allowedPred), queries, k = 10)
        val approx = graft.pipeline.Hnsw
          .topKFiltered(graft.pipeline.Hnsw.build(emb, m = 8,
            efConstruction = 64, shards = 4), queries, allowed,
            k = 10, efSearch = 48)
          .select(lit("hnsw_filtered").as("method"), col("query_id"),
            col("neighbor_id"))
          .unionByName(
            // a p-selective filter thins every probed cell to ~p of
            // its vectors, so the filtered lane probes WIDER (nprobe
            // 8, not e17's 4) — the standard 1/selectivity inflation
            Similarity.ivfTopKFiltered(Similarity.ivfBuild(emb, k = 16),
              queries, allowed, k = 10, nprobe = 8)
              .select(lit("ivf_filtered").as("method"), col("query_id"),
                col("neighbor_id")))
        val state = freshState(s, "e28")
        approx.write.mode("overwrite").parquet(state + "/approx")
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .withColumn("n_disallowed", lit(0L))
          .withColumn("recall_ok", col("recall") >=
            when(col("method") === "hnsw_filtered", lit(0.7))
              .otherwise(lit(0.2)))
          .orderBy("method", "query_id")
      },
      Some("""WITH surv AS (SELECT vec_id, embedding FROM embeddings
          WHERE label % 3 = 0),
        q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 25),
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
          FROM read_parquet('/tmp/graft_qstate/e28/approx/*.parquet')),
        hits AS (SELECT method, query_id,
            CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM ap JOIN exact USING (query_id, neighbor_id) GROUP BY 1, 2),
        m AS (SELECT DISTINCT method FROM ap),
        bad AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_disallowed
          FROM ap JOIN embeddings e ON ap.neighbor_id = e.vec_id
          WHERE e.label % 3 <> 0)
        SELECT m.method, nex.query_id, nex.n_exact,
          COALESCE(hits.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / nex.n_exact, 6)
            AS recall,
          bad.n_disallowed,
          TRUE AS recall_ok
        FROM m CROSS JOIN nex LEFT JOIN hits
          ON hits.method = m.method AND hits.query_id = nex.query_id, bad
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
        // recall_ok is the PINNED quality floor (the a24 within_tol
        // pattern): the engine computes recall >= 0.7 per query, the
        // oracle claims the literal TRUE — so lifecycle corruption
        // that merely LOWERS recall (ghost neighbors, a lost append
        // slice) goes hash-red even though both sides derive recall
        // from the same persisted approx sets
        Similarity.recallAtK(exact, s.read.parquet(state + "/approx"))
          .withColumn("recall_ok", col("recall") >= lit(0.7))
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
            AS recall,
          TRUE AS recall_ok
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
        FROM pc, st ORDER BY pc.cell""")))
}
