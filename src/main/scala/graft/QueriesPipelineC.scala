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

/** D/E/M/X-series LLM data pipeline (3/3) slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesPipelineC {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
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
        FROM wr ORDER BY vec_id""")),

    Q("x122_bpe_replay",
      // the BPE tokenizer ITSELF, independently replayed (r16 verdict
      // optional ask #8): x46/x90 persist the engine's per-doc counts
      // and pin only the aggregation, trusting the Scala kernel via
      // BpeSpec fixtures — here the oracle re-runs the MERGE LOOP. A
      // DuckDB recursive CTE carries each word's segmentation as list
      // state and applies the identical leftmost-lowest-rank pair
      // reduction over the same 20-rule demo merges table, so a
      // kernel regression (rank order, tie rule, termination) goes
      // hash-red with NO persisted state trusted. Token budgets in
      // LLM data work are tokenizer-exact — this pins the tokenizer,
      // not just its sums. ASCII-only sample: the Scala kernel
      // segments by UTF-16 char while RE2's '.' is a codepoint, so
      // astral chars differ by construction (x121 owns unicode
      // canonicalization); ~40 docs bound the recursion to < 0.5 s.
      (s, d) =>
        t(s, d, "documents")
          .filter(col("doc_id") < 40 && col("text").isNotNull &&
            col("text").rlike("^\\p{ASCII}*$"))
          .select(col("doc_id"),
            TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
          .orderBy("doc_id"),
      Some("""WITH RECURSIVE
        eligible AS (SELECT doc_id, text FROM documents
          WHERE doc_id < 40 AND text IS NOT NULL
            AND regexp_matches(text, '^[[:ascii:]]*$')),
        words AS (
          SELECT doc_id, i AS wi, ws[i] AS w
          FROM (SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)),
                    '\s+'), x -> len(x) > 0) AS ws
                FROM eligible),
               UNNEST(range(1, len(ws) + 1)) AS t(i)),
        seg AS (
          SELECT doc_id, wi, regexp_extract_all(w, '.') AS pieces
          FROM words
          UNION ALL
          SELECT doc_id, wi,
            pieces[1:bi-1] || [pieces[bi] || pieces[bi+1]]
              || pieces[bi+2:] AS pieces
          FROM (
            SELECT doc_id, wi, pieces,
              list_position(rks, list_aggregate(
                list_filter(rks, r -> r IS NOT NULL), 'min')) AS bi
            FROM (
              SELECT doc_id, wi, pieces,
                list_transform(range(1, len(pieces)),
                  i -> CASE WHEN list_position(['t h','th e','i n',
                      'a n','an d','e r','o n','r e','in g','o u',
                      'e n','a t','e s','o r','t i','s t','a r',
                      'te d','o f','i s'],
                      pieces[i] || ' ' || pieces[i+1]) > 0
                    THEN list_position(['t h','th e','i n','a n',
                      'an d','e r','o n','r e','in g','o u','e n',
                      'a t','e s','o r','t i','s t','a r','te d',
                      'o f','i s'],
                      pieces[i] || ' ' || pieces[i+1]) END) AS rks
              FROM seg WHERE len(pieces) >= 2))
          WHERE bi IS NOT NULL AND bi > 0),
        final AS (
          SELECT doc_id, wi, len(pieces) AS n
          FROM (
            SELECT doc_id, wi, pieces,
              list_aggregate(list_filter(list_transform(
                range(1, len(pieces)),
                i -> CASE WHEN list_position(['t h','th e','i n',
                    'a n','an d','e r','o n','r e','in g','o u',
                    'e n','a t','e s','o r','t i','s t','a r',
                    'te d','o f','i s'],
                    pieces[i] || ' ' || pieces[i+1]) > 0
                  THEN 1 END), r -> r IS NOT NULL), 'min') AS anymerge
            FROM seg)
          WHERE len(pieces) < 2 OR anymerge IS NULL),
        counts AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bpe_tokens
          FROM final GROUP BY 1)
        SELECT e.doc_id, COALESCE(c.n_bpe_tokens, 0) AS n_bpe_tokens
        FROM eligible e LEFT JOIN counts c ON e.doc_id = c.doc_id
        ORDER BY e.doc_id""")))
}
