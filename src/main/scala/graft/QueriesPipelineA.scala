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

/** D/E/M/X-series LLM data pipeline (1/3) slice of the SparkEntry query registry — split out of the
 *  13k-line SparkEntry.scala in round 17 so lane diffs stay
 *  reviewable. Same Seq, same order, zero behavior change; the
 *  contract, parity discipline and shared helpers live in
 *  [[SparkEntry]]. */
private[graft] object QueriesPipelineA {
  import SparkEntry._

  def queries: Seq[Q] = Seq(
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
        FROM ranked WHERE rank <= 10 ORDER BY rank""")))
}
