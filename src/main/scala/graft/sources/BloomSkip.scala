package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Per-file Bloom filters: point-lookup data skipping where zone maps
 * can't help.
 *
 * [[ZoneMap]] prunes on min/max ranges — powerful when the layout
 * keeps each file's range narrow (sorted/Z-ordered data), useless for
 * a high-cardinality key written in arrival order, where every file's
 * [min, max] spans the whole domain. A per-file Bloom filter answers
 * "can file F contain key = v?" probabilistically with NO false
 * negatives: a point lookup over 100 TB then opens only the files
 * whose filter claims the key, instead of every file whose range
 * covers it (usually: all of them).
 *
 * The filter is a plain bitset in `array<long>` with k deterministic
 * probe positions per key derived from two xxhash64 passes
 * (h1 + i·h2 double hashing — the standard Kirsch–Mitzenmacher
 * construction). Everything is engine-neutral data: a sidecar row per
 * file, broadcastable at any corpus size (m/8 bytes per file), and
 * membership probes are reproducible from the persisted sidecar alone
 * — which is what lets the s12 oracle verify pruned-scan equivalence.
 *
 * Sizing: with k = 5 probes, m ≈ 10 bits/key gives ~1% false
 * positives; the default 2^17 bits (16 KiB/file) covers ~13k distinct
 * keys per file at that rate. Tune `bits` to the file's distinct
 * count, not its row count.
 */
object BloomSkip {

  /** Number of probe positions per key. */
  val NumProbes = 5

  /** Deterministic probe positions for a key hash pair (Kirsch–
   *  Mitzenmacher: pos_i = h1 + i·h2 mod m; h2 forced odd so probes
   *  cycle the whole table). */
  private[sources] def probes(h1: Long, h2: Long, mBits: Int): Array[Int] = {
    val step = h2 | 1L
    Array.tabulate(NumProbes) { i =>
      val p = (h1 + i * step) % mBits
      (if (p < 0) p + mBits else p).toInt
    }
  }

  private final class BloomAgg(mBits: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    private def words = (mBits + 63) / 64
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], kv: (Long, Long)): Array[Long] = {
      probes(kv._1, kv._2, mBits).foreach { p =>
        b(p >>> 6) |= (1L << (p & 63))
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build per-file Bloom filters for `keyCol` over every parquet file
   *  under `path` — ONE scan grouped by `_metadata.file_path`, the
   *  filter built as a mergeable aggregation buffer (map-side partial
   *  bitsets OR together). Output: (file, row_count, bloom:
   *  array<long>). Key hashing goes through the key's STRING form so
   *  the sidecar probes identically from any engine. */
  def build(
      spark: SparkSession,
      path: String,
      keyCol: String,
      bits: Int = 1 << 17): DataFrame = {
    require(bits > 64 && (bits & (bits - 1)) == 0, "bits must be a power of 2")
    val df = spark.read.parquet(path)
    val keyed = df.select(
      col("_metadata.file_path").as("file"),
      xxhash64(col(keyCol).cast("string")).as("h1"),
      xxhash64(col(keyCol).cast("string"), lit(0x9e3779b9L)).as("h2"))
    val agg = udaf(new BloomAgg(bits))
    keyed
      .groupBy("file")
      .agg(count(lit(1)).as("row_count"), agg(col("h1"), col("h2")).as("bloom"))
  }

  /** Membership probe against a built sidecar: files whose filter
   *  claims `key` (no false negatives; ~1% false positives at default
   *  sizing). The table size comes from the sidecar itself (bloom
   *  length × 64) — a build/probe sizing mismatch is therefore
   *  impossible, which protects the no-false-negative guarantee. The
   *  sidecar is a row per file by construction, so it collects
   *  driver-side and the membership test runs locally; key hashing
   *  stays a one-row Spark expression so the probe bits are computed
   *  by the SAME xxhash64 the build used. Persist/cache the sidecar
   *  frame for repeated probes — like [[ZoneMap]], it is the artifact,
   *  and re-deriving it from data would rescan what it exists to
   *  skip. */
  def pruneFiles(blooms: DataFrame, key: Column): Array[String] = {
    val spark = blooms.sparkSession
    val rows = blooms.select(col("file"), col("bloom")).collect()
    if (rows.isEmpty) return Array.empty
    val mBits = rows.head.getSeq[Long](1).length * 64
    val hs = spark.range(1)
      .select(xxhash64(key.cast("string")),
        xxhash64(key.cast("string"), lit(0x9e3779b9L)))
      .head()
    val ps = probes(hs.getLong(0), hs.getLong(1), mBits)
    rows.filter { r =>
      val words = r.getSeq[Long](1)
      ps.forall(p => (words(p >>> 6) & (1L << (p & 63))) != 0L)
    }.map(_.getString(0))
  }

  /** Point-lookup read: open only the files whose Bloom filter claims
   *  `key`. Like [[ZoneMap.prunedRead]], this PRUNES (superset
   *  guarantee) — callers still apply the real predicate. */
  def prunedRead(
      spark: SparkSession,
      path: String,
      blooms: DataFrame,
      key: Column): DataFrame = {
    val files = pruneFiles(blooms, key)
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
