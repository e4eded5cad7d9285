package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing.
 *
 * Media rides as opaque `binary` columns with typed metadata; decode /
 * feature-extract run as partition-local batch functions (the Scala
 * analog of `mapInPandas`: one iterator per partition, vectorizable
 * batches, no per-row task overhead). The actual codec calls are STUBBED
 * (no image/audio libraries in this environment) behind
 * `MediaDecoder.decodeStub` — a deterministic fake with the real batch
 * shape — so the Spark-side schema, partitioning and UDF signatures are
 * real and tested while the codec is swappable.
 */
object Multimodal {

  /** Typed metadata sidecar for a media column. */
  final case class MediaMeta(
      mediaType: String, // image | audio | video
      format: String,    // png | jpeg | wav | mp4 | ...
      width: Int,
      height: Int,
      durationMs: Long)

  final case class MediaRow(id: Long, bytes: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      id: Long,
      mediaType: String,
      sizeBytes: Long,
      // decoded-feature stand-ins (deterministic stub values)
      meanIntensity: Double,
      featureVec: Array[Float])

  /** STUB decode: deterministic pseudo-features from the raw bytes.
   *  Swap this for a real codec (JavaCV / TwelveMonkeys / ffmpeg) in a
   *  full container — the signature is the contract: a BATCH of rows in,
   *  a batch of features out, so a real decoder can amortize per-batch
   *  model/codec setup exactly like `mapInPandas` does. */
  def decodeStub(batch: Iterator[MediaRow], dim: Int = 16): Iterator[MediaFeatures] =
    batch.map { r =>
      val h = r.bytes.foldLeft(0xcbf29ce484222325L)((a, b) => (a ^ b) * 0x100000001b3L)
      val rnd = new java.util.Random(h)
      MediaFeatures(
        id = r.id,
        mediaType = r.meta.mediaType,
        sizeBytes = r.bytes.length.toLong,
        meanIntensity = math.abs(h % 256).toDouble / 255.0,
        featureVec = Array.fill(dim)(rnd.nextFloat()))
    }

  /** Feature extraction over a media Dataset: partition-local batching,
   *  schema-preserving — repartition first so decode parallelism matches
   *  cores, not input file layout. */
  def extractFeatures(
      media: Dataset[MediaRow],
      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repart = if (partitions > 0) media.repartition(partitions) else media
    repart.mapPartitions(batch => decodeStub(batch))
  }

  /** Binary-column profile: sizes, null blobs, format histogram — the
   *  P-series profile for an opaque media column. Single pass. */
  def profileBinary(
      df: DataFrame,
      binCol: String,
      formatCol: Option[String] = None): DataFrame = {
    val b = col(binCol)
    val aggs = Seq(
      count(lit(1)).as("total_rows"),
      coalesce(sum(when(b.isNull, 1L).otherwise(0L)), lit(0L)).as("null_blobs"),
      min(length(b)).as("min_bytes"),
      max(length(b)).as("max_bytes"),
      round(avg(length(b)), 2).as("avg_bytes"),
      sum(length(b)).as("total_bytes"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic synthetic media table for tests/benches (the container
   *  has no real media files): bytes are seeded per id. */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPerRow: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new java.util.Random(i)
      val bytes = new Array[Byte](bytesPerRow)
      rnd.nextBytes(bytes)
      MediaRow(i, bytes, MediaMeta("image", "png", 32, 32, 0L))
    }
  }
}
