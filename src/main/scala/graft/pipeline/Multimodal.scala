package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing.
 *
 * Media rides as opaque `binary` columns with typed metadata; decode /
 * feature-extract run as partition-local batch functions (the Scala
 * analog of `mapInPandas`: one iterator per partition, vectorizable
 * batches, no per-row task overhead).
 *
 * Image decode/resize are REAL: `javax.imageio` (PNG/JPEG/GIF) ships in
 * the JDK's java.desktop module and needs no display in headless mode.
 * WAV PCM sample extraction is REAL byte parsing off the RIFF walker.
 * Video frames are REAL for MJPEG-in-AVI (container parse yields per-
 * frame JPEG payloads ImageIO decodes); inter-frame codecs (H.264 in
 * MP4) genuinely need an external codec and take the deterministic
 * stub fallback, so mixed/corrupt corpora never kill a 100 TB scan.
 */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // of an in-memory byte array creates (and synchronizes on) a temp
  // cache file. All our media rides as binary columns already in
  // memory, so the cache buys nothing and its file churn + registry
  // locking serialize the 32-thread decode path. Executor-side too:
  // this object initializes inside each task's JVM before first use.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** STUB decode: deterministic pseudo-features from the raw bytes —
   *  the fallback for formats the JDK can't decode (video, webp) and
   *  for corrupt bytes, so a 100 TB scan degrades per-row instead of
   *  failing. The signature is the contract: a BATCH of rows in, a
   *  batch of features out, so a heavier codec (JavaCV / ffmpeg) can
   *  amortize per-batch setup exactly like `mapInPandas` does. */
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

  /** REAL pixel decode of one blob via JDK ImageIO (PNG/JPEG/GIF).
   *  None when the bytes aren't a decodable image — the caller decides
   *  the fallback. ImageIO.read needs no display under headless. */
  private[graft] def decodeImageBytes(
      b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    sniffFormatBytes(b) match {
      case "png" | "jpeg" | "gif" =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        catch { case _: Exception => None }
      case _ => None
    }

  /** REAL image features: mean intensity = mean over pixels of
   *  (R+G+B)/3/255, featureVec = dim-bin normalized grayscale histogram.
   *  One bulk getRGB per image (no per-pixel JNI chatter); rows whose
   *  bytes don't decode fall back to the deterministic stub. */
  def decodeImages(
      batch: Iterator[MediaRow], dim: Int = 16): Iterator[MediaFeatures] =
    batch.map { r =>
      decodeImageBytes(r.bytes) match {
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0.0
          val hist = new Array[Long](dim)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            val gray = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            sum += gray
            hist(gray * dim / 256) += 1
            i += 1
          }
          val n = (w.toLong * h).toDouble
          MediaFeatures(r.id, r.meta.mediaType, r.bytes.length.toLong,
            sum / n / 255.0, hist.map(c => (c / n).toFloat))
        case None => decodeStub(Iterator.single(r), dim).next()
      }
    }

  /** Feature extraction over a media Dataset: partition-local batching,
   *  schema-preserving — repartition first so decode parallelism matches
   *  cores, not input file layout. Images decode for real (ImageIO);
   *  everything else takes the stub path. */
  def extractFeatures(
      media: Dataset[MediaRow],
      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repart = if (partitions > 0) media.repartition(partitions) else media
    repart.mapPartitions(batch => decodeImages(batch))
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

  // ---- REAL byte-level metadata (no codec library needed) ------------

  /** Container format from magic bytes: png / jpeg / gif / webp / wav /
   *  mp4 / unknown. Pure byte inspection — works on any binary column
   *  without a codec, so format histograms over 100 TB of blobs are a
   *  map-only scan. */
  private[graft] def sniffFormatBytes(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'E' && at(10) == 'B' && at(11) == 'P') "webp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'A' && at(9) == 'V' && at(10) == 'I' && at(11) == ' ') "avi"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else if (at(0) == 'Y' && at(1) == 'U' && at(2) == 'V' && at(3) == '4' &&
      at(4) == 'M' && at(5) == 'P' && at(6) == 'E' && at(7) == 'G' &&
      at(8) == '2') "y4m"
    else "unknown"
  }

  /** Image (width, height) parsed straight from the header bytes —
   *  PNG IHDR, JPEG SOF marker scan, GIF logical screen descriptor.
   *  None for other/corrupt formats. This is REAL metadata extraction
   *  (headers are spec-fixed byte layouts), distinct from the pixel
   *  decode which genuinely needs a codec and stays stubbed. */
  private[graft] def imageDimsBytes(b: Array[Byte]): Option[(Int, Int)] = {
    def be16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def be32(i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    sniffFormatBytes(b) match {
      case "png" if b.length >= 24 =>
        // 8-byte signature, 4-byte length, "IHDR", then width/height BE32
        Some((be32(16), be32(20)))
      case "gif" if b.length >= 10 =>
        Some((le16(6), le16(8)))
      case "jpeg" =>
        // scan segments for a start-of-frame marker (C0-CF minus C4/C8/CC)
        var i = 2
        while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
          val marker = b(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some((be16(i + 7), be16(i + 5))) // SOF: height then width
          i += 2 + be16(i + 2)
        }
        None
      case _ => None
    }
  }

  /** WAV/RIFF audio metadata from the spec-fixed header layout — REAL
   *  byte parsing like [[imageDimsBytes]] (no codec needed): walk the
   *  RIFF chunk list for "fmt " (audio format, channels, sample rate,
   *  byte rate, bits/sample) and "data" (payload size), and derive
   *  duration = dataSize / byteRate. Returns (channels, sampleRate,
   *  bitsPerSample, durationMs); None for non-WAV / truncated bytes. */
  private[graft] def audioMetaBytes(
      b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String =
      new String(b.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    if (sniffFormatBytes(b) != "wav" || b.length < 36) return None
    var channels = -1; var sampleRate = -1; var bits = -1
    var byteRate = -1L; var dataSize = -1L
    var i = 12L // after RIFF<size>WAVE; Long index: chunk sizes are u32
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val id = tag(ii); val size = le32(ii + 4) // unsigned, up to 2^32-1
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(ii + 10)
        sampleRate = le32(ii + 12).toInt
        byteRate = le32(ii + 16)
        bits = le16(ii + 22)
      } else if (id == "data") {
        dataSize = size
      }
      i += 8L + size + (size & 1L) // word-aligned; always advances ≥ 8
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0) None
    else Some((channels, sampleRate, bits,
      if (dataSize < 0) -1L else dataSize * 1000L / byteRate))
  }

  /** `struct(channels, sample_rate, bits_per_sample, duration_ms)`
   *  column parsed from WAV headers (null for non-audio bytes). */
  def audioMetadata(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None else audioMetaBytes(b)).apply(bin)

  /** MP4/ISO-BMFF video metadata from the spec-fixed box layout — REAL
   *  byte parsing like [[audioMetaBytes]] (boxes are [size:be32][4cc]
   *  [payload]; no codec needed): walk the top level for `moov`, read
   *  `mvhd` (timescale + duration → duration ms; version 0 and 1
   *  layouts) and the first `trak`/`tkhd` with nonzero 16.16-fixed
   *  width/height (the video track — audio tracks carry 0×0). Returns
   *  (durationMs, width, height); None for non-MP4 / truncated bytes.
   *  Frame PIXELS still need a codec and stay stubbed — this closes the
   *  metadata half for video the way RIFF parsing did for audio. */
  private[graft] def videoMetaBytes(b: Array[Byte]): Option[(Long, Int, Int)] = {
    def be16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def be32(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      new String(b.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    if (sniffFormatBytes(b) != "mp4") return None
    // iterate boxes in [from, to); size==1 → 64-bit largesize follows,
    // size==0 → box runs to the end of the enclosing range
    def children(lo: Long, hi: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var i = lo
        def hasNext: Boolean = i + 8 <= hi
        def next(): (String, Long, Long) = {
          val ii = i.toInt
          val size0 = be32(ii)
          val t = tag(ii + 4)
          val (payload, size) =
            if (size0 == 1L && i + 16 <= hi) (i + 16, be64(ii + 8))
            else if (size0 == 0L) (i + 8, hi - i)
            else (i + 8, size0)
          val end = if (size < 8) hi else math.min(i + size, hi) // malformed: stop
          i = if (size < 8) hi else i + math.max(size, 8L)
          (t, payload, end)
        }
      }
    var durationMs = -1L; var width = 0; var height = 0
    for ((t, p, e) <- children(0L, b.length.toLong) if t == "moov")
      for ((ct, cp, ce) <- children(p, e)) ct match {
        case "mvhd" if cp + 4 <= ce =>
          val version = b(cp.toInt) & 0xff
          if (version == 1 && cp + 32 <= ce) {
            val timescale = be32((cp + 20).toInt)
            if (timescale > 0) durationMs = be64((cp + 24).toInt) * 1000L / timescale
          } else if (version == 0 && cp + 20 <= ce) {
            val timescale = be32((cp + 12).toInt)
            if (timescale > 0) durationMs = be32((cp + 16).toInt) * 1000L / timescale
          }
        case "trak" if width == 0 =>
          // header-only tkhd (size 8): payload start == box end — guard
          // BEFORE the version read or corrupt bytes kill the task
          for ((tt, tp, te) <- children(cp, ce)
               if tt == "tkhd" && tp + 4 <= te) {
            val version = b(tp.toInt) & 0xff
            val (wOff, hOff) = if (version == 1) (88L, 92L) else (76L, 80L)
            if (tp + hOff + 4 <= te) {
              val w = be16((tp + wOff).toInt)  // integer part of 16.16
              val h = be16((tp + hOff).toInt)
              if (w > 0 && h > 0) { width = w; height = h }
            }
          }
        case _ => ()
      }
    // -1 = dims parsed but duration unknown (missing/truncated mvhd) —
    // the same unknown sentinel audioMetaBytes uses; never conflate
    // with a genuinely zero-length video
    if (durationMs < 0 && width == 0) None
    else Some((durationMs, width, height))
  }

  // ---- AVI container (REAL frame payload extraction) -----------------

  /** RIFF chunk walker shared by the AVI paths: iterate
   *  `[fourcc][size:le32][payload]` chunks in `[lo, hi)` as
   *  (id, payloadStart, payloadEnd). Chunk sizes are u32 and
   *  word-aligned; malformed sizes clamp to the enclosing range and the
   *  cursor always advances, so corrupt bytes terminate instead of
   *  spinning a 100 TB task. */
  private def riffChildren(
      b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Int, Int) = {
        val id = new String(b.slice(i, i + 4),
          java.nio.charset.StandardCharsets.US_ASCII)
        val size = (b(i + 4) & 0xffL) | ((b(i + 5) & 0xffL) << 8) |
          ((b(i + 6) & 0xffL) << 16) | ((b(i + 7) & 0xffL) << 24)
        val p = i + 8
        val end = math.min(p.toLong + size, hi.toLong).toInt
        i = math.max(
          math.min(p.toLong + size + (size & 1L), hi.toLong), (i + 8).toLong).toInt
        (id, p, end)
      }
    }

  /** AVI video metadata from the spec-fixed `avih` main header (inside
   *  LIST hdrl): (durationMs = usPerFrame × totalFrames / 1000, width,
   *  height). REAL byte parsing like [[videoMetaBytes]] did for MP4 —
   *  the reference has no media ops; this follows the builder brief's
   *  multimodal requirement. None for non-AVI / truncated bytes. */
  private[graft] def aviMetaBytes(b: Array[Byte]): Option[(Long, Int, Int)] = {
    def le32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(b.slice(i, i + 4),
      java.nio.charset.StandardCharsets.US_ASCII)
    if (sniffFormatBytes(b) != "avi") return None
    var usPerFrame = 0L; var totalFrames = 0L; var w = 0; var h = 0
    for ((id, p, e) <- riffChildren(b, 12, b.length)
         if id == "LIST" && p + 4 <= e && tag(p) == "hdrl")
      for ((cid, cp, ce) <- riffChildren(b, p + 4, e)
           if cid == "avih" && cp + 40 <= ce) {
        usPerFrame = le32(cp)
        totalFrames = le32(cp + 16)
        w = le32(cp + 32).toInt
        h = le32(cp + 36).toInt
      }
    if (w <= 0 || h <= 0) None
    else Some((
      if (usPerFrame > 0) usPerFrame * totalFrames / 1000L else -1L, w, h))
  }

  /** REAL per-frame payloads from an AVI container: walk LIST movi (and
   *  nested LIST rec groupings) for `##db`/`##dc` stream chunks in file
   *  order. For MJPEG — the one video codec the JDK can decode, because
   *  every frame IS a JPEG — the returned payloads feed straight into
   *  [[decodeImageBytes]]. Empty for non-AVI bytes. */
  private[graft] def aviFrameBytes(b: Array[Byte]): Array[Array[Byte]] = {
    def tag(i: Int): String = new String(b.slice(i, i + 4),
      java.nio.charset.StandardCharsets.US_ASCII)
    if (sniffFormatBytes(b) != "avi") return Array.empty
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id(2) == 'd' || id(2) == 'D') &&
        (id(3) == 'b' || id(3) == 'c' || id(3) == 'B' || id(3) == 'C')
    def walk(lo: Int, hi: Int, inMovi: Boolean): Unit =
      for ((id, p, e) <- riffChildren(b, lo, hi))
        if (id == "LIST" && p + 4 <= e) {
          val lt = tag(p)
          if (lt == "movi" || (inMovi && lt == "rec "))
            walk(p + 4, e, inMovi = true)
        } else if (inMovi && isFrameChunk(id) && e > p)
          out += java.util.Arrays.copyOfRange(b, p, e)
    walk(12, b.length, inMovi = false)
    out.toArray
  }

  // ---- animated GIF frames (REAL, stock ImageIO — no codec) ----------

  /** REAL per-frame payloads from an ANIMATED GIF: the second video
   *  container with genuine JDK-decodable pixels beside MJPEG-in-AVI.
   *  ImageIO's GIF reader yields raw (possibly partial) frames; this
   *  composes them per the GIF89a model — draw each frame at its
   *  descriptor offset over the running canvas, honoring the
   *  restore-to-background disposal — and re-encodes each COMPOSED
   *  frame as lossless PNG so downstream per-frame work
   *  ([[frameFeatures]], scene cuts, dHash) decodes them like any
   *  other image payload. Returns (pngBytes, delayMs) per frame —
   *  delays from each frame's GraphicControlExtension (GIF stores
   *  centiseconds; 0 → 100 ms, the de-facto player default). Empty for
   *  non-GIF bytes or single-frame (static) GIFs. `maxFrames` bounds
   *  the per-row explosion the same way audio decode bounds samples. */
  private[graft] def gifAnimFrames(
      b: Array[Byte], maxFrames: Int = 4096): Array[(Array[Byte], Long)] = {
    if (b == null || sniffFormatBytes(b) != "gif") return Array.empty
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Array.empty
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false)
      val n = math.min(reader.getNumImages(true), maxFrames)
      if (n < 2) return Array.empty
      // logical screen from the stream metadata; frame-0 dims fallback
      val (sw, sh) = {
        val smd = reader.getStreamMetadata
        val root = smd.getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        var w = 0; var h = 0
        val kids = root.getChildNodes
        for (i <- 0 until kids.getLength) {
          val k = kids.item(i)
          if (k.getNodeName == "LogicalScreenDescriptor") {
            val a = k.getAttributes
            w = a.getNamedItem("logicalScreenWidth").getNodeValue.toInt
            h = a.getNamedItem("logicalScreenHeight").getNodeValue.toInt
          }
        }
        if (w > 0 && h > 0) (w, h)
        else { val f0 = reader.read(0); (f0.getWidth, f0.getHeight) }
      }
      val canvas = new java.awt.image.BufferedImage(
        sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      val out = Array.newBuilder[(Array[Byte], Long)]
      for (i <- 0 until n) {
        val frame = reader.read(i)
        val imd = reader.getImageMetadata(i)
        val root = imd.getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        var x = 0; var y = 0
        var delayCs = 0; var disposal = "none"
        val kids = root.getChildNodes
        for (j <- 0 until kids.getLength) {
          val k = kids.item(j)
          k.getNodeName match {
            case "ImageDescriptor" =>
              val a = k.getAttributes
              x = a.getNamedItem("imageLeftPosition").getNodeValue.toInt
              y = a.getNamedItem("imageTopPosition").getNodeValue.toInt
            case "GraphicControlExtension" =>
              val a = k.getAttributes
              delayCs = a.getNamedItem("delayTime").getNodeValue.toInt
              disposal = a.getNamedItem("disposalMethod").getNodeValue
            case _ => ()
          }
        }
        g.drawImage(frame, x, y, null)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(canvas, "png", baos)
        out += ((baos.toByteArray,
          if (delayCs <= 0) 100L else delayCs * 10L))
        if (disposal == "restoreToBackgroundColor") {
          g.setColor(java.awt.Color.BLACK)
          g.fillRect(x, y, frame.getWidth, frame.getHeight)
        }
      }
      g.dispose()
      out.result()
    } catch { case _: Exception => Array.empty }
    finally { reader.dispose(); iis.close() }
  }

  /** Minimal animated-GIF writer over stock ImageIO (synthetic fixtures
   *  only): one write sequence, each frame carrying a
   *  GraphicControlExtension with the given delay. The READ path under
   *  test ([[gifAnimFrames]]) is the one arbitrary animated GIFs take. */
  private[graft] def encodeAnimatedGif(
      frames: Seq[java.awt.image.BufferedImage],
      delayMs: Long): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      val ty = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val md = writer.getDefaultImageMetadata(ty, writer.getDefaultWriteParam)
      val fmt = md.getNativeMetadataFormatName
      val root = md.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = {
        val kids = root.getChildNodes
        (0 until kids.getLength)
          .map(kids.item).find(_.getNodeName == "GraphicControlExtension")
          .map(_.asInstanceOf[javax.imageio.metadata.IIOMetadataNode])
          .getOrElse {
            val node = new javax.imageio.metadata.IIOMetadataNode(
              "GraphicControlExtension")
            root.appendChild(node)
            node
          }
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", (delayMs / 10L).toString)
      md.setFromTree(fmt, root)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, md),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  /** Deterministic synthetic animated-GIF scene corpus — the GIF twin
   *  of [[syntheticSceneCorpus]]: each clip pans gradually (+2
   *  gray/frame) with ONE hard cut (+100 at frame 4 + id%3). Uniform
   *  gray frames survive GIF's palette quantization losslessly, so the
   *  decoded mean intensities are exact. */
  def syntheticGifSceneCorpus(
      spark: SparkSession,
      n: Int,
      framesPerVideo: Int = 12,
      side: Int = 32,
      delayMs: Long = 250L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val cutAt = (4 + id % 3).toInt
      val frames = (0 until framesPerVideo).map { f =>
        val gray = math.min(247,
          (id * 7 % 60 + 20 + f * 2 + (if (f >= cutAt) 100 else 0))).toInt
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(gray, gray, gray))
        g2.fillRect(0, 0, side, side)
        g2.dispose()
        img
      }
      (id, encodeAnimatedGif(frames, delayMs))
    }.toDF("id", "bytes")
  }

  // ---- Y4M (YUV4MPEG2): raw uncompressed video, fully decodable ------

  /** Parsed Y4M stream header: (width, height, fpsNum, fpsDen,
   *  bytesPerFrame, firstFrameOffset). YUV4MPEG2 is the one video
   *  container whose PIXELS need no codec at all — a plain-text header
   *  (`YUV4MPEG2 W.. H.. F<num>:<den> .. C<colourspace>\n`) followed by
   *  raw planar frames (`FRAME\n` + Y then Cb/Cr planes) — so it joins
   *  MJPEG-AVI and animated GIF as the third genuinely-decodable
   *  container. C420-family/C422/C444/Cmono plane sizes per the
   *  published mjpegtools layout; None for non-Y4M / malformed
   *  headers. */
  private[graft] def y4mHeaderBytes(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    if (b == null || sniffFormatBytes(b) != "y4m") return None
    var end = 9
    while (end < b.length && b(end) != 0x0a) end += 1
    if (end >= b.length) return None
    val params = new String(b, 9, end - 9,
      java.nio.charset.StandardCharsets.US_ASCII).trim.split("\\s+")
    var w = -1; var h = -1; var fn = -1; var fd = -1; var cs = "420jpeg"
    try {
      var i = 0
      while (i < params.length) {
        val p = params(i)
        if (p.nonEmpty) p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'F' =>
            val r = p.substring(1).split(':')
            if (r.length == 2) { fn = r(0).toInt; fd = r(1).toInt }
          case 'C' => cs = p.substring(1)
          case _   => () // I (interlacing), A (aspect), X (comment)
        }
        i += 1
      }
    } catch { case _: NumberFormatException => return None }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val chromaBytes =
      if (cs.startsWith("420")) 2 * ((w / 2) * (h / 2))
      else if (cs.startsWith("422")) 2 * ((w / 2) * h)
      else if (cs.startsWith("444")) 2 * (w * h)
      else if (cs.startsWith("mono")) 0
      else return None
    Some((w, h, fn, fd, w * h + chromaBytes, end + 1))
  }

  /** Y4M video metadata (durationMs, width, height) — the [[videoMetaBytes]]
   *  tuple shape: frame count from a frame-marker walk (each frame is
   *  `FRAME[ params]\n` + a header-fixed byte count), duration from the
   *  header's exact F<num>:<den> rate. */
  private[graft] def y4mMetaBytes(b: Array[Byte]): Option[(Long, Int, Int)] =
    y4mHeaderBytes(b).map { case (w, h, fn, fd, frameBytes, off) =>
      var i = off; var n = 0L
      var ok = true
      while (ok && i + 5 <= b.length) {
        ok = b(i) == 'F' && b(i + 1) == 'R' && b(i + 2) == 'A' &&
          b(i + 3) == 'M' && b(i + 4) == 'E'
        if (ok) {
          i += 5
          while (i < b.length && b(i) != 0x0a) i += 1 // frame params
          i += 1
          if (i + frameBytes <= b.length) { n += 1; i += frameBytes }
          else ok = false
        }
      }
      (n * 1000L * fd / fn, w, h)
    }

  /** Y4M frames as PNG-encoded grayscale images (the luma plane is the
   *  intensity signal scene analysis needs; chroma planes are skipped
   *  over, not decoded). Pixels land in TYPE_INT_RGB with r=g=b=Y so no
   *  gray→sRGB colorspace transform ever touches the values — the
   *  decoded mean intensity is exactly meanY/255. Returns empty for
   *  non-Y4M bytes; `maxFrames` bounds the per-row explosion. */
  private[graft] def y4mPngFrames(
      b: Array[Byte], maxFrames: Int = 4096): Array[Array[Byte]] =
    y4mHeaderBytes(b) match {
      case None => Array.empty
      case Some((w, h, _, _, frameBytes, off)) =>
        val out = Array.newBuilder[Array[Byte]]
        var i = off; var n = 0
        var ok = true
        while (ok && n < maxFrames && i + 5 <= b.length) {
          ok = b(i) == 'F' && b(i + 1) == 'R' && b(i + 2) == 'A' &&
            b(i + 3) == 'M' && b(i + 4) == 'E'
          if (ok) {
            i += 5
            while (i < b.length && b(i) != 0x0a) i += 1
            i += 1
            if (i + frameBytes <= b.length) {
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var p = 0
              while (p < w * h) {
                val y = b(i + p) & 0xff
                img.setRGB(p % w, p / w, (y << 16) | (y << 8) | y)
                p += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              out += baos.toByteArray
              n += 1
              i += frameBytes
            } else ok = false
          }
        }
        out.result()
    }

  /** Minimal Y4M writer (synthetic fixtures only): C420jpeg planes with
   *  neutral chroma (Cb=Cr=128 — gray), one luma plane per frame. The
   *  READ path under test ([[y4mPngFrames]]/[[y4mMetaBytes]]) is the one
   *  arbitrary Y4M (e.g. ffmpeg-emitted) streams take. */
  private[graft] def buildY4m(
      lumaFrames: Seq[Array[Byte]],
      width: Int,
      height: Int,
      fpsNum: Int,
      fpsDen: Int = 1): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    baos.write(
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val chroma = new Array[Byte]((width / 2) * (height / 2))
    java.util.Arrays.fill(chroma, 128.toByte)
    lumaFrames.foreach { y =>
      require(y.length == width * height, "luma plane size mismatch")
      baos.write("FRAME\n".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      baos.write(y)
      baos.write(chroma) // Cb
      baos.write(chroma) // Cr
    }
    baos.toByteArray
  }

  /** Deterministic synthetic Y4M scene corpus — the raw-video twin of
   *  [[syntheticSceneCorpus]]: each clip pans gradually (+2 luma/frame)
   *  with ONE hard cut (+100 at frame 4 + id%3). Y4M is lossless, so
   *  the decoded mean intensities are exact. */
  def syntheticY4mSceneCorpus(
      spark: SparkSession,
      n: Int,
      framesPerVideo: Int = 12,
      side: Int = 32,
      fps: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val cutAt = (4 + id % 3).toInt
      val frames = (0 until framesPerVideo).map { f =>
        val gray = math.min(247,
          (id * 7 % 60 + 20 + f * 2 + (if (f >= cutAt) 100 else 0))).toInt
        val y = new Array[Byte](side * side)
        java.util.Arrays.fill(y, gray.toByte)
        y
      }
      (id, buildY4m(frames, side, side, fps))
    }.toDF("id", "bytes")
  }

  /** `struct(duration_ms, width, height)` column parsed from MP4 box,
   *  AVI `avih`, or Y4M stream headers (null for non-video bytes;
   *  duration_ms = -1 when dims parsed but the duration header
   *  didn't). */
  def videoMetadata(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None
      else videoMetaBytes(b).orElse(aviMetaBytes(b))
        .orElse(y4mMetaBytes(b))).apply(bin)

  /** `format` column from a binary column's magic bytes. */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) => if (b == null) null else sniffFormatBytes(b)).apply(bin)

  /** `struct(width, height)` column parsed from image headers (null for
   *  non-images / corrupt bytes). */
  def imageDimensions(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None else imageDimsBytes(b)).apply(bin)

  // ---- PCM sample extraction (REAL, plain-offset reads) --------------

  /** WAV PCM samples as mono floats in [-1, 1]: walk RIFF for "fmt " +
   *  "data" (same layout [[audioMetaBytes]] locates), then decode the
   *  interleaved frames — u8, s16/s24/s32 LE (format 1) or f32 (format
   *  3) — averaging channels. `maxSamples` caps the materialized array
   *  (a 10-minute 48 kHz file is 28M samples; features only need a
   *  bounded prefix). None for non-WAV / non-PCM / truncated bytes. */
  private[graft] def audioSamplesBytes(
      b: Array[Byte], maxSamples: Int = 1 << 20): Option[Array[Float]] = {
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String =
      new String(b.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    if (sniffFormatBytes(b) != "wav" || b.length < 36) return None
    var fmtCode = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = 0L
    var i = 12L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val id = tag(ii); val size = le32(ii + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        fmtCode = le16(ii + 8)
        channels = le16(ii + 10)
        bits = le16(ii + 22)
      } else if (id == "data") {
        dataOff = ii + 8
        dataLen = math.min(size, b.length.toLong - dataOff)
      }
      i += 8L + size + (size & 1L)
    }
    val pcm = fmtCode == 1 && Set(8, 16, 24, 32)(bits)
    val f32 = fmtCode == 3 && bits == 32
    // G.711 companded telephony formats (8-bit): 6 = A-law, 7 = μ-law —
    // pure published formulas, no codec library
    val g711 = (fmtCode == 6 || fmtCode == 7) && bits == 8
    if (channels <= 0 || dataOff < 0 || !(pcm || f32 || g711)) return None
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    val frames = math.min(dataLen / frameBytes, maxSamples.toLong).toInt
    val out = new Array[Float](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val o = dataOff + f * frameBytes + c * bytesPerSample
        acc += (if (g711 && fmtCode == 7) { // μ-law (ITU-T G.711)
          val u = ~b(o) & 0xff
          val mag = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
          (if ((u & 0x80) != 0) -mag else mag) / 32768.0f
        } else if (g711) { // A-law (ITU-T G.711)
          val a = (b(o) ^ 0x55) & 0xff
          val exp = (a >> 4) & 0x07
          val mant = a & 0x0f
          val mag =
            if (exp == 0) (mant << 4) + 8
            else ((mant << 4) + 0x108) << (exp - 1)
          // NB: after the 0x55 toggle the SET sign bit means POSITIVE
          // (opposite of μ-law's post-complement convention)
          (if ((a & 0x80) != 0) mag else -mag) / 32768.0f
        } else bits match {
          case 8 => ((b(o) & 0xff) - 128) / 128.0f // u8 is offset-binary
          case 16 => le16(o).toShort / 32768.0f
          case 24 =>
            val v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) << 16)
            v / 8388608.0f // sign carried by the unshifted top byte
          case 32 =>
            if (f32) java.lang.Float.intBitsToFloat(le32(o).toInt)
            else le32(o).toInt / 2147483648.0f
        })
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    Some(out)
  }

  /** `array<float>` column of the decoded mono PCM samples (null for
   *  non-WAV/non-PCM bytes) — the exploded grain audio-quality
   *  aggregates (RMS, silence ratio, clipping) run over. */
  def audioSamples(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None else audioSamplesBytes(b)).apply(bin)

  /** 64-bit audio fingerprint from real PCM decode — the audio lane's
   *  dHash: the clip splits into 32 equal windows and each window
   *  contributes two bits, (window RMS > clip-median RMS) and (window
   *  zero-crossing count > clip-median ZC). Energy bits are
   *  level-invariant (median-relative, so a re-encode at a different
   *  gain matches) and ZC bits carry pitch, so two clips that happen
   *  to share an energy envelope still separate. Pure byte-walker
   *  kernel (no SQL equivalent exists for WAV PCM), null/undecodable
   *  → null. */
  private[graft] def audioFingerprintBytes(b: Array[Byte]): Option[Long] =
    (if (b == null) None else audioSamplesBytes(b)).flatMap { s =>
      val w = 32
      if (s.length < w) None
      else {
        val rms = new Array[Double](w)
        val zc = new Array[Double](w)
        val len = s.length / w
        var i = 0
        while (i < w) {
          var sq = 0.0; var z = 0; var j = i * len
          val end = j + len
          var prev = s(j)
          while (j < end) {
            val v = s(j); sq += v.toDouble * v
            if ((v > 0 && prev <= 0) || (v < 0 && prev >= 0)) z += 1
            prev = v; j += 1
          }
          rms(i) = math.sqrt(sq / len); zc(i) = z.toDouble; i += 1
        }
        def median(a: Array[Double]): Double = {
          val srt = a.sorted
          (srt(w / 2 - 1) + srt(w / 2)) / 2.0
        }
        val mr = median(rms); val mz = median(zc)
        var fp = 0L
        i = 0
        while (i < w) {
          if (rms(i) > mr) fp |= 1L << i
          if (zc(i) > mz) fp |= 1L << (i + 32)
          i += 1
        }
        Some(fp)
      }
    }

  def audioFingerprint(
      bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None else audioFingerprintBytes(b)).apply(bin)

  /** Deterministic synthetic MELODY corpus for the fingerprint lane:
   *  each clip is 32 segments whose frequency and amplitude follow a
   *  per-id integer pattern, so window energy/pitch vary WITHIN a clip
   *  (a constant tone fingerprints degenerately — every window equals
   *  the median). `gain` scales the whole clip (a "re-encode at a
   *  different level"), which [[audioFingerprint]]'s median-relative
   *  bits must shrug off. Same WAV container as
   *  [[syntheticAudioCorpus]]. */
  def syntheticMelodyCorpus(
      spark: SparkSession,
      n: Int,
      gain: Double = 1.0,
      segments: Int = 32,
      samplesPerSegment: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val total = segments * samplesPerSegment
      val pcm = new Array[Short](total)
      var j = 0
      while (j < segments) {
        val freq = 300.0 + ((id * 31 + j * 7) % 13) * 250.0
        val amp = (0.15 + ((id * 17 + j * 5) % 9) * 0.09) * gain
        var i = 0
        while (i < samplesPerSegment) {
          val v = amp * math.sin(2 * math.Pi * freq * i / 8000.0)
          pcm(j * samplesPerSegment + i) =
            math.max(-32768.0, math.min(32767.0, v * 32767.0)).toShort
          i += 1
        }
        j += 1
      }
      val dataLen = pcm.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1)
        .putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes).putInt(dataLen)
      pcm.foreach(bb.putShort)
      (id, bb.array())
    }.toDF("id", "bytes")
  }

  /** Deterministic synthetic WAV corpus for tests/benches (no media
   *  files ship in the container): mono 8000 Hz s16 PCM clips, each a
   *  silence prefix + a sine tone whose amplitude/frequency vary by id;
   *  every 13th id overdrives the sine (amp 1.2) so the clamp produces
   *  genuine clipping. Bytes are REAL spec-layout WAV — the decode path
   *  under test is the same one arbitrary user audio takes. */
  def syntheticAudioCorpus(
      spark: SparkSession,
      n: Int,
      samplesPerClip: Int = 400): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val silence = ((id % 5) * samplesPerClip / 10).toInt
      val amp = if (id % 13 == 0) 1.2 else 0.1 + (id % 7) * 0.14
      val freq = 200.0 + (id % 11) * 150.0
      val pcm = new Array[Short](samplesPerClip)
      var i = silence
      while (i < samplesPerClip) {
        val v = amp * math.sin(2 * math.Pi * freq * (i - silence) / 8000.0)
        pcm(i) = math.max(-32768.0, math.min(32767.0, v * 32767.0)).toShort
        i += 1
      }
      val dataLen = pcm.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1)       // PCM, mono
        .putInt(8000).putInt(16000)    // sample rate, byte rate
        .putShort(2).putShort(16)      // block align, bits/sample
        .put("data".getBytes).putInt(dataLen)
      pcm.foreach(bb.putShort)
      (id, bb.array())
    }.toDF("id", "bytes")
  }

  /** `struct(n_samples, rms, peak, mean)` from real WAV PCM decode
   *  (null for non-WAV/non-PCM bytes) — the audio analog of
   *  [[decodeImages]]'s intensity features, map-only over the corpus. */
  def audioFeatures(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None
      else audioSamplesBytes(b).map { s =>
        var sum = 0.0; var sq = 0.0; var peak = 0.0f
        s.foreach { v =>
          sum += v; sq += v.toDouble * v
          if (math.abs(v) > peak) peak = math.abs(v)
        }
        val n = math.max(s.length, 1)
        (s.length, math.sqrt(sq / n), peak.toDouble, sum / n)
      }).apply(bin)

  // ---- perceptual hashing (image near-dup) ---------------------------

  /** 64-bit difference hash (dHash) over REAL decoded pixels: ImageIO
   *  decode → exact area-mean downsample to a 9×8 grayscale grid (pure
   *  integer block averaging — no Graphics2D resampling, so the hash is
   *  bit-stable across JVMs) → bit (y*8+x) = 1 iff grid(x+1,y) >
   *  grid(x,y). Near-identical images (re-encode, resize, small edits)
   *  land within a few bits of hamming distance; unrelated images are
   *  ~32 bits apart. None for bytes ImageIO can't decode. */
  private[graft] def dHashBytes(b: Array[Byte]): Option[Long] =
    decodeImageBytes(b).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      // grid cell (gx, gy) = mean gray over pixel block
      // [gx*w/9, (gx+1)*w/9) × [gy*h/8, (gy+1)*h/8)  (block ≥ 1 px when
      // the source is smaller than the grid: indices clamp to ≥ 1 wide)
      val grid = Array.ofDim[Double](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * h / 8
        val y1 = math.max((gy + 1) * h / 8, y0 + 1)
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9
          val x1 = math.max((gx + 1) * w / 9, x0 + 1)
          var sum = 0L; var n = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val p = px(y * w + x)
              sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              n += 1
              x += 1
            }
            y += 1
          }
          grid(gy)(gx) = if (n == 0) 0.0 else sum.toDouble / n
          gx += 1
        }
        gy += 1
      }
      var hash = 0L; var bit = 0
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (grid(gy)(gx + 1) > grid(gy)(gx)) hash |= (1L << bit)
          bit += 1
          gx += 1
        }
        gy += 1
      }
      hash
    }

  /** Nullable `bigint` dHash column from a binary image column. */
  def imageHash(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None else dHashBytes(b)).apply(bin)

  /** DCT perceptual hash (pHash): mean-pool the decoded image to a
   *  32×32 gray grid (integer sums — no resampling filter to diverge
   *  across platforms), 2-D DCT-II, take the 8×8 low-frequency block,
   *  set bit i when coefficient i exceeds the mean of the 63 non-DC
   *  block coefficients. dHash keys on local gradients and misses
   *  global-structure edits (crops, brightness ramps); pHash keys on
   *  the coarse spectrum, the standard second opinion an image-dedup
   *  pipeline runs. Pure deterministic double math over pixel ints —
   *  the same hash on every JVM. */
  private[graft] def pHashBytes(b: Array[Byte]): Option[Long] =
    decodeImageBytes(b).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val N = 32
      val g = Array.ofDim[Double](N, N)
      var gy = 0
      while (gy < N) {
        val y0 = gy * h / N
        val y1 = math.max((gy + 1) * h / N, y0 + 1)
        var gx = 0
        while (gx < N) {
          val x0 = gx * w / N
          val x1 = math.max((gx + 1) * w / N, x0 + 1)
          var sum = 0L; var n = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val p = px(y * w + x)
              sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              n += 1
              x += 1
            }
            y += 1
          }
          g(gy)(gx) = if (n == 0) 0.0 else sum.toDouble / n
          gx += 1
        }
        gy += 1
      }
      // separable DCT-II (rows then columns); naive O(N^3) is fine at
      // N = 32 and keeps the arithmetic order fixed
      val cosTab = Array.tabulate(N, N)((k, x) =>
        math.cos((2 * x + 1) * k * math.Pi / (2.0 * N)))
      val rows = Array.ofDim[Double](N, N)
      var y = 0
      while (y < N) {
        var k = 0
        while (k < N) {
          var s = 0.0; var x = 0
          while (x < N) { s += g(y)(x) * cosTab(k)(x); x += 1 }
          rows(y)(k) = s
          k += 1
        }
        y += 1
      }
      val coef = Array.ofDim[Double](8, 8)
      var ky = 0
      while (ky < 8) {
        var kx = 0
        while (kx < 8) {
          var s = 0.0; var yy = 0
          while (yy < N) { s += rows(yy)(kx) * cosTab(ky)(yy); yy += 1 }
          coef(ky)(kx) = s
          kx += 1
        }
        ky += 1
      }
      var mean = 0.0
      var i = 1
      while (i < 64) { mean += coef(i / 8)(i % 8); i += 1 }
      mean /= 63.0
      var hash = 0L
      i = 0
      while (i < 64) {
        if (coef(i / 8)(i % 8) > mean) hash |= (1L << i)
        i += 1
      }
      hash
    }

  /** Nullable `bigint` pHash column from a binary image column. */
  def imagePHash(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) =>
      if (b == null) None else pHashBytes(b)).apply(bin)

  /** (id, phash) signature frame — [[imageSignatures]]' DCT twin,
   *  persisted by m05 so the oracle can replay the hamming stage. */
  def pHashSignatures(
      df: DataFrame,
      idCol: String = "id",
      binCol: String = "bytes"): DataFrame =
    df.select(col(idCol), imagePHash(col(binCol)).as("phash"))
      .filter(col("phash").isNotNull)

  /** (id, dhash) signature frame — the image analog of
   *  [[graft.pipeline.Dedup.simhashSignatures]]; rows whose bytes don't
   *  decode are dropped (they can't be perceptually compared). Public so
   *  the m01 oracle can persist it and DuckDB can replay the hamming
   *  verification over every pair. */
  def imageSignatures(
      df: DataFrame,
      idCol: String = "id",
      binCol: String = "bytes"): DataFrame =
    df.select(col(idCol), imageHash(col(binCol)).as("dhash"))
      .filter(col("dhash").isNotNull)

  /** Image near-duplicate pairs (id_a, id_b, hamming): real pixel
   *  decode → dHash → the same pigeonhole 16-bit-chunk bucketing SimHash
   *  uses ([[graft.pipeline.Dedup.hammingNearDuplicates]]) — candidate
   *  generation shuffles only (id, hash) keys, never pixel bytes, so the
   *  plan scales to a 100 TB image corpus exactly like text SimHash. */
  def nearDuplicateImages(
      df: DataFrame,
      idCol: String = "id",
      binCol: String = "bytes",
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    Dedup.hammingNearDuplicates(
      imageSignatures(df, idCol, binCol), idCol, "dhash",
      maxHamming, maxBucketSize)

  /** Deterministic synthetic PNG corpus for tests/benches (the
   *  container ships no real image files): `groups` base patterns ×
   *  `variants` per group. Variant 0 is the base image; variant v
   *  nudges v pixels by +8 gray levels, so intra-group pairs sit at
   *  hamming ≈ 0–2 (near-dups) while inter-group pairs are unrelated.
   *  Encode is REAL ImageIO PNG; ids are group*variants+variant. */
  def syntheticImageCorpus(
      spark: SparkSession,
      groups: Int,
      variants: Int = 4,
      side: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(groups.toLong * variants).map { id =>
      val g = id / variants; val v = (id % variants).toInt
      val rnd = new java.util.Random(g * 7919L + 17)
      val img = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val gray = rnd.nextInt(256)
          img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
          x += 1
        }
        y += 1
      }
      var k = 0
      while (k < v) { // nudge v deterministic pixels
        val x = (k * 13 + 5) % side; val y2 = (k * 29 + 11) % side
        val p = img.getRGB(x, y2) & 0xff
        val np = math.min(p + 8, 255)
        img.setRGB(x, y2, (np << 16) | (np << 8) | np)
        k += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      (id, baos.toByteArray)
    }.toDF("id", "bytes")
  }

  // ---- resize / frame-sample plumbing --------------------------------

  /** STUB resize fallback for non-image bytes: the metadata transform
   *  (width/height, proportional byte-size model) is real; the pixel
   *  resample is faked deterministically. Real images take
   *  [[resizeImages]]' ImageIO path instead. */
  def resizeStub(
      batch: Iterator[MediaRow],
      width: Int,
      height: Int): Iterator[MediaRow] =
    batch.map { r =>
      if (r.bytes.isEmpty) // nothing to resample; metadata still updates
        MediaRow(r.id, Array.empty[Byte],
          r.meta.copy(width = width, height = height))
      else {
        val srcArea = math.max(r.meta.width * r.meta.height, 1)
        // clamp BEFORE toInt: a large upscale (1 MB src → 10k×10k) would
        // overflow Int and throw NegativeArraySizeException
        val outLen = math.max(1, math.min(
          r.bytes.length.toLong * (width.toLong * height) / srcArea,
          64L * 1024 * 1024)).toInt
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < outLen) { out(i) = r.bytes(i % r.bytes.length); i += 1 }
        MediaRow(r.id, out, r.meta.copy(width = width, height = height))
      }
    }

  /** REAL image resize: ImageIO decode → bilinear Graphics2D resample →
   *  re-encode in the source format. JPEG's writer rejects alpha, so
   *  the canvas is RGB for jpeg and ARGB otherwise. Bytes that don't
   *  decode fall back to the stub row-by-row. */
  def resizeImages(
      batch: Iterator[MediaRow],
      width: Int,
      height: Int): Iterator[MediaRow] =
    batch.map { r =>
      decodeImageBytes(r.bytes) match {
        case Some(img) =>
          val fmt = sniffFormatBytes(r.bytes)
          val kind =
            if (fmt == "jpeg") java.awt.image.BufferedImage.TYPE_INT_RGB
            else java.awt.image.BufferedImage.TYPE_INT_ARGB
          val out = new java.awt.image.BufferedImage(width, height, kind)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, fmt, baos)
          MediaRow(r.id, baos.toByteArray,
            r.meta.copy(width = width, height = height))
        case None => resizeStub(Iterator.single(r), width, height).next()
      }
    }

  /** Resize a media Dataset: schema-preserving `mapPartitions` so the
   *  codec amortizes setup per batch; repartition first when decode
   *  parallelism should match cores rather than input file layout. */
  def resizeMedia(
      media: Dataset[MediaRow],
      width: Int,
      height: Int,
      partitions: Int = 0): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repart = if (partitions > 0) media.repartition(partitions) else media
    repart.mapPartitions(batch => resizeImages(batch, width, height))
  }

  /** One sampled video frame: the (media, frame) exploded grain a
   *  frame-level training pipeline joins/filters on. */
  final case class FrameRow(
      mediaId: Long,
      frameIdx: Int,
      tsMs: Long,
      frameBytes: Array[Byte])

  /** STUB frame-sample: emit one frame per `intervalMs` of duration
   *  (t = 0, interval, … < durationMs; at least one frame per video).
   *  The explode arithmetic, output grain and partition-local batching
   *  are real; the per-frame pixel payload is the stubbed step
   *  (deterministic bytes seeded by (content hash, frameIdx)). */
  def sampleFramesStub(
      batch: Iterator[MediaRow],
      intervalMs: Long,
      frameBytes: Int = 64): Iterator[FrameRow] =
    batch.flatMap { r =>
      val h = r.bytes.foldLeft(0xcbf29ce484222325L)((a, b) => (a ^ b) * 0x100000001b3L)
      val n = math.max(1L, (r.meta.durationMs + intervalMs - 1) / intervalMs).toInt
      (0 until n).iterator.map { idx =>
        val rnd = new java.util.Random(h ^ idx.toLong)
        val bytes = new Array[Byte](frameBytes)
        rnd.nextBytes(bytes)
        FrameRow(r.id, idx, idx * intervalMs, bytes)
      }
    }

  /** Pluggable frame-extraction codec — the seam an H.264/H.265-capable
   *  plug-in (JavaCV / ffmpeg bindings) drops into without touching any
   *  Spark-side plumbing: batching, schema, tick sampling and the
   *  partition-local shape are all codec-independent. `decode` returns
   *  Some((per-frame image payloads, durationMs)) when this codec
   *  handles the bytes, None to decline (the next codec, then the
   *  built-ins, then the stub get their turn). Implementations must be
   *  serializable (they ride the task closure) and self-sniff their
   *  container from the bytes. */
  trait FrameCodec extends Serializable {
    def decode(bytes: Array[Byte]): Option[(Array[Array[Byte]], Long)]
  }

  /** REAL frame-sample for AVI, animated-GIF, and Y4M bytes:
   *  container-parse the per-frame payloads ([[aviFrameBytes]]
   *  `##db`/`##dc` chunks — JPEGs for MJPEG; [[gifAnimFrames]] composed
   *  PNG frames; [[y4mPngFrames]] raw-luma PNG frames), then emit the
   *  frame nearest each `intervalMs` tick. GIF frames carry their OWN
   *  per-frame delays, so that tick lookup walks the cumulative
   *  timeline instead of assuming a constant rate; AVI and Y4M are
   *  constant-rate with a header-derived duration. `codecs` plug-ins
   *  are consulted FIRST (so a real video codec can claim — or even
   *  override — any container); rows nothing claims fall back to
   *  [[sampleFramesStub]] so mixed/corrupt corpora degrade per-row. */
  def sampleFramesReal(
      batch: Iterator[MediaRow],
      intervalMs: Long,
      frameBytes: Int = 64,
      codecs: Seq[FrameCodec] = Nil): Iterator[FrameRow] =
    batch.flatMap { r =>
      def constantRate(
          frames: Array[Array[Byte]],
          headerDur: Option[Long]): Iterator[FrameRow] = {
        val dur = headerDur.filter(_ > 0)
          .getOrElse(math.max(r.meta.durationMs, frames.length.toLong))
        val n = math.max(1L, (dur + intervalMs - 1) / intervalMs).toInt
        (0 until n).iterator.map { idx =>
          val t = idx * intervalMs
          val fi = math.min(t * frames.length / dur, frames.length - 1L).toInt
          FrameRow(r.id, idx, t, frames(fi))
        }
      }
      val plugged = codecs.iterator
        .map(_.decode(r.bytes))
        .collectFirst { case Some((fs, dur)) if fs.nonEmpty => (fs, dur) }
      if (plugged.nonEmpty)
        constantRate(plugged.get._1, Some(plugged.get._2))
      else {
      val frames = aviFrameBytes(r.bytes)
      if (frames.nonEmpty)
        constantRate(frames, aviMetaBytes(r.bytes).map(_._1))
      else {
        val y4m = y4mPngFrames(r.bytes)
        if (y4m.nonEmpty)
          constantRate(y4m, y4mMetaBytes(r.bytes).map(_._1))
        else {
        val gif = gifAnimFrames(r.bytes)
        if (gif.isEmpty)
          sampleFramesStub(Iterator.single(r), intervalMs, frameBytes)
        else {
          // cumulative frame start times from the per-frame delays
          val starts = gif.scanLeft(0L)(_ + _._2)
          val dur = math.max(1L, starts.last)
          val n = math.max(1L, (dur + intervalMs - 1) / intervalMs).toInt
          (0 until n).iterator.map { idx =>
            val t = idx * intervalMs
            // last frame whose start ≤ t (starts is ascending)
            var fi = java.util.Arrays.binarySearch(starts, t)
            if (fi < 0) fi = -fi - 2
            fi = math.min(math.max(fi, 0), gif.length - 1)
            FrameRow(r.id, idx, t, gif(fi)._1)
          }
        }
        }
      }
      }
    }

  /** Frame sampling over a video Dataset — a partition-local flatMap, so
   *  the explosion never shuffles the source bytes; downstream per-frame
   *  work inherits the partitioning. AVI, animated-GIF, and Y4M rows
   *  yield REAL pixel payloads; `codecs` plug-ins (e.g. a JavaCV H.264
   *  [[FrameCodec]]) extend that set without touching this plumbing;
   *  anything unclaimed (MP4 — no JDK codec) takes the stub path. */
  def sampleFrames(
      media: Dataset[MediaRow],
      intervalMs: Long = 1000L,
      frameBytes: Int = 64,
      partitions: Int = 0,
      codecs: Seq[FrameCodec] = Nil): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repart = if (partitions > 0) media.repartition(partitions) else media
    repart.mapPartitions(batch =>
      sampleFramesReal(batch, intervalMs, frameBytes, codecs))
  }

  /** Per-frame pixel features off the sampled grain: ImageIO decode of
   *  each frame payload (REAL for MJPEG frames) → mean intensity, dims.
   *  -1 marks undecodable payloads (stub frames, corrupt chunks) so a
   *  quality filter can drop them without killing the scan. Map-only;
   *  inherits [[sampleFrames]]' partitioning. */
  def frameFeatures(frames: Dataset[FrameRow]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions(_.map { fr =>
      decodeImageBytes(fr.frameBytes) match {
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0.0
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            i += 1
          }
          (fr.mediaId, fr.frameIdx, fr.tsMs, w, h,
            sum / (w.toLong * h) / 255.0)
        case None => (fr.mediaId, fr.frameIdx, fr.tsMs, 0, 0, -1.0)
      }
    }).toDF("id", "frame_idx", "ts_ms", "width", "height", "mean_intensity")
  }

  /** Minimal spec-layout MJPEG-in-AVI writer (synthetic fixtures only —
   *  RIFF [LIST hdrl [avih, LIST strl [strh, strf]], LIST movi [00dc…]]
   *  with each `00dc` payload a complete JPEG). The READ path under
   *  test is the same one arbitrary user AVIs take. */
  private[graft] def buildAviMjpeg(
      frames: Seq[Array[Byte]],
      width: Int,
      height: Int,
      fps: Int): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes ++ children)
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes).put("MJPG".getBytes)
        .putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(fps)              // scale, rate → fps
        .putInt(0).putInt(frames.length)    // start, length
        .putInt(0).putInt(-1).putInt(0)     // sugBuf, quality, sampleSize
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .put("MJPG".getBytes).putInt(width * height * 3)
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(chunk("00dc", _)).fold(Array.empty[Byte])(_ ++ _))
    chunk("RIFF", "AVI ".getBytes ++ hdrl ++ movi)
  }

  /** Deterministic synthetic MJPEG-AVI corpus (the container ships no
   *  media files): each video is `framesPerVideo` REAL JPEG frames —
   *  uniform gray varying by (id, frame) — in a spec-layout AVI. The
   *  sample/decode path under test is the one arbitrary MJPEG takes. */
  def syntheticVideoCorpus(
      spark: SparkSession,
      n: Int,
      framesPerVideo: Int = 4,
      side: Int = 32,
      fps: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val frames = (0 until framesPerVideo).map { f =>
        val gray = ((id * 53 + f * 40) % 240 + 8).toInt
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(gray, gray, gray))
        g2.fillRect(0, 0, side, side)
        g2.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpeg", baos)
        baos.toByteArray
      }
      (id, buildAviMjpeg(frames, side, side, fps))
    }.toDF("id", "bytes")
  }

  /** Deterministic SCENE corpus for cut detection: each clip's frames
   *  drift gradually (+2 gray per frame — camera pan) except at ONE
   *  declared cut point (4 + id%3) where the level jumps by 100 — the
   *  shape a histogram-delta detector must flag exactly once per
   *  clip. Same MJPEG-in-AVI container as [[syntheticVideoCorpus]]. */
  def syntheticSceneCorpus(
      spark: SparkSession,
      n: Int,
      framesPerVideo: Int = 12,
      side: Int = 32,
      fps: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val cutAt = (4 + id % 3).toInt
      val frames = (0 until framesPerVideo).map { f =>
        val gray = math.min(247,
          (id * 7 % 60 + 20 + f * 2 + (if (f >= cutAt) 100 else 0))).toInt
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(gray, gray, gray))
        g2.fillRect(0, 0, side, side)
        g2.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpeg", baos)
        baos.toByteArray
      }
      (id, buildAviMjpeg(frames, side, side, fps))
    }.toDF("id", "bytes")
  }

  /** Unified asset manifest over a mixed blob table — the catalog row a
   *  multimodal corpus keeps per asset: container format (magic bytes),
   *  size, the type-appropriate metadata (image dims / WAV audio params
   *  / MP4+AVI duration+dims) and a decodable flag. One map-only pass:
   *  every extractor is a per-row byte parse, no codec, no shuffle —
   *  cataloging 100 TB of blobs is scan-bound. Columns not applicable
   *  to a format stay NULL (an image has no sample_rate). */
  def assetManifest(
      df: DataFrame,
      idCol: String = "id",
      binCol: String = "bytes"): DataFrame = {
    val b = col(binCol)
    df.select(col(idCol),
        sniffFormat(b).as("format"),
        length(b).cast("long").as("n_bytes"),
        imageDimensions(b).as("__img"),
        audioMetadata(b).as("__aud"),
        videoMetadata(b).as("__vid"))
      .select(col(idCol), col("format"), col("n_bytes"),
        coalesce(col("__img._1"), col("__vid._2")).as("width"),
        coalesce(col("__img._2"), col("__vid._3")).as("height"),
        coalesce(col("__vid._1"), col("__aud._4")).as("duration_ms"),
        col("__aud._1").as("channels"),
        col("__aud._2").as("sample_rate"),
        (col("__img").isNotNull || col("__aud").isNotNull ||
          col("__vid").isNotNull).as("decodable"))
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
