package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** A minimal crafted video container for the codec-seam proof:
 *  "GRFT" magic, 1-byte frame count, 4-byte big-endian durationMs,
 *  then length-prefixed PNG frame payloads. */
object GraftVid {
  val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

  def grayPng(level: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encode(grayLevels: Seq[Int], durationMs: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Magic)
    out.writeByte(grayLevels.size)
    out.writeInt(durationMs.toInt)
    grayLevels.foreach { g =>
      val png = grayPng(g)
      out.writeInt(png.length)
      out.write(png)
    }
    out.flush()
    bos.toByteArray
  }
}

/** The plug-in under test: a [[Multimodal.FrameCodec]] that decodes the
 *  crafted GRFT container. Top-level object so the task closure
 *  serializes it without dragging the spec instance along — exactly
 *  the footprint a JavaCV/ffmpeg H.264 plug-in would have. */
object GraftVidCodec extends Multimodal.FrameCodec {
  def decode(bytes: Array[Byte]): Option[(Array[Array[Byte]], Long)] = {
    if (bytes.length < 9 || !bytes.take(4).sameElements(GraftVid.Magic))
      return None
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes, 4, bytes.length - 4))
      val n = in.readUnsignedByte()
      val dur = in.readInt().toLong
      val frames = Array.fill(n) {
        val len = in.readInt()
        val f = new Array[Byte](len)
        in.readFully(f)
        f
      }
      Some((frames, dur))
    } catch { case _: Exception => None }
  }
}

/** Proof that the video-frame pipeline's codec seam is real: a fake
 *  codec for a crafted container runs END-TO-END through sampleFrames
 *  → frameFeatures with genuine pixel decode, while unclaimed rows in
 *  the same batch still degrade to the stub. The only thing missing
 *  for H.264 is the codec binary itself — every Spark-side piece
 *  (batching, schema, tick sampling, partition-local shape) is proven
 *  codec-independent here. */
class CodecSeamSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("injected codec decodes a crafted format end-to-end") {
    // clip 0: 4 frames over 1000 ms, gray levels 40/80/120/200
    // clip 1: NOT a GRFT container — must fall through to the stub
    val clips = Seq(
      Multimodal.MediaRow(0L, GraftVid.encode(Seq(40, 80, 120, 200), 1000L),
        Multimodal.MediaMeta("video", "grft", 8, 8, 0L)),
      Multimodal.MediaRow(1L, "not a container".getBytes("UTF-8"),
        Multimodal.MediaMeta("video", "mp4", 0, 0, 500L))
    ).toDS()
    val frames = Multimodal.sampleFrames(clips, intervalMs = 250L,
      codecs = Seq(GraftVidCodec))
    val feats = Multimodal.frameFeatures(frames)
      .orderBy("id", "frame_idx").collect()

    // clip 0: 1000 ms at 250 ms ticks = 4 sampled frames, one per
    // source frame, each with the EXACT crafted gray mean
    val c0 = feats.filter(_.getLong(0) == 0L)
    assert(c0.length == 4)
    val expected = Seq(40, 80, 120, 200).map(_ / 255.0)
    c0.zip(expected).foreach { case (r, want) =>
      assert(r.getInt(3) == 8 && r.getInt(4) == 8, "real decoded dims")
      assert(math.abs(r.getDouble(5) - want) < 1e-9,
        s"frame ${r.getInt(1)}: decoded mean matches the crafted gray")
    }
    // ticks follow the plug-in's header duration, not meta
    assert(c0.map(_.getLong(2)).toSeq == Seq(0L, 250L, 500L, 750L))

    // clip 1: unclaimed bytes degrade per-row to the stub
    // (meta.durationMs 500 ms at 250 ms ticks = 2 stub frames, which
    // don't PNG-decode so mean_intensity is the -1 sentinel)
    val c1 = feats.filter(_.getLong(0) == 1L)
    assert(c1.length == 2)
    assert(c1.forall(_.getDouble(5) == -1.0))
  }

  test("a declining codec changes nothing: built-ins keep their formats") {
    // a GIF clip with the plug-in injected: the plug-in declines
    // (wrong magic) and the built-in GIF path still decodes for real
    val gif = Multimodal.encodeAnimatedGif(
      Seq(60, 180).map { g =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        (0 until 8).foreach(y => (0 until 8).foreach(x =>
          img.setRGB(x, y, rgb)))
        img
      }, 500L)
    val clips = Seq(Multimodal.MediaRow(7L, gif,
      Multimodal.MediaMeta("video", "gif", 8, 8, 0L))).toDS()
    val feats = Multimodal.frameFeatures(
      Multimodal.sampleFrames(clips, intervalMs = 500L,
        codecs = Seq(GraftVidCodec)))
      .orderBy("frame_idx").collect()
    assert(feats.length == 2)
    assert(math.abs(feats(0).getDouble(5) - 60.0 / 255.0) < 0.02,
      "GIF palette quantization keeps gray close")
    assert(math.abs(feats(1).getDouble(5) - 180.0 / 255.0) < 0.02)
  }
}
