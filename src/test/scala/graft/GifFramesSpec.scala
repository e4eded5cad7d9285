package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** Animated-GIF frame decode: the second real video container (stock
 *  ImageIO, no codec). Pins the encode→decode roundtrip, per-frame
 *  delays, GIF89a composition (offsets + restore-to-background
 *  disposal), and the scene-cut path over the GIF grain. */
class GifFramesSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def gray(v: Int, side: Int = 8): BufferedImage = {
    val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v))
    g.fillRect(0, 0, side, side)
    g.dispose()
    img
  }

  private def meanGray(png: Array[Byte]): Double = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    px.map(p => (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0)
      .sum / px.length
  }

  test("encode→decode roundtrip: frame count, delays, exact grays") {
    val bytes = Multimodal.encodeAnimatedGif(
      Seq(gray(40), gray(80), gray(200)), delayMs = 250L)
    assert(Multimodal.sniffFormatBytes(bytes) == "gif")
    val frames = Multimodal.gifAnimFrames(bytes)
    assert(frames.length == 3)
    assert(frames.forall(_._2 == 250L))
    // uniform grays survive the palette losslessly
    assert(frames.map(f => math.round(meanGray(f._1))).toSeq ==
      Seq(40L, 80L, 200L))
  }

  test("static (single-frame) GIF is not a video: no frames") {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray(99), "gif", baos)
    assert(Multimodal.gifAnimFrames(baos.toByteArray).isEmpty)
    // and non-GIF bytes are refused outright
    assert(Multimodal.gifAnimFrames("not a gif".getBytes).isEmpty)
    assert(Multimodal.gifAnimFrames(null).isEmpty)
  }

  test("composition honors frame offsets over the running canvas") {
    // frame 0: full 8x8 black; frame 1: a 4x4 white patch at (2,2) —
    // the composed second frame must be mostly black with the patch
    val base = gray(0)
    val patch = gray(255, side = 4)
    // hand-build a 2-frame GIF where frame 2 sits at an offset: encode
    // via ImageIO write sequence with an ImageDescriptor offset
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def write(img: BufferedImage, x: Int, y: Int): Unit = {
      val ty = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val md = writer.getDefaultImageMetadata(ty, writer.getDefaultWriteParam)
      val fmt = md.getNativeMetadataFormatName
      val root = md.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getChildNodes
      val desc = (0 until kids.getLength).map(kids.item)
        .find(_.getNodeName == "ImageDescriptor").get
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      md.setFromTree(fmt, root)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, md),
        writer.getDefaultWriteParam)
    }
    write(base, 0, 0)
    write(patch, 2, 2)
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val frames = Multimodal.gifAnimFrames(baos.toByteArray)
    assert(frames.length == 2)
    val f1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames(1)._1))
    assert(f1.getWidth == 8 && f1.getHeight == 8)
    assert((f1.getRGB(3, 3) & 0xff) == 255, "patch pixel composed")
    assert((f1.getRGB(0, 0) & 0xff) == 0, "canvas outside patch survives")
  }

  test("sampleFrames walks GIF per-frame delays; scene cut detects") {
    val vids = Multimodal.syntheticGifSceneCorpus(spark, 6,
      framesPerVideo = 8)
    val media = vids.as[(Long, Array[Byte])].map { case (id, b) =>
      Multimodal.MediaRow(id, b, Multimodal.MediaMeta("video", "gif", 32, 32, 0L))
    }
    val feats = Multimodal.frameFeatures(
      Multimodal.sampleFrames(media, intervalMs = 250L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("frame_idx")
    val cuts = feats
      .withColumn("delta", abs(col("mean_intensity") -
        lag(col("mean_intensity"), 1).over(w)))
      .filter(col("delta") > 0.1)
      .groupBy("id")
      .agg(count(lit(1)).as("n_cuts"),
        min("frame_idx").as("first_cut"))
      .collect().map(r => (r.getLong(0),
        r.getLong(1), r.getInt(2))).toList.sortBy(_._1)
    assert(cuts.size == 6)
    cuts.foreach { case (id, nCuts, firstCut) =>
      assert(nCuts == 1L, s"clip $id: one declared cut")
      assert(firstCut == (4 + id % 3).toInt, s"clip $id cut position")
    }
    // 8 frames x 250ms at 250ms ticks → 8 sampled frames per clip
    assert(feats.groupBy("id").count().collect()
      .forall(_.getLong(1) == 8L))
  }
}
