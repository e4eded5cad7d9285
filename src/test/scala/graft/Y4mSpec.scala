package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** Y4M (YUV4MPEG2) decode: the third real video container and the only
 *  one needing NO codec at all — plain-text stream header + raw planar
 *  frames. Pins header parsing, the frame walk, lossless luma decode,
 *  the metadata lane, and the scene-cut path over the Y4M grain. */
class Y4mSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def luma(v: Int, side: Int = 8): Array[Byte] = {
    val y = new Array[Byte](side * side)
    java.util.Arrays.fill(y, v.toByte)
    y
  }

  test("header parse: dims, rate, colourspace plane sizes") {
    val b = Multimodal.buildY4m(Seq(luma(40)), 8, 8, 25)
    assert(Multimodal.sniffFormatBytes(b) == "y4m")
    val Some((w, h, fn, fd, frameBytes, off)) = Multimodal.y4mHeaderBytes(b)
    assert((w, h, fn, fd) == (8, 8, 25, 1))
    assert(frameBytes == 64 + 2 * 16, "C420: Y + two quarter planes")
    assert(b(off) == 'F' && b(off + 5) == 0x0a, "first FRAME marker")
    // C444 and mono plane arithmetic straight from a hand-built header
    val h444 = "YUV4MPEG2 W4 H2 F30:1 C444\n".getBytes("US-ASCII")
    assert(Multimodal.y4mHeaderBytes(h444).get._5 == 3 * 8)
    val hMono = "YUV4MPEG2 W4 H2 F30:1 Cmono\n".getBytes("US-ASCII")
    assert(Multimodal.y4mHeaderBytes(hMono).get._5 == 8)
    // malformed: unknown colourspace, junk dims, non-Y4M bytes
    assert(Multimodal.y4mHeaderBytes(
      "YUV4MPEG2 W4 H2 F30:1 C999\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.y4mHeaderBytes(
      "YUV4MPEG2 Wx H2 F30:1\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.y4mHeaderBytes("not video".getBytes).isEmpty)
    assert(Multimodal.y4mHeaderBytes(null).isEmpty)
  }

  test("metadata: frame-count walk and exact rational duration") {
    val b = Multimodal.buildY4m(Seq(luma(10), luma(20), luma(30)), 8, 8, 4)
    // 3 frames at 4 fps = 750 ms
    assert(Multimodal.y4mMetaBytes(b).contains((750L, 8, 8)))
    // non-integer rate: 5 frames at 30000:1001 (NTSC) = 166 ms floor
    val ntsc = {
      val baos = new java.io.ByteArrayOutputStream()
      baos.write("YUV4MPEG2 W2 H2 F30000:1001 Cmono\n".getBytes("US-ASCII"))
      (0 until 5).foreach { _ =>
        baos.write("FRAME\n".getBytes("US-ASCII"))
        baos.write(Array[Byte](1, 2, 3, 4))
      }
      baos.toByteArray
    }
    assert(Multimodal.y4mMetaBytes(ntsc).contains((5 * 1000L * 1001 / 30000, 2, 2)))
    // a truncated final frame is not counted
    val cut = b.dropRight(10)
    assert(Multimodal.y4mMetaBytes(cut).contains((500L, 8, 8)))
  }

  test("luma decode is lossless: r=g=b=Y, no colorspace transform") {
    val b = Multimodal.buildY4m(Seq(luma(40), luma(200)), 8, 8, 25)
    val frames = Multimodal.y4mPngFrames(b)
    assert(frames.length == 2)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames(1)))
    assert(img.getWidth == 8 && img.getHeight == 8)
    val p = img.getRGB(3, 3)
    assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == (200, 200, 200))
    // frame params after the FRAME marker are skipped, not misread
    val withParams = new String(b, "ISO-8859-1")
      .replaceFirst("FRAME\n", "FRAME Xsome-param\n")
      .getBytes("ISO-8859-1")
    assert(Multimodal.y4mPngFrames(withParams).length == 2)
    assert(Multimodal.y4mPngFrames("junk".getBytes).isEmpty)
  }

  test("videoMetadata + assetManifest catalog y4m beside mp4/avi") {
    val df = Seq(
      (1L, Multimodal.buildY4m(Seq(luma(50), luma(60)), 8, 8, 2)),
      (2L, "not media".getBytes)).toDF("id", "bytes")
    val rows = Multimodal.assetManifest(df).orderBy("id").collect()
    assert(rows(0).getAs[String]("format") == "y4m")
    assert(rows(0).getAs[Long]("duration_ms") == 1000L)
    assert(rows(0).getAs[Int]("width") == 8)
    assert(rows(0).getAs[Int]("height") == 8)
    assert(rows(0).getAs[Boolean]("decodable"))
    assert(rows(1).getAs[String]("format") == "unknown")
    assert(!rows(1).getAs[Boolean]("decodable"))
  }

  test("sampleFrames constant-rate ticks; scene cut detects exactly once") {
    val vids = Multimodal.syntheticY4mSceneCorpus(spark, 6,
      framesPerVideo = 8)
    val media = vids.as[(Long, Array[Byte])].map { case (id, b) =>
      Multimodal.MediaRow(id, b, Multimodal.MediaMeta("video", "y4m", 32, 32, 0L))
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
    // 8 frames at 4 fps = 2000 ms sampled at 250 ms → 8 frames per clip,
    // and raw luma means are EXACT gray/255 (no codec approximation)
    assert(feats.groupBy("id").count().collect()
      .forall(_.getLong(1) == 8L))
    val mi0 = feats.filter(col("id") === 0 && col("frame_idx") === 0)
      .select("mean_intensity").as[Double].head()
    assert(math.abs(mi0 - 20.0 / 255.0) < 1e-9)
  }
}
