package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** The REAL video container path (pure-JVM RIFF/AVI demux): buildAvi →
  * demuxAvi round-trips frame payloads byte-exactly, MJPEG frames decode
  * back through ImageIO with true dimensions and colors, the sampler
  * strides by the container's own cadence, and junk/truncated payloads
  * degrade gracefully — the video sibling of Image/AudioCodecSpec.
  */
class VideoCodecSpec extends SparkSpec {

  /** A real JPEG: solid-color frame encoded through ImageIO. */
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("buildAvi → demuxAvi round-trips cadence, dims, and frame bytes exactly") {
    val frames = Seq[Array[Byte]](
      Array[Byte](1, 2, 3, 4, 5),
      Array.empty[Byte],            // zero-length chunk is legal RIFF
      Array[Byte](9, 8, 7))         // odd length exercises pad byte
    val avi = Multimodal.buildAvi(frames, usPerFrame = 40000L, width = 64, height = 48)
    val clip = Multimodal.demuxAvi(avi).get
    assert(clip.usPerFrame === 40000L)
    assert((clip.width, clip.height) === ((64, 48)))
    assert(clip.frames.length === 3)
    assert(clip.frames(0).toSeq === frames(0).toSeq)
    assert(clip.frames(1).isEmpty)
    assert(clip.frames(2).toSeq === frames(2).toSeq)
    assert((0 to 2).map(clip.tsMs) === Seq(0L, 40L, 80L))
  }

  test("MJPEG frames demux to JPEGs that ImageIO decodes with true dims and color") {
    import spark.implicits._
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    val avi = Multimodal.buildAvi(colors.map(jpegFrame(32, 24, _)),
      usPerFrame = 100000L, width = 32, height = 24)
    val media = Seq(MediaRow(1L, "video", avi)).toDS()
    val frames = Multimodal.videoFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.length === 3)
    assert(frames.map(_.ts_ms).toSeq === Seq(0L, 100L, 200L))
    frames.zip(colors).foreach { case (f, c) =>
      val img = ImageIO.read(new ByteArrayInputStream(f.content))
      assert(img != null, s"frame ${f.frame_idx} is not a decodable JPEG")
      assert((img.getWidth, img.getHeight) === ((32, 24)))
      // solid-color JPEG: the dominant channel survives lossy encoding
      val got = img.getRGB(16, 12)
      val dom = Seq((got >> 16) & 0xff, (got >> 8) & 0xff, got & 0xff).zipWithIndex.maxBy(_._1)._2
      val want = Seq((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff).zipWithIndex.maxBy(_._1)._2
      assert(dom === want, s"frame ${f.frame_idx}: dominant channel $dom, want $want")
    }
  }

  test("frameSample strides by container cadence and caps at maxFrames") {
    import spark.implicits._
    // 25 fps (40 ms/frame), 20 frames; sample every 80 ms → stride 2
    val frames = (0 until 20).map(i => Array(i.toByte): Array[Byte])
    val avi = Multimodal.buildAvi(frames, usPerFrame = 40000L, width = 8, height = 8)
    val media = Seq(MediaRow(5L, "video", avi)).toDS()
    val got = Multimodal.frameSample(media, everyNthMs = 80L, maxFrames = 4)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    assert(got.map(_.ts_ms).toSeq === Seq(0L, 80L, 160L, 240L))
    assert(got.map(_.content.head.toInt).toSeq === Seq(0, 2, 4, 6))
  }

  test("junk and truncated payloads degrade gracefully, never throw") {
    import spark.implicits._
    val good = Multimodal.buildAvi(
      Seq(Array[Byte](1), Array[Byte](2), Array[Byte](3)), usPerFrame = 50000L)
    val media = Seq(
      MediaRow(1L, "video", "not a video at all".getBytes("UTF-8")),
      MediaRow(2L, "video", Array.empty[Byte]),
      MediaRow(3L, "video", good.take(good.length / 2)), // truncated mid-movi
      MediaRow(4L, "video", good)
    ).toDS()
    val byId = Multimodal.videoFrames(media).collect().groupBy(_.media_id)
    assert(!byId.contains(1L) && !byId.contains(2L))
    assert(byId(4L).length === 3) // intact clip demuxes fully
    // truncated clip yields a prefix of frames (possibly none), no error
    assert(byId.get(3L).forall(_.length <= 3))
  }

  test("demuxAvi rejects RIFF files that are not AVI") {
    // a RIFF/WAVE header is RIFF but not AVI
    val wav = Array[Byte]('R', 'I', 'F', 'F', 36, 0, 0, 0, 'W', 'A', 'V', 'E')
    assert(Multimodal.demuxAvi(wav).isEmpty)
  }
}
