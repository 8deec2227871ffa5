package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The REAL image codec path (JDK ImageIO): decode recovers true
  * dimensions and channel means from genuine PNG/JPEG payloads, resize
  * re-encodes at target dimensions with color preserved, and junk
  * bytes degrade to no row instead of failing the job.
  */
class ImageCodecSpec extends SparkSpec {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: true dimensions + exact channel means; junk yields no row") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", png(32, 16, 0xFF0000)), // solid red
      MediaRow(2L, "image", png(8, 8, 0x00FF00)),   // solid green
      MediaRow(3L, "image", "not an image at all".getBytes("UTF-8"))
    ).toDS()
    val got = Multimodal.decodeImages(media).collect()
      .map(d => d.media_id -> d).toMap
    assert(got.keySet === Set(1L, 2L)) // junk row degrades gracefully
    assert((got(1L).width, got(1L).height, got(1L).n_px) === ((32, 16, 512L)))
    assert(got(1L).mean_rgb.toSeq === Seq(1.0f, 0.0f, 0.0f))
    assert((got(2L).width, got(2L).height) === ((8, 8)))
    assert(got(2L).mean_rgb.toSeq === Seq(0.0f, 1.0f, 0.0f))
  }

  test("resizeImages: re-encoded payload decodes at target dims, color preserved") {
    import spark.implicits._
    val media = Seq(MediaRow(5L, "image", png(64, 48, 0x0000FF))).toDS()
    val resized = Multimodal.resizeImages(media, 16, 12).collect()
    assert(resized.length === 1)
    assert((resized.head.width, resized.head.height) === ((16, 12)))
    // round-trip: the resized PNG is itself decodable with the color intact
    val back = Multimodal.decodeImages(
      Seq(MediaRow(5L, "image", resized.head.content)).toDS()).collect().head
    assert((back.width, back.height) === ((16, 12)))
    assert(back.mean_rgb.toSeq === Seq(0.0f, 0.0f, 1.0f))
  }

  test("jpeg payloads decode too (second container format)") {
    import spark.implicits._
    val img = new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 10, 10); g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val got = Multimodal.decodeImages(
      Seq(MediaRow(9L, "image", bos.toByteArray)).toDS()).collect()
    assert(got.length === 1 && got.head.width === 10)
    // white survives JPEG's lossy round-trip at full intensity
    assert(got.head.mean_rgb.forall(_ > 0.98f))
  }
}
