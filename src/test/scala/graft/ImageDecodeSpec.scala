package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Real image decode over the multimodal binary column: in-memory
  * PNG/JPEG/BMP fixtures round-trip through the distributed decode
  * path with exact dimensions, channel counts, luminance arithmetic,
  * and quarantine semantics for undecodable payloads. */
class ImageDecodeSpec extends SparkSpec {

  /** A w×h image whose pixel (x,y) is a solid (r,g,b), encoded via the
    * JDK writer for `format`. */
  private def solid(w: Int, h: Int, rgb: (Int, Int, Int),
                    format: String): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(im, format, out), s"no JDK writer for $format")
    out.toByteArray
  }

  private def decode(rows: Seq[MediaRow]) = {
    import spark.implicits._
    Multimodal.decodeImages(spark.createDataset(rows))
      .collect().map(f => f.doc_id -> f).toMap
  }

  test("PNG/JPEG/BMP payloads decode with exact dimensions and channels") {
    val got = decode(Seq(
      MediaRow(1L, solid(16, 9, (255, 0, 0), "png")),
      MediaRow(2L, solid(8, 8, (0, 0, 0), "jpg")),
      MediaRow(3L, solid(5, 7, (10, 20, 30), "bmp"))))
    assert(got(1L).ok && got(1L).width == 16 && got(1L).height == 9)
    assert(got(2L).ok && got(2L).width == 8 && got(2L).height == 8)
    assert(got(3L).ok && got(3L).width == 5 && got(3L).height == 7)
    assert(got.values.forall(_.channels == 3))
  }

  test("luminance sum and pooled signature are exact integer arithmetic") {
    // solid red, BT.601 fixed-point: 299*255 per pixel
    val got = decode(Seq(MediaRow(1L, solid(16, 9, (255, 0, 0), "png"))))
    val perPixel = 299L * 255
    assert(got(1L).luma_sum == perPixel * 16 * 9)
    // every 8x8 cell of a solid image averages to the same value
    assert(got(1L).signature.toSeq == Seq.fill(64)(perPixel))
  }

  test("undecodable payloads quarantine as ok=false instead of failing the scan") {
    val garbage = MediaRow(9L, Array[Byte](1, 2, 3, 4, 5))
    val text = MediaRow(10L, "not an image at all".getBytes("UTF-8"))
    val fine = MediaRow(11L, solid(4, 4, (0, 255, 0), "png"))
    val got = decode(Seq(garbage, text, fine))
    assert(!got(9L).ok && !got(10L).ok)
    assert(got(9L).width == 0 && got(9L).luma_sum == 0L)
    assert(got(11L).ok && got(11L).width == 4)
  }

  test("partitioning does not change decoded rows (deterministic features)") {
    val rows = (0 until 12).map(i =>
      MediaRow(i.toLong, solid(3 + i, 5 + i, (i * 20 % 256, 50, 200), "png")))
    import spark.implicits._
    val one = Multimodal.decodeImages(
      spark.createDataset(rows).repartition(1)).collect()
      .sortBy(_.doc_id).map(f => (f.doc_id, f.width, f.luma_sum, f.signature.toSeq))
    val many = Multimodal.decodeImages(
      spark.createDataset(rows).repartition(7)).collect()
      .sortBy(_.doc_id).map(f => (f.doc_id, f.width, f.luma_sum, f.signature.toSeq))
    assert(one.toSeq == many.toSeq)
  }
}
