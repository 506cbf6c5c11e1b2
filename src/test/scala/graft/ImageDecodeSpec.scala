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

  test("perceptual near-dup: JPEG re-encode pairs with its PNG original") {
    import spark.implicits._
    // a gradient survives lossy re-encoding with (nearly) the same
    // aHash; the vertical and inverted gradients are far away
    def gradient(w: Int, h: Int, fx: (Int, Int) => Int): BufferedImage = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = fx(x, y) & 0xff
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def bytes(im: BufferedImage, format: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(im, format, out))
      out.toByteArray
    }
    val horiz = gradient(64, 64, (x, _) => x * 4)
    val rows = Seq(
      MediaRow(1L, bytes(horiz, "png")),
      MediaRow(2L, bytes(horiz, "jpg")), // lossy near-dup of 1
      MediaRow(3L, bytes(gradient(64, 64, (_, y) => y * 4), "png")),
      MediaRow(4L, bytes(gradient(64, 64, (x, _) => 255 - x * 4), "png")))
    val pairs = Multimodal.imageNearDupPairs(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"re-encoded image must pair: $pairs")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      "the inverted gradient is a far hash, not a near-dup")
  }

  test("banding recall is exact: every hamming<=7 pair surfaces (pigeonhole)") {
    import spark.implicits._
    // adversarial fixture: hashes at controlled hamming distances via
    // images built from an 8x8 block pattern (each block maps to one
    // signature cell, so flipping k blocks flips exactly k hash bits)
    def blocks(bits: Long): BufferedImage = {
      val im = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val cell = (y / 8) * 8 + (x / 8)
        val v = if (((bits >> cell) & 1L) == 1L) 255 else 0
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def png(im: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(im, "png", out))
      out.toByteArray
    }
    // base pattern (32 bits set, so the mean threshold splits cleanly),
    // plus variants flipping 1/4/7 ZERO-cells to one — hamming 1, 4, 7
    val base = 0x00000000ffffffffL
    val rows = Seq(
      MediaRow(0L, png(blocks(base))),
      MediaRow(1L, png(blocks(base | (1L << 33)))),
      MediaRow(4L, png(blocks(base | (0xfL << 40)))),
      MediaRow(7L, png(blocks(base | (0x7fL << 48)))))
    val ds = spark.createDataset(rows)
    // driver-side brute-force truth over the actual hashes
    val hs = Multimodal.imageHashes(Multimodal.decodeImages(ds))
      .collect().map(h => h.doc_id -> h.ahash).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 7
    } yield (a, b)).toSet
    assert(want.nonEmpty, s"fixture must produce close pairs: $hs")
    val got = Multimodal.imageNearDupPairs(ds, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"banded candidates must find EXACTLY the brute-force pairs: got $got want $want")
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
