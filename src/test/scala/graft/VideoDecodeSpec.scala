package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** The real-codec multi-frame video path (javax.imageio animated GIF):
  * synthesized containers decode to exactly their gray-ramp closed
  * forms, and undecodable payloads take the quarantine lane — the same
  * posture AudioDecodeSpec pins for javax.sound and ImageDecodeSpec
  * for single images. */
class VideoDecodeSpec extends SparkSpec {

  test("synth GIF round-trips through the real multi-frame codec to its closed forms") {
    for ((w, h, n, base, step) <- Seq(
        (6, 6, 3, 0, 1), (10, 8, 8, 199, 9), (11, 7, 5, 123, 4), (6, 10, 1, 255, 1))) {
      val f = Multimodal.decodeVideoRow(
        MediaRow(7L, Multimodal.synthGif(w, h, n, base, step)))
      assert(f.ok, s"decode failed for ${w}x${h}x$n base=$base")
      assert(f.width == w && f.height == h && f.n_frames == n)
      val means = (0 until n).map(i => (base + i * step) % 256)
      assert(f.mean_sum == means.map(_.toLong).sum)
      assert(f.peak_mean == means.max)
      assert(f.mid_mean == means(n / 2))
    }
  }

  test("undecodable payloads quarantine as ok=false, never throw") {
    val garbage = Multimodal.decodeVideoRow(
      MediaRow(1L, "definitely not a gif".getBytes("UTF-8")))
    assert(!garbage.ok && garbage.n_frames == 0)
    val truncated = Multimodal.decodeVideoRow(
      MediaRow(2L, Multimodal.synthGif(8, 8, 4, 10, 3).take(25)))
    assert(!truncated.ok)
    val empty = Multimodal.decodeVideoRow(MediaRow(3L, Array.emptyByteArray))
    assert(!empty.ok)
  }

  test("the oracled endpoint emits one decoded row per document") {
    val df = Multimodal.videoFrameFeatures(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(df.count() == n, "every synthesized container must decode (ok=true)")
  }
}
