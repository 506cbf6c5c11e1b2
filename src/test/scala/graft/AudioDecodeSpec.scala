package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** The real-codec audio path (javax.sound.sampled): synthesized
  * RIFF/WAVE payloads decode to exactly their construction parameters'
  * closed forms, and undecodable payloads take the quarantine lane —
  * the same posture ImageDecodeSpec pins for javax.imageio. */
class AudioDecodeSpec extends SparkSpec {

  test("synth WAV round-trips through the real codec to its closed forms") {
    for ((rate, ch, frames, amp) <- Seq(
        (8000, 1, 400, 1000), (16000, 2, 655, 1990), (44100, 2, 1234, 32767))) {
      val f = Multimodal.decodeAudioRow(
        MediaRow(7L, Multimodal.synthWav(rate, ch, frames, amp)))
      assert(f.ok, s"decode failed for rate=$rate ch=$ch")
      assert(f.sample_rate == rate && f.channels == ch && f.bits == 16)
      assert(f.n_frames == frames)
      assert(f.duration_ms == frames * 1000L / rate)
      assert(f.peak == amp)
      assert(f.energy_sum == frames.toLong * ch * amp.toLong * amp)
    }
  }

  test("undecodable payloads quarantine as ok=false, never throw") {
    val garbage = Multimodal.decodeAudioRow(
      MediaRow(1L, "not audio at all".getBytes("UTF-8")))
    assert(!garbage.ok && garbage.energy_sum == 0L)
    val truncated = Multimodal.decodeAudioRow(
      MediaRow(2L, Multimodal.synthWav(8000, 1, 100, 500).take(20)))
    assert(!truncated.ok)
    val empty = Multimodal.decodeAudioRow(MediaRow(3L, Array.emptyByteArray))
    assert(!empty.ok)
  }

  test("the oracled endpoint emits one decoded row per document") {
    val df = Multimodal.audioFeatures(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(df.count() == n, "every synthesized payload must decode (ok=true)")
  }
}
