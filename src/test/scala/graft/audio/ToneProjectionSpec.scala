package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Margin sweep for [[Spectral.toneMatchRatio]] — the verdict primitive of
  * FrequencyCheck — using the REAL codec pipeline: synth → encode →
  * (byte-zero the back half exactly like ClipsGenerator.injectErrors) →
  * AudioCodec.decode → project onto the claimed tone. These bounds are
  * what the q42 oracle's exact band prediction rests on: legitimate
  * content and corrupt content must sit far from the 0.75 threshold on
  * opposite sides for EVERY (sample-rate, tone, codec) combination the
  * generator can produce. */
class ToneProjectionSpec extends AnyFunSuite {

  private def corruptBytes(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var k = 44 + (b.length - 44) / 2
    while (k < b.length) { b(k) = 0; k += 1 }
    b
  }

  private def encode(codec: String, sr: Int, f: Double): Array[Byte] = {
    val s = WavCodec.synthSineSamples(f, 25, sr)
    codec match {
      case "flac" => FlacCodec.encode(sr, s)
      case "pcm_mulaw" => G711Codec.encodeMuLaw(sr, s)
      case "pcm_alaw" => G711Codec.encodeALaw(sr, s)
      case "adpcm_ima" => AdpcmCodec.encode(sr, s)
      case "pcm_s16le" => WavCodec.synthSine(f, 25, sr)
    }
  }

  private val rates = Seq(8000, 16000, 22050, 44100, 48000)
  private val codecs =
    Seq("pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw", "adpcm_ima")

  // ADPCM's 4-bit quantization puts ~0.5-1% of clean-signal energy into
  // noise at the hardest f/sr corners (12.65 dB min SNR, AdpcmBandSweep) —
  // still >= 0.24 above the 0.75 verdict threshold; the other codecs stay
  // at >= 0.999
  private def cleanFloor(codec: String): Double =
    if (codec == "adpcm_ima") 0.99 else 0.999

  test("legitimate content clears its clean floor through every real codec") {
    var worst = 1.0
    for (sr <- rates; f <- 220 until 1100 by 3; codec <- codecs) {
      val (srd, dec) = AudioCodec.decode(encode(codec, sr, f.toDouble), codec)
      val r = Spectral.toneMatchRatio(dec, srd, f.toDouble)
      if (r < worst) worst = r
      assert(r >= cleanFloor(codec), s"codec=$codec sr=$sr f=$f r=$r")
    }
    info(f"clean decoded min ratio: $worst%.5f (threshold 0.75)")
  }

  test("a 1 Hz-off tone still matches (dup rows pass here by design)") {
    for (sr <- rates; f <- Seq(220, 659, 1099)) {
      val s = WavCodec.synthSineSamples(f.toDouble, 25, sr)
      assert(Spectral.toneMatchRatio(s, sr, f - 1.0) >= 0.999)
    }
  }

  test("corrupt payloads score <= 0.55 (or fail decode) for every combo") {
    var worst = 0.0
    var flacFailed = 0
    for (sr <- rates; f <- 220 until 1100 by 3;
         codec <- codecs if codec != "adpcm_ima") {
      val bad = corruptBytes(encode(codec, sr, f.toDouble))
      val decoded =
        try Some(AudioCodec.decode(bad, codec))
        catch { case _: Exception => None }
      decoded match {
        case None =>
          assert(codec === "flac", s"corrupt $codec failed decode sr=$sr f=$f")
          flacFailed += 1
        case Some((srd, dec)) =>
          assert(codec !== "flac",
            s"zeroed flac stream decoded without a CRC error (sr=$sr f=$f)")
          val r = Spectral.toneMatchRatio(dec, srd, f.toDouble)
          if (r > worst) worst = r
          assert(r <= 0.55, s"codec=$codec sr=$sr f=$f r=$r")
      }
    }
    info(f"corrupt decodable max ratio: $worst%.4f (threshold 0.75)")
    assert(flacFailed > 0, "flac corruption must exercise the CRC path")
  }

  test("corrupt adpcm payloads score <= 0.6 at every combo the generator can reach") {
    // corrupt rows exist only at sr = 22050: i ≡ 17 (mod 5000) forces
    // i = 5000k+17, so i%10 = 7 (not the 16000 branch) and
    // (i/10) % 4 = (500k+1) % 4 = 1 because 500 ≡ 0 (mod 4) — always
    // SampleRates(1) = 22050. At UNREACHABLE combos (e.g. sr=8000, f=220,
    // which also violates f ≡ 237 (mod 40)) a zeroed adpcm tail can freeze
    // near a zero crossing and project up to ~0.78 — irrelevant to the q42
    // oracle, which only ever sees reachable rows (measured max there:
    // 0.387 over the 22 real freqs; 0.574 over ALL f at 22050).
    var worst = 0.0
    for (f <- 220 until 1100 by 3) {
      val bad = corruptBytes(encode("adpcm_ima", 22050, f.toDouble))
      val (srd, dec) = AudioCodec.decode(bad, "adpcm_ima")
      val r = Spectral.toneMatchRatio(dec, srd, f.toDouble)
      if (r > worst) worst = r
      assert(r <= 0.6, s"sr=22050 f=$f r=$r")
    }
    info(f"corrupt adpcm max ratio at the reachable rate: $worst%.4f (threshold 0.75)")
  }

  test("a swapped tone >= 40 Hz away is rejected at every combo") {
    var worst = 0.0
    for (sr <- rates; f <- 220 until 1060 by 3) {
      val s = WavCodec.synthSineSamples(f.toDouble, 25, sr)
      val r = Spectral.toneMatchRatio(s, sr, f + 40.0)
      if (r > worst) worst = r
      assert(r <= 0.55, s"sr=$sr f=$f r=$r")
    }
    info(f"swap(40 Hz) max ratio: $worst%.4f")
  }
}
