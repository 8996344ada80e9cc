package graft.audio

import org.scalatest.funsuite.AnyFunSuite

class ResamplerSpec extends AnyFunSuite {

  private def sine(freq: Double, sr: Int, ms: Int): Array[Short] =
    WavCodec.synthSineSamples(freq, ms, sr)

  test("length is floor(n·srTo/srFrom); same-rate is identity (no copy)") {
    val s = sine(440, 16000, 25) // 400 samples
    assert(Resampler.linear(s, 16000, 16000) eq s)
    assert(Resampler.linear(s, 16000, 8000).length === 200)
    assert(Resampler.linear(s, 16000, 48000).length === 1200)
    // non-integer ratio: 400 * 16000 / 44100 = 145.1…
    assert(Resampler.linear(sine(440, 44100, 25).take(400).toArray,
      44100, 16000).length === 145)
    assert(Resampler.linear(Array.empty[Short], 8000, 16000).length === 0)
  }

  test("a band-limited tone survives conversion at every table rate pair") {
    for (srFrom <- ClipsGenerator16.rates; freq <- Seq(220.0, 660.0, 1099.0)) {
      val conv = Resampler.linear(sine(freq, srFrom, 25), srFrom, 16000)
      val ratio = Spectral.toneMatchRatio(conv, 16000, freq)
      assert(ratio >= 0.99, s"sr=$srFrom freq=$freq ratio=$ratio")
    }
  }

  test("conversion is deterministic and overflow-free at clip scale") {
    val s = sine(523, 48000, 25)
    val a = Resampler.linear(s, 48000, 16000)
    val b = Resampler.linear(s.clone(), 48000, 16000)
    assert(a.toSeq === b.toSeq)
    // the final output sample interpolates within bounds (clamped idx+1)
    val up = Resampler.linear(Array[Short](100, -100), 8000, 48000)
    assert(up.length === 12 && up.forall(v => v >= -100 && v <= 100))
  }

  test("rates must be positive") {
    intercept[IllegalArgumentException] {
      Resampler.linear(Array[Short](1), 0, 16000)
    }
  }
}

/** The five table rates incl. the 16 kHz hot key. */
private object ClipsGenerator16 {
  val rates = Seq(8000, 16000, 22050, 44100, 48000)
}
