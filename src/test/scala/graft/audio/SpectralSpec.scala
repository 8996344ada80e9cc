package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch FFT, dominant-frequency estimator, and tone-projection
  * ratio ([[Spectral]]): transform correctness is pinned against a naive
  * O(n^2) DFT written independently here, and the estimator is swept over
  * the generator's ENTIRE frequency x sample-rate space at the oracle
  * tables' 25 ms synth cap. (The codec-level margin sweep for the
  * projection verdict lives in ToneProjectionSpec.) */
class SpectralSpec extends AnyFunSuite {

  private def naiveDft(re: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      or(k) += re(t) * math.cos(ang)
      oi(k) += re(t) * math.sin(ang)
    }
    (or, oi)
  }

  test("FFT matches a naive DFT on seeded random signals") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(8, 64, 256)) {
      val sig = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val re = sig.clone()
      val im = new Array[Double](n)
      Spectral.fftInPlace(re, im)
      val (er, ei) = naiveDft(sig)
      var k = 0
      while (k < n) {
        assert(math.abs(re(k) - er(k)) < 1e-8, s"re[$k] n=$n")
        assert(math.abs(im(k) - ei(k)) < 1e-8, s"im[$k] n=$n")
        k += 1
      }
    }
  }

  test("FFT conserves energy (Parseval) and rejects non-power-of-two sizes") {
    val rnd = new scala.util.Random(7)
    val n = 128
    val sig = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = sig.clone()
    val im = new Array[Double](n)
    Spectral.fftInPlace(re, im)
    val timeEnergy = sig.map(x => x * x).sum
    val freqEnergy = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeEnergy - freqEnergy) < 1e-8 * n)
    intercept[IllegalArgumentException] {
      Spectral.fftInPlace(new Array[Double](12), new Array[Double](12))
    }
  }

  test("dominant-frequency sweep: whole generator parameter space at the 25 ms cap") {
    // every (sr, tone) the oracle tables can contain: 5 rates x 880 tones
    var maxErr = 0.0
    for (sr <- Seq(8000, 16000, 22050, 44100, 48000); f <- 220 until 1100) {
      val s = WavCodec.synthSineSamples(f.toDouble, 25, sr)
      val est = Spectral.dominantFreqHz(s, sr)
      val err = math.abs(est - f)
      if (err > maxErr) maxErr = err
      assert(err < 1.0, s"sr=$sr f=$f est=$est")
    }
    info(f"max |error| over 4400 combos: $maxErr%.4f Hz")
  }

  test("dominant frequency survives the lossy G.711 round-trip") {
    for (sr <- Seq(8000, 48000); f <- Seq(220, 659, 1099)) {
      val s = WavCodec.synthSineSamples(f.toDouble, 25, sr)
      val (srBack, decoded) =
        AudioCodec.decode(G711Codec.encodeMuLaw(sr, s), "pcm_mulaw")
      assert(srBack === sr)
      val est = Spectral.dominantFreqHz(decoded, sr)
      assert(math.abs(est - f) < 2.0, s"sr=$sr f=$f est=$est")
    }
  }

  test("degenerate signals: too-short gives NaN, constant resolves near DC") {
    assert(Spectral.dominantFreqHz(Array[Short](1, 2, 3), 8000).isNaN)
    val const = Array.fill[Short](200)(-32124)
    val est = Spectral.dominantFreqHz(const, 8000)
    // a step/constant is not a tone: all energy near DC, far below 220 Hz
    assert(est < 100.0, s"constant signal estimated $est Hz")
    val silent = Array.fill[Short](200)(0)
    assert(Spectral.dominantFreqHz(silent, 8000) === 0.0)
  }

  test("band floor skips out-of-band energy: tone + DC offset resolves to the tone") {
    for (sr <- Seq(8000, 48000); f <- Seq(220, 1099)) {
      val s = WavCodec.synthSineSamples(f.toDouble, 25, sr)
      val offset = s.map(v => (v / 2 + 12000).toShort)
      val est = Spectral.dominantFreqHz(offset, sr, minHz = 150.0)
      assert(math.abs(est - f) < 1.0, s"sr=$sr f=$f est=$est")
    }
  }

  test("toneMatchRatio: unit behavior (full tone ~1, orthogonal tone ~0, silence 0)") {
    val sr = 16000
    val s = WavCodec.synthSineSamples(440.0, 25, sr)
    assert(Spectral.toneMatchRatio(s, sr, 440.0) > 0.999)
    assert(Spectral.toneMatchRatio(s, sr, 880.0) < 0.01)
    assert(Spectral.toneMatchRatio(Array.fill[Short](400)(0), sr, 440.0) === 0.0)
    assert(Spectral.toneMatchRatio(Array[Short](1, 2), sr, 440.0).isNaN)
    // phase invariance: shifted tone projects identically
    val shifted = Array.tabulate[Short](s.length)(i =>
      math.round(math.sin(2.0 * math.Pi * 440.0 * i / sr + 1.234) * 16384).toShort)
    assert(Spectral.toneMatchRatio(shifted, sr, 440.0) > 0.999)
  }
}
