package graft.audio

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for [[Spectral.toneMatchRatio]] — seeded ScalaCheck
  * generators (same deterministic-sampling pattern as
  * JsonSchemaSubsetSpec) over random phases, amplitudes, frequencies,
  * sample rates, and two-tone mixtures. These pin the mathematical
  * contract the q42 margins rest on, beyond the generator's own
  * parameter grid. */
class SpectralPropsSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  private def tone(f: Double, phase: Double, amp: Double, sr: Int,
      n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      math.round(math.sin(2.0 * math.Pi * f * i / sr + phase) * amp).toShort)

  private val caseGen: Gen[(Int, Double, Double, Double)] = for {
    sr <- Gen.oneOf(8000, 16000, 22050, 44100, 48000)
    f <- Gen.choose(220.0, 1099.0)
    phase <- Gen.choose(0.0, 2.0 * math.Pi)
    amp <- Gen.choose(1000.0, 16384.0)
  } yield (sr, f, phase, amp)

  test("any full-window tone scores ~1 regardless of phase and amplitude") {
    samples(caseGen, 200).foreach { case (sr, f, phase, amp) =>
      val n = sr * 25 / 1000
      val r = Spectral.toneMatchRatio(tone(f, phase, amp, sr, n), sr, f)
      assert(r > 0.999, s"sr=$sr f=$f phase=$phase amp=$amp r=$r")
    }
  }

  test("ratio is invariant under amplitude scaling (energy fraction, not energy)") {
    samples(caseGen, 50).foreach { case (sr, f, phase, _) =>
      val n = sr * 25 / 1000
      val lo = Spectral.toneMatchRatio(tone(f, phase, 2000.0, sr, n), sr, f)
      val hi = Spectral.toneMatchRatio(tone(f, phase, 16000.0, sr, n), sr, f)
      assert(math.abs(lo - hi) < 5e-3, s"sr=$sr f=$f lo=$lo hi=$hi")
    }
  }

  test("two-tone mixture: ratio at each tone ~ its energy share") {
    // x = A*tone(f1) + B*tone(f2), |f1-f2| >= 100 Hz: the projection onto
    // f1 must recover ~A^2/(A^2+B^2) (cross-terms vanish at separation)
    val mixGen = for {
      sr <- Gen.oneOf(16000, 44100, 48000)
      f1 <- Gen.choose(220.0, 800.0)
      sep <- Gen.choose(150.0, 299.0)
      a <- Gen.choose(3000.0, 12000.0)
      b <- Gen.choose(3000.0, 12000.0)
      p1 <- Gen.choose(0.0, 2.0 * math.Pi)
      p2 <- Gen.choose(0.0, 2.0 * math.Pi)
    } yield (sr, f1, f1 + sep, a, b, p1, p2)
    samples(mixGen, 100).foreach { case (sr, f1, f2, a, b, p1, p2) =>
      val n = sr * 25 / 1000
      val x = Array.tabulate(n)(i => math.round(
        math.sin(2.0 * math.Pi * f1 * i / sr + p1) * a +
          math.sin(2.0 * math.Pi * f2 * i / sr + p2) * b).toShort)
      val share = a * a / (a * a + b * b)
      val r = Spectral.toneMatchRatio(x, sr, f1)
      assert(math.abs(r - share) < 0.06,
        s"sr=$sr f1=$f1 f2=$f2 a=$a b=$b r=$r share=$share")
    }
  }

  test("white-ish noise explains little at any probe frequency") {
    val rnd = new scala.util.Random(7)
    for (sr <- Seq(8000, 48000)) {
      val n = sr * 25 / 1000
      val x = Array.fill[Short](n)((rnd.nextInt(8192) - 4096).toShort)
      for (f <- Seq(220.0, 659.5, 1099.0)) {
        val r = Spectral.toneMatchRatio(x, sr, f)
        // a tone subspace is 2 of ~n/2 effective dimensions; even with
        // windowing slack, noise cannot look like a tone
        assert(r < 0.2, s"sr=$sr f=$f r=$r")
      }
    }
  }

  test("dominant-frequency estimate agrees with the probe on random tones") {
    samples(caseGen, 100).foreach { case (sr, f, phase, amp) =>
      val n = sr * 25 / 1000
      val est = Spectral.dominantFreqHz(tone(f, phase, amp, sr, n), sr, 150.0)
      assert(math.abs(est - f) < 1.0, s"sr=$sr f=$f phase=$phase est=$est")
    }
  }
}
