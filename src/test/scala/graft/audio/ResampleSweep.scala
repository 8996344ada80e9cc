package graft.audio

import graft.io.ClipsGenerator
import graft.validate.ResampleCheck
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.audio.ResampleSweep"`):
  * the post-conversion tone-survival ratios per (codec, class) that
  * justify ResampleCheck's verdict bands and the q66 oracle's
  * id-arithmetic prediction. Same sections as AudioTrimSweep: an id-space
  * sweep over the generated table (errors on) and a structural sweep over
  * every feasible (freq, sr) pair through the real codecs, clean and
  * zeroed-back-half corrupt, all converted to the 16 kHz target with
  * [[Resampler.linear]] and measured with
  * [[Spectral.toneMatchRatio]] at the claimed tone.
  *
  * Measured 2026-08-18 (cap 25 ms, target 16 kHz), ratio [min, max]:
  *   clean / struct_clean  pcm [0.9979, 1.0000]  flac [0.9979, 1.0000]
  *                         µ-law [0.9978, 0.9999]  A-law [0.9978, 1.0000]
  *                         adpcm [0.9928, 1.0000]
  *   dup_id (tone 1 Hz off, unresolvable in 25 ms) ≥ 0.9985
  *   corrupt / struct_corrupt  flac → decode FAILS (all 880 + 9 id rows)
  *                         pcm ≤ 0.5372  A-law ≤ 0.4628  µ-law ≤ 0.1177
  *                         adpcm ≤ 0.6928 (front-half tone dominates)
  *   struct_swapped (tone ≥ 40 Hz off) ≤ 0.4482
  * The 0.85 threshold is the [0.6928, 0.9928] midpoint — ≥ 1.17× margin
  * each side. ResampleCheckSpec asserts the corners; the `ignore`d test
  * keeps the sweep out of CI.
  */
class ResampleSweep extends AnyFunSuite {
  ignore("sweep") { ResampleSweep.run() }
}

object ResampleSweep {

  def main(args: Array[String]): Unit = run()

  private def zeroBackHalf(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var k = 44 + (b.length - 44) / 2
    while (k < b.length) { b(k) = 0; k += 1 }
    b
  }

  /** (decoded, ratio) after decode → resample(target) → project. */
  private def measure(bytes: Array[Byte], codec: String, freq: Double,
      targetHz: Int): (Boolean, Double) =
    try {
      val (sr, samples) = AudioCodec.decode(bytes, codec)
      val conv = Resampler.linear(samples, sr, targetHz)
      (true, Spectral.toneMatchRatio(conv, targetHz, freq))
    } catch { case _: Exception => (false, Double.NaN) }

  def run(): Unit = {
    val cap = 25
    val target = ResampleCheck.DefaultTargetHz
    val agg = scala.collection.mutable.Map
      .empty[(String, String), (Double, Double, Long, Long)]
    def record(key: (String, String), m: (Boolean, Double)): Unit = {
      val (lo, hi, n, fails) =
        agg.getOrElseUpdate(key, (Double.MaxValue, Double.MinValue, 0L, 0L))
      if (m._1)
        agg(key) = (math.min(lo, m._2), math.max(hi, m._2), n + 1, fails)
      else agg(key) = (lo, hi, n, fails + 1)
    }

    // 1. id-space sweep (what the oracle tables contain)
    def cls(i: Long): String =
      if (i % 5000 == 17) "corrupt"
      else if (i % 5000 == 11 && i > 0) "dup_id" // claimed tone 1 Hz off
      else "clean"
    for (i <- 0L until 400000L) {
      val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
      val claimed = 220.0 +
        (c.clip_id.substring(5).toLong % 880) // oracle-side id arithmetic
      record((c.codec, cls(i)), measure(c.bytes, c.codec, claimed, target))
    }

    // 2. structural sweep over every feasible (freq, sr) pair
    def feasibleSr(r: Int): Int =
      if (r % 10 <= 5) 16000
      else ClipsGenerator.SampleRates((r / 10) % 4)
    for (f <- 0 until 880) {
      val freq = 220.0 + f
      val sr = feasibleSr(f)
      val samples = WavCodec.synthSineSamples(freq, cap, sr)
      for (codec <- ClipsGenerator.Codecs) {
        val enc = codec match {
          case "flac" => FlacCodec.encode(sr, samples)
          case "pcm_mulaw" => G711Codec.encodeMuLaw(sr, samples)
          case "pcm_alaw" => G711Codec.encodeALaw(sr, samples)
          case "adpcm_ima" => AdpcmCodec.encode(sr, samples)
          case _ => WavCodec.wrapPcm16(sr, samples)
        }
        record((codec, "struct_clean"), measure(enc, codec, freq, target))
        record((codec, "struct_corrupt"),
          measure(zeroBackHalf(enc), codec, freq, target))
        // a payload actually carrying a tone ≥ 40 Hz away (the swap case)
        record((codec, "struct_swapped"),
          measure(enc, codec, freq + 40.0 + (f % 200), target))
      }
    }

    println(f"${"codec"}%-10s ${"class"}%-15s ${"n"}%7s ${"fails"}%6s  ratio[min,max]")
    for (((codec, k), (lo, hi, n, fails)) <- agg.toSeq.sortBy(_._1)) {
      val range = if (n > 0) f"[$lo%.4f, $hi%.4f]" else "[-]"
      println(f"$codec%-10s $k%-15s $n%7d $fails%6d  $range")
    }
  }
}
