package graft.audio

import graft.io.ClipsGenerator
import graft.validate.GainCheck
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.audio.GainSweep"`): the
  * rail ratios (peak × gain-to-target / 32767) per (codec, class) that
  * justify GainCheck's would-clip boundary and the q72 oracle's
  * id-arithmetic prediction. Sections as in AudioTrimSweep: the id-space
  * sweep (errors on) and the structural sweep over every feasible
  * (freq, sr) pair through the real codecs, plus the three q72 plants.
  *
  * A ratio > 1 means normalizing to the −20 dBFS target drives the peak
  * past the rail (`would_clip`); the verdict is safe when every class
  * sits far from 1 on its own side.
  *
  * Measured 2026-08-18 (cap 25 ms, target −20 dBFS), rail ratio
  * [min, max] per class:
  *   clean / struct_clean   pcm+flac [0.1406, 0.1426]
  *                          µ-law [0.1430, 0.1455]  A-law [0.1387, 0.1472]
  *                          adpcm [0.1407, 0.1610]      → normalize_ok
  *   corrupt / struct_corrupt  pcm ≤ 0.2029  A-law ≤ 0.1906
  *                          adpcm ≤ 0.2581 (the nearest under-class,
  *                          3.9× under the boundary)    → normalize_ok
  *                          µ-law → already_clipped (rail constant,
  *                          all 880 + 8 id rows); flac → undecodable
  *   plant_impulse (400k ids) 1.9998 exactly             → would_clip
  *   plant_quiet  0.1411-0.1414 (gains +17 dB cleanly)   → normalize_ok
  *   plant_silent 0.0                                    → silent
  * GainCheckSpec asserts the corners. `ignore`d out of CI.
  */
class GainSweep extends AnyFunSuite {
  ignore("sweep") { GainSweep.run() }
}

object GainSweep {

  def main(args: Array[String]): Unit = run()

  private def zeroBackHalf(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var k = 44 + (b.length - 44) / 2
    while (k < b.length) { b(k) = 0; k += 1 }
    b
  }

  /** (decoded, railRatio, band). */
  private def measure(bytes: Array[Byte], codec: String,
      target: Double): (Boolean, Double, String) =
    try {
      val (_, samples) = AudioCodec.decode(bytes, codec)
      val (dbfs, clip, sil, peak) = GainCheck.gainStats(samples)
      val gain = math.pow(10.0, (target - dbfs) / 20.0)
      (true, peak * gain / 32767.0,
        GainCheck.band(decoded = true, dbfs, clip, sil, peak, target))
    } catch { case _: Exception => (false, Double.NaN, "undecodable") }

  def run(): Unit = {
    val cap = 25
    val target = GainCheck.DefaultTargetDbfs
    val agg = scala.collection.mutable.Map
      .empty[(String, String), (Double, Double, Long, Map[String, Long])]
    def record(key: (String, String), m: (Boolean, Double, String)): Unit = {
      val (lo, hi, n, bands) = agg.getOrElseUpdate(key,
        (Double.MaxValue, Double.MinValue, 0L, Map.empty))
      val (nl, nh) =
        if (m._1) (math.min(lo, m._2), math.max(hi, m._2)) else (lo, hi)
      agg(key) = (nl, nh, n + 1,
        bands.updated(m._3, bands.getOrElse(m._3, 0L) + 1L))
    }

    // 1. id-space sweep (what the oracle tables contain)
    def cls(i: Long): String =
      if (i % 5000 == 17) "corrupt" else "clean"
    for (i <- 0L until 400000L) {
      val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
      record((c.codec, cls(i)), measure(c.bytes, c.codec, target))
      // the three q72 plants over the same id space
      record(("pcm_s16le", "plant_impulse"),
        measure(ClipsGenerator.impulseBytes(i, cap), "pcm_s16le", target))
      if (i % 100 == 0) {
        record(("pcm_s16le", "plant_silent"),
          measure(ClipsGenerator.silentBytes(i, cap), "pcm_s16le", target))
        record(("pcm_s16le", "plant_quiet"),
          measure(ClipsGenerator.quietBytes(i, cap), "pcm_s16le", target))
      }
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
        record((codec, "struct_clean"), measure(enc, codec, target))
        record((codec, "struct_corrupt"),
          measure(zeroBackHalf(enc), codec, target))
      }
    }

    println(f"${"codec"}%-10s ${"class"}%-15s ${"n"}%7s  rail_ratio[min,max]  bands")
    for (((codec, k), (lo, hi, n, bands)) <- agg.toSeq.sortBy(_._1)) {
      val range =
        if (lo != Double.MaxValue) f"[$lo%.4f, $hi%.4f]" else "[decode-fail]"
      println(f"$codec%-10s $k%-15s $n%7d  $range  " +
        bands.toSeq.sorted.map { case (b, c) => s"$b=$c" }.mkString(" "))
    }
  }
}
