package graft.audio

import graft.io.ClipsGenerator
import graft.audio.{AdpcmCodec, FlacCodec, G711Codec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.audio.AudioTrimSweep"`):
  * the silence-endpoint runs per (codec, class) that justify AudioTrim's
  * verdict bands and the q59 oracle's id-arithmetic prediction. Same
  * three sections as QualityBandSweep (id-space sweep, structural corrupt
  * sweep over every feasible (freq, sr) pair, structural plant sweep).
  *
  * Measured 2026-08-18 (cap 25 ms), 880 feasible shapes per class; runs
  * reported as lead/trail sample counts and as a fraction of the 5 ms
  * trim threshold (sr/200 samples — ≥ 1.0 means the side trims):
  *   clean (ALL 5 codecs) → lead = 1 sample, trail ≤ 1    → keep
  *                        (≤ 0.025× threshold — 40× headroom)
  *   corrupt pcm_s16le  → trail/thr [2.4943, 2.5034]      → trim_trail
  *   corrupt flac       → decode fails                    → undecodable
  *   corrupt pcm_mulaw  → trail = 0 (−32124 rail is loud) → keep
  *   corrupt pcm_alaw   → trail = 0 (loud DC constant)    → keep
  *   corrupt adpcm_ima  → trail/thr [1.7500, 2.3447]      → trim_trail
  *                        (zeroed block headers reset the predictor to 0
  *                        and zeroed nibbles hold it there — the whole
  *                        zeroed half decodes as one contiguous silent
  *                        run, uniformly across the space)
  *   padded plant       → lead/thr [3.0023, 3.0250],
  *                        trail/thr [4.0000, 4.0125]      → trim_both
  *   silent plant       → all samples ≤ 8                 → all_silence
  * Every trimming class clears the threshold by ≥ 1.75× and every keep
  * class stays under by ≥ 40×, so all five codec labels carry a FIXED
  * per-class verdict and the q59 oracle predicts the full census by id
  * arithmetic. The `ignore`d test keeps the sweep out of CI;
  * AudioTrimSpec asserts the corners.
  */
class AudioTrimSweep extends AnyFunSuite {
  ignore("sweep") { AudioTrimSweep.run() }
}

object AudioTrimSweep {

  def main(args: Array[String]): Unit = run()

  private def zeroBackHalf(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var k = 44 + (b.length - 44) / 2
    while (k < b.length) { b(k) = 0; k += 1 }
    b
  }

  /** (decoded, n, sr, lead, trail, verdict). */
  private def ep(bytes: Array[Byte], codec: String)
      : (Boolean, Int, Int, Int, Int, String) =
    try {
      val (sr, samples) = AudioCodec.decode(bytes, codec)
      val (lead, trail) = AudioTrim.endpoints(samples)
      (true, samples.length, sr, lead, trail,
        AudioTrim.verdict(decoded = true, samples.length, sr, lead, trail))
    } catch { case _: Exception => (false, 0, 0, 0, 0, "undecodable") }

  def run(): Unit = {
    val cap = 25
    val agg = scala.collection.mutable.Map
      .empty[(String, String), (Array[Double], Array[Double], Long, Map[String, Long])]
    def record(key: (String, String),
        st: (Boolean, Int, Int, Int, Int, String)): Unit = {
      val (_, _, sr, lead, trail, v) = st
      val thr = if (sr > 0) sr.toDouble * AudioTrim.TrimThresholdMs / 1000 else 1.0
      val (mins, maxs, n, bands) = agg.getOrElseUpdate(key,
        (Array.fill(4)(Double.MaxValue), Array.fill(4)(Double.MinValue),
          0L, Map.empty))
      val vals = Array(lead.toDouble, trail.toDouble, lead / thr, trail / thr)
      for (k <- 0 until 4) {
        mins(k) = math.min(mins(k), vals(k))
        maxs(k) = math.max(maxs(k), vals(k))
      }
      agg(key) = (mins, maxs, n + 1,
        bands.updated(v, bands.getOrElse(v, 0L) + 1L))
    }

    // 1. id-space sweep (what the oracle tables contain)
    def cls(i: Long): String = if (i % 5000 == 17) "corrupt" else "clean"
    for (i <- 0L until 400000L) {
      val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
      record((c.codec, cls(i)), ep(c.bytes, c.codec))
    }

    // 2. structural corrupt sweep over every feasible (freq, sr) pair
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
          case _ => WavCodec.synthSine(freq, cap, sr)
        }
        record((codec, "struct_corrupt"), ep(zeroBackHalf(enc), codec))
        record((codec, "struct_clean"), ep(enc, codec))
      }
    }

    // 3. structural plant sweep (q59's padded / silent plants)
    for (f <- 0 until 880) {
      val freq = 220.0 + f
      val sr = feasibleSr(f)
      // replicate paddedBytes/silentBytes shapes directly from (freq, sr)
      val body = WavCodec.synthSineSamples(freq, cap, sr)
      val lead = (sr.toLong * 15 / 1000).toInt
      val trail = (sr.toLong * 20 / 1000).toInt
      val padded = new Array[Short](lead + body.length + trail)
      System.arraycopy(body, 0, padded, lead, body.length)
      record(("pcm_s16le", "struct_padded"),
        ep(WavCodec.wrapPcm16(sr, padded), "pcm_s16le"))
      record(("pcm_s16le", "struct_silent"),
        ep(WavCodec.wrapPcm16(sr,
          new Array[Short]((sr.toLong * cap / 1000).toInt)), "pcm_s16le"))
    }

    println(f"${"codec"}%-10s ${"class"}%-15s ${"n"}%6s  lead_samp        trail_samp       lead/thr         trail/thr        verdicts")
    for (((codec, k), (mins, maxs, n, bands)) <- agg.toSeq.sortBy(_._1)) {
      println(f"$codec%-10s $k%-15s $n%6d  [${mins(0)}%6.0f,${maxs(0)}%6.0f] [${mins(1)}%6.0f,${maxs(1)}%6.0f] [${mins(2)}%.4f,${maxs(2)}%.4f] [${mins(3)}%.4f,${maxs(3)}%.4f]  " +
        bands.toSeq.sorted.map { case (b, c) => s"$b=$c" }.mkString(" "))
    }
  }
}
