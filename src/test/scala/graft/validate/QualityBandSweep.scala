package graft.validate

import graft.audio.{AdpcmCodec, AudioCodec, FlacCodec, G711Codec, WavCodec}
import graft.io.ClipsGenerator
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.validate.QualityBandSweep"`):
  * the reference-free quality statistics (RMS dBFS / clip fraction /
  * silence fraction / DC ratio) per (codec, injection class) that justify
  * QualityCensus's thresholds and the q56 oracle's id-arithmetic verdict
  * prediction. Two sections:
  *
  *  1. id-space sweep — 400k generator ids through clip()+injectErrors,
  *     exactly what the oracle tables contain (corrupt classes are thin
  *     here: ~80 ids total split across five codecs);
  *  2. structural corrupt sweep — EVERY feasible (freq, sr) shape for the
  *     back-half-zeroing corruption per codec, so the thin classes'
  *     verdicts are pinned over the whole parameter space, not just the
  *     ids a given scale happens to draw;
  *  3. structural plant sweep — the q56 quiet/clipped plants over the
  *     same feasible shapes.
  *
  * Measured 2026-08-18 (cap 25 ms), 880 feasible (freq, sr) pairs each,
  * every class landing in exactly ONE band:
  *   corrupt pcm_s16le  → silence_frac [0.5008, 0.5625] → half_silent
  *   corrupt flac       → decode fails                  → undecodable
  *   corrupt pcm_mulaw  → clip_frac    [0.5058, 0.5350] → clipped
  *   corrupt pcm_alaw   → dc_ratio     [0.0629, 0.0904] → dc_bias
  *   corrupt adpcm_ima  → silence_frac [0.3525, 0.4719] → half_silent
  *   quiet plant        → rms [-37.06, -36.94] dBFS, silence ≤ 0.125 → quiet
  *   clipped plant      → clip_frac    [0.4950, 0.6250] → clipped
  *   clean/dup (all)    → rms [-9.33, -8.93] dBFS, clip 0,
  *                        silence ≤ 0.125, dc ≤ 0.0292 → nominal
  * Margins vs thresholds (clip 0.05, silence 0.25, dc 0.05, quiet −30):
  * every corrupt/plant band clears its line by ≥ 1.24× and every clean
  * stat stays under by ≥ 1.7×. The `ignore`d test keeps the sweep out of
  * CI; QualityCensusSpec asserts the corners.
  */
class QualityBandSweep extends AnyFunSuite {
  ignore("sweep") { QualityBandSweep.run() }
}

object QualityBandSweep {

  def main(args: Array[String]): Unit = run()

  private def zeroBackHalf(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var k = 44 + (b.length - 44) / 2
    while (k < b.length) { b(k) = 0; k += 1 }
    b
  }

  private def stats(bytes: Array[Byte], codec: String)
      : (Boolean, Double, Double, Double, Double) =
    try {
      val (_, samples) = AudioCodec.decode(bytes, codec)
      val (d, cl, s, dc) = QualityCensus.pcmStats(samples)
      (true, math.max(d, -120.0), cl, s, dc)
    } catch { case _: Exception => (false, -120.0, 0.0, 0.0, 0.0) }

  def run(): Unit = {
    val cap = 25

    // 1. id-space sweep
    val agg = scala.collection.mutable.Map
      .empty[(String, String), (Array[Double], Array[Double], Long, Map[String, Long])]
    def cls(i: Long): String =
      if (i % 5000 == 17) "corrupt"
      else if (i % 5000 == 11 && i > 0) "dup_id"
      else "clean"
    def record(key: (String, String),
        st: (Boolean, Double, Double, Double, Double)): Unit = {
      val (decoded, dbfs, clip, sil, dc) = st
      val b = QualityCensus.band(decoded, dbfs, clip, sil, dc)
      val (mins, maxs, n, bands) = agg.getOrElseUpdate(key,
        (Array.fill(4)(Double.MaxValue), Array.fill(4)(Double.MinValue),
          0L, Map.empty))
      val vals = Array(dbfs, clip, sil, dc)
      for (k <- 0 until 4) {
        mins(k) = math.min(mins(k), vals(k))
        maxs(k) = math.max(maxs(k), vals(k))
      }
      agg(key) = (mins, maxs, n + 1,
        bands.updated(b, bands.getOrElse(b, 0L) + 1L))
    }
    for (i <- 0L until 400000L) {
      val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
      record((c.codec, cls(i)), stats(c.bytes, c.codec))
    }

    // 2. structural corrupt sweep: every FEASIBLE (freq, sr) pair, per
    // codec — independent of which ids a scale draws. Feasibility is a
    // CRT fact of the generator: freqHz(i) = 220 + (i % 880) and both
    // i % 10 (= r % 10, since 880 ≡ 0 mod 10) and (i/10) % 4
    // (= (r/10) % 4, since 88 ≡ 0 mod 4) are functions of the freq
    // residue r alone, so each of the 880 freqs pairs with EXACTLY ONE
    // sample rate. Sweeping infeasible pairs would demand margins on
    // shapes no id can produce (e.g. 1000 Hz at 8000 Hz = 8 samples/cycle
    // puts 25% of samples on exact zeros — feasible 1000 Hz rows are
    // always 16000 Hz).
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
        record((codec, "struct_corrupt"), stats(zeroBackHalf(enc), codec))
      }
    }

    // 3. structural PLANT sweep: the q56 quiet/clipped plants over every
    // feasible (freq, sr) shape
    for (f <- 0 until 880) {
      val freq = 220.0 + f
      val sr = feasibleSr(f)
      val quiet = WavCodec.synthSine(freq, cap, sr, amplitude = 0.02)
      record(("pcm_s16le", "struct_quiet"), stats(quiet, "pcm_s16le"))
      val n = (sr.toLong * cap / 1000).toInt
      val clippedSamples = new Array[Short](n)
      val scale = 1.5 * Short.MaxValue
      for (k <- 0 until n) {
        val v = math.round(math.sin(2.0 * math.Pi * freq * k / sr) * scale)
        clippedSamples(k) = math.max(Short.MinValue.toLong,
          math.min(Short.MaxValue.toLong, v)).toShort
      }
      record(("pcm_s16le", "struct_clipped"),
        stats(WavCodec.wrapPcm16(sr, clippedSamples), "pcm_s16le"))
    }

    println(f"${"codec"}%-10s ${"class"}%-14s ${"n"}%6s  rms_dbfs           clip_frac        silence_frac     dc_ratio         bands")
    for (((codec, k), (mins, maxs, n, bands)) <- agg.toSeq.sortBy(_._1)) {
      println(f"$codec%-10s $k%-14s $n%6d  [${mins(0)}%8.2f,${maxs(0)}%8.2f] [${mins(1)}%.4f,${maxs(1)}%.4f] [${mins(2)}%.4f,${maxs(2)}%.4f] [${mins(3)}%.4f,${maxs(3)}%.4f]  " +
        bands.toSeq.sorted.map { case (b, c) => s"$b=$c" }.mkString(" "))
    }
  }
}
