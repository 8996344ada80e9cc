package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.audio.AdpcmBandSweep"`):
  * the SNR and tone-projection bands that justify promoting `adpcm_ima` to
  * a generator label under a PER-CODEC invariant floor (round-5 verdict
  * task 3). Three populations, all over the generator's actual parameter
  * space at the oracle synth cap (25 ms):
  *
  *  1. CLEAN rows — full (sr × freq) sweep, 4,400 combos: the codec's
  *     intrinsic floor. The per-codec threshold must sit BELOW this.
  *  2. DUPLICATE-ID rows (i ≡ 11 mod 5000) — payload is the clip's own
  *     tone but the inherited id claims a tone 1 Hz lower; the reference
  *     re-synth is 1 Hz off, costing ~21 dB by itself (the reason dup rows
  *     fail the 30 dB floor for the other codecs). Under an ADPCM floor
  *     below ~15 dB these rows PASS the SNR check — a deliberate,
  *     measured trade (they are still flagged by transcript equality and
  *     q22's uniqueness check) that the q25/q26/q40 oracles encode
  *     per-codec. Dup rows always have sr = 16000 (i%10 == 1) and
  *     i%880 ≡ 11 (mod 40) — 22 distinct shapes, all swept.
  *  3. CORRUPT rows (i ≡ 17 mod 5000) — back half of the payload bytes
  *     zeroed from offset 44+(len-44)/2; with 65-sample blocks this always
  *     lands in real nibble data (see AdpcmCodec.BlockAlign), destroying
  *     ~45-55% of decoded samples. The floor must sit ABOVE this band.
  *
  * Measured with BlockAlign=36 at cap 25 ms (this harness, 2026-08-17):
  * clean min 12.65 dB (f=997, sr=8000) / tone-ratio min 0.9925;
  * dup SNR [15.14, 18.95] dB / tone-ratio min 0.9980; corrupt max
  * 2.49 dB / tone-ratio max 0.3868. Floor chosen: 8 dB — ≥ 4.6 dB from
  * the clean band, ≥ 5.5 dB from the corrupt band; tone threshold 0.75
  * keeps ≥ 0.24 margin on both sides. The `ignore`d test keeps the full
  * sweep out of CI; LossyCodecsSpec + ClipsPipelineSpec assert the
  * corners.
  */
class AdpcmBandSweep extends AnyFunSuite {

  ignore("sweep") { AdpcmBandSweep.run() }
}

object AdpcmBandSweep {

  private def zeroBackHalf(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var k = 44 + (b.length - 44) / 2
    while (k < b.length) { b(k) = 0; k += 1 }
    b
  }

  def run(): Unit = {
    val cap = 25
    val srs = Array(8000, 16000, 22050, 44100, 48000)

    // 1. clean band: full parameter space
    var cleanMinSnr = Double.MaxValue; var cleanAt = ""
    var cleanMinRatio = Double.MaxValue
    for (sr <- srs; f <- 0 until 880) {
      val freq = 220.0 + f
      val ref = WavCodec.synthSineSamples(freq, cap, sr)
      val (_, got) = AdpcmCodec.decode(AdpcmCodec.encode(sr, ref))
      val snr = WavCodec.snrDb(ref, got)
      val ratio = Spectral.toneMatchRatio(got, sr, freq)
      if (snr < cleanMinSnr) { cleanMinSnr = snr; cleanAt = s"f=$freq sr=$sr" }
      cleanMinRatio = math.min(cleanMinRatio, ratio)
    }
    println(f"[adpcm-sweep] clean : min SNR $cleanMinSnr%.2f dB at $cleanAt, min tone ratio $cleanMinRatio%.4f")

    // 2. dup band: all 22 (i mod 880) residues of i ≡ 11 (mod 5000),
    //    sr locked to 16000 by the generator (i%10 == 1)
    var dupMinSnr = Double.MaxValue; var dupMaxSnr = Double.MinValue
    var dupMinRatio = Double.MaxValue
    var i = 11L
    val seen = scala.collection.mutable.Set[Long]()
    while (i < 11L + 5000L * 176) { // 176 × 5000 covers all residues mod 880
      val r = i % 880
      if (!seen.contains(r)) {
        seen += r
        val sr = 16000
        val payloadFreq = 220.0 + (i % 880)  // the payload's true tone
        val claimedFreq = 220.0 + ((i - 1) % 880) // what the inherited id claims
        val signal = WavCodec.synthSineSamples(payloadFreq, cap, sr)
        val ref = WavCodec.synthSineSamples(claimedFreq, cap, sr)
        val (_, got) = AdpcmCodec.decode(AdpcmCodec.encode(sr, signal))
        val snr = WavCodec.snrDb(ref, got)
        val ratio = Spectral.toneMatchRatio(got, sr, claimedFreq)
        dupMinSnr = math.min(dupMinSnr, snr)
        dupMaxSnr = math.max(dupMaxSnr, snr)
        dupMinRatio = math.min(dupMinRatio, ratio)
      }
      i += 5000
    }
    println(f"[adpcm-sweep] dup   : SNR [$dupMinSnr%.2f, $dupMaxSnr%.2f] dB over ${seen.size} shapes, min tone ratio $dupMinRatio%.4f")

    // 3. corrupt band: every (sr, freq) the i ≡ 17 (mod 5000) rows hit
    var corMaxSnr = Double.MinValue; var corAt = ""
    var corMaxRatio = Double.MinValue
    val combos = scala.collection.mutable.Set[(Int, Long)]()
    var j = 17L
    while (j < 17L + 5000L * 220) { // covers the joint (sr, freq) period
      val sr = graft.io.ClipsGenerator.srHz(j)
      val fr = j % 880
      if (!combos.contains((sr, fr))) {
        combos += ((sr, fr))
        val freq = 220.0 + fr
        val ref = WavCodec.synthSineSamples(freq, cap, sr)
        val bad = zeroBackHalf(AdpcmCodec.encode(sr, ref))
        val (_, got) = AdpcmCodec.decode(bad)
        val snr = WavCodec.snrDb(ref, got)
        val ratio = Spectral.toneMatchRatio(got, sr, freq)
        if (snr > corMaxSnr) { corMaxSnr = snr; corAt = s"f=$freq sr=$sr" }
        corMaxRatio = math.max(corMaxRatio, ratio)
      }
      j += 5000
    }
    println(f"[adpcm-sweep] corrupt: max SNR $corMaxSnr%.2f dB at $corAt over ${combos.size} combos, max tone ratio $corMaxRatio%.4f")
  }

  def main(args: Array[String]): Unit = run()
}
