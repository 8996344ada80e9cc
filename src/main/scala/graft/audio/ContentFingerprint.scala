package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio CONTENT fingerprinting + duplicate-content census — the audio
  * twin of exact text dedup (q12), which no byte- or id-level check can
  * provide: the same recording re-encoded through a different codec,
  * container, or sample rate shares not a single byte with its twin, but
  * is still the duplicate a training pipeline must not double-count.
  * The published shape is acoustic fingerprinting (Shazam/Chromaprint):
  * map each clip to a compact, codec/container/rate-invariant signature,
  * then duplicate clusters are exact fingerprint matches — a keys-only
  * groupBy at any corpus size.
  *
  * Fingerprint for this tonal corpus: the dominant tone
  * ([[Spectral.dominantFreqHz]]: Hann + 4× zero-pad + parabolic peak)
  * rounded to integer Hz, plus the decoded duration quantized to 25 ms
  * bins — `tone:<hz>:d<bin>`. Rounding is stable because the measured
  * estimator error over the FULL structural space (exhaustive: all 880
  * tones × 5 rates × 5 codecs at the 25 ms cap, `FingerprintSweep`) is
  * ≤ 0.21 Hz — a 2.4× margin under the 0.5 Hz rounding boundary — in
  * every cell EXCEPT (adpcm_ima, 8000 Hz), where it reaches 0.56 Hz.
  * That cell is estimation PHYSICS, not estimator choice: 200 samples of
  * a ~12 dB-SNR codec cannot resolve adjacent 1 Hz tones (the CRLB sits
  * right at the boundary; a matched-filter refinement stage was measured
  * WORSE, 0.70 Hz, and removed), so q83 excludes that one cell the way
  * q77 excludes its content-bistable class — a fingerprint over 4-bit
  * ADPCM at 8 kHz needs either longer clips or a coarser tone grid.
  * Duration bins are stable when true durations sit away from bin edges
  * (here: all clips cap at 25 ms → bin 1); a corpus with near-edge
  * durations needs a coarser quantizer or locality-sensitive binning.
  *
  * Scale shape: ONE decode+FFT+projection UDF per row, scan-local; only
  * `(fingerprint, stats)` pairs enter the exchange — the census is a
  * keys-only groupBy like exact dedup's, and the decode cost rides the
  * same sampled-or-all discipline as every other audio census.
  */
object ContentFingerprint {

  /** Dominant-tone estimate for fingerprinting — the coarse FFT-peak
    * estimator, which MEASURED best over the structural space (a
    * matched-filter grid refinement and an onset-skip variant both
    * measured worse on the noisy ADPCM cells; see the sweep). The 50 Hz
    * floor keeps near-DC decode artifacts from outvoting a tone. */
  def estimateFreqHz(samples: Array[Short], srHz: Int): Double =
    Spectral.dominantFreqHz(samples, srHz, minHz = 50.0)

  /** Content fingerprint of one payload PLUS its decoded container rate,
    * from exactly ONE decode: `(fingerprint, rate)` where the fingerprint
    * is `tone:<hz>:d<bin>`, or `undecodable` / `silence` / `short` for
    * payloads with no tonal content identity, and the rate is the
    * container sample rate (0 when undecodable). Pure function of the
    * bytes — the same signal through any codec/container/rate lands the
    * same string. The decode is the dominant per-row cost of a full-table
    * census, so callers needing both facts MUST use this form rather than
    * decoding twice (round-8 verdict #2; ContentFingerprintSpec pins the
    * equivalence). */
  def fingerprintWithRate(bytes: Array[Byte], codec: String): (String, Int) = {
    val decoded =
      try Some(AudioCodec.decode(bytes, codec))
      catch { case _: Exception => None }
    decoded match {
      case None => ("undecodable", 0)
      case Some((sr, samples)) =>
        val fp =
          if (samples.length < 8) "short"
          else {
            val est = estimateFreqHz(samples, sr)
            if (est.isNaN) "short"
            else if (est <= 0.0) "silence"
            else {
              val durBin = math.round(samples.length * 1000.0 / sr / 25.0)
              s"tone:${math.round(est)}:d$durBin"
            }
          }
        (fp, sr)
    }
  }

  /** Fingerprint only — see [[fingerprintWithRate]]. */
  def fingerprint(bytes: Array[Byte], codec: String): String =
    fingerprintWithRate(bytes, codec)._1

  /** Duplicate-content census: per fingerprint, how many clips carry that
    * content, across how many distinct codecs and container rates, and
    * the canonical keeper (min clip_id) — the removal set is every
    * non-keeper row of a multi-clip fingerprint. ONE decode per row
    * ([[fingerprintWithRate]]). */
  def dedupReport(clips: DataFrame): DataFrame = {
    val fpUdf = udf { (bytes: Array[Byte], codec: String) =>
      fingerprintWithRate(bytes, codec)
    }
    clips
      .withColumn("_fp", fpUdf(col("bytes"), col("codec")))
      .groupBy(col("_fp._1").as("fingerprint"))
      .agg(count(lit(1)).as("n_clips"),
        countDistinct(col("codec")).as("n_codecs"),
        countDistinct(col("_fp._2")).as("n_rates"),
        min(col("clip_id")).as("keeper_id"))
  }
}
