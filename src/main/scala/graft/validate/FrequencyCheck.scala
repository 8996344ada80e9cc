package graft.validate

import graft.audio.{AudioCodec, Spectral}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-domain content check: does the decoded audio actually carry
  * the tone the clip's own id claims?
  *
  * The generator synthesizes every payload as a pure sine at
  * `220 + (index % 880)` Hz (ClipsGenerator.freqHz), so the expected
  * frequency is a pure function of clip_id — a content fingerprint the
  * engine verifies by decoding the payload and measuring how much of its
  * energy a tone at the claimed frequency explains
  * ([[graft.audio.Spectral.toneMatchRatio]], a least-squares projection —
  * one O(n) pass, phase-invariant). This catches swapped / mislabeled /
  * garbage-contaminated payloads the metadata checks can't see, the way a
  * training-data pipeline audits that audio content matches its catalog
  * row — and unlike the SNR invariant ([[AudioInvariantCheck]]) it needs
  * no reference signal, only the id-derived claim. A dominant-frequency
  * estimate (from-scratch FFT, [[graft.audio.Spectral.dominantFreqHz]])
  * rides along as a per-row diagnostic; the VERDICT is the ratio alone,
  * because a spectral peak race is bistable on half-garbage signals while
  * the energy fraction degrades smoothly (measured margins: legitimate
  * content >= 0.9995, corrupt/swapped <= 0.54, threshold 0.75).
  *
  * The decode+measure runs in a Scala UDF confined to the (deterministic)
  * sampled subset, same discipline as the SNR UDF. Decode reads the sample
  * rate from the payload header, not the sr_hz column — a corrupted
  * metadata column cannot skew the measurement.
  */
object FrequencyCheck {

  /** Verdict threshold on the explained-energy fraction. Sweeping the full
    * generator parameter space through the REAL codecs
    * (ToneProjectionSpec): clean and duplicate-id rows score >= 0.9995
    * (G.711 quantization costs < 4e-4), every byte-zeroed corrupt payload
    * scores <= 0.537 (µ-law garbage 0.13, A-law 0.48, zeroed PCM 0.54),
    * a tone 40 Hz off <= 0.45. 0.75 sits > 0.2 from both bands. The check
    * cannot resolve swaps under ~25 Hz — the physics of a 25 ms window —
    * which is why duplicate-id rows (1 Hz off) legitimately pass here and
    * are caught by the SNR invariant instead. */
  val DefaultMinRatio = 0.75

  /** FFT band floor for the diagnostic frequency estimate, below the
    * generator's 220 Hz tone floor. */
  val SearchFloorHz = 150.0

  /** Decode the payload and measure (dominant-frequency estimate,
    * claimed-tone match ratio); nulls on decode failure (e.g. a corrupted
    * FLAC stream failing its CRC). */
  def toneUdf(): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], codec: String, expectedHz: Double) =>
      try {
        val (sr, decoded) = AudioCodec.decode(bytes, codec)
        val ratio = Spectral.toneMatchRatio(decoded, sr, expectedHz)
        // a signal too short to window (NaN ratio) is a failed decode,
        // not content: Spark orders NaN ABOVE every double, so letting it
        // through would silently satisfy `ratio >= threshold`
        if (ratio.isNaN) None
        else Some((Spectral.dominantFreqHz(decoded, sr, SearchFloorHz), ratio))
      } catch { case _: Exception => None }
    }

  /** Per-row check on the deterministic sampled subset: (clip_id, codec,
    * freq_est_hz, freq_expected_hz, tone_ratio, content_ok). Null
    * freq_est_hz/tone_ratio = decode failure = not ok. A NULL clip_id
    * cannot drop a row from the census (round-5 verdict: `pmod(xxhash64(
    * NULL), k)` is NULL → silently filtered on foreign data) — the
    * sampling hash is null-safe and a full census skips the filter
    * entirely; null-key rows land as decode failures (the expected
    * frequency is underivable). */
  def check(clips: DataFrame, sampleEvery: Int = 100,
      minRatio: Double = DefaultMinRatio): DataFrame = {
    val sampled =
      clips.where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
    val expected =
      (lit(220L) + expr("CAST(substr(clip_id, 6) AS BIGINT)") % 880L)
        .cast("double")
    sampled
      .withColumn("_tone",
        toneUdf()(col("bytes"), col("codec"), expected))
      .select(
        col("clip_id"), col("codec"),
        col("_tone._1").as("freq_est_hz"),
        expected.as("freq_expected_hz"),
        col("_tone._2").as("tone_ratio"),
        coalesce(col("_tone._2") >= lit(minRatio), lit(false))
          .as("content_ok"))
  }

  /** Per-codec census: content-matched / anomalous / failed-to-decode
    * counts. Null guards are explicit so a decode failure can never count
    * as an anomaly (or vice versa). */
  def census(clips: DataFrame, sampleEvery: Int = 1,
      minRatio: Double = DefaultMinRatio): DataFrame =
    check(clips, sampleEvery, minRatio)
      .groupBy(col("codec"))
      .agg(
        sum(when(col("tone_ratio").isNotNull &&
          col("tone_ratio") >= lit(minRatio), 1L).otherwise(0L))
          .as("tone_match_rows"),
        sum(when(col("tone_ratio").isNotNull &&
          col("tone_ratio") < lit(minRatio), 1L).otherwise(0L))
          .as("tone_anomaly_rows"),
        sum(when(col("tone_ratio").isNull, 1L).otherwise(0L))
          .as("decode_fail_rows"))
}
