package graft.validate

import graft.audio.{AudioCodec, Resampler, Spectral}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resample-then-verify census — the rate-unification REPAIR step with its
  * own verification: mixed-rate ingest is converted to one model rate
  * ([[graft.audio.Resampler]], deterministic linear interpolation) and the
  * content check re-runs on the CONVERTED signal (the claimed-tone
  * projection of [[FrequencyCheck]], at the target rate), so the census
  * answers "which rows survive rate unification with their content
  * intact" — not "which rows were fine before it". A pipeline that
  * resamples without re-verifying ships whatever the converter silently
  * mangles (aliasing on full-band content, garbage in = garbage out).
  *
  * Verdict bands, first match wins:
  *   - `undecodable` — payload doesn't parse; nothing to convert
  *   - `resample_ok` — converted signal still explains ≥ `minRatio` of
  *     its energy at the claimed tone
  *   - `degraded`    — conversion succeeded, content did not survive
  *
  * Margins (ResampleSweep, 2026-08-18: 400k-id sweep + the full 880-shape
  * structural (freq, sr) space through the real codecs, 16 kHz target):
  * clean rows ≥ 0.9928 (adpcm_ima floor; the other four ≥ 0.9978) and
  * duplicate-id rows ≥ 0.9985 post-conversion — linear-interp distortion
  * of a ≤ 1099 Hz tone costs < 8e-3 at any source rate in the table.
  * Byte-zeroed corrupt payloads: flac fails decode; pcm ≤ 0.5372,
  * A-law ≤ 0.4628, µ-law ≤ 0.1177, adpcm_ima ≤ 0.6928 (reset predictors
  * leave the front-half tone dominant — the widest corrupt band, and why
  * this check's threshold sits HIGHER than FrequencyCheck's 0.75).
  * A payload genuinely carrying a tone ≥ 40 Hz away ≤ 0.4482. The 0.85
  * threshold (the [0.6928, 0.9928] midpoint) keeps ≥ 1.17× margin to the
  * nearest band on either side.
  *
  * The decode+convert+measure runs in one UDF confined to the
  * deterministic [[SampleFilter]] subset; conversion reads the rate from
  * the container (a lying `sr_hz` column cannot skew the conversion —
  * same pin as [[FrequencyCheck]]); the census exchanges only
  * (codec, band, count) triples — `bytes` never moves.
  */
object ResampleCheck {

  /** The model rate mixed ingest unifies to. */
  val DefaultTargetHz = 16000

  /** Post-conversion tone-survival threshold (measured; see above). */
  val DefaultMinRatio = 0.85

  val Bands: Seq[String] = Seq("undecodable", "resample_ok", "degraded")

  /** (bytes, codec, expectedHz) → (source_sr, out_samples, ratio) or null
    * on decode failure. */
  def resampleUdf(targetHz: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], codec: String, expectedHz: Double) =>
      try {
        val (sr, decoded) = AudioCodec.decode(bytes, codec)
        val conv = Resampler.linear(decoded, sr, targetHz)
        val ratio = Spectral.toneMatchRatio(conv, targetHz, expectedHz)
        // too-short-to-window is a failed conversion, not content
        // (NaN orders above every double — the FrequencyCheck lesson)
        if (ratio.isNaN) None else Some((sr, conv.length, ratio))
      } catch { case _: Exception => None }
    }

  /** Per-row verdicts for the sampled subset: (clip_id, codec, source_sr,
    * out_samples, tone_ratio, band). The claimed tone is id-derived
    * exactly as in [[FrequencyCheck.check]]. */
  def measure(clips: DataFrame, targetHz: Int = DefaultTargetHz,
      sampleEvery: Int = 1,
      minRatio: Double = DefaultMinRatio): DataFrame = {
    val sampled =
      clips.where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
    val expected =
      (lit(220L) + expr("CAST(substr(clip_id, 6) AS BIGINT)") % 880L)
        .cast("double")
    sampled
      .withColumn("_r",
        resampleUdf(targetHz)(col("bytes"), col("codec"), expected))
      .select(
        col("clip_id"), col("codec"),
        col("_r._1").as("source_sr"),
        col("_r._2").as("out_samples"),
        col("_r._3").as("tone_ratio"),
        when(col("_r").isNull, "undecodable")
          .when(col("_r._3") >= lit(minRatio), "resample_ok")
          .otherwise("degraded").as("band"))
  }

  /** The census rollup: (codec, band, clips) — the only exchange. */
  def census(clips: DataFrame, targetHz: Int = DefaultTargetHz,
      sampleEvery: Int = 1,
      minRatio: Double = DefaultMinRatio): DataFrame =
    measure(clips, targetHz, sampleEvery, minRatio)
      .groupBy(col("codec"), col("band"))
      .agg(count(lit(1)).as("clips"))
}
