package graft.validate

import graft.audio.AudioCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loudness-normalization planning census — the "can this clip be gained
  * to the model's target level" scan a speech pipeline runs before batch
  * gain normalization: per clip, the linear gain to reach `targetDbfs`
  * RMS and whether applying it is even meaningful. A pipeline that gains
  * blindly ships three failure shapes — re-amplified digital silence
  * (gain → ∞ on noise), re-scaled already-clipped audio (the flat-tops
  * stay flat), and newly-clipped peaks (a high-crest clip whose peak
  * crosses the rail before its RMS reaches target).
  *
  * Verdict bands, first match wins (oracle replays must mirror):
  *   - `undecodable`     — nothing to measure
  *   - `already_clipped` — clip_frac ≥ [[QualityCensus.ClipFracThreshold]]
  *     (gain cannot un-flatten a rail; route to drop/declip, not gain)
  *   - `silent`          — silence_frac ≥ [[SilentFracFloor]] (gain would
  *     amplify the noise floor; the q59 trim verdicts own repair here)
  *   - `would_clip`      — peak × gain > 32767: normalizing to target
  *     drives the peak past the rail; needs a limiter or a lower target
  *   - `normalize_ok`    — gain (up or down) applies cleanly
  *
  * Margins (GainSweep, 2026-08-18, target −20 dBFS, 400k-id sweep + the
  * full 880-shape structural space through the five real codecs; numbers
  * are rail ratio = peak×gain/32767, would-clip boundary 1.0): clean
  * rows 0.1387-0.1610 across all codecs (sine crest ≈ √2 → ≥ 6.2× under
  * the boundary); zeroed-back-half corrupt rows ≤ 0.2581 (adpcm worst;
  * 3.9× under) where they reach the gain test at all — corrupt µ-law
  * rails land `already_clipped` (all 880+8) and corrupt flac
  * `undecodable` before it; the single-spike impulse plant measures
  * 1.9998 on every id (√400-crest at the pinned 16 kHz — 2.0× over the
  * boundary); the quiet plant gains up cleanly at 0.141 and the silent
  * plant lands `silent`. No class sits within 2× of the boundary on
  * either side.
  *
  * Scale shape: the decode UDF behind the shared [[SampleFilter]], gain
  * arithmetic per-row scan-only, census exchanges only
  * (codec, band, count) — `bytes` never moves.
  */
object GainCheck {

  /** The model target level mixed ingest normalizes to. */
  val DefaultTargetDbfs = -20.0

  /** A clip mostly at the digital-silence floor: gain is meaningless.
    * 0.95, not [[QualityCensus.SilenceFracThreshold]]'s 0.25: a HALF
    * silent clip still carries a real signal to normalize — only a
    * dead-channel clip (silent plant: 100%) lands here. */
  val SilentFracFloor = 0.95

  val Bands: Seq[String] = Seq("undecodable", "already_clipped", "silent",
    "would_clip", "normalize_ok")

  /** Pure per-clip gain stats: (rms_dbfs floored at −120, clip_frac,
    * silence_frac, peak). Shared with the sweep so margins can't drift. */
  def gainStats(samples: Array[Short]): (Double, Double, Double, Int) = {
    val n = samples.length
    if (n == 0) return (-120.0, 0.0, 0.0, 0)
    var sumSq = 0.0
    var clipped = 0
    var silent = 0
    var peak = 0
    var i = 0
    while (i < n) {
      val s = samples(i).toInt
      val a = math.abs(s)
      sumSq += s.toDouble * s.toDouble
      if (a >= QualityCensus.ClipRailAbs) clipped += 1
      if (a <= QualityCensus.SilenceAbs) silent += 1
      if (a > peak) peak = a
      i += 1
    }
    val rms = math.sqrt(sumSq / n)
    val dbfs =
      if (rms <= 0.0) -120.0 else 20.0 * math.log10(rms / 32768.0)
    (math.max(dbfs, -120.0), clipped.toDouble / n, silent.toDouble / n,
      peak)
  }

  /** Band + gain for one clip (gain in dB, NaN-free; callers only read it
    * on `normalize_ok`/`would_clip`). Mirrored by [[measure]]'s chain. */
  def band(decoded: Boolean, rmsDbfs: Double, clipFrac: Double,
      silenceFrac: Double, peak: Int, targetDbfs: Double): String = {
    val gain = math.pow(10.0, (targetDbfs - rmsDbfs) / 20.0)
    if (!decoded) "undecodable"
    else if (clipFrac >= QualityCensus.ClipFracThreshold) "already_clipped"
    else if (silenceFrac >= SilentFracFloor) "silent"
    else if (peak * gain > 32767.0) "would_clip"
    else "normalize_ok"
  }

  /** Column-form banding of a [[statsUdf]] struct — ONE definition shared
    * by [[measure]] and any streaming twin (must mirror [[band]]'s order
    * exactly; the QualityCensus/ContainerCheck discipline, so the scalar
    * path the sweep measures and the shipped operator cannot drift). */
  def bandCol(st: org.apache.spark.sql.Column,
      targetDbfs: Double): org.apache.spark.sql.Column = {
    val gain = pow(lit(10.0), (lit(targetDbfs) - st.getField("_2")) / 20.0)
    when(!st.getField("_1"), "undecodable")
      .when(st.getField("_3") >= QualityCensus.ClipFracThreshold,
        "already_clipped")
      .when(st.getField("_4") >= SilentFracFloor, "silent")
      .when(st.getField("_5") * gain > 32767.0, "would_clip")
      .otherwise("normalize_ok")
  }

  /** (bytes, codec) → struct(decoded, rms_dbfs, clip_frac, silence_frac,
    * peak). Decode failure is data, not an exception. */
  val statsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], codec: String) =>
      try {
        val (_, samples) = AudioCodec.decode(bytes, codec)
        val (dbfs, clip, sil, peak) = gainStats(samples)
        (true, dbfs, clip, sil, peak)
      } catch { case _: Exception => (false, -120.0, 0.0, 0.0, 0) }
    }

  /** Per-row verdicts for the sampled subset: (clip_id, codec, rms_dbfs,
    * gain_db, band). */
  def measure(clips: DataFrame, targetDbfs: Double = DefaultTargetDbfs,
      sampleEvery: Int = 1): DataFrame = {
    val sampled =
      clips.where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
    val st = statsUdf(col("bytes"), col("codec"))
    sampled
      .withColumn("_st", st)
      .select(
        col("clip_id"), col("codec"),
        round(col("_st._2"), 3).as("rms_dbfs"),
        round(lit(targetDbfs) - col("_st._2"), 3).as("gain_db"),
        bandCol(col("_st"), targetDbfs).as("band"))
  }

  /** The census rollup: (codec, band, clips) — the only exchange. */
  def census(clips: DataFrame, targetDbfs: Double = DefaultTargetDbfs,
      sampleEvery: Int = 1): DataFrame =
    measure(clips, targetDbfs, sampleEvery)
      .groupBy(col("codec"), col("band"))
      .agg(count(lit(1)).as("clips"))
}
