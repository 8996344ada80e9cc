package graft.validate

import graft.audio.AudioCodec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-FREE audio quality census — absolute signal statistics over
  * decoded PCM, no golden signal required.
  *
  * [[AudioInvariantCheck]] needs a reference PCM to compare against
  * (reference `tests/e2e` exercises validators against known-good frames);
  * a real 100 TB ingest has no reference for most rows. The standard
  * speech-pipeline hygiene scan instead measures each clip on its own:
  * loudness (RMS dBFS), hard-clipping fraction (samples at the rail), and
  * silence fraction (near-zero samples) — then bands rows into verdicts a
  * curation run can filter on (drop silent/clipped clips, flag quiet ones
  * for gain normalization).
  *
  * Scale shape: the decode UDF is the only non-codegen step, confined
  * behind the same deterministic [[SampleFilter]] the SNR invariant uses;
  * stats are per-row (scan-only, no exchange), and the census rollup
  * exchanges only (codec, band, count) triples.
  *
  * All three statistics are per-SAMPLE so they are sample-rate independent:
  *  - `rms_dbfs`   = 20·log10(rms / 32768), −∞ for an all-zero/empty clip
  *  - `clip_frac`  = fraction of samples with |s| ≥ [[ClipRailAbs]]
  *  - `silence_frac` = fraction of samples with |s| ≤ [[SilenceAbs]]
  */
object QualityCensus {

  /** "At the rail" for 16-bit PCM. 32000 rather than 32767: lossy decode
    * chains reproduce a clipped flat-top only approximately (G.711 µ-law
    * full-scale decodes to ±32124, IMA ADPCM wanders ± a step size), and a
    * true clipped segment sits ≥ 32256 after companding — the 32000 line
    * separates "rail" from the loudest clean sine this generator emits
    * (amplitude 0.5 → peak 16384) by ~2×. */
  val ClipRailAbs = 32000

  /** Near-zero for 16-bit PCM: |s| ≤ 8 is −72 dBFS, 3 µ-law steps. A clean
    * sine at amplitude 0.5 spends ~0.03% of samples this close to zero
    * (zero crossings); digital silence spends 100%. */
  val SilenceAbs = 8

  /** Band thresholds (see QualityBandSweep for the measured margins on
    * this generator's corruption classes). */
  val ClipFracThreshold = 0.05
  val SilenceFracThreshold = 0.25
  /** 0.05, not lower: a TRUNCATED sine (the 25 ms synth cap cuts
    * mid-cycle) carries real DC from the partial final cycle — measured
    * up to 0.0292 on clean rows across the full (freq, sr) space — while
    * the loud-constant corruption signature (zeroed A-law bytes decode to
    * a DC rail) measures ≥ 0.0615 structurally. */
  val DcRatioThreshold = 0.05
  val QuietDbfs = -30.0

  /** Verdict bands, first match wins (the when-chain below and any oracle
    * replay must use this exact order). */
  val Bands: Seq[String] =
    Seq("undecodable", "clipped", "half_silent", "dc_bias", "quiet",
      "nominal")

  /** Pure stats over decoded samples: (rms_dbfs, clip_frac, silence_frac,
    * dc_ratio) where dc_ratio = |mean| / 32768 (a healthy AC-coupled
    * signal sits near 0; a stuck/offset converter — or a companded stream
    * decoding a constant — shows a large one). Shared by the UDF and the
    * measurement sweep so the pinned bands can never diverge from the
    * shipped operator. */
  def pcmStats(samples: Array[Short]): (Double, Double, Double, Double) = {
    val n = samples.length
    if (n == 0) return (Double.NegativeInfinity, 0.0, 0.0, 0.0)
    var sumSq = 0.0
    var sum = 0.0
    var clipped = 0
    var silent = 0
    var i = 0
    while (i < n) {
      val s = samples(i).toInt
      sumSq += s.toDouble * s.toDouble
      sum += s.toDouble
      val a = math.abs(s)
      if (a >= ClipRailAbs) clipped += 1
      if (a <= SilenceAbs) silent += 1
      i += 1
    }
    val rms = math.sqrt(sumSq / n)
    val dbfs =
      if (rms <= 0.0) Double.NegativeInfinity
      else 20.0 * math.log10(rms / 32768.0)
    (dbfs, clipped.toDouble / n, silent.toDouble / n,
      math.abs(sum / n) / 32768.0)
  }

  /** Band for one clip's stats; `decoded=false` short-circuits to
    * `undecodable`. */
  def band(decoded: Boolean, rmsDbfs: Double, clipFrac: Double,
      silenceFrac: Double, dcRatio: Double): String =
    if (!decoded) "undecodable"
    else if (clipFrac >= ClipFracThreshold) "clipped"
    else if (silenceFrac >= SilenceFracThreshold) "half_silent"
    else if (dcRatio >= DcRatioThreshold) "dc_bias"
    else if (rmsDbfs < QuietDbfs) "quiet"
    else "nominal"

  /** The decode-and-measure UDF: (bytes, codec) → struct(decoded,
    * rms_dbfs, clip_frac, silence_frac, dc_ratio). Decode failure is
    * data, not an exception (same posture as the SNR UDF). */
  val statsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], codec: String) =>
      try {
        val (_, samples) = AudioCodec.decode(bytes, codec)
        val (dbfs, clip, sil, dc) = pcmStats(samples)
        // NegativeInfinity survives parquet/DuckDB poorly; an all-zero clip
        // reports the silence band anyway, so floor the dBFS at -120
        (true, math.max(dbfs, -120.0), clip, sil, dc)
      } catch { case _: Exception => (false, -120.0, 0.0, 0.0, 0.0) }
    }

  /** Column-form banding of a [[statsUdf]] struct — ONE definition shared
    * by [[measure]] and [[graft.streaming.StreamingCensus]] so the batch
    * and streaming when-chains can never diverge (must mirror [[band]]'s
    * order exactly). */
  def bandCol(st: Column): Column =
    when(!st.getField("_1"), "undecodable")
      .when(st.getField("_3") >= ClipFracThreshold, "clipped")
      .when(st.getField("_4") >= SilenceFracThreshold, "half_silent")
      .when(st.getField("_5") >= DcRatioThreshold, "dc_bias")
      .when(st.getField("_2") < QuietDbfs, "quiet")
      .otherwise("nominal")

  /** Per-row measurement for a sampled subset: (clip_id, codec, rms_dbfs,
    * clip_frac, silence_frac, band). */
  def measure(clips: DataFrame, sampleEvery: Int = 1): DataFrame = {
    val sampled =
      clips.where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
    val st = statsUdf(col("bytes"), col("codec"))
    sampled
      .withColumn("_st", st)
      .select(
        col("clip_id"), col("codec"),
        round(col("_st._2"), 3).as("rms_dbfs"),
        round(col("_st._3"), 4).as("clip_frac"),
        round(col("_st._4"), 4).as("silence_frac"),
        round(col("_st._5"), 4).as("dc_ratio"),
        bandCol(col("_st")).as("band"))
  }

  /** The census rollup: (codec, band, clips) counts — the only exchange. */
  def census(clips: DataFrame, sampleEvery: Int = 1): DataFrame =
    measure(clips, sampleEvery)
      .groupBy(col("codec"), col("band"))
      .agg(count(lit(1)).as("clips"))
}
