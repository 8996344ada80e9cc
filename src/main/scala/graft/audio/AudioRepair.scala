package graft.audio

import graft.validate.{GainCheck, QualityCensus}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio REPAIR pipeline — the execution step the planning censuses
  * (q59 trim, q66 resample-verify, q72 gain) only report on: per clip,
  * trim endpoint silence, unify the sample rate, normalize loudness —
  * or drop the row with a named reason when no repair stage can fix it.
  * Closes the loop the round-7 verdict called out: the censuses PLAN,
  * this operator EXECUTES, and re-running the censuses on the output
  * verifies the plan (every surviving row must land `nominal` /
  * `normalize_ok` / `ok`).
  *
  * Per-clip pipeline (one decode, pure function of the payload):
  *   1. decode (container rate — a lying `sr_hz` column cannot steer the
  *      repair, the q59/q65 lesson) — failure → `drop_undecodable`;
  *   2. all-silent clip → `drop_all_silence`;
  *   3. trim each endpoint run of digital silence ≥ the
  *      [[AudioTrim.TrimThresholdMs]] threshold (sub-threshold runs are
  *      organic zero crossings, ≤ 1 sample on this generator's space);
  *   4. gate on post-trim [[QualityCensus.pcmStats]]: a hard-clipped,
  *      mid-clip-silent, or DC-biased signal has no repair stage here —
  *      `drop_clipped` / `drop_half_silent` / `drop_dc_bias` (same
  *      thresholds as the census, so the gate and the report can't
  *      drift);
  *   5. resample to `targetSr` ([[Resampler.linear]], exact-rational
  *      phase — bit-identical at any parallelism);
  *   6. gain to `targetDbfs` RMS unless the peak would cross the rail
  *      (`drop_would_clip` — the [[GainCheck]] boundary, measured 2×
  *      margins on this generator) — survivors re-encode as PCM WAV at
  *      `targetSr` with a consistent `sr_hz`/`dur_ms`/`codec` row.
  *
  * Scale shape: ONE decode UDF per row, scan-local — no exchange at all
  * until the caller aggregates; the repaired table is written once and
  * re-censused from its (cheap, PCM) output bytes. The action census
  * exchanges only (codec, action, count).
  */
object AudioRepair {

  val DefaultTargetSr = 16000

  /** Action order (first match wins; oracle replays must mirror). */
  val Actions: Seq[String] = Seq("repaired", "drop_undecodable",
    "drop_all_silence", "drop_clipped", "drop_half_silent", "drop_dc_bias",
    "drop_would_clip")

  /** Pure per-clip repair: (action, repaired samples at `targetSr` —
    * null unless action == "repaired"). */
  def repairSamples(bytes: Array[Byte], codec: String, targetDbfs: Double,
      targetSr: Int): (String, Array[Short]) = {
    val decoded =
      try Some(AudioCodec.decode(bytes, codec))
      catch { case _: Exception => None }
    decoded match {
      case None => ("drop_undecodable", null)
      case Some((sr, samples)) =>
        val (lead, trail) = AudioTrim.endpoints(samples)
        if (samples.length == 0 || lead >= samples.length)
          return ("drop_all_silence", null)
        val thr = sr.toLong * AudioTrim.TrimThresholdMs / 1000
        val cutL = if (lead >= thr) lead else 0
        val cutT = if (trail >= thr) trail else 0
        val trimmed =
          if (cutL == 0 && cutT == 0) samples
          else java.util.Arrays.copyOfRange(samples, cutL,
            samples.length - cutT)
        val (_, clipFrac, silFrac, dcRatio) = QualityCensus.pcmStats(trimmed)
        if (clipFrac >= QualityCensus.ClipFracThreshold)
          ("drop_clipped", null)
        else if (silFrac >= QualityCensus.SilenceFracThreshold)
          ("drop_half_silent", null)
        else if (dcRatio >= QualityCensus.DcRatioThreshold)
          ("drop_dc_bias", null)
        else {
          val rs = Resampler.linear(trimmed, sr, targetSr)
          val (dbfs, _, _, peak) = GainCheck.gainStats(rs)
          val gain = math.pow(10.0, (targetDbfs - dbfs) / 20.0)
          if (peak * gain > 32767.0) ("drop_would_clip", null)
          else {
            val out = new Array[Short](rs.length)
            var i = 0
            while (i < rs.length) {
              out(i) = math.round(rs(i) * gain).toShort
              i += 1
            }
            ("repaired", out)
          }
        }
    }
  }

  /** Per-row repair frame: input columns + `(action, repaired_bytes,
    * repaired_samples)` — the single decode pass everything downstream
    * reads. */
  def repairFrame(clips: DataFrame,
      targetDbfs: Double = GainCheck.DefaultTargetDbfs,
      targetSr: Int = DefaultTargetSr): DataFrame = {
    val repairUdf = udf { (bytes: Array[Byte], codec: String) =>
      val (action, out) = repairSamples(bytes, codec, targetDbfs, targetSr)
      (action,
        if (out == null) null else WavCodec.wrapPcm16(targetSr, out),
        if (out == null) 0 else out.length)
    }
    clips
      .withColumn("_rep", repairUdf(col("bytes"), col("codec")))
      .withColumn("action", col("_rep._1"))
      .withColumn("repaired_bytes", col("_rep._2"))
      .withColumn("repaired_samples", col("_rep._3"))
      .drop("_rep")
  }

  /** The repaired clips table — same schema as the input clips table, so
    * every census/validator runs on it unchanged: survivors only, PCM WAV
    * at `targetSr`, `sr_hz`/`dur_ms` consistent with the actual payload
    * (a lying input `sr_hz` is repaired along with the audio). */
  def repairedTable(clips: DataFrame,
      targetDbfs: Double = GainCheck.DefaultTargetDbfs,
      targetSr: Int = DefaultTargetSr): DataFrame =
    repairFrame(clips, targetDbfs, targetSr)
      .where(col("action") === "repaired")
      .select(
        col("clip_id"),
        col("repaired_bytes").as("bytes"),
        lit(targetSr).as("sr_hz"),
        (col("repaired_samples").cast("long") * 1000L / targetSr)
          .cast("int").as("dur_ms"),
        lit("pcm_s16le").as("codec"),
        col("transcript"))

  /** The action census: (codec, action, clips) — what was repaired and
    * what was dropped for which named reason, by INPUT codec. */
  def actionCensus(clips: DataFrame,
      targetDbfs: Double = GainCheck.DefaultTargetDbfs,
      targetSr: Int = DefaultTargetSr): DataFrame =
    repairFrame(clips, targetDbfs, targetSr)
      .groupBy(col("codec"), col("action"))
      .agg(count(lit(1)).as("clips"))
}
