package graft.audio

import graft.validate.SampleFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silence endpointing (VAD-lite) — the standard speech-curation repair
  * scan: find how much leading/trailing digital silence a clip carries and
  * band it into the trim decision a curation run acts on (trim the pads,
  * drop all-silence rows). Reference-free like [[graft.validate
  * .QualityCensus]]: no golden signal, each clip measured on its own.
  *
  * Verdicts are BANDS with structural margins, not millisecond estimates:
  * a sine's first sample is sin(0)=0 and at this generator's parameter
  * space (f ≥ 220 Hz, sr ≤ 48 kHz) no two CONSECUTIVE samples can both
  * sit within the ±8 silence line (adjacent-sample phase spacing
  * 2πf/sr ≥ 0.0288 rad ≫ the 4.88e-4 rad silence window), so organic
  * endpoint runs are ≤ 1 sample ≪ the 5 ms trim threshold, while planted
  * pads and zeroed halves clear it by ≥ 1.75× — measured across the full
  * feasible space by `AudioTrimSweep`. The q56 lesson applied: smooth,
  * margin-backed verdicts instead of bistable boundary arithmetic.
  *
  * Scale shape: decode UDF behind the shared deterministic
  * [[SampleFilter]]; endpoint stats per-row scan-only; the census
  * exchanges only (codec, verdict, count) triples.
  */
object AudioTrim {

  /** Same near-zero line as [[graft.validate.QualityCensus.SilenceAbs]]. */
  val SilenceAbs = 8

  /** A side is trim-worthy when its silent run is ≥ 5 ms: leadSamples ≥
    * sr/200. Organic runs are ≤ 1 sample (see object doc); the smallest
    * planted pad is ≥ 12.4 ms. */
  val TrimThresholdMs = 5

  /** Verdict order (first match wins; any oracle replay must use it). */
  val Verdicts: Seq[String] =
    Seq("undecodable", "all_silence", "trim_both", "trim_lead",
      "trim_trail", "keep")

  /** Count leading/trailing samples with |s| ≤ [[SilenceAbs]]. For an
    * all-silent clip both counts equal `n` (classified `all_silence`
    * before either side is read as a pad). */
  def endpoints(samples: Array[Short]): (Int, Int) = {
    val n = samples.length
    var lead = 0
    while (lead < n && math.abs(samples(lead).toInt) <= SilenceAbs) lead += 1
    var trail = 0
    while (trail < n - lead &&
      math.abs(samples(n - 1 - trail).toInt) <= SilenceAbs) trail += 1
    (lead, trail)
  }

  /** Band one clip's endpoints; `srHz` is the DECODED container rate (a
    * lying `sr_hz` column must not change where 5 ms falls). */
  def verdict(decoded: Boolean, n: Int, srHz: Int, lead: Int,
      trail: Int): String = {
    if (!decoded) return "undecodable"
    if (n == 0 || lead >= n) return "all_silence"
    val thresholdSamples = srHz.toLong * TrimThresholdMs / 1000
    val l = lead >= thresholdSamples
    val t = trail >= thresholdSamples
    if (l && t) "trim_both"
    else if (l) "trim_lead"
    else if (t) "trim_trail"
    else "keep"
  }

  /** Decode-and-endpoint UDF: (bytes, codec) → struct(decoded, n, sr,
    * lead, trail). Decode failure is data, not an exception. */
  val endpointsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], codec: String) =>
      try {
        val (sr, samples) = AudioCodec.decode(bytes, codec)
        val (lead, trail) = endpoints(samples)
        (true, samples.length, sr, lead, trail)
      } catch { case _: Exception => (false, 0, 0, 0, 0) }
    }

  private val verdictUdf =
    udf((decoded: Boolean, n: Int, sr: Int, lead: Int, trail: Int) =>
      verdict(decoded, n, sr, lead, trail))

  /** Per-row endpoint measurement for a sampled subset:
    * (clip_id, codec, lead_samples, trail_samples, verdict). */
  def measure(clips: DataFrame, sampleEvery: Int = 1): DataFrame = {
    val sampled =
      clips.where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
    sampled
      .withColumn("_ep", endpointsUdf(col("bytes"), col("codec")))
      .select(
        col("clip_id"), col("codec"),
        col("_ep._4").as("lead_samples"),
        col("_ep._5").as("trail_samples"),
        verdictUdf(col("_ep._1"), col("_ep._2"), col("_ep._3"),
          col("_ep._4"), col("_ep._5")).as("verdict"))
  }

  /** The census rollup: (codec, verdict, clips) — the only exchange. */
  def census(clips: DataFrame, sampleEvery: Int = 1): DataFrame =
    measure(clips, sampleEvery)
      .groupBy(col("codec"), col("verdict"))
      .agg(count(lit(1)).as("clips"))
}
