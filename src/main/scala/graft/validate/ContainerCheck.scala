package graft.validate

import graft.audio.AudioCodec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Container-metadata consistency census — does the PAYLOAD agree with the
  * catalog columns? Schema/range checks (q02) only see the columns; this
  * check decodes the container header and compares the sample rate the
  * bytes actually carry against the `sr_hz` the row CLAIMS — the classic
  * "metadata lies" failure of bulk-ingested audio (a transcode changed the
  * rate, the catalog didn't). The generator's own error injection creates
  * exactly this row shape (i % 5000 == 13 sets the column to 96000 while
  * the payload keeps its true rate): the range check flags it as
  * out-of-range, but only a decode proves the COLUMN is the lying side.
  *
  * Verdict bands, first match wins:
  *   - `undecodable`  — the payload doesn't parse (no container to trust)
  *   - `sr_mismatch`  — container rate ≠ claimed `sr_hz`
  *   - `ok`
  *
  * Scale shape: the decode UDF reads only the header + frames it needs,
  * confined behind the shared deterministic [[SampleFilter]]; the verdict
  * is per-row scan-only and the census exchanges only (codec, band, count)
  * triples — `bytes` never enters an exchange.
  */
object ContainerCheck {

  /** Verdict bands, the when-chain order (any oracle replay must match). */
  val Bands: Seq[String] = Seq("undecodable", "sr_mismatch", "ok")

  /** (bytes, codec) → struct(decoded, container_sr, n_samples). Decode
    * failure is data, not an exception (the [[QualityCensus]] posture). */
  val metaUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], codec: String) =>
      try {
        val (sr, samples) = AudioCodec.decode(bytes, codec)
        (true, sr, samples.length)
      } catch { case _: Exception => (false, 0, 0) }
    }

  /** Band for one decoded header vs its claimed rate. */
  def band(decoded: Boolean, containerSr: Int, claimedSr: Int): String =
    if (!decoded) "undecodable"
    else if (containerSr != claimedSr) "sr_mismatch"
    else "ok"

  /** Column-form banding of a [[metaUdf]] struct (mirrors [[band]]). */
  def bandCol(st: Column, claimedSr: Column): Column =
    when(!st.getField("_1"), "undecodable")
      .when(st.getField("_2") =!= claimedSr, "sr_mismatch")
      .otherwise("ok")

  /** Per-row verdicts for a sampled subset: (clip_id, codec, sr_hz,
    * container_sr, n_samples, band). */
  def measure(clips: DataFrame, sampleEvery: Int = 1): DataFrame = {
    val sampled =
      clips.where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
    val st = metaUdf(col("bytes"), col("codec"))
    sampled
      .withColumn("_st", st)
      .select(
        col("clip_id"), col("codec"), col("sr_hz"),
        col("_st._2").as("container_sr"),
        col("_st._3").as("n_samples"),
        bandCol(col("_st"), col("sr_hz")).as("band"))
  }

  /** The census rollup: (codec, band, clips) — the only exchange. */
  def census(clips: DataFrame, sampleEvery: Int = 1): DataFrame =
    measure(clips, sampleEvery)
      .groupBy(col("codec"), col("band"))
      .agg(count(lit(1)).as("clips"))
}
