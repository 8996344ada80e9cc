package graft.streaming

import graft.validate.{QualityCensus, SampleFilter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming reference-free quality census — the ingest-time twin of
  * [[QualityCensus.census]]: per closed event-time window (× codec), how
  * many clips landed in each quality band. An ingest pipeline watches this
  * to catch a bad upstream batch (a burst of `undecodable` or
  * `half_silent`) WHILE it streams in, instead of discovering it in the
  * next batch census.
  *
  * Design notes for scale:
  *  - The decode UDF and the band when-chain are the EXACT batch
  *    operators ([[QualityCensus.statsUdf]] / [[QualityCensus.bandCol]] —
  *    shared definitions, so the two paths cannot drift), applied as
  *    stateless per-row projections before the windowed count.
  *  - State per key is ONE count per (window, codec, band) — bounded by
  *    windows inside the watermark horizon × codecs × the six fixed
  *    bands, independent of row volume; closed windows emit once in
  *    Append mode and drop their state.
  *  - The deterministic [[SampleFilter]] applies per-row, so a sampled
  *    census costs the same fraction streaming as batch. */
object StreamingCensus {

  /** (window, codec, band, clips) per event-time window. */
  def quality(stream: DataFrame, tsCol: String, windowDuration: String,
      watermarkDelay: String, sampleEvery: Int = 1): DataFrame =
    stream
      .where(SampleFilter.sampledOrAll(col("clip_id"), sampleEvery))
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withColumn("_st", QualityCensus.statsUdf(col("bytes"), col("codec")))
      .withColumn("band", QualityCensus.bandCol(col("_st")))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("codec"), col("band"))
      .agg(count(lit(1)).as("clips"))
}
