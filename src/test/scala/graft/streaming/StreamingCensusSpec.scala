package graft.streaming

import graft.TestSpark
import graft.io.ClipsGenerator
import graft.validate.QualityCensus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming quality census: the windowed band counts must equal the batch
  * census over the same rows (shared statsUdf/bandCol definitions), with
  * per-window isolation for event-time separated batches. */
class StreamingCensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cap = 25

  // epoch-hour-aligned (see StreamingDriftSpec note)
  private def ts(min: Int) = new Timestamp(1700002800000L + min * 60000L)

  private def corruptClip(i: Long) =
    ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)

  test("streaming census equals the batch census over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    // clean rows + one corrupt per codec, all in one hour window
    val corruptIds = ClipsGenerator.Codecs.map(c =>
      Iterator.from(0).map(k => 17L + 5000L * k)
        .find(i => ClipsGenerator.codec(i) == c).get)
    val clips = ((0L until 40L) ++ corruptIds).map(i => corruptClip(i))
    val rows = clips.map(c =>
      (c.clip_id, c.bytes, c.sr_hz, c.dur_ms, c.codec, c.transcript, ts(5)))
    val input = MemoryStream[(String, Array[Byte], Int, Int, String, String, Timestamp)]
    val df = input.toDF().toDF(
      "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "ts")
    val out = StreamingCensus.quality(df, "ts", "1 hour", "10 minutes")
    val tmp = Files.createTempDirectory("graft-scensus").toString
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("scensus_eq")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("scensus_eq")
      .select("codec", "band", "clips")
      .as[(String, String, Long)].collect().toSet
    val batch = QualityCensus.census(
      spark.createDataset(clips).toDF())
      .as[(String, String, Long)].collect().toSet
    assert(streaming === batch,
      s"streaming $streaming\nbatch $batch")
    // the five corrupt signatures all present
    assert(streaming.exists(r => r._1 == "flac" && r._2 == "undecodable"))
    assert(streaming.exists(r => r._1 == "pcm_mulaw" && r._2 == "clipped"))
    assert(streaming.exists(r => r._1 == "pcm_alaw" && r._2 == "dc_bias"))
    assert(streaming.exists(r => r._1 == "adpcm_ima" && r._2 == "half_silent"))
  }

  test("event-time windows keep their censuses separate") {
    implicit val sqlCtx = spark.sqlContext
    val clean = ClipsGenerator.clip(1L, cap)
    val input = MemoryStream[(String, Array[Byte], String, Timestamp)]
    val df = input.toDF().toDF("clip_id", "bytes", "codec", "ts")
    val out = StreamingCensus.quality(df, "ts", "1 hour", "10 minutes")
    val tmp = Files.createTempDirectory("graft-scensus2").toString
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("scensus_win")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(
      (clean.clip_id, clean.bytes, clean.codec, ts(5)),
      (clean.clip_id, clean.bytes, clean.codec, ts(15)),
      (clean.clip_id, clean.bytes, clean.codec, ts(90)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scensus_win")
      .select(col("window.start").cast("long"), col("clips"))
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSeq.sorted === Seq(1L, 2L),
      s"expected one window of 2 and one of 1, got $got")
  }
}
