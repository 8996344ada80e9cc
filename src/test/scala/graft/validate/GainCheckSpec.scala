package graft.validate

import graft.TestSpark
import graft.io.ClipsGenerator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GainCheckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // real generator slice (errors on, cap 25 like the oracle tables) with
  // the three q72 plants injected by residue
  lazy val clips = {
    val base = ClipsGenerator
      .clips(spark, 16000, numPartitions = 4, withErrors = true,
        maxSynthMs = 25).toDF()
    val id = expr("CAST(substring(clip_id, 6, 12) AS BIGINT)")
    val impU = udf((i: Long) => ClipsGenerator.impulseBytes(i, 25))
    val silU = udf((i: Long) => ClipsGenerator.silentBytes(i, 25))
    val quiU = udf((i: Long) => ClipsGenerator.quietBytes(i, 25))
    base
      .withColumn("bytes",
        when(id % 5000 === 53, impU(id))
          .when(id % 5000 === 59, silU(id))
          .when(id % 5000 === 61, quiU(id))
          .otherwise(col("bytes")))
      .withColumn("codec",
        when(id % 5000 === 53 || id % 5000 === 59 || id % 5000 === 61,
          lit("pcm_s16le")).otherwise(col("codec")))
  }

  lazy val measured = GainCheck.measure(clips)
    .withColumn("m", expr("CAST(substring(clip_id, 6, 12) AS BIGINT) % 5000"))

  test("plants land their bands: impulse would_clip, silent, quiet ok") {
    val byPlant = measured.where(col("m").isin(53, 59, 61))
      .select("m", "band").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byPlant(53L) === Seq("would_clip"))
    assert(byPlant(59L) === Seq("silent"))
    assert(byPlant(61L) === Seq("normalize_ok"))
    // the quiet plant needs a real upward gain (~+17 dB to −20 target)
    val quietGain = measured.where(col("m") === 61)
      .select("gain_db").as[Double].collect()
    assert(quietGain.forall(g => g > 15.0 && g < 19.0), quietGain.toSeq)
  }

  test("corrupt rows: mulaw already_clipped, flac undecodable, rest ok") {
    val corrupt = measured.where(col("m") === 17)
      .select("codec", "band").as[(String, String)].collect()
    assert(corrupt.nonEmpty)
    for ((codec, band) <- corrupt) codec match {
      case "pcm_mulaw" => assert(band === "already_clipped", codec)
      case "flac" => assert(band === "undecodable", codec)
      case _ => assert(band === "normalize_ok", codec)
    }
    assert(corrupt.exists(_._1 == "flac")) // i=15017 in range
    assert(corrupt.exists(_._1 == "pcm_mulaw"))
  }

  test("clean rows normalize cleanly by ATTENUATION (sine crest ≈ √2)") {
    val clean = measured.where(!col("m").isin(17, 53, 59, 61))
    assert(clean.where(col("band") =!= "normalize_ok").count() === 0L)
    // generator sines sit ≈ −9 dBFS → gain to −20 is ~−11 dB
    val gains = clean.select("gain_db").as[Double].collect()
    assert(gains.forall(g => g < -9.0 && g > -13.0))
  }

  test("sweep margins hold on the slice: no class within 2× of the rail") {
    // recompute the rail ratio from the measured gain + decoded peak via
    // the shared gainStats — the spec's own arithmetic, not the UDF's
    val rows = clips.select("clip_id", "bytes", "codec")
      .as[(String, Array[Byte], String)].collect()
    var maxUnder = 0.0
    var minOver = Double.MaxValue
    for ((id, bytes, codec) <- rows) {
      try {
        val (_, samples) = graft.audio.AudioCodec.decode(bytes, codec)
        val (dbfs, clip, sil, peak) = GainCheck.gainStats(samples)
        if (clip < QualityCensus.ClipFracThreshold &&
          sil < GainCheck.SilentFracFloor) {
          val ratio = peak *
            math.pow(10.0, (GainCheck.DefaultTargetDbfs - dbfs) / 20.0) /
            32767.0
          if (ratio <= 1.0) maxUnder = math.max(maxUnder, ratio)
          else minOver = math.min(minOver, ratio)
        }
      } catch { case _: Exception => () }
    }
    assert(maxUnder <= 0.5, s"under-class crept to $maxUnder")
    assert(minOver >= 1.9, s"over-class crept to $minOver")
  }

  test("census equals measure rolled up; bytes never enter the exchange") {
    val full = GainCheck.census(clips)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val manual = measured.groupBy("codec", "band")
      .agg(count(lit(1)).as("clips"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(full === manual)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = GainCheck.census(clips)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeExec => e.output.map(_.name).toSeq
        }
      assert(shuffles.nonEmpty)
      assert(!shuffles.exists(cols =>
        cols.contains("bytes") || cols.contains("clip_id")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
