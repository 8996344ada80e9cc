package graft.validate

import graft.TestSpark
import graft.io.ClipsGenerator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ContainerCheckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a deterministic slice of the real generator, errors ON — carries the
  // m=13 sr-column lie and the m=17 zeroed-back-half corruption; 16000
  // rows so the corrupt set includes a flac row (i=15017 is the first
  // i ≡ 17 mod 5000 whose mix-hash codec lands on flac)
  lazy val clips = ClipsGenerator
    .clips(spark, 16000, numPartitions = 4, withErrors = true).toDF()

  test("clean rows are ok; the m=13 sr-column lie is caught as the COLUMN") {
    val m = ContainerCheck.measure(clips)
      .select("clip_id", "sr_hz", "container_sr", "band")
      .as[(String, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    // m=13 plant: column says 96000, container carries the true rate
    val lied = m("clip-000000000013")
    assert(lied._2 === 96000)
    assert(lied._3 === ClipsGenerator.srHz(13L))
    assert(lied._4 === "sr_mismatch")
    // a clean row agrees on both sides
    val clean = m("clip-000000000012")
    assert(clean._2 === clean._3 && clean._4 === "ok")
  }

  test("zeroed-flac corruption fails decode; zeroed PCM keeps its header") {
    val bands = ContainerCheck.measure(clips)
      .withColumn("m",
        expr("CAST(substring(clip_id, 6, 12) AS BIGINT) % 5000"))
      .where(col("m") === 17)
      .groupBy("codec", "band").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (((codec, band), _) <- bands) {
      if (codec == "flac") assert(band === "undecodable", codec)
      else assert(band === "ok", codec) // payload zeroed, header intact
    }
    assert(bands.keys.exists(_._1 == "flac"))
    assert(bands.keys.exists(_._1 != "flac"))
  }

  test("outright garbage bytes are undecodable, not an exception") {
    val garbage = Seq(
      ("g-1", Array[Byte](1, 2, 3, 4, 5), 16000, "pcm_s16le"),
      ("g-2", Array.empty[Byte], 16000, "flac"))
      .toDF("clip_id", "bytes", "sr_hz", "codec")
    val got = ContainerCheck.measure(garbage)
      .select("clip_id", "band").as[(String, String)].collect().toMap
    assert(got === Map("g-1" -> "undecodable", "g-2" -> "undecodable"))
  }

  test("census equals measure rolled up; sampling gate respected") {
    val full = ContainerCheck.census(clips)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val manual = ContainerCheck.measure(clips)
      .groupBy("codec", "band").agg(count(lit(1)).as("clips"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(full === manual)
    // sampleEvery=8 decodes only the deterministic 1-in-8 subset
    val sampled = ContainerCheck.census(clips, sampleEvery = 8)
      .agg(sum("clips")).as[Long].head()
    assert(sampled < 16000L / 4 && sampled > 16000L / 16)
  }

  test("scale shape: bytes never enter the census exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = ContainerCheck.census(clips)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeExec => e.output.map(_.name).toSeq
        }
      assert(shuffles.nonEmpty)
      // only partial-agg (codec, band, count) columns ever move
      assert(!shuffles.exists(cols =>
        cols.contains("bytes") || cols.contains("clip_id")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
