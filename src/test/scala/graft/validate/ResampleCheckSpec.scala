package graft.validate

import graft.TestSpark
import graft.io.ClipsGenerator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ResampleCheckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // real generator slice, errors ON: covers clean rows at every source
  // rate, duplicate-id rows, the m=13 sr-column lie, and corrupt rows
  // incl. the first flac one (i=15017). maxSynthMs=25 matches the
  // OracleTables cap the sweep measured its margins over.
  lazy val clips = ClipsGenerator
    .clips(spark, 16000, numPartitions = 4, withErrors = true,
      maxSynthMs = 25).toDF()

  lazy val measured = ResampleCheck.measure(clips)
    .withColumn("m", expr("CAST(substring(clip_id, 6, 12) AS BIGINT) % 5000"))

  test("clean rows across all five codecs and every rate band resample_ok") {
    val clean = measured.where(col("m") =!= 17 && col("m") =!= 13)
    val bad = clean.where(col("band") =!= "resample_ok")
    assert(bad.count() === 0L)
    // every (codec, source_sr) combination present actually converted
    val rates = clean.select("codec", "source_sr").distinct()
      .as[(String, Int)].collect()
    assert(rates.map(_._1).distinct.length === 5)
    assert(rates.map(_._2).distinct.sorted.toSeq
      === Seq(8000, 16000, 22050, 44100, 48000))
  }

  test("measured margins hold: clean ≥ 0.9928, corrupt ≤ 0.6928 or fails") {
    val cleanMin = measured.where(col("m") =!= 17)
      .agg(min("tone_ratio")).as[Double].head()
    assert(cleanMin >= 0.9928)
    val corrupt = measured.where(col("m") === 17)
      .select("codec", "tone_ratio", "band")
      .as[(String, Option[Double], String)].collect()
    assert(corrupt.nonEmpty)
    for ((codec, ratio, band) <- corrupt) {
      if (codec == "flac")
        assert(ratio.isEmpty && band === "undecodable", codec)
      else {
        assert(ratio.exists(_ <= 0.6928), s"$codec $ratio")
        assert(band === "degraded", codec)
      }
    }
    // the slice genuinely exercises the flac decode-failure arm (i=15017)
    assert(corrupt.exists(_._1 == "flac"))
  }

  test("the m=13 sr-column lie cannot skew conversion (container rate wins)") {
    val lied = measured.where(col("m") === 13)
      .select("source_sr", "band").as[(Int, String)].collect()
    assert(lied.nonEmpty)
    // conversion read the TRUE rate from the container, so the tone
    // math lands on the right frequency axis and the row passes
    assert(lied.forall { case (sr, band) =>
      sr != 96000 && band == "resample_ok"
    })
  }

  test("census equals measure rolled up; sampling gate bounds the decode") {
    val full = ResampleCheck.census(clips)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val manual = measured.groupBy("codec", "band")
      .agg(count(lit(1)).as("clips"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(full === manual)
    val sampled = ResampleCheck.census(clips, sampleEvery = 8)
      .agg(sum("clips")).as[Long].head()
    assert(sampled < 16000L / 4 && sampled > 16000L / 16)
  }

  test("scale shape: bytes never enter the census exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = ResampleCheck.census(clips)
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
