package graft.validate

import graft.TestSpark
import graft.io.{Clip, ClipsGenerator}
import org.scalatest.funsuite.AnyFunSuite

/** Corners of the reference-free quality census (QualityBandSweep carries
  * the full-parameter-space measurement; this asserts one clip per
  * (codec, class) end-to-end through the DataFrame operator). */
class QualityCensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cap = 25

  /** First id ≡ 17 (mod 5000) whose clean codec is `codec`. */
  private def corruptIdFor(codec: String): Long =
    Iterator.from(0).map(k => 17L + 5000L * k)
      .find(i => ClipsGenerator.codec(i) == codec)
      .get

  test("pcmStats corners: clean sine, digital silence, empty") {
    val clean = graft.audio.WavCodec.synthSineSamples(440.0, cap, 16000)
    val (dbfs, clip, sil, dc) = QualityCensus.pcmStats(clean)
    assert(dbfs > -9.4 && dbfs < -8.9, s"clean rms $dbfs")
    assert(clip == 0.0)
    assert(sil < 0.13, s"clean silence $sil")
    assert(dc < 0.03, s"clean dc $dc")
    val (zdb, _, zsil, _) = QualityCensus.pcmStats(Array.fill[Short](100)(0))
    assert(zdb == Double.NegativeInfinity && zsil == 1.0)
    val (edb, eclip, esil, edc) = QualityCensus.pcmStats(Array.empty[Short])
    assert(edb == Double.NegativeInfinity && eclip == 0.0 && esil == 0.0 &&
      edc == 0.0)
  }

  test("one clip per (codec, class) lands in its measured band") {
    def corruptClip(codec: String): Clip = {
      val i = corruptIdFor(codec)
      ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
    }
    val quietId = 21L
    val clippedId = 27L
    val rows = Seq(
      ClipsGenerator.clip(1L, cap) -> "nominal",
      corruptClip("pcm_s16le") -> "half_silent",
      corruptClip("flac") -> "undecodable",
      corruptClip("pcm_mulaw") -> "clipped",
      corruptClip("pcm_alaw") -> "dc_bias",
      corruptClip("adpcm_ima") -> "half_silent",
      ClipsGenerator.clip(quietId, cap).copy(
        bytes = ClipsGenerator.quietBytes(quietId, cap),
        codec = "pcm_s16le") -> "quiet",
      ClipsGenerator.clip(clippedId, cap).copy(
        bytes = ClipsGenerator.clippedBytes(clippedId, cap),
        codec = "pcm_s16le") -> "clipped")
    val df = spark.createDataset(rows.map(_._1)).toDF()
    val got = QualityCensus.measure(df)
      .select("clip_id", "band").as[(String, String)].collect().toMap
    rows.foreach { case (c, expected) =>
      assert(got(c.clip_id) == expected,
        s"${c.clip_id} (${c.codec}): got ${got(c.clip_id)}, want $expected")
    }
  }

  test("census rolls up to (codec, band) counts") {
    val clips = spark.createDataset(
      (0L until 50L).map(i => ClipsGenerator.clip(i, cap))).toDF()
    val census = QualityCensus.census(clips)
      .as[(String, String, Long)].collect()
    assert(census.forall(_._2 == "nominal"), census.mkString(", "))
    assert(census.map(_._3).sum == 50L)
  }

  test("sampled census measures only the deterministic subset") {
    val clips = spark.createDataset(
      (0L until 200L).map(i => ClipsGenerator.clip(i, cap))).toDF()
    val n = QualityCensus.measure(clips, sampleEvery = 4).count()
    assert(n > 0 && n < 200, s"sampled $n of 200")
    // deterministic: same subset on rerun
    assert(QualityCensus.measure(clips, sampleEvery = 4).count() == n)
  }
}
