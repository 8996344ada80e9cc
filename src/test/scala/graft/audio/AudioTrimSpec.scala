package graft.audio

import graft.TestSpark
import graft.io.{Clip, ClipsGenerator}
import org.scalatest.funsuite.AnyFunSuite

/** Corners of the silence-endpoint trim census (AudioTrimSweep carries the
  * full-parameter-space measurement; this asserts one clip per
  * (codec, class) end-to-end through the DataFrame operator). */
class AudioTrimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cap = 25

  private def corruptIdFor(codec: String): Long =
    Iterator.from(0).map(k => 17L + 5000L * k)
      .find(i => ClipsGenerator.codec(i) == codec)
      .get

  test("endpoints corners: clean sine, padded, all-zero, empty") {
    val clean = WavCodec.synthSineSamples(440.0, cap, 16000)
    assert(AudioTrim.endpoints(clean) === ((1, 0)),
      "sin(0)=0 is the only organic leading-silent sample at 440/16k")
    val padded = new Array[Short](100 + clean.length + 200)
    System.arraycopy(clean, 0, padded, 100, clean.length)
    assert(AudioTrim.endpoints(padded) === ((101, 200)))
    val zeros = Array.fill[Short](50)(0)
    assert(AudioTrim.endpoints(zeros) === ((50, 0)),
      "an all-silent clip reports lead = n, trail 0 (no double count)")
    assert(AudioTrim.endpoints(Array.empty[Short]) === ((0, 0)))
  }

  test("verdict bands: threshold is sr-scaled, all_silence wins over trim") {
    // 5 ms at 16 kHz = 80 samples
    assert(AudioTrim.verdict(decoded = true, 400, 16000, 80, 0) === "trim_lead")
    assert(AudioTrim.verdict(decoded = true, 400, 16000, 79, 0) === "keep")
    assert(AudioTrim.verdict(decoded = true, 400, 16000, 80, 80) === "trim_both")
    assert(AudioTrim.verdict(decoded = true, 400, 16000, 0, 80) === "trim_trail")
    assert(AudioTrim.verdict(decoded = true, 400, 16000, 400, 0) === "all_silence")
    assert(AudioTrim.verdict(decoded = true, 0, 16000, 0, 0) === "all_silence")
    assert(AudioTrim.verdict(decoded = false, 400, 16000, 0, 0) === "undecodable")
  }

  test("one clip per (codec, class) lands in its measured verdict") {
    def corruptClip(codec: String): Clip = {
      val i = corruptIdFor(codec)
      ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
    }
    val padId = 37L
    val silId = 41L
    val rows = Seq(
      ClipsGenerator.clip(1L, cap) -> "keep",
      corruptClip("pcm_s16le") -> "trim_trail",
      corruptClip("flac") -> "undecodable",
      corruptClip("pcm_mulaw") -> "keep",
      corruptClip("pcm_alaw") -> "keep",
      corruptClip("adpcm_ima") -> "trim_trail",
      ClipsGenerator.clip(padId, cap).copy(
        bytes = ClipsGenerator.paddedBytes(padId, cap, 15, 20),
        codec = "pcm_s16le") -> "trim_both",
      ClipsGenerator.clip(silId, cap).copy(
        bytes = ClipsGenerator.silentBytes(silId, cap),
        codec = "pcm_s16le") -> "all_silence")
    val df = spark.createDataset(rows.map(_._1)).toDF()
    val got = AudioTrim.measure(df)
      .select("clip_id", "verdict").as[(String, String)].collect().toMap
    rows.foreach { case (c, expected) =>
      assert(got(c.clip_id) == expected,
        s"${c.clip_id} (${c.codec}): got ${got(c.clip_id)}, want $expected")
    }
  }

  test("the verdict ignores a lying sr_hz column (decoded rate rules)") {
    // id%5000==13 rows carry sr_hz=96000 in METADATA; the container still
    // says the true rate, so the 5 ms threshold must not shrink
    val i = Iterator.from(0).map(k => 13L + 5000L * k)
      .find(i => ClipsGenerator.codec(i) == "pcm_s16le").get
    val c = ClipsGenerator.injectErrors(ClipsGenerator.clip(i, cap), i)
    assert(c.sr_hz === 96000)
    val got = AudioTrim.measure(
      spark.createDataset(Seq(c)).toDF())
      .select("verdict").as[String].collect()
    assert(got === Array("keep"))
  }

  test("census rolls up to (codec, verdict) counts") {
    val clips = spark.createDataset(
      (0L until 50L).map(i => ClipsGenerator.clip(i, cap))).toDF()
    val census = AudioTrim.census(clips)
      .as[(String, String, Long)].collect()
    assert(census.forall(_._2 == "keep"), census.mkString(", "))
    assert(census.map(_._3).sum == 50L)
  }
}
