package graft.audio

import graft.TestSpark
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content fingerprinting: codec/container/rate invariance (the property
  * byte-level dedup cannot have), adjacent-tone separation, degenerate
  * routing, the census shape, and the keys-only exchange. The estimator
  * margin itself is measured exhaustively by [[FingerprintSweep]]. */
class ContentFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def enc(codec: String, sr: Int, freq: Double): Array[Byte] = {
    val samples = WavCodec.synthSineSamples(freq, 25, sr)
    codec match {
      case "flac" => FlacCodec.encode(sr, samples)
      case "pcm_mulaw" => G711Codec.encodeMuLaw(sr, samples)
      case "pcm_alaw" => G711Codec.encodeALaw(sr, samples)
      case "adpcm_ima" => AdpcmCodec.encode(sr, samples)
      case _ => WavCodec.wrapPcm16(sr, samples)
    }
  }

  test("same content through every codec and rate lands one fingerprint") {
    val fps = for {
      codec <- Seq("pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw", "adpcm_ima")
      sr <- Seq(16000, 22050, 44100, 48000) // adpcm@8k is the excluded cell
    } yield ContentFingerprint.fingerprint(enc(codec, sr, 440.0), codec)
    assert(fps.toSet === Set("tone:440:d1"), fps.toString)
  }

  test("adjacent integer tones separate") {
    for (f <- Seq(220, 440, 441, 1099)) {
      val fp = ContentFingerprint.fingerprint(enc("pcm_s16le", 16000, f), "pcm_s16le")
      assert(fp === s"tone:$f:d1")
    }
  }

  test("degenerate payloads route to named buckets") {
    assert(ContentFingerprint.fingerprint(Array[Byte](9, 9, 9), "pcm_s16le")
      === "undecodable")
    assert(ContentFingerprint.fingerprint(
      WavCodec.wrapPcm16(16000, new Array[Short](4)), "pcm_s16le") === "short")
    assert(ContentFingerprint.fingerprint(
      WavCodec.wrapPcm16(16000, new Array[Short](400)), "pcm_s16le")
      === "silence")
  }

  test("fingerprintWithRate: ONE decode yields fp ≡ fingerprint AND the " +
      "container rate (r8 verdict #2)") {
    for {
      codec <- Seq("pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw", "adpcm_ima")
      sr <- Seq(16000, 22050, 44100, 48000)
    } {
      val bytes = enc(codec, sr, 440.0)
      val (fp, rate) = ContentFingerprint.fingerprintWithRate(bytes, codec)
      assert(fp === ContentFingerprint.fingerprint(bytes, codec))
      assert(rate === AudioCodec.decode(bytes, codec)._1)
      assert(rate === sr)
    }
    // undecodable payloads report rate 0 (the old double-decode path's
    // exception fallback, now from the same single decode)
    assert(ContentFingerprint.fingerprintWithRate(Array[Byte](9, 9, 9),
      "pcm_s16le") === (("undecodable", 0)))
  }

  test("dedupReport: cross-codec cluster with canonical keeper") {
    import spark.implicits._
    val clips = Seq(
      ("clip-000000000002", enc("pcm_mulaw", 22050, 300.0), "pcm_mulaw"),
      ("clip-000000000001", enc("flac", 16000, 300.0), "flac"),
      ("clip-000000000003", enc("pcm_s16le", 16000, 301.0), "pcm_s16le"))
      .toDF("clip_id", "bytes", "codec")
    val rep = ContentFingerprint.dedupReport(clips)
      .orderBy("fingerprint").collect()
    assert(rep.length === 2)
    val c300 = rep.find(_.getString(0) == "tone:300:d1").get
    assert(c300.getLong(1) === 2L && c300.getLong(2) === 2L
      && c300.getLong(3) === 2L && c300.getString(4) === "clip-000000000001")
    val c301 = rep.find(_.getString(0) == "tone:301:d1").get
    assert(c301.getLong(1) === 1L)
  }

  test("plan: the census exchanges fingerprints and stats, never audio") {
    import spark.implicits._
    val clips = (0 until 50).map(i =>
      (f"clip-$i%012d", enc("pcm_s16le", 16000, 220.0 + i % 5), "pcm_s16le"))
      .toDF("clip_id", "bytes", "codec")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchanges = ContentFingerprint.dedupReport(clips)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.output.map(_.name).toSeq
        }
      assert(exchanges.nonEmpty &&
        exchanges.forall(out => !out.exists(_.contains("bytes"))),
        exchanges.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
