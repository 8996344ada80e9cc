package graft.validate

import graft.TestSpark
import graft.io.ClipsGenerator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequency-domain content check over the dirty clips table: the census
  * bands must equal the injection-rule prediction, with margins far from
  * the 0.75 threshold on both sides (the parameter-space margin sweep
  * lives in ToneProjectionSpec; this spec pins the table-level behavior).
  * Facts the prediction rests on:
  *  - duplicate-id rows sit exactly 1 Hz from the id-derived expectation
  *    (payload of index id+1 under index id's tone claim) — unresolvable
  *    in a 25 ms window, so they MATCH here and are caught by the SNR
  *    invariant instead. The wrap case (879 Hz off) is arithmetically
  *    impossible: i ≡ 11 (mod 5000) and i ≡ 0 (mod 880) has no solution
  *    (it needs 600a ≡ 869 (mod 880), but gcd(600,880)=40 does not
  *    divide 869);
  *  - corrupt rows are identified by id for EVERY row (dup rows inherit
  *    id ≡ 10 (mod 5000), never 17): zeroed flac streams fail their CRC
  *    (decode_fail), zeroed PCM/G.711 decode to half-garbage whose
  *    claimed-tone projection collapses (anomaly);
  *  - corrupted sr_hz columns can't skew anything (decode reads the
  *    payload header), and null transcripts don't touch the payload.
  */
class FrequencyCheckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val N = 20000L
  lazy val dirty = ClipsGenerator.clips(spark, N, numPartitions = 8,
    withErrors = true, maxSynthMs = 25).toDF().cache()

  test("census bands equal the injection-rule prediction") {
    val got = FrequencyCheck.census(dirty, sampleEvery = 1)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val corrupt = (0L until N).filter(_ % 5000 == 17)
    assert(corrupt.nonEmpty)
    val byCodec = (0L until N).groupBy(ClipsGenerator.codec)
    for ((codec, ids) <- byCodec) {
      val corruptHere = corrupt.count(ClipsGenerator.codec(_) == codec).toLong
      val expected =
        if (codec == "flac") (ids.size - corruptHere, 0L, corruptHere)
        else (ids.size - corruptHere, corruptHere, 0L)
      assert(got(codec) === expected, s"codec=$codec")
    }
  }

  test("verdict margins: legit rows clear per-codec floors, corrupt rows <= 0.6") {
    // adpcm_ima's 4-bit quantization costs up to ~0.8% of clean-signal
    // energy (min ratio 0.9925, AdpcmBandSweep); the other codecs stay at
    // >= 0.999. Both floors sit >= 0.24 above the 0.75 verdict threshold.
    val rows = FrequencyCheck.check(dirty, sampleEvery = 1)
      .withColumn("corrupt",
        expr("CAST(substr(clip_id, 6) AS BIGINT)") % 5000 === 17)
      .where(col("tone_ratio").isNotNull)
      .groupBy(col("corrupt"), (col("codec") === "adpcm_ima").as("adpcm"))
      .agg(min(col("tone_ratio")).as("lo"), max(col("tone_ratio")).as("hi"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows((false, false))._1 >= 0.999,
      s"legit min ${rows((false, false))._1}")
    assert(rows((false, true))._1 >= 0.99,
      s"legit adpcm min ${rows((false, true))._1}")
    rows.collect { case ((true, _), (_, hi)) => hi }.foreach { hi =>
      assert(hi <= 0.6, s"corrupt max $hi") }
  }

  test("a payload too short to window reads as decode failure, not a match") {
    // 3 samples => NaN ratio inside the UDF; Spark orders NaN above every
    // double, so an unguarded NaN would satisfy `ratio >= 0.75`
    val shortWav = graft.audio.WavCodec.synthSine(440.0, 0, 16000)
    val tiny = Seq((ClipsGenerator.clipId(1), shortWav, 16000, 25,
      "pcm_s16le", "t")).toDF(
      "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val out = FrequencyCheck.check(tiny, sampleEvery = 1).collect().head
    assert(out.isNullAt(out.fieldIndex("tone_ratio")))
    assert(!out.getAs[Boolean]("content_ok"))
  }

  test("a null-key row stays in the census as a decode failure") {
    // round-5 verdict: the raw sampling hash `pmod(xxhash64(NULL), k)` is
    // NULL, silently dropping null-key rows on foreign data. The full
    // census must skip the filter, and ANY sampleEvery must keep the row
    // findable (null-safe hash); the row itself lands as decode_fail (its
    // expected frequency is underivable from a null id).
    val wav = graft.audio.WavCodec.synthSine(440.0, 25, 16000)
    val rows = Seq((null.asInstanceOf[String], wav, 16000, 25, "pcm_s16le", "t"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val census = FrequencyCheck.census(rows, sampleEvery = 1).collect()
    assert(census.map(_.getLong(3)).sum === 1L, "null-key row must be counted")
    // the hash predicate itself is null-safe: on a NULL-poisoned hash both
    // the predicate AND its negation are NULL, so the tautology below
    // would filter the row out (count 0) — with the null-safe hash it is
    // genuinely two-valued and keeps it
    val p = SampleFilter.hashSampled(col("clip_id"), 100)
    assert(rows.where(p || !p).count() === 1L)
  }

  test("a genuinely swapped payload is caught (the check's purpose)") {
    // graft a payload 100 Hz away from what the id claims
    val swapped = Seq((ClipsGenerator.clipId(42),
      graft.audio.WavCodec.synthSine(
        ClipsGenerator.freqHz(42) + 100.0, 25, 16000),
      16000, 25, "pcm_s16le", "t")).toDF(
      "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val out = FrequencyCheck.check(swapped, sampleEvery = 1).collect().head
    assert(!out.getAs[Boolean]("content_ok"))
    // the diagnostic estimate pinpoints the actual tone carried
    assert(math.abs(out.getAs[Double]("freq_est_hz") -
      (ClipsGenerator.freqHz(42) + 100.0)) < 1.0)
  }
}
