package graft.audio

import graft.TestSpark
import graft.io.ClipsGenerator
import graft.validate.{ContainerCheck, GainCheck, QualityCensus}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The repair pipeline: action routing, trim/resample/gain arithmetic on
  * the survivors, output-table consistency, post-repair censuses clean,
  * and the scan-local plan shape. The (codec, class) → action map itself
  * is measured across the id space by [[RepairSweep]] and pinned by the
  * q77/q78 oracles. */
class AudioRepairSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val target = GainCheck.DefaultTargetDbfs
  private val sr16 = AudioRepair.DefaultTargetSr
  private def repair(bytes: Array[Byte], codec: String = "pcm_s16le") =
    AudioRepair.repairSamples(bytes, codec, target, sr16)

  test("action routing: each drop class lands its named reason") {
    assert(repair(Array[Byte](1, 2, 3))._1 === "drop_undecodable")
    assert(repair(ClipsGenerator.silentBytes(7, 25))._1 === "drop_all_silence")
    assert(repair(ClipsGenerator.clippedBytes(7, 25))._1 === "drop_clipped")
    assert(repair(ClipsGenerator.impulseBytes(7, 25))._1 === "drop_would_clip")
  }

  test("survivors: gained to target RMS, no trimmable endpoints, deterministic") {
    val clean = ClipsGenerator.injectErrors(ClipsGenerator.clip(12L, 25), 12L)
    for ((mk, codec) <- Seq(
      (ClipsGenerator.paddedBytes(11L, 25, 15, 20), "pcm_s16le"),
      (ClipsGenerator.quietBytes(11L, 25), "pcm_s16le"),
      (clean.bytes, clean.codec))) {
      val (action, out) = repair(mk, codec)
      assert(action === "repaired")
      val (dbfs, _, _, _) = GainCheck.gainStats(out)
      assert(math.abs(dbfs - target) < 0.5, s"rms $dbfs vs target $target")
      val (lead, trail) = AudioTrim.endpoints(out)
      val thr = sr16.toLong * AudioTrim.TrimThresholdMs / 1000
      assert(lead < thr && trail < thr, s"untrimmed endpoints $lead/$trail")
      // pure function of the payload: bit-identical on a second call
      assert(java.util.Arrays.equals(repair(mk, codec)._2, out))
    }
  }

  test("trim removes exactly the padded endpoints (within resample rounding)") {
    val padded = ClipsGenerator.paddedBytes(11L, 25, 15, 20)
    val (sr, raw) = AudioCodec.decode(padded, "pcm_s16le")
    val (lead, trail) = AudioTrim.endpoints(raw)
    val expected = (raw.length - lead - trail).toLong * sr16 / sr
    val (_, out) = repair(padded)
    assert(math.abs(out.length - expected) <= 2,
      s"repaired ${out.length} vs expected $expected")
  }

  test("repairedTable: consistent PCM rows the input schema's consumers can read") {
    import spark.implicits._
    val clips = ClipsGenerator
      .clips(spark, 200, numPartitions = 4, withErrors = true, maxSynthMs = 25)
      .toDF()
    val rep = AudioRepair.repairedTable(clips)
    assert(rep.columns.toSeq === clips.columns.toSeq)
    val rows = rep.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec")
      .as[(String, Array[Byte], Int, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, bytes, sr, dur, codec) =>
      assert(codec === "pcm_s16le" && sr === sr16, id)
      val (dsr, samples) = AudioCodec.decode(bytes, codec)
      assert(dsr === sr16, id)
      assert(dur === samples.length.toLong * 1000 / sr16, id)
    }
  }

  test("post-repair censuses land every survivor in the clean band") {
    val clips = ClipsGenerator
      .clips(spark, 2000, numPartitions = 4, withErrors = true, maxSynthMs = 25)
      .toDF()
    val repaired = AudioRepair.repairedTable(clips).localCheckpoint()
    val n = repaired.count()
    assert(n > 1900) // only corrupt µ-law/A-law/flac rows drop at this n
    def one(df: org.apache.spark.sql.DataFrame, band: String): Unit = {
      val rows = df.collect()
      assert(rows.length === 1 && rows.head.getString(1) === band
        && rows.head.getLong(2) === n, rows.mkString("; "))
    }
    one(QualityCensus.census(repaired), "nominal")
    one(GainCheck.census(repaired), "normalize_ok")
    one(ContainerCheck.census(repaired), "ok")
  }

  test("plan: the action census exchanges only (codec, action, count) — never audio") {
    val clips = ClipsGenerator
      .clips(spark, 200, numPartitions = 4, withErrors = true, maxSynthMs = 10)
      .toDF()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchanges = AudioRepair.actionCensus(clips)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.output.map(_.name).toSeq
        }
      assert(exchanges.length === 1, exchanges.toString)
      assert(!exchanges.head.exists(c =>
        c.contains("bytes") || c.contains("transcript")), exchanges.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
