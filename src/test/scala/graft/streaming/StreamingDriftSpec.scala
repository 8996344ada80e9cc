package graft.streaming

import graft.TestSpark
import graft.validate.DriftCheck
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Windowed streaming drift monitor: per closed event-time window the
  * t-digest sketch is compared against a fixed reference — verdict
  * directionality pinned on deterministic planted data (same scheme as the
  * batch drift tests: self-comparison clean, shifted reference trips). */
class StreamingDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // epoch-hour-aligned base so each windowData batch falls in ONE tumbling
  // hour window (an unaligned base splits the batch across two windows,
  // correlating window membership with the value and faking drift)
  private def ts(min: Int) = new Timestamp(1700002800000L + min * 60000L)

  /** 200 values per hour-window, same uniform distribution in each window. */
  private def windowData(hourOffset: Int): Seq[(Timestamp, Double)] =
    (0 until 200).map(i => (ts(hourOffset * 60 + (i % 50)), (i % 100).toDouble))

  test("self-referenced stream: closed windows emit clean verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val tmp = Files.createTempDirectory("graft-sdrift").toString
    // reference = the same distribution the windows carry
    val ref = DriftCheck.digest(
      windowData(0).map(_._2).toDF("v"), "v")
    val out = StreamingDrift.monitor(input.toDF().toDF("ts", "v"),
      "ts", "v", groupCols = Nil, ref, "1 hour", "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdrift_clean")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(windowData(0) ++ windowData(1): _*)
    q.processAllAvailable()
    // push the watermark far past both windows so they close and emit
    input.addData((ts(10 * 60), 50.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sdrift_clean").collect()
    assert(rows.length >= 2, s"expected ≥2 closed windows, got ${rows.length}")
    // identical distribution per window vs reference → clean verdict
    assert(rows.forall(!_.getAs[Boolean]("drifted")),
      rows.map(r => (r.getDouble(1), r.getDouble(2))).mkString(","))
    assert(rows.forall(_.getAs[Double]("ks") < 0.1))
  }

  test("shifted reference trips the windowed verdict") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val tmp = Files.createTempDirectory("graft-sdrift2").toString
    // reference lives at +1000 — every window must flag drift
    val ref = DriftCheck.digest(
      windowData(0).map(x => x._2 + 1000.0).toDF("v"), "v")
    val out = StreamingDrift.monitor(input.toDF().toDF("ts", "v"),
      "ts", "v", groupCols = Nil, ref, "1 hour", "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdrift_shift")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(windowData(0): _*)
    q.processAllAvailable()
    input.addData((ts(10 * 60), 50.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sdrift_shift").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("drifted")))
    assert(rows.forall(_.getAs[Double]("ks") > 0.9)) // disjoint supports
  }

  test("group columns partition the verdict (per-codec windows)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val tmp = Files.createTempDirectory("graft-sdrift3").toString
    val ref = DriftCheck.digest(windowData(0).map(_._2).toDF("v"), "v")
    // codec "bad" carries a +1000-shifted distribution; "good" matches ref
    val good = windowData(0).map { case (t, v) => (t, "good", v) }
    val bad = windowData(0).map { case (t, v) => (t, "bad", v + 1000.0) }
    val out = StreamingDrift.monitor(input.toDF().toDF("ts", "codec", "v"),
      "ts", "v", groupCols = Seq("codec"), ref, "1 hour", "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdrift_grp")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(good ++ bad: _*)
    q.processAllAvailable()
    input.addData((ts(10 * 60), "good", 50.0))
    q.processAllAvailable()
    q.stop()
    val verdicts = spark.table("sdrift_grp").collect()
      .map(r => r.getAs[String]("codec") -> r.getAs[Boolean]("drifted")).toMap
    assert(verdicts.get("good").contains(false), verdicts.toString)
    assert(verdicts.get("bad").contains(true), verdicts.toString)
  }
}
