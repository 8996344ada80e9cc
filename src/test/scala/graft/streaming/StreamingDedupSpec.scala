package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("dropDuplicatesWithinWatermark keeps first occurrence per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Int)]
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    val deduped = StreamingDedup.dedupWithinWatermark(
      input.toDF().toDF("doc_id", "ts", "payload"), Seq("doc_id"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(("a", ts(0), 1), ("b", ts(1), 2), ("a", ts(2), 3))
    q.processAllAvailable()
    input.addData(("a", ts(3), 4), ("c", ts(4), 5))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sdedup").collect()
      .map(r => (r.getString(0), r.getInt(2))).toSet
    // first occurrence of each key wins; in-horizon repeats dropped
    assert(out === Set(("a", 1), ("b", 2), ("c", 5)))
  }

  test("flatMapGroupsWithState duplicate counter emits recurring keys only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val tmp = Files.createTempDirectory("graft-sdup").toString
    val counts = StreamingDedup.duplicateCounts(
      input.toDF().toDF("fp", "ts"), "fp", "ts")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("sdup")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(("x", ts(0)), ("y", ts(1)), ("x", ts(2)))
    q.processAllAvailable()
    input.addData(("x", ts(3)), ("z", ts(4)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sdup").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // batch 1: x seen twice -> (x,2); y single -> silent.
    // batch 2: x again -> (x,3); z single -> silent. State carried across.
    assert(out === Set(("x", 2L), ("x", 3L)))
  }

  test("poison pill: unparseable event time doesn't kill the monitor (r3 verdict #1)") {
    // a row whose timestamp fails the cast arrives as NULL; before the
    // null-ts guard it reached flatMapGroupsWithState and
    // batch.map(_._2.getTime).max threw an NPE that terminated the whole
    // ingest-dedup query. The malformed row must be dropped and the valid
    // duplicates still counted.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val tmp = Files.createTempDirectory("graft-spoison").toString
    def iso(min: Int) = ts(min).toString // "2023-11-14 22:13:20.0" — castable
    val counts = StreamingDedup.duplicateCounts(
      input.toDF().toDF("fp", "ts"), "fp", "ts")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("spoison")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(("x", iso(0)), ("x", iso(2)), ("bad", "not-a-timestamp"))
    q.processAllAvailable()
    input.addData(("x", iso(3)), ("bad", "also-unparseable"))
    q.processAllAvailable()
    q.stop()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    val out = spark.table("spoison").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("x", 2L), ("x", 3L)))
  }

  test("foldBatch is iterator-only: never buffers the key's batch (r4 verdict #2)") {
    // The pin: the iterator re-yields the SAME mutable Timestamp object,
    // re-set before each yield. A single-pass fold reads each event time at
    // yield time and finds the true max (9); any implementation that
    // buffers the batch first (the old rows.toSeq) sees N references to one
    // object holding the FINAL value and reports 3 — deterministic failure.
    val shared = new Timestamp(0L)
    val times = Seq(5L, 9L, 3L)
    val it = times.iterator.map { t => shared.setTime(t); ("k", shared) }
    val (count, maxMs) = StreamingDedup.foldBatch(it)
    assert(count === 3L)
    assert(maxMs === 9L)
    // empty batch (hasTimedOut callbacks never reach the fold, but the
    // helper's contract is total): count 0, sentinel max
    assert(StreamingDedup.foldBatch(Iterator.empty) === ((0L, Long.MinValue)))
  }
}
