package graft.streaming

import graft.TestSpark
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming ingest classification vs a frozen corpus store: statuses must
  * equal the batch incremental classification's corpus verdicts over the
  * same rows (shared fingerprint definition), with window isolation. */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700002800000L + min * 60000L)

  lazy val corpus = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon"),
    (3L, "Alpha  Beta   Gamma"), // normalizes to doc 1's fingerprint
  ).toDF("doc_id", "text")

  test("streaming statuses equal the batch corpus verdicts; keeper carried") {
    implicit val sqlCtx = spark.sqlContext
    val store = Dedup.fingerprintStore(corpus, "doc_id", "text")
    val batchRows = Seq(
      (10L, "alpha beta gamma", ts(1)),   // dup_of_corpus, keeper 1
      (11L, "DELTA EPSILON", ts(2)),      // dup_of_corpus (normalized), 2
      (12L, "fresh content here", ts(3)), // new
      (13L, null.asInstanceOf[String], ts(4)), // NULL text → new, no keeper
    )
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingIngest.classify(df, "text", store)
      .select("doc_id", "status", "dup_of")
    val tmp = Files.createTempDirectory("graft-singest").toString
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("singest_eq")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(batchRows: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("singest_eq")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      10L -> (("dup_of_corpus", Some(1L))),
      11L -> (("dup_of_corpus", Some(2L))),
      12L -> (("new", None)),
      13L -> (("new", None))))
    // agreement with the batch path's corpus verdict on the same rows
    val batch = Dedup.incrementalExact(
      batchRows.map(r => (r._1, r._2)).toDF("doc_id", "text"),
      "doc_id", "text", store)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    for ((id, (st, _)) <- got if st == "dup_of_corpus")
      assert(batch(id) === "dup_of_corpus", id.toString)
  }

  test("windowed counts: per-window isolation, statuses summed correctly") {
    implicit val sqlCtx = spark.sqlContext
    val store = Dedup.fingerprintStore(corpus, "doc_id", "text")
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingIngest.classifyCounts(df, "text", store,
      "ts", "1 hour", "10 minutes")
    val tmp = Files.createTempDirectory("graft-singest2").toString
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("singest_win")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData(
      (20L, "alpha beta gamma", ts(5)),
      (21L, "novel one", ts(6)),
      (22L, "novel two", ts(7)),
      (23L, "delta epsilon", ts(90))) // next hour window
    q.processAllAvailable()
    q.stop()
    val got = spark.table("singest_win")
      .select(col("window.start").cast("long"), col("status"), col("docs"))
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val starts = got.keys.map(_._1).toSeq.distinct.sorted
    assert(starts.length === 2)
    assert(got((starts(0), "dup_of_corpus")) === 1L)
    assert(got((starts(0), "new")) === 2L)
    assert(got((starts(1), "dup_of_corpus")) === 1L)
    assert(!got.contains((starts(1), "new")))
  }
}
