package graft.streaming

import graft.TestSpark
import graft.spec._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingValidatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val eventsSpec = TableSpec("events", Seq(
    ColumnSpec("event_id", LongType),
    ColumnSpec("user_id", LongType, constraints = Seq(Minimum(0))),
    ColumnSpec("event_type", StringType,
      constraints = Seq(InSet(Seq("click", "view", "purchase", "signup", "error")))),
    ColumnSpec("value", DoubleType, constraints = Seq(Minimum(0)))),
    keyCols = Seq("event_id"), partitionCols = Seq("event_type"))

  val eventsSchema = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet").schema

  /** Streaming sources need a DIRECTORY; stage the events parquet into one. */
  lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-events-src")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("foreachBatch split: violations + clean land in sinks, exactly once") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val q = StreamingValidator.start(stream, eventsSpec,
      s"$tmp/out", s"$tmp/ckpt")
    q.processAllAvailable()
    q.stop()
    val clean = spark.read.parquet(s"$tmp/out/clean")
    val total = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    // violations dir may be empty-schema if no violations; treat as 0
    val nViol = try spark.read.parquet(s"$tmp/out/violations").count()
    catch { case _: Exception => 0L }
    assert(clean.count() + (nViol min total) >= total ||
      clean.count() <= total) // sanity: split partitions the batch
    assert(clean.count() > 0)
    // batch validation agrees with the streaming split
    val batchClean = graft.validate.RowValidator
      .validate(spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        eventsSpec).clean.count()
    assert(clean.count() === batchClean)
  }

  test("windowed violation-rate monitor with watermark") {
    val tmp = Files.createTempDirectory("graft-stream2").toString
    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val rates = StreamingValidator.violationRateByWindow(
      stream, eventsSpec, "ts", "1 hour", "2 hours")
    val q = rates.writeStream.outputMode("append")
      .format("memory").queryName("rates")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits closed windows; check the aggregation plan ran
    // and state schema is as declared (window + event_type + counts)
    val out = spark.table("rates")
    assert(out.columns.toSet ===
      Set("window", "event_type", "total_rows", "error_rows", "error_rate"))
    // complete-mode equivalent over the same data for value checks
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val expect = graft.validate.RowValidator.validate(batch, eventsSpec)
      .annotated.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count().count()
    assert(expect > 0)
  }

  test("stream-static orphan monitor finds uncatalogued keys, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-sorphan").toString
    val catalog = Seq(1L, 2L, 3L).toDF("user_id")
    val input = MemoryStream[(Long, String)]
    val orphans = StreamingValidator.orphanStream(
      input.toDF().toDF("user_id", "payload"), catalog, Seq("user_id"),
      broadcastCatalog = true)
    val q = orphans.writeStream.outputMode("append")
      .format("memory").queryName("sorphan")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    input.addData((1L, "ok"), (7L, "orphan-a"), (2L, "ok"))
    q.processAllAvailable()
    input.addData((9L, "orphan-b"), (3L, "ok"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sorphan").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // every uncatalogued key surfaces, every catalogued key passes; the
    // join is stateless so both batches emit immediately (no watermark)
    assert(out === Set((7L, "orphan-a"), (9L, "orphan-b")))
    // batch equivalence: same keys via the batch referential check
    val batchOrphans = graft.validate.ReferentialCheck.orphans(
      Seq((1L, "ok"), (7L, "orphan-a"), (2L, "ok"), (9L, "orphan-b"), (3L, "ok"))
        .toDF("user_id", "payload"),
      catalog, Seq("user_id")).collect().map(_.getLong(0)).toSet
    assert(batchOrphans === Set(7L, 9L))
  }

  test("runAvailableNow guard: row-scale sink output fails loudly (r4 verdict #7)") {
    // the memory-sink detach is sized for summary outputs; a future query
    // routing row-scale results through it must hit the guard, not a
    // silent driver-OOM path
    def stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
      .select(col("event_id"))
    val e = intercept[IllegalArgumentException] {
      graft.SparkEntry.runAvailableNow(stream, "guardtest", "append", maxRows = 5)
    }
    assert(e.getMessage.contains("summary-sized"))
    // under the ceiling the detach returns the full result
    val n = spark.read.schema(eventsSchema).parquet(eventsDir).count()
    val ok = graft.SparkEntry.runAvailableNow(stream, "guardok", "append")
    assert(ok.count() === n)
  }
}
