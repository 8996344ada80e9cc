package graft.validate

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CrossModalCheckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // (id, transcript, dur_ms) fixtures spanning every verdict class
  private lazy val rows = Seq(
    ("ok2wps", "two words spoken here", Some(2000)), // 4 tok / 2 s = 2 wps
    ("slow", "hi", Some(9000)),                      // 1 tok / 9 s ≈ 0.11
    ("fast", "a b c d e f g h i j k l", Some(250)),  // 12 tok / 0.25 s = 48
    ("nulltx", null, Some(1000)),
    ("nulldur", "some words", None),
    ("zerodur", "some words", Some(0)),
    ("lo-edge", "w", Some(2000)),                    // exactly 0.5 wps → ok
    ("hi-edge", Seq.fill(40)("w").mkString(" "), Some(1000)), // exactly 40 → ok
  ).toDF("clip_id", "transcript", "dur_ms")

  test("per-row verdicts cover ok / too_slow / too_fast / unscorable") {
    val got = CrossModalCheck.check(rows, Seq("clip_id"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("verdict")).toMap
    assert(got === Map(
      "ok2wps" -> "ok", "slow" -> "too_slow", "fast" -> "too_fast",
      "nulltx" -> "unscorable", "nulldur" -> "unscorable",
      "zerodur" -> "unscorable",
      // band edges are CLOSED: strict inequalities on exact doubles
      "lo-edge" -> "ok", "hi-edge" -> "ok"))
  }

  test("words_per_second is the exact integer ratio (engine-portable)") {
    val wps = CrossModalCheck.check(rows, Seq("clip_id"))
      .where(col("clip_id") === "ok2wps")
      .head().getAs[Double]("words_per_second")
    assert(wps === 2.0)
  }

  test("summary counts every class once per group") {
    val s = CrossModalCheck.summary(rows.withColumn("g", lit("all")), Seq("g"))
      .collect().head
    assert(s.getAs[Long]("total_rows") === 8L)
    assert(s.getAs[Long]("ok_rows") === 3L)
    assert(s.getAs[Long]("too_slow_rows") === 1L)
    assert(s.getAs[Long]("too_fast_rows") === 1L)
    assert(s.getAs[Long]("unscorable_rows") === 3L)
  }

  test("custom band tightens the verdicts") {
    val got = CrossModalCheck.check(rows, Seq("clip_id"),
      minWps = 1.0, maxWps = 3.0)
      .collect().map(r => r.getString(0) -> r.getAs[String]("verdict")).toMap
    assert(got("ok2wps") === "ok")
    assert(got("lo-edge") === "too_slow")  // 0.5 < 1.0 now
    assert(got("hi-edge") === "too_fast")  // 40 > 3.0 now
  }
}
