package graft.cast

import graft.TestSpark
import graft.spec._
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.sql.{Date, Timestamp}

/** Port of the cast-function matrix behaviors from
  * `/root/reference/tests/polars/test_cast_functions.py` (strict casts,
  * whitespace trim, exact-string bools, format-driven temporal parses,
  * null preservation). */
class CastPlannerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("str→numeric with trim (whitespace-tolerant, :86-89,336-394)") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", LongType)))
    val df = Seq("  42 ", "7", " -3").toDF("a")
    val out = CastPlanner(df, spec)
    assert(out.schema("a").dataType === LongType)
    assert(out.as[Long].collect().sorted === Array(-3L, 7L, 42L))
  }

  test("str→numeric strict: malformed value throws (ANSI, :103-122)") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", LongType)))
    val df = Seq("abc").toDF("a")
    intercept[Exception](CastPlanner(df, spec).collect())
  }

  test("str→numeric overflow throws (bounds rows of :16-101)") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", ByteType)))
    intercept[Exception](CastPlanner(Seq("300").toDF("a"), spec).collect())
    val ok = CastPlanner(Seq("127", "-128").toDF("a"), spec)
    assert(ok.as[Byte].collect().sorted === Array(-128.toByte, 127.toByte))
  }

  test("str→bool exact-string map with custom strings (:21-27)") {
    val spec = TableSpec("t", Seq(ColumnSpec("b", BooleanType, nullable = true,
      boolTrueString = "yes", boolFalseString = "no")))
    val out = CastPlanner(Seq(Some("yes"), Some("no"), None).toDF("b"), spec)
    assert(out.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      === Seq(true, false, null))
    // ANSI would accept "1"/"true"; the exact-string map must NOT
    intercept[Exception](
      CastPlanner(Seq("1").toDF("b"), spec).collect())
    intercept[Exception](
      CastPlanner(Seq("true").toDF("b"), spec).collect())
  }

  test("str→date honors date_format (:30-35 + format conversion)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("d", DateType, dateFormat = "%d/%m/%Y")))
    val out = CastPlanner(Seq("09/03/2024").toDF("d"), spec)
    assert(out.head().getDate(0) === Date.valueOf("2024-03-09"))
    val iso = TableSpec("t", Seq(ColumnSpec("d", DateType))) // default %Y-%m-%d
    assert(CastPlanner(Seq("2024-03-09").toDF("d"), iso).head().getDate(0)
      === Date.valueOf("2024-03-09"))
  }

  test("str→date strict: bad value throws") {
    val spec = TableSpec("t", Seq(ColumnSpec("d", DateType)))
    intercept[Exception](CastPlanner(Seq("not-a-date").toDF("d"), spec).collect())
  }

  test("str→datetime: time-part format parses with it, else generic cast (:38-53)") {
    val withTime = TableSpec("t", Seq(
      ColumnSpec("ts", TimestampNTZType, dateFormat = "%Y-%m-%d %H:%M:%S")))
    val out = CastPlanner(Seq("2024-03-09 12:34:56").toDF("ts"), withTime)
    assert(out.head().get(0).toString === "2024-03-09T12:34:56")
    // date-only format falls back to generic ISO cast
    val noTime = TableSpec("t", Seq(ColumnSpec("ts", TimestampNTZType)))
    val out2 = CastPlanner(Seq("2024-03-09T01:02:03").toDF("ts"), noTime)
    assert(out2.head().get(0).toString === "2024-03-09T01:02:03")
  }

  test("str→time honors time format (:56-76), Spark 4.1 TIME type") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("t", TimeType(), dateFormat = "%H:%M:%S")))
    val out = CastPlanner(Seq("12:34:56").toDF("t"), spec)
    assert(out.schema("t").dataType.isInstanceOf[TimeType])
    assert(out.head().get(0).toString === "12:34:56")
    // default parse when format has no time codes
    val iso = TableSpec("t", Seq(ColumnSpec("t", TimeType())))
    assert(CastPlanner(Seq("01:02:03").toDF("t"), iso)
      .head().get(0).toString === "01:02:03")
  }

  test("str→duration: int64 micros → interval (:79-83)") {
    val spec = TableSpec("t", Seq(ColumnSpec("d", DayTimeIntervalType())))
    val out = CastPlanner(Seq("1500000").toDF("d"), spec)
    assert(out.head().get(0) === java.time.Duration.ofMillis(1500))
  }

  test("str→binary is UTF-8 bytes (:293-307)") {
    val spec = TableSpec("t", Seq(ColumnSpec("b", BinaryType)))
    val out = CastPlanner(Seq("hello").toDF("b"), spec)
    assert(new String(out.head().getAs[Array[Byte]](0), "UTF-8") === "hello")
  }

  test("same-type columns are skipped; extra columns pass through") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", LongType)))
    val df = Seq((1L, "x")).toDF("a", "extra")
    assert(CastPlanner.plan(spec, df.schema).isEmpty)
    val out = CastPlanner(df, spec)
    assert(out.columns.toSeq === Seq("a", "extra"))
  }

  test("missing model column raises (polars/model.py:331)") {
    val spec = TableSpec("t", Seq(ColumnSpec("nope", LongType)))
    val e = intercept[IllegalArgumentException](
      CastPlanner(Seq(1L).toDF("a"), spec))
    assert(e.getMessage === "Column nope not found in source schema")
  }

  test("int64→float64 simple cast (registry :110)") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", DoubleType)))
    val out = CastPlanner(Seq(3L).toDF("a"), spec)
    assert(out.head().getDouble(0) === 3.0)
  }

  test("str→decimal (:98-101) with default-ish precision") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", DecimalType(10, 2))))
    val out = CastPlanner(Seq("123.45").toDF("a"), spec)
    assert(out.head().getDecimal(0) === new java.math.BigDecimal("123.45"))
  }

  test("null values are preserved through casts (:336-394)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("a", LongType, nullable = true),
      ColumnSpec("d", DateType, nullable = true)))
    val df = Seq((Some(" 5"), Some("2024-01-01")), (None, None))
      .toDF("a", "d")
    val out = CastPlanner(df, spec).orderBy(col("a").asc_nulls_last)
    val rows = out.collect()
    assert(rows(0).getLong(0) === 5L)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("rename between alias views, only columns present (model.py:184-243)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("a", LongType, serializationAlias = Some("A")),
      ColumnSpec("b", LongType, serializationAlias = Some("B"))))
    val df = Seq((1L, 2L)).toDF("a", "x")
    val out = CastPlanner.rename(df, spec,
      from = AliasType.Validation, to = AliasType.Serialization)
    assert(out.columns.toSeq === Seq("A", "x"))
  }
}
