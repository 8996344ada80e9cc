package graft.cast

import graft.TestSpark
import graft.spec._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The remaining rows of the reference's string→numeric cast matrix
  * (`/root/reference/tests/polars/test_cast_functions.py:16-122,336-394`):
  * unsigned + Int128 targets with bound values and overflow errors, empty
  * strings, scientific notation. Spark has no unsigned/128-bit ints, so the
  * targets are the documented narrowings (SURVEY §1.3) with strict range
  * guards (CastPlanner.integralHints); Int128 is range-limited to ±(10³⁸−1),
  * Spark's widest exact integral — a documented deviation. */
class IntegralCastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def castOne(hint: String, values: Seq[String]): Seq[Any] = {
    val spec = TableSpec("t", Seq(CastPlanner.integralColumn("value", hint, nullable = true)))
    CastPlanner(values.toDF("value"), spec).collect().map(_.get(0)).toSeq
  }

  private def castFails(hint: String, value: String): Boolean =
    try { castOne(hint, Seq(value)); false }
    catch { case _: Exception => true }

  // happy-path bound rows of tests/polars/test_cast_functions.py:49-68
  test("uint8 bounds (0, 255, 100) → ShortType") {
    assert(castOne("uint8", Seq("0", "255", "100")) === Seq(0.toShort, 255.toShort, 100.toShort))
  }
  test("uint16 bounds (0, 65535, 100) → IntegerType") {
    assert(castOne("uint16", Seq("0", "65535", "100")) === Seq(0, 65535, 100))
  }
  test("uint32 bounds (0, 4294967295, 100) → LongType") {
    assert(castOne("uint32", Seq("0", "4294967295", "100")) === Seq(0L, 4294967295L, 100L))
  }
  test("uint64 bounds incl. 2^64-1 → DecimalType(20,0)") {
    val got = castOne("uint64", Seq("0", "18446744073709551615", "100"))
    assert(got.map(_.toString) === Seq("0", "18446744073709551615", "100"))
    val spec = TableSpec("t", Seq(CastPlanner.integralColumn("value", "uint64")))
    assert(CastPlanner(Seq("1").toDF("value"), spec).schema("value").dataType ===
      DecimalType(20, 0))
  }
  test("int128 → DecimalType(38,0), ±(10^38-1) supported") {
    val hi = "9" * 38
    val got = castOne("int128", Seq(hi, s"-$hi", "0"))
    assert(got.map(_.toString) === Seq(hi, s"-$hi", "0"))
  }

  // error rows (:103-122) — strict: overflow and malformed strings raise
  test("uint8 overflow/underflow/malformed raise") {
    assert(castFails("uint8", "256"))
    assert(castFails("uint8", "-1"))
    assert(castFails("uint8", "abc"))
  }
  test("uint64 overflow raises (2^64)") {
    assert(castFails("uint64", "18446744073709551616"))
  }
  test("int128 true 2^127-1 extreme raises (documented 38-digit deviation)") {
    assert(castFails("int128", "170141183460469231731687303715884105727"))
  }
  test("non-integer strings raise for integral hints (no silent rounding)") {
    assert(castFails("uint32", "1.5"))
    assert(castFails("int128", "1.5"))
    assert(castFails("uint32", ""))
  }
  test("range guard also fires for NUMERIC sources feeding a hinted column") {
    // regression: a non-string source used to fall through to the generic
    // cast, bypassing the unsigned range promise entirely
    val spec = TableSpec("t", Seq(CastPlanner.integralColumn("value", "uint8")))
    val okDf = CastPlanner(Seq(300).toDF("value").selectExpr("CAST(value AS INT) AS value"), spec)
    assertThrows[Exception] { okDf.collect() }
    val fine = CastPlanner(Seq(200).toDF("value").selectExpr("CAST(value AS INT) AS value"), spec)
    assert(fine.collect().map(_.get(0)).toSeq === Seq(200.toShort))
  }

  test("whitespace is trimmed; nulls pass through (:352-380)") {
    assert(castOne("uint16", Seq(" 1 ", "  2", "3  ")) === Seq(1, 2, 3))
    val spec = TableSpec("t", Seq(CastPlanner.integralColumn("value", "uint16", nullable = true)))
    val got = CastPlanner(Seq(Some("1"), None, Some("3")).toDF("value"), spec)
      .collect().map(r => Option(r.get(0)))
    assert(got === Seq(Some(1), None, Some(3)))
  }

  // edge rows :336-394 for the plain numeric paths
  test("empty string raises for plain int target (:103-122 row 1)") {
    val spec = TableSpec("t", Seq(ColumnSpec("value", LongType, nullable = true)))
    assertThrows[Exception] {
      CastPlanner(Seq("").toDF("value"), spec).collect()
    }
  }
  test("scientific notation parses for float targets (:382-394)") {
    val spec = TableSpec("t", Seq(ColumnSpec("value", DoubleType, nullable = true)))
    val got = CastPlanner(Seq("1e2", "2.5e-3", "3.14e+1").toDF("value"), spec)
      .collect().map(_.getDouble(0))
    assert(got === Seq(100.0, 0.0025, 31.4))
  }
  test("float32 target parses with single precision (:70-77)") {
    val spec = TableSpec("t", Seq(ColumnSpec("value", FloatType, nullable = true)))
    val got = CastPlanner(Seq("1.5", "2.7", "3.14").toDF("value"), spec)
      .collect().map(_.getFloat(0))
    assert(got.zip(Seq(1.5f, 2.7f, 3.14f)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  // round-2 ADVICE: fractional NUMERIC sources keep the same no-silent-
  // rounding contract as strings — a Double 1.5 feeding a hinted integral
  // column must raise (it previously cast to Decimal(38,0) as 2 and passed)
  private def hintedFromNumeric[T](hint: String, df: org.apache.spark.sql.DataFrame): Seq[Any] = {
    val spec = TableSpec("t", Seq(CastPlanner.integralColumn("value", hint, nullable = true)))
    CastPlanner(df, spec).collect().map(_.get(0)).toSeq
  }
  test("double source: integral values cast, fractional values raise") {
    assert(hintedFromNumeric("uint8", Seq(2.0, 255.0).toDF("value")) ===
      Seq(2.toShort, 255.toShort))
    assertThrows[Exception] {
      hintedFromNumeric("uint8", Seq(1.5).toDF("value"))
    }
  }
  test("decimal source with scale: 2.00 casts, 1.50 raises") {
    val dec = Seq("2.00", "1.00").toDF("value")
      .select(col("value").cast(DecimalType(10, 2)).as("value"))
    assert(hintedFromNumeric("uint16", dec).map(_.toString) === Seq("2", "1"))
    val bad = Seq("1.50").toDF("value")
      .select(col("value").cast(DecimalType(10, 2)).as("value"))
    assertThrows[Exception] { hintedFromNumeric("uint16", bad) }
  }
  test("integral sources are untouched by the guard (long → uint32)") {
    assert(hintedFromNumeric("uint32", Seq(7L, 4294967295L).toDF("value")) ===
      Seq(7L, 4294967295L))
    // out-of-range long still raises via the range guard
    assertThrows[Exception] {
      hintedFromNumeric("uint32", Seq(-1L).toDF("value"))
    }
  }
  test("fractional-source null passes through untouched") {
    val df = Seq(Some(2.0), None).toDF("value")
    assert(hintedFromNumeric("uint8", df).map(Option(_)) ===
      Seq(Some(2.toShort), None))
  }
  test("huge double beyond Decimal(38,0) raises the LIBRARY range error (r3 advice)") {
    // 1e40 is integral by representation (passes the % 1 guard) and
    // previously fell into Spark's generic ANSI CAST_OVERFLOW from the
    // Decimal(38,0) parse; the magnitude pre-guard must surface the
    // intended 'str_to_<hint>: value out of range' message instead
    val e = intercept[Exception] {
      hintedFromNumeric("uint64", Seq(1e40).toDF("value"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("str_to_uint64: value out of range")),
      s"got: ${msgs(e).mkString(" | ")}")
  }
  test("the 1e38 pre-guard boundary matches Spark's shortest-repr decimal cast (r4 advice)") {
    // Spark casts double→decimal through the SHORTEST DECIMAL RENDERING:
    // double(1e38) is "1.0E38" = 10^38 (39 digits — overflows Decimal(38,0)
    // and exceeds int128's ±(10^38−1)), so it must get the LIBRARY range
    // error from the `>=` pre-guard, not Spark's generic CAST_OVERFLOW…
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      hintedFromNumeric("int128", Seq(1e38).toDF("value"))
    }
    assert(msgs(e).exists(_.contains("str_to_int128: value out of range")),
      s"got: ${msgs(e).mkString(" | ")}")
    // …while nextDown(1e38) renders as 9.999999999999999e37 — 38 digits,
    // fits Decimal(38,0), inside int128's range — and must cast cleanly
    // (a `>` guard would be wrong one way; `>=` with the binary-exact-value
    // premise would be wrong the other).
    val below = math.nextDown(1e38)
    val ok = hintedFromNumeric("int128", Seq(below).toDF("value"))
    assert(ok.map(_.toString) ===
      Seq(new java.math.BigDecimal(java.lang.Double.toString(below))
        .toBigInteger.toString))
  }
}
