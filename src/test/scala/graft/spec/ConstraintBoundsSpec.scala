package graft.spec

import graft.TestSpark
import graft.validate.RowValidator
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 verdict fixes #6/#10: numeric bounds as BigDecimal —
  * (a) non-integer `multipleOf` divisors match `core/types.py:66-71`
  * semantics (arbitrary numerics divide), (b) integral bounds stay EXACT
  * past 2^53, where the former Double representation silently rounded. */
class ConstraintBoundsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def violators(df: org.apache.spark.sql.DataFrame, c: Constraint,
      colName: String = "v"): Seq[Any] =
    df.where(!c.holds(col(colName))).collect().map(_.get(0)).toSeq

  test("fractional multipleOf divisors (0.5, 0.25) — decimal-mod semantics") {
    val df = Seq(1.0, 1.25, 1.3, 2.5, 0.75).toDF("v")
    // 0.5 divides 1.0 and 2.5; 1.25/1.3/0.75 violate
    assert(violators(df, MultipleOf(0.5)) === Seq(1.25, 1.3, 0.75))
    // 0.25 divides everything here except 1.3 (Decimal('1.3') % Decimal(
    // '0.25') != 0, matching the reference's core/types.py:66-71)
    assert(violators(df, MultipleOf(0.25)) === Seq(1.3))
  }

  test("fractional multipleOf passes the classic binary-float traps (r3 verdict #3)") {
    // 0.3 % 0.1 and 1.05 % 0.05 are NONZERO in binary floating point but
    // zero in the reference's Decimal arithmetic — the double-mod
    // implementation wrongly flagged them. 0.35 % 0.1 must still violate
    // (a scale-1 rounding of the value would round 0.35→0.4 and pass it).
    val df = Seq(0.3, 0.35, 0.7, 1.0).toDF("v")
    assert(violators(df, MultipleOf(0.1)) === Seq(0.35))
    assert(violators(Seq(1.05, 1.07).toDF("v"), MultipleOf(0.05)) === Seq(1.07))
    // ref core/types.py doctest shape: 5 % Decimal('2.5') == 0
    assert(violators(Seq(5.0, 6.0).toDF("v"), MultipleOf(2.5)) === Seq(6.0))
    // integer columns against a fractional divisor go through the same
    // exact decimal path
    assert(violators(Seq(1L, 2L).toDF("v"), MultipleOf(0.5)) === Seq())
  }

  test("fractional multipleOf: sub-scale values are not rounded into passing") {
    // Decimal(38,18) ROUNDS scale rather than nulling: 1e-19 → 0E-18,
    // which as "0" would wrongly pass any divisor. The round-trip guard
    // (decimal image must cast back to the same double) detects the loss
    // and falls back to double mod ⇒ violation, matching Decimal('1E-19')
    // % Decimal('0.5') != 0.
    val df = Seq(1e-19, 2.5e-19, 0.5, 0.0).toDF("v")
    val bad = violators(df, MultipleOf(0.5))
    assert(bad.toSet === Set(1e-19, 2.5e-19))
    // 19-significant-fractional-digit values also lose scale; must violate
    // (Decimal mod of the full-precision value is nonzero)
    assert(violators(Seq(0.0012345678901234567).toDF("v"),
      MultipleOf(0.1)) === Seq(0.0012345678901234567))
  }

  test("fractional multipleOf on FLOAT columns (round-trip guard must not widen)") {
    // 0.2f widened to double is 0.20000000298… — a guard comparing against
    // c.cast(double) directly would spuriously fail and flag every float.
    // The string-routed compare sees "0.2" on both sides, so Decimal("0.2")
    // % 0.1 == 0 ⇒ pass, matching the reference's Decimal(str(x)) answer.
    val df = Seq(0.2f, 0.3f, 0.25f).toDF("v")
    assert(violators(df, MultipleOf(0.1)) === Seq(0.25f))
    assert(violators(df, MultipleOf(0.05)) === Seq())
  }

  test("fractional multipleOf edge inputs: NaN/Inf fall back safely, no NULLs") {
    // NaN/Inf have no decimal image → double-mod fallback: NaN % v = NaN ≠ 0
    // ⇒ violation (a non-numeric duration is never a valid multiple), and
    // `holds` keeps its never-NULL contract on every row
    val df = Seq(Double.NaN, Double.PositiveInfinity, 1e30, 0.2).toDF("v")
    val bad = violators(df, MultipleOf(0.1))
    assert(bad.exists(v => v.asInstanceOf[Double].isNaN))
    assert(bad.exists(v => v.asInstanceOf[Double].isPosInfinity))
    assert(!bad.contains(0.2)) // exact decimal multiple stays clean
    // the huge-magnitude fallback row (1e30 overflows Decimal(38,18)) must
    // produce a definite boolean either way — count pass+fail == all rows
    val held = df.where(MultipleOf(0.1).holds(col("v"))).count()
    assert(held + bad.size === 4)
  }

  test("integral multipleOf keeps exact integer remainder on longs") {
    val big = 3000000000000000000L // > 2^53 * 256: double math would alias
    val df = Seq(big, big + 1).toDF("v")
    assert(violators(df, MultipleOf(2)) === Seq(big + 1))
  }

  test("Minimum bound >2^53 distinguishes adjacent longs (was Double-lossy)") {
    val b = 9007199254740993L // 2^53 + 1: not representable as Double
    val df = Seq(b - 1, b, b + 1).toDF("v")
    // with a Double bound, 2^53 and 2^53+1 collapse to the same literal and
    // b-1 would (wrongly) pass; the Long literal keeps the exact cut
    assert(violators(df, Minimum(b)) === Seq(b - 1))
    assert(violators(df, ExclusiveMinimum(b)) === Seq(b - 1, b))
  }

  test("Maximum at Long.MaxValue-adjacent values stays exact") {
    val m = Long.MaxValue
    val df = Seq(m, m - 1, m - 2).toDF("v")
    assert(violators(df, Maximum(m - 1)).toSet === Set(m))
    assert(violators(df, ExclusiveMaximum(m - 1)).toSet === Set(m, m - 1))
  }

  test("whole bounds beyond Long stay exact (uint64-max on Decimal(20,0))") {
    import org.apache.spark.sql.functions.col
    val mx = BigDecimal("18446744073709551615") // 2^64 − 1: > Long.MaxValue
    // a Double bound would round this UP to 2^64 and accept mx+1
    val df = Seq("18446744073709551614", "18446744073709551615",
      "18446744073709551616").toDF("s")
      .select(col("s").cast(org.apache.spark.sql.types.DecimalType(20, 0)).as("v"))
    val bad = df.where(!Maximum(mx).holds(col("v"))).collect().map(_.get(0).toString)
    assert(bad === Array("18446744073709551616"))
    val low = df.where(!Minimum(mx).holds(col("v"))).collect().map(_.get(0).toString)
    assert(low === Array("18446744073709551614"))
  }

  test("double columns keep the old behavior with fractional bounds") {
    val df = Seq(0.04, 0.05, 0.06).toDF("v")
    assert(violators(df, Maximum(0.05)) === Seq(0.06))
    assert(violators(df, Minimum(0.05)) === Seq(0.04))
  }

  test("BigDecimal bounds surface in the JSON-schema lattice") {
    import graft.schema.SchemaValidator
    import org.json4s._
    val c = ColumnSpec("v", DoubleType,
      constraints = Seq(Minimum(0.5), Maximum(10), MultipleOf(0.25)))
    val js = SchemaValidator.columnToJsonSchema(c)
    assert(js \ "minimum" === JDecimal(BigDecimal("0.5")))
    assert(js \ "maximum" === JInt(10)) // whole values render as integers
    assert(js \ "multipleOf" === JDecimal(BigDecimal("0.25")))
  }

  test("full-suite integration: fractional multipleOf in RowValidator") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("v", DoubleType, constraints = Seq(MultipleOf(0.5)))))
    val run = RowValidator.validate(Seq(1.0, 1.3).toDF("v"), spec)
    val ids = run.violations.collect().map(_.getAs[String]("constraint_id"))
    assert(ids === Array("multiple_of"))
  }
}
