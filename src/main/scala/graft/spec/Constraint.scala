package graft.spec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative per-column constraint vocabulary.
  *
  * Mirrors the constraint keys the reference compares schema-vs-schema
  * (`/root/reference/src/fastdataframe/core/types.py:53-83`: minimum, maximum,
  * exclusiveMinimum, exclusiveMaximum, multipleOf, minLength, maxLength,
  * pattern, minItems, maxItems, uniqueItems) plus the `ColumnInfo` fields
  * (`core/annotation.py:20-23`) and `NotNull` (derived from non-Optional,
  * `polars/model.py:397-408`). The reference never enforces these against
  * *data* (`polars/model.py:388` "Future versions will support additional
  * validation rules"); here every constraint compiles to a codegen-friendly
  * Catalyst predicate via [[Constraint.holds]] so a single distributed
  * projection evaluates the full suite per row.
  *
  * Null semantics: every constraint except [[NotNull]] passes on NULL input —
  * nullability is exclusively NotNull's job, so constraints compose without
  * double-reporting a null row.
  */
sealed trait Constraint extends Serializable {
  /** Stable identifier used in violation rows (north rule:
    * `(clip_id, constraint_id, observed_value)`). */
  def id: String

  /** Predicate that is TRUE iff the value passes this constraint.
    * Must never evaluate to NULL (so `!holds` is a safe violation filter). */
  def holds(c: Column): Column

  /** Non-null-aware core predicate; wrapped by [[holds]]. */
  protected def pred(c: Column): Column

  /** JSON-schema constraint key/value for the subset lattice; None if the
    * constraint has no JSON-schema counterpart. */
  def jsonKey: Option[(String, Any)] = None
}

/** Base for constraints that pass on NULL.
  *
  * `holds` is `c.isNull || pred(c)` WITHOUT a coalesce guard: every built-in
  * predicate below is non-null for non-null input, and keeping the negation
  * as a plain comparison lets Catalyst push `NOT (col <= k)`-style filters
  * into the parquet scan for row-group skipping (a coalesce wrapper was
  * measured to block PushedFilters entirely). [[Check]], whose user-supplied
  * predicate may be null-producing, adds its own guard. */
sealed trait NullPassing extends Constraint {
  def holds(c: Column): Column = c.isNull || pred(c)
}

/** Required (non-Optional) field — ref `polars/model.py:411-425`,
  * error_type "null_in_required_field". */
case object NotNull extends Constraint {
  val id = "not_null"
  protected def pred(c: Column): Column = c.isNotNull
  def holds(c: Column): Column = c.isNotNull
}

/** Numeric bounds as a Catalyst literal preserving BOTH exactness and scan
  * pushdown: an integral bound stays an integral literal (Long-vs-Long
  * comparison is exact past 2^53, where the former Double bound silently
  * rounded — `Minimum(9007199254740993L)` was unrepresentable), while a
  * fractional bound becomes a double literal (a Decimal literal would make
  * type coercion cast the COLUMN to decimal, which blocks the parquet
  * PushedFilters that PlanShapeSpec pins). Callers still write plain
  * numbers: `Minimum(0.05)` / `Minimum(8000)` via scala.math.BigDecimal's
  * standard implicit widenings. */
private[spec] object Bound {
  def toLit(v: BigDecimal): Column =
    if (v.isValidLong) lit(v.toLongExact)
    // whole numbers beyond Long (e.g. the uint64 max bound for a
    // Decimal(20,0) column) stay EXACT as a Decimal literal — a Double here
    // would round 2^64−1 up to 2^64 and silently accept out-of-range
    // values. Decimal-vs-decimal comparison keeps exactness and pushdown;
    // the (rare) decimal bound on a non-decimal column trades pushdown for
    // correctness.
    else if (v.isWhole && v.precision <= 38) lit(v.underlying)
    else lit(v.toDouble)
}

/** value >= v — JSON-schema `minimum` (`core/types.py:53`). */
final case class Minimum(v: BigDecimal) extends NullPassing {
  val id = "minimum"
  protected def pred(c: Column): Column = c >= Bound.toLit(v)
  override def jsonKey = Some("minimum" -> v)
}

/** value <= v — JSON-schema `maximum`. */
final case class Maximum(v: BigDecimal) extends NullPassing {
  val id = "maximum"
  protected def pred(c: Column): Column = c <= Bound.toLit(v)
  override def jsonKey = Some("maximum" -> v)
}

/** value > v — JSON-schema `exclusiveMinimum`. */
final case class ExclusiveMinimum(v: BigDecimal) extends NullPassing {
  val id = "exclusive_minimum"
  protected def pred(c: Column): Column = c > Bound.toLit(v)
  override def jsonKey = Some("exclusiveMinimum" -> v)
}

/** value < v — JSON-schema `exclusiveMaximum`. */
final case class ExclusiveMaximum(v: BigDecimal) extends NullPassing {
  val id = "exclusive_maximum"
  protected def pred(c: Column): Column = c < Bound.toLit(v)
  override def jsonKey = Some("exclusiveMaximum" -> v)
}

/** value % v == 0 — JSON-schema `multipleOf`. The reference never enforces
  * this on DATA at all (SURVEY.md §2.5: constraint keys are compared
  * schema-vs-schema only); its closest analog is the schema-compat
  * superset check `core/types.py:66-71`, which takes the remainder of the
  * two SCHEMA values in Decimal arithmetic (`r % Decimal(str(l)) == 0`).
  * This row-level check — a north-rule extension — adopts the same
  * Decimal-exact arithmetic for row values, which is also what a Python
  * validator doing `Decimal(str(x)) % Decimal(str(v))` would compute.
  * Integral divisors keep the exact integer remainder. Fractional divisors
  * take the remainder in DECIMAL arithmetic: double remainder is wrong
  * there (`0.3 % 0.1` is nonzero in binary floating point, so it would
  * flag 0.3 as a violation of MultipleOf(0.1) where Decimal passes it). The value reaches the decimal
  * mod through its shortest decimal rendering (Spark's double→string emits
  * "0.3", exactly what Python's Decimal(str(x)) would see) — casting the
  * double BITS to decimal directly would either round 0.35→0.4 at the
  * divisor's scale or preserve the binary noise 0.2999…988 at high scale,
  * both wrong. The cast applies to the mod input only; no pushdown exists
  * for `%` anyway, so nothing is lost at the scan. Values whose decimal
  * image overflows Decimal(38,18) (|x| ≳ 1e20, plus NaN/Inf) fall back to
  * the double remainder (NaN % v = NaN ≠ 0 ⇒ violation, as before). */
final case class MultipleOf(v: BigDecimal) extends NullPassing {
  require(v != 0, "multipleOf divisor must be non-zero")
  val id = "multiple_of"
  protected def pred(c: Column): Column =
    if (v.isValidLong) (c % Bound.toLit(v)) === lit(0)
    else {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}
      // try_cast: NaN/Inf/overflow decimal images become NULL (→ the
      // double-mod fallback) instead of an ANSI CAST_INVALID_INPUT abort.
      // The image is trusted only if it ROUND-TRIPS: Decimal(38,18)
      // silently rounds scale (1e-19 → 0E-18, which would wrongly PASS any
      // divisor), it does not null it. Both round-trip sides go through
      // the STRING rendering — comparing against `c.cast(double)` directly
      // would widen a FloatType column (0.2f → 0.20000000298…) and
      // spuriously fail the guard for every float, while the string of a
      // float is its own shortest repr ("0.2") on both sides. On mismatch:
      // double mod (1e-19 % 0.5 ≠ 0 ⇒ violation, the Decimal answer).
      // Known bound: a DECIMAL column with scale > 18 is evaluated at
      // scale 18 (its string parses to the same double either way, so the
      // loss is undetectable here) — >18 fractional digits is beyond any
      // float/double input and beyond the reference's test space.
      val str = c.cast(StringType)
      val dec = str.try_cast(DecimalType(38, 18))
      when(dec.isNotNull && dec.cast(DoubleType) === str.try_cast(DoubleType),
        (dec % lit(v.underlying)) === lit(0))
        .otherwise((c % lit(v.toDouble)) === lit(0))
    }
  override def jsonKey = Some("multipleOf" -> v)
}

/** length(value) >= n — JSON-schema `minLength` (`core/types.py:215-217`). */
final case class MinLength(n: Int) extends NullPassing {
  val id = "min_length"
  protected def pred(c: Column): Column = length(c) >= lit(n)
  override def jsonKey = Some("minLength" -> n)
}

/** length(value) <= n — JSON-schema `maxLength`. */
final case class MaxLength(n: Int) extends NullPassing {
  val id = "max_length"
  protected def pred(c: Column): Column = length(c) <= lit(n)
  override def jsonKey = Some("maxLength" -> n)
}

/** value RLIKE regex — JSON-schema `pattern` (`core/types.py:72-77`). */
final case class Pattern(regex: String) extends NullPassing {
  val id = "pattern"
  protected def pred(c: Column): Column = c.rlike(regex)
  override def jsonKey = Some("pattern" -> regex)
}

/** value ∈ values — JSON-schema `enum`. Spec-level vocabulary check
  * (e.g. codec ∈ {pcm_s16le, flac, pcm_mulaw, pcm_alaw} per FIXTURES.md §1). */
final case class InSet(values: Seq[Any]) extends NullPassing {
  val id = "in_set"
  protected def pred(c: Column): Column = c.isin(values: _*)
  override def jsonKey = Some("enum" -> values)
}

/** size(array) >= n — JSON-schema `minItems` (`core/types.py:86-104`). */
final case class MinItems(n: Int) extends NullPassing {
  val id = "min_items"
  protected def pred(c: Column): Column = size(c) >= lit(n)
  override def jsonKey = Some("minItems" -> n)
}

/** size(array) <= n — JSON-schema `maxItems`. */
final case class MaxItems(n: Int) extends NullPassing {
  val id = "max_items"
  protected def pred(c: Column): Column = size(c) <= lit(n)
  override def jsonKey = Some("maxItems" -> n)
}

/** array elements pairwise distinct — JSON-schema `uniqueItems`. */
case object UniqueItems extends NullPassing {
  val id = "unique_items"
  protected def pred(c: Column): Column = size(array_distinct(c)) === size(c)
  override def jsonKey = Some("uniqueItems" -> true)
}

/** Arbitrary SQL predicate escape hatch; `mkPred` must be a pure Column
  * function of the column (used e.g. for the dur_ms>0 AND dur_ms<=30000
  * compound in one constraint id). User predicates may evaluate to NULL on
  * non-null input, so this one keeps the coalesce guard. */
final case class Check(id: String, mkPred: Column => Column) extends NullPassing {
  protected def pred(c: Column): Column = mkPred(c)
  override def holds(c: Column): Column =
    c.isNull || coalesce(mkPred(c), lit(false))
}
