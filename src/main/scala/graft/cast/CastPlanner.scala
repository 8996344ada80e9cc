package graft.cast

import graft.spec._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed-ingestion planner: builds one fused projection of strict cast
  * expressions per model column, dispatching on the (source, target) type
  * pair like the reference's `custom_cast_functions` registry
  * (`/root/reference/src/fastdataframe/polars/_cast_functions.py:104-131`)
  * with fallback `simple_cast` (:15-18), driven by
  * `PolarsFastDataframeModel.cast` (`polars/model.py:245-349`).
  *
  * Strictness: all casts are strict (fail on malformed value) like the
  * reference's `strict=True` — on Spark that is ANSI mode
  * (`spark.sql.ansi.enabled=true`, default in Spark 4.x). The one place ANSI
  * is MORE permissive than the reference is string→boolean (ANSI accepts
  * "1"/"yes"/"t" etc.), so [[strToBool]] is an explicit exact-string map with
  * a `raise_error` branch (parity with `replace_strict`,
  * `_cast_functions.py:21-27`).
  *
  * Columns already at the target type are skipped at expression-build time
  * (`polars/model.py:332-333`); Catalyst's `SimplifyCasts`+`CollapseProject`
  * would fold them anyway, but skipping keeps `explain()` clean. The whole
  * result is a single narrow projection that Catalyst pushes into the scan —
  * at 100 TB this is a zero-shuffle, codegen'd map stage.
  */
object CastPlanner {

  /** Exact-string boolean map (`str_to_bool`, `_cast_functions.py:21-27`):
    * only the two configured strings are accepted; null passes through;
    * anything else raises. */
  def strToBool(c: Column, info: ColumnSpec): Column =
    when(c.isNull, lit(null).cast(BooleanType))
      .when(c === lit(info.boolTrueString), lit(true))
      .when(c === lit(info.boolFalseString), lit(false))
      .otherwise(raise_error(concat(
        lit(s"str_to_bool: value not in {'${info.boolTrueString}', '${info.boolFalseString}'}: '"),
        c, lit("'"))).cast(BooleanType))

  /** `str_to_date` (`_cast_functions.py:30-35`): parse with the converted
    * format; ANSI makes `to_date` throw on mismatch. */
  def strToDate(c: Column, info: ColumnSpec): Column =
    to_date(c, StrftimeFormat.toSparkPattern(info.dateFormat))

  /** `str_to_datetime` (`_cast_functions.py:38-53`): format with a time part
    * parses with it; otherwise generic (ISO) cast. */
  def strToTimestamp(c: Column, info: ColumnSpec, tgt: DataType): Column =
    if (info.dateFormat.nonEmpty && StrftimeFormat.hasTimePart(info.dateFormat))
      to_timestamp(c, StrftimeFormat.toSparkPattern(info.dateFormat)).cast(tgt)
    else c.cast(tgt)

  /** `str_to_time` (`_cast_functions.py:56-76`): parse with the converted
    * format when it carries any of %H/%M/%S/%T, else default TIME parse —
    * Spark 4.1's `to_time`. */
  def strToTime(c: Column, info: ColumnSpec): Column =
    if (info.dateFormat.nonEmpty && StrftimeFormat.hasAnyTimeCode(info.dateFormat))
      call_function("to_time", c,
        lit(StrftimeFormat.toSparkPattern(info.dateFormat)))
    else call_function("to_time", c)

  /** `str_to_duration` (`_cast_functions.py:79-83`): string → Int64 micros →
    * duration. Exact micro arithmetic via interval multiplication (no double
    * rounding). */
  def strToDuration(c: Column): Column =
    (c.cast(LongType) * expr("INTERVAL '0 00:00:00.000001' DAY TO SECOND"))
      .cast(DayTimeIntervalType())

  /** `str_to_numeric_with_trim` (`_cast_functions.py:86-89`): whitespace-
    * tolerant strict numeric parse, applied to every numeric target like the
    * registry rows at :112-122. */
  def strToNumericWithTrim(c: Column, tgt: DataType): Column = trim(c).cast(tgt)

  /** Integral targets Spark lacks, as (storage type, min, max) — the
    * documented narrowings of SURVEY §1.3. Int128's true extremes (±2^127 ≈
    * ±1.70e38) exceed Spark's widest exact integral (Decimal 38 digits), so
    * int128 is range-limited to ±(10^38−1): a documented deviation — values
    * beyond 38 digits raise instead of wrapping. */
  val integralHints: Map[String, (DataType, BigDecimal, BigDecimal)] = Map(
    "uint8" -> ((ShortType, BigDecimal(0), BigDecimal(255))),
    "uint16" -> ((IntegerType, BigDecimal(0), BigDecimal(65535))),
    "uint32" -> ((LongType, BigDecimal(0), BigDecimal(4294967295L))),
    "uint64" -> ((DecimalType(20, 0), BigDecimal(0),
      BigDecimal("18446744073709551615"))),
    "int128" -> ((DecimalType(38, 0),
      BigDecimal("-" + "9" * 38), BigDecimal("9" * 38))),
  )

  /** Strict range-guarded integral cast for [[integralHints]] targets:
    * for string sources, trims and rejects non-integer strings (a plain
    * Decimal cast would ROUND "1.5"; the reference errors); for numeric
    * sources the same range guard applies directly — a hinted column keeps
    * its unsigned/128-bit range promise regardless of what type feeds it.
    * Null passes through (`_cast_functions.py` strict casts are
    * null-preserving, tests :352-366). */
  def hintedIntegral(c: Column, src: DataType, hint: String): Column = {
    val (tgt, min, max) = integralHints.getOrElse(hint,
      throw new IllegalArgumentException(s"unknown integral cast hint: $hint"))
    val isStr = src == StringType
    val t = if (isStr) trim(c) else c
    val parsed = t.cast(DecimalType(38, 0))
    val rangeChecked =
      when(parsed < lit(min.bigDecimal) || parsed > lit(max.bigDecimal),
        raise_error(concat(lit(s"str_to_$hint: value out of range: '"),
          c.cast(StringType), lit("'"))).cast(tgt))
      .otherwise(parsed.cast(tgt))
    // fractional numeric sources get the same no-silent-rounding contract as
    // strings: a Double 1.5 would otherwise cast to Decimal(38,0) as 2 and
    // pass the range guard while the string "1.5" raises. The guard is
    // `c % 1 != 0` in the SOURCE's own arithmetic (double mod for float/
    // double — where any value ≥ 2^53 is integral by representation, and
    // NaN/Inf yield NaN % 1 = NaN ≠ 0 → raise; exact decimal mod for
    // decimals). Comparing c against its Decimal(38,0) image does NOT work:
    // decimal comparison coercion caps precision at 38 by SACRIFICING scale,
    // which rounds 1.50 to 2 inside the comparison and equates them.
    val fractionalSrc = src match {
      case FloatType | DoubleType => true
      case d: DecimalType if d.scale > 0 => true
      case _ => false
    }
    // float/double magnitudes beyond Decimal(38,0) (e.g. 1e40) are integral
    // by representation, so they pass the `% 1` guard — but the
    // Decimal(38,0) parse inside rangeChecked would then throw Spark's
    // generic ANSI CAST_OVERFLOW instead of the library's range error.
    // Pre-guard the magnitude at `>= 1e38` — this is EXACTLY Spark's
    // Decimal(38,0) overflow boundary under its double→decimal semantics
    // (round-4 advice investigated and rejected): Spark casts a double to
    // decimal through its SHORTEST DECIMAL RENDERING (Decimal(doubleValue)
    // parses Double.toString), so double(1e38) is "1.0E38" = 10^38 — 39
    // digits, overflows Decimal(38,0) and is outside even int128's
    // ±(10^38−1) — while nextDown(1e38) renders as 9.999999999999999e37,
    // 38 digits, in range. The advice's premise (that the binary-exact
    // value ~9.9999999999999998e37 is what the decimal parse sees) does
    // not hold in Spark; a strict `>` here would route double(1e38) into
    // rangeChecked's Decimal(38,0) parse and resurface the generic ANSI
    // CAST_OVERFLOW this guard exists to replace. Shortest-repr is also
    // the engine-wide convention for reading floats (see
    // Constraint.MultipleOf). Decimal sources can't hit this (a
    // Decimal(38,s) value always fits 38 digits).
    val floatSrc = src == FloatType || src == DoubleType
    val rangeGuarded =
      if (!floatSrc) rangeChecked
      else when(abs(t) >= lit(1e38),
        raise_error(concat(lit(s"str_to_$hint: value out of range: '"),
          c.cast(StringType), lit("'"))).cast(tgt))
        .otherwise(rangeChecked)
    if (isStr)
      when(c.isNull, lit(null).cast(tgt))
        .when(!t.rlike("^[+-]?[0-9]{1,38}$"),
          raise_error(concat(lit(s"str_to_$hint: invalid integer string: '"),
            c, lit("'"))).cast(tgt))
        .otherwise(rangeChecked)
    else if (fractionalSrc)
      when(c.isNull, lit(null).cast(tgt))
        .when((t % lit(1)) =!= lit(0),
          raise_error(concat(lit(s"str_to_$hint: non-integral value: '"),
            c.cast(StringType), lit("'"))).cast(tgt))
        .otherwise(rangeGuarded)
    else
      when(c.isNull, lit(null).cast(tgt)).otherwise(rangeGuarded)
  }

  /** Convenience spec builder for an [[integralHints]] target:
    * `integralColumn("v", "uint64")` ⇒ Decimal(20,0) storage + the strict
    * range-guarded cast. */
  def integralColumn(name: String, hint: String, nullable: Boolean = false): ColumnSpec =
    ColumnSpec(name, integralHints(hint)._1, nullable, castHint = Some(hint))

  /** Build the cast expression for one column. */
  def castExpr(src: DataType, spec: ColumnSpec, sourceName: String): Column = {
    val c = col(sourceName)
    val tgt = spec.dataType
    val out: Column = (src, tgt) match {
      case (_, _) if spec.castHint.isDefined =>
        val hint = spec.castHint.get
        require(integralHints.get(hint).exists(_._1 == tgt),
          s"castHint '$hint' requires dataType ${integralHints.get(hint).map(_._1)}, got $tgt")
        hintedIntegral(c, src, hint)
      case (s, t) if s == t => c
      case (StringType, BooleanType) => strToBool(c, spec)
      case (StringType, DateType) => strToDate(c, spec)
      case (StringType, TimestampType | TimestampNTZType) => strToTimestamp(c, spec, tgt)
      case (StringType, _: TimeType) => strToTime(c, spec)
      case (StringType, _: DayTimeIntervalType) => strToDuration(c)
      case (StringType, ByteType | ShortType | IntegerType | LongType |
                        FloatType | DoubleType) => strToNumericWithTrim(c, tgt)
      case (StringType, _: DecimalType) => c.cast(tgt) // str_to_decimal :98-101
      case (StringType, BinaryType) => c.cast(tgt) // registry :130 simple_cast
      case _ => c.cast(tgt) // simple_cast fallback (:15-18), ANSI-strict
    }
    out.as(sourceName)
  }

  /** Per-column cast map for a source schema. Missing model column ⇒
    * IllegalArgumentException, message parity with `polars/model.py:331`.
    * Same-type columns are skipped. */
  def plan(spec: TableSpec, srcSchema: StructType,
      alias: AliasType = AliasType.Serialization): Map[String, Column] = {
    val srcByName = srcSchema.fields.map(f => f.name -> f.dataType).toMap
    spec.columns.flatMap { cSpec =>
      val n = cSpec.nameFor(alias)
      srcByName.get(n) match {
        case None =>
          throw new IllegalArgumentException(s"Column $n not found in source schema")
        // same-type skip (`polars/model.py:332-333`) — EXCEPT for hinted
        // integral columns, whose storage type can match the source while
        // the unsigned/128-bit RANGE promise still needs enforcing (a Long
        // feeding a uint32 column must range-check, not pass through)
        case Some(srcType) if srcType == cSpec.dataType && cSpec.castHint.isEmpty => None
        case Some(srcType) => Some(n -> castExpr(srcType, cSpec, n))
      }
    }.toMap
  }

  /** Apply: one fused `withColumns` projection (`polars/model.py:347`);
    * non-model columns pass through untouched. */
  def apply(df: DataFrame, spec: TableSpec,
      alias: AliasType = AliasType.Serialization): DataFrame =
    df.withColumns(plan(spec, df.schema, alias))

  /** `rename` (`polars/model.py:184-243`): bidirectional alias rename; only
    * columns present in the frame are renamed. */
  def rename(df: DataFrame, spec: TableSpec, from: AliasType, to: AliasType): DataFrame =
    df.withColumnsRenamed(spec.renameMap(from, to, df.columns.toSeq))
}
