package graft.schema

import graft.spec._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the schema-validation cases of
  * `/root/reference/tests/polars/test_model.py:381-473` (UserTestModel /
  * TemporalModel fixtures per FIXTURES.md §2-3) — analysis-time only. */
class SchemaValidatorSpec extends AnyFunSuite {

  // FIXTURES.md §2: UserTestModel
  val userSpec = TableSpec("user", Seq(
    ColumnSpec("name", StringType),
    ColumnSpec("age", LongType),
    ColumnSpec("is_active", BooleanType),
    ColumnSpec("score", DoubleType, nullable = true),
  ))

  test("valid frame: no errors") {
    val frame = StructType(Seq(
      StructField("name", StringType), StructField("age", LongType),
      StructField("is_active", BooleanType), StructField("score", DoubleType)))
    assert(SchemaValidator.validateSchema(userSpec, frame).isEmpty)
  }

  test("missing column error — message parity with core/json_schema.py:20") {
    val frame = StructType(Seq(
      StructField("name", StringType), StructField("is_active", BooleanType)))
    val errs = SchemaValidator.validateMissingColumns(userSpec, frame)
    assert(errs.map(_.columnName) === Seq("age"))
    assert(errs.head.errorType === "MissingColumn")
    assert(errs.head.errorDetails === "Column age is missing in the frame.")
  }

  test("optional missing column is not an error") {
    val frame = StructType(Seq(
      StructField("name", StringType), StructField("age", LongType),
      StructField("is_active", BooleanType)))
    assert(SchemaValidator.validateMissingColumns(userSpec, frame).isEmpty)
  }

  test("type mismatch — message parity with core/json_schema.py:40") {
    // age/score given as strings (tests/polars/test_model.py:417-433)
    val frame = StructType(Seq(
      StructField("name", StringType), StructField("age", StringType),
      StructField("is_active", BooleanType), StructField("score", StringType)))
    val errs = SchemaValidator.validateColumnTypes(userSpec, frame)
    assert(errs.map(_.columnName).toSet === Set("age", "score"))
    val ageErr = errs.find(_.columnName == "age").get
    assert(ageErr.errorType === "TypeMismatch")
    assert(ageErr.errorDetails === "Expected type integer, but got string.")
    val scoreErr = errs.find(_.columnName == "score").get
    assert(scoreErr.errorDetails === "Expected type union[number, null], but got string.")
  }

  test("widening is accepted: long model vs int frame, optional vs required") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("a", LongType), ColumnSpec("b", DoubleType, nullable = true)))
    val frame = StructType(Seq(
      StructField("a", IntegerType), StructField("b", FloatType)))
    assert(SchemaValidator.validateSchema(spec, frame).isEmpty)
  }

  test("narrowing is rejected: int model vs double frame") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", LongType)))
    val frame = StructType(Seq(StructField("a", DoubleType)))
    val errs = SchemaValidator.validateColumnTypes(spec, frame)
    assert(errs.size === 1)
    assert(errs.head.errorDetails === "Expected type integer, but got number.")
  }

  test("temporal types: date vs date-time formats are distinct") {
    val spec = TableSpec("t", Seq(ColumnSpec("d", DateType)))
    val okFrame = StructType(Seq(StructField("d", DateType)))
    assert(SchemaValidator.validateSchema(spec, okFrame).isEmpty)
    val tsFrame = StructType(Seq(StructField("d", TimestampNTZType)))
    val errs = SchemaValidator.validateColumnTypes(spec, tsFrame)
    assert(errs.head.errorDetails === "Expected type date, but got date-time.")
  }

  test("temporal format tags: time vs date vs duration are all distinct") {
    // iceberg/json_schema.py:45-64 formats matrix
    val time = SchemaValidator.typeToJsonSchema(TimeType())
    val date = SchemaValidator.typeToJsonSchema(DateType)
    val dur = SchemaValidator.typeToJsonSchema(DayTimeIntervalType())
    import graft.schema.JsonSchemaSubset._
    assert(typeName(time) === "time")
    assert(typeName(dur) === "duration")
    assert(!isSubset(time, date) && !isSubset(date, time))
    val spec = TableSpec("t", Seq(ColumnSpec("x", TimeType())))
    val errs = SchemaValidator.validateColumnTypes(spec,
      StructType(Seq(StructField("x", DateType))))
    assert(errs.head.errorDetails === "Expected type time, but got date.")
  }

  test("map types recurse through additionalProperties (iceberg matrix)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("m", MapType(StringType, LongType, valueContainsNull = false))))
    val ok = StructType(Seq(StructField("m",
      MapType(StringType, IntegerType, valueContainsNull = false))))
    assert(SchemaValidator.validateSchema(spec, ok).isEmpty)
    val bad = StructType(Seq(StructField("m",
      MapType(StringType, StringType, valueContainsNull = false))))
    assert(SchemaValidator.validateColumnTypes(spec, bad).size === 1)
  }

  test("list-of-struct recursion (iceberg matrix :424-468)") {
    val inner = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = false)))
    val spec = TableSpec("t", Seq(
      ColumnSpec("xs", ArrayType(inner, containsNull = false))))
    assert(SchemaValidator.validateSchema(spec,
      StructType(Seq(StructField("xs", ArrayType(inner, containsNull = false))))).isEmpty)
    val badInner = StructType(Seq(StructField("a", StringType, nullable = false)))
    val errs = SchemaValidator.validateColumnTypes(spec,
      StructType(Seq(StructField("xs", ArrayType(badInner, containsNull = false)))))
    assert(errs.size === 1)
  }

  test("optional containers and containers-of-optionals (iceberg :119-223)") {
    // Optional[list[int]] model vs plain list frame: ok
    val optList = TableSpec("t", Seq(
      ColumnSpec("xs", ArrayType(LongType, containsNull = false), nullable = true)))
    assert(SchemaValidator.validateSchema(optList,
      StructType(Seq(StructField("xs", ArrayType(LongType, containsNull = false))))).isEmpty)
    // list-of-optional model vs list-of-required frame: ok (widening)
    val listOfOpt = TableSpec("t", Seq(
      ColumnSpec("xs", ArrayType(LongType, containsNull = true))))
    assert(SchemaValidator.validateSchema(listOfOpt,
      StructType(Seq(StructField("xs", ArrayType(LongType, containsNull = false))))).isEmpty)
    // list-of-required model vs list-of-optional frame: MISMATCH
    val listOfReq = TableSpec("t", Seq(
      ColumnSpec("xs", ArrayType(LongType, containsNull = false))))
    assert(SchemaValidator.validateColumnTypes(listOfReq,
      StructType(Seq(StructField("xs", ArrayType(LongType, containsNull = true))))).size === 1)
  }

  test("decimal model accepts double frame (pydantic anyOf union)") {
    val spec = TableSpec("t", Seq(ColumnSpec("a", DecimalType(10, 2))))
    val frame = StructType(Seq(StructField("a", DoubleType)))
    assert(SchemaValidator.validateSchema(spec, frame).isEmpty)
  }

  test("arrays recurse; binary maps to base64 format") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("xs", ArrayType(LongType, containsNull = false)),
      ColumnSpec("bytes", BinaryType)))
    val ok = StructType(Seq(
      StructField("xs", ArrayType(IntegerType, containsNull = false)),
      StructField("bytes", BinaryType)))
    assert(SchemaValidator.validateSchema(spec, ok).isEmpty)
    val bad = StructType(Seq(
      StructField("xs", ArrayType(StringType, containsNull = false)),
      StructField("bytes", StringType)))
    assert(SchemaValidator.validateColumnTypes(spec, bad).size === 2)
  }

  test("nested struct: extra frame fields rejected only when model lacks them") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("s", StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", StringType, nullable = false))))))
    val frameOk = StructType(Seq(StructField("s", StructType(Seq(
      StructField("a", LongType, nullable = false))))))
    assert(SchemaValidator.validateSchema(spec, frameOk).isEmpty)
    val frameBad = StructType(Seq(StructField("s", StructType(Seq(
      StructField("a", StringType, nullable = false))))))
    assert(SchemaValidator.validateColumnTypes(spec, frameBad).size === 1)
  }

  test("alias views: validation alias resolves against frame names") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("a", LongType, serializationAlias = Some("A"),
        validationAlias = Some("a_raw"))))
    val frame = StructType(Seq(StructField("a_raw", LongType)))
    assert(SchemaValidator.validateSchema(spec, frame, AliasType.Validation).isEmpty)
    assert(SchemaValidator.validateMissingColumns(spec, frame,
      AliasType.Serialization).nonEmpty)
  }

  test("ColumnInfo JSON round-trip gates (core/annotation.py:88-125)") {
    val good =
      """{"json_schema_extra": {"_fastdataframe": {"type": "FastDataframe",
        |"version": "1.0", "properties": {"is_unique": true}}}}""".stripMargin
    assert(ColumnSpec.infoFromJson(good).isUnique)
    val noDoc = """{"json_schema_extra": {}}"""
    val e1 = intercept[IllegalArgumentException](ColumnSpec.infoFromJson(noDoc))
    assert(e1.getMessage === "Schema does not contain FastDataframe information")
    val badVersion =
      """{"json_schema_extra": {"_fastdataframe": {"type": "FastDataframe",
        |"version": "2.0", "properties": {"is_unique": true}}}}""".stripMargin
    val e2 = intercept[IllegalArgumentException](ColumnSpec.infoFromJson(badVersion))
    assert(e2.getMessage === "Unsupported FastDataframe version: 2.0")
    val missingProps =
      """{"json_schema_extra": {"_fastdataframe": {"type": "FastDataframe",
        |"version": "1.0", "properties": {}}}}""".stripMargin
    intercept[IllegalArgumentException](ColumnSpec.infoFromJson(missingProps))
  }

  test("StructField metadata embeds the versioned reconstruction doc") {
    val f = ColumnSpec("id", LongType, isUnique = true).toStructField()
    val md = f.metadata.getMetadata("_fastdataframe")
    assert(md.getString("type") === "FastDataframe")
    assert(md.getString("version") === "1.0")
    assert(md.getMetadata("properties").getBoolean("is_unique"))
  }
}
