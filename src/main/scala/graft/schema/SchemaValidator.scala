package graft.schema

import graft.result.ValidationError
import graft.spec.{AliasType, ColumnSpec, TableSpec}
import org.apache.spark.sql.types._
import org.json4s._

/** Analysis-time schema validation: zero Spark jobs, pure driver code —
  * the Spark analog of validating a Polars LazyFrame via `collect_schema()`
  * (`/root/reference/src/fastdataframe/polars/model.py:95,111-148`), since
  * `df.schema` is resolved without executing the plan.
  */
object SchemaValidator {

  /** Spark DataType → JSON schema, pydantic-dialect. Mirrors the shapes
    * pydantic's TypeAdapter emits (which the reference compares against,
    * `polars/model.py:123-124`) and the reference's own dtype→JSON mapping
    * `_polars_dtype_to_json_schema` (`polars/model.py:65-87`) / Iceberg
    * visitor formats (`iceberg/json_schema.py:27-67`: date, time,
    * date-time, duration, uuid, base64). */
  def typeToJsonSchema(dt: DataType): JObject = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      JObject("type" -> JString("integer"))
    case FloatType | DoubleType => JObject("type" -> JString("number"))
    case StringType | _: VarcharType | _: CharType =>
      JObject("type" -> JString("string"))
    case BooleanType => JObject("type" -> JString("boolean"))
    case DateType =>
      JObject("type" -> JString("string"), "format" -> JString("date"))
    case TimestampType | TimestampNTZType =>
      JObject("type" -> JString("string"), "format" -> JString("date-time"))
    case _: DayTimeIntervalType | _: YearMonthIntervalType =>
      JObject("type" -> JString("string"), "format" -> JString("duration"))
    case BinaryType =>
      JObject("type" -> JString("string"), "format" -> JString("base64"))
    case _: DecimalType =>
      // pydantic renders Decimal as anyOf[number, string]
      JObject("anyOf" -> JArray(List(
        JObject("type" -> JString("number")),
        JObject("type" -> JString("string")))))
    case ArrayType(elem, containsNull) =>
      val inner = if (containsNull) nullableWrap(typeToJsonSchema(elem))
      else typeToJsonSchema(elem)
      JObject("type" -> JString("array"), "items" -> inner)
    case MapType(_, v, valueContainsNull) =>
      val inner = if (valueContainsNull) nullableWrap(typeToJsonSchema(v))
      else typeToJsonSchema(v)
      JObject("type" -> JString("object"), "additionalProperties" -> inner)
    case StructType(fields) =>
      JObject(
        "type" -> JString("object"),
        "properties" -> JObject(fields.toList.map(f =>
          f.name -> fieldToJsonSchema(f))),
        "required" -> JArray(fields.filterNot(_.nullable).map(f => JString(f.name)).toList))
    case NullType => JObject("type" -> JString("null"))
    case _: TimeType => // Spark 4.1 TIME type (iceberg/json_schema.py:45-64)
      JObject("type" -> JString("string"), "format" -> JString("time"))
    case _ => JObject("type" -> JString("string"))
  }

  /** Optional[T] renders as anyOf[T, null] (`core/types.py` docstring;
    * pydantic behavior). */
  def nullableWrap(inner: JObject): JObject =
    JObject("anyOf" -> JArray(List(inner, JObject("type" -> JString("null")))))

  /** Model-side column → JSON schema: type + nullability union + declared
    * constraint keys (the reference embeds pydantic Field constraints the
    * same way; `core/types.py:206-217` consumes them). */
  def columnToJsonSchema(c: ColumnSpec): JValue = {
    val derived = typeToJsonSchema(c.dataType)
    // spec-level format override (e.g. Some("uuid") on a StringType column
    // — Spark has no UUID type): replaces any type-derived format so the
    // lattice rejects uuid-vs-plain-string (iceberg/json_schema.py:52-55)
    val base = c.format match {
      case Some(f) => JObject(derived.obj.filterNot(_._1 == "format") :+
        ("format" -> JString(f): JField))
      case None => derived
    }
    val constraintFields: List[JField] = c.constraints.flatMap(_.jsonKey).collect {
      case (k, v: BigDecimal) if v.isWhole => k -> JInt(v.toBigInt)
      case (k, v: BigDecimal) => k -> JDecimal(v)
      case (k, v: Double) if v.isWhole => k -> JInt(BigInt(v.toLong))
      case (k, v: Double) => k -> JDouble(v)
      case (k, v: Int) => k -> JInt(v)
      case (k, v: Long) => k -> JInt(BigInt(v))
      case (k, v: String) => k -> JString(v)
      case (k, v: Boolean) => k -> JBool(v)
      case (k, v: Seq[_]) => k -> JArray(v.toList.map(x => JString(x.toString)))
    }.toList
    val withConstraints = JObject(base.obj ++ constraintFields)
    if (c.nullable) nullableWrap(withConstraints) else withConstraints
  }

  /** Frame-side field → JSON schema. Note: plain dtype, ignoring Spark's
    * (almost-always-true) parquet nullability flag — parity with the
    * reference, whose frame extraction has no per-column nullability
    * (`polars/model.py:90-105` marks all frame columns required). Nested
    * struct fields DO keep their declared nullability. */
  def fieldToJsonSchema(f: StructField): JValue = typeToJsonSchema(f.dataType)

  /** `validate_missing_columns` (`core/json_schema.py:6-22`): required model
    * columns absent from the frame. Message bytes per :20. */
  def validateMissingColumns(spec: TableSpec, frame: StructType,
      alias: AliasType = AliasType.Serialization): Seq[ValidationError] = {
    val present = frame.fieldNames.toSet
    spec.requiredColumns(alias).filterNot(present).map(f =>
      ValidationError(f, "MissingColumn", s"Column $f is missing in the frame."))
  }

  /** `validate_column_types` (`core/json_schema.py:25-42`): for each model
    * column present in the frame, the model schema must be a superset of the
    * frame schema. Message bytes per :40. */
  def validateColumnTypes(spec: TableSpec, frame: StructType,
      alias: AliasType = AliasType.Serialization): Seq[ValidationError] = {
    val frameByName = frame.fields.map(f => f.name -> f).toMap
    spec.columns.flatMap { c =>
      val n = c.nameFor(alias)
      frameByName.get(n).flatMap { f =>
        val modelSchema = columnToJsonSchema(c)
        val frameSchema = fieldToJsonSchema(f)
        if (JsonSchemaSubset.isSubset(modelSchema, frameSchema)) None
        else Some(ValidationError(n, "TypeMismatch",
          s"Expected type ${JsonSchemaSubset.typeName(modelSchema)}, " +
            s"but got ${JsonSchemaSubset.typeName(frameSchema)}."))
      }
    }
  }

  /** Full schema validation = missing columns + type subset
    * (`polars/model.py:111-148`). Analysis-time only. */
  def validateSchema(spec: TableSpec, frame: StructType,
      alias: AliasType = AliasType.Serialization): Seq[ValidationError] =
    validateMissingColumns(spec, frame, alias) ++ validateColumnTypes(spec, frame, alias)
}
