package graft.spec

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-model alias recursion (round-2 verdict #7): the reference applies
  * alias resolution to every field of a nested BaseModel, any depth
  * (`/root/reference/src/fastdataframe/polars/_types.py:56-104`,
  * `alias_func` per nested field), pinned by
  * `tests/polars/test_model.py:1050-1072` (test_basemodel_with_field_aliases).
  * Here a ColumnSpec with `children` derives its struct type from the child
  * specs under the requested alias view. */
class NestedAliasSpec extends AnyFunSuite {

  // Address(street_name alias "street", city_name alias "city") — a pydantic
  // Field(alias=...) applies to BOTH views, so both per-view options are set
  private val address = Seq(
    ColumnSpec("street_name", StringType,
      serializationAlias = Some("street"), validationAlias = Some("street")),
    ColumnSpec("city_name", StringType,
      serializationAlias = Some("city"), validationAlias = Some("city")))

  test("nested struct fields rename under aliases (test_model.py:1050-1072)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("name", StringType),
      ColumnSpec("address", StructType(Nil), children = address)))
    val st = spec.toStructType(AliasType.Serialization)
    val inner = st("address").dataType.asInstanceOf[StructType]
    assert(inner.fieldNames.toSeq === Seq("street", "city"))
    assert(inner.fields.forall(_.dataType == StringType))
  }

  test("per-view nested aliases: serialization_alias only renames that view") {
    val children = Seq(
      ColumnSpec("a_alias_serialize", StringType,
        serializationAlias = Some("aliasSerialize")),
      ColumnSpec("a_alias_validate", StringType,
        validationAlias = Some("aliasValidate")))
    val spec = TableSpec("t", Seq(
      ColumnSpec("nested", StructType(Nil), children = children)))
    val ser = spec.toStructType(AliasType.Serialization)("nested")
      .dataType.asInstanceOf[StructType].fieldNames.toSeq
    val vld = spec.toStructType(AliasType.Validation)("nested")
      .dataType.asInstanceOf[StructType].fieldNames.toSeq
    // mirrors test_get_polars_schema_with_alias_* (:20-49), one level down
    assert(ser === Seq("aliasSerialize", "a_alias_validate"))
    assert(vld === Seq("a_alias_serialize", "aliasValidate"))
  }

  test("recursion is depth-unbounded (nested inside nested)") {
    val deep = Seq(ColumnSpec("value_raw", LongType,
      serializationAlias = Some("value")))
    val middle = Seq(
      ColumnSpec("name", StringType),
      ColumnSpec("deep", StructType(Nil), children = deep))
    val spec = TableSpec("t", Seq(
      ColumnSpec("middle", StructType(Nil), children = middle)))
    val mid = spec.toStructType(AliasType.Serialization)("middle")
      .dataType.asInstanceOf[StructType]
    val inner = mid("deep").dataType.asInstanceOf[StructType]
    assert(inner.fieldNames.toSeq === Seq("value"))
    assert(inner("value").dataType === LongType)
  }

  test("array-of-model keeps the List wrapper (list[BaseModel], _types.py:31-40)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("addresses", ArrayType(StructType(Nil), containsNull = false),
        children = address)))
    val dt = spec.toStructType(AliasType.Serialization)("addresses").dataType
    dt match {
      case ArrayType(inner: StructType, containsNull) =>
        assert(!containsNull)
        assert(inner.fieldNames.toSeq === Seq("street", "city"))
      case other => fail(s"expected array<struct>, got $other")
    }
  }

  test("leaf columns are unaffected (children empty ⇒ dataType verbatim)") {
    val c = ColumnSpec("x", LongType)
    assert(c.resolvedDataType(AliasType.Serialization) === LongType)
    assert(c.resolvedDataType(AliasType.Validation) === LongType)
  }

  test("child specs carry their own nullability into the struct") {
    val children = Seq(
      ColumnSpec("req", StringType, nullable = false),
      ColumnSpec("opt", StringType, nullable = true))
    val spec = TableSpec("t", Seq(
      ColumnSpec("nested", StructType(Nil), children = children)))
    val inner = spec.toStructType(AliasType.Serialization)("nested")
      .dataType.asInstanceOf[StructType]
    assert(!inner("req").nullable)
    assert(inner("opt").nullable)
  }
}
