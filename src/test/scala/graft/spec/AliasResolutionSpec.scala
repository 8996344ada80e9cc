package graft.spec

import graft.TestSpark
import graft.cast.CastPlanner
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Alias-resolution parity: the AliasChoices flattening + multi-alias error
  * of `get_validation_alias` (`core/pydantic/field_info.py:19-47`) and the
  * 4-direction rename matrix (`tests/polars/test_model.py:480-575`). */
class AliasResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("alias choices: serialization alias excluded; empty -> serialization") {
    assert(ColumnSpec.resolveValidationAlias(Seq("ser"), "ser") === "ser")
    assert(ColumnSpec.resolveValidationAlias(Seq("ser", "val"), "ser") === "val")
    assert(ColumnSpec.resolveValidationAlias(Seq("val"), "ser") === "val")
  }

  test(">1 surviving alias raises with the reference's message bytes") {
    val e = intercept[IllegalArgumentException] {
      ColumnSpec.resolveValidationAlias(Seq("a", "b"), "ser")
    }
    assert(e.getMessage === "Invalid validation alias: ['a', 'b']")
  }

  test("choices flow through nameFor(Validation)") {
    val c = ColumnSpec("f", StringType, serializationAlias = Some("ser"),
      validationAliasChoices = Seq("ser", "val"))
    assert(c.nameFor(AliasType.Validation) === "val")
    assert(c.nameFor(AliasType.Serialization) === "ser")
  }

  // --- 4-direction rename matrix over one model with split aliases ---
  private val spec = TableSpec("m", Seq(
    ColumnSpec("a", LongType),
    ColumnSpec("b", StringType),
    ColumnSpec("c", LongType,
      serializationAlias = Some("ser_c"), validationAlias = Some("val_c"))))

  test("rename serialization -> validation") {
    val df = Seq((1L, "x", 2L)).toDF("a", "b", "ser_c")
    val out = CastPlanner.rename(df, spec, AliasType.Serialization, AliasType.Validation)
    assert(out.columns.toSet === Set("a", "b", "val_c"))
    assert(out.select("val_c").head().getLong(0) === 2L)
  }

  test("rename validation -> serialization") {
    val df = Seq((1L, "x", 99L)).toDF("a", "b", "val_c")
    val out = CastPlanner.rename(df, spec, AliasType.Validation, AliasType.Serialization)
    assert(out.columns.toSet === Set("a", "b", "ser_c"))
    assert(out.select("ser_c").head().getLong(0) === 99L)
  }

  test("rename serialization -> serialization is identity") {
    val df = Seq((1L, "x", 2L)).toDF("a", "b", "ser_c")
    val out = CastPlanner.rename(df, spec, AliasType.Serialization, AliasType.Serialization)
    assert(out.columns.toSet === Set("a", "b", "ser_c"))
  }

  test("rename validation -> validation is identity") {
    val df = Seq((1L, "x", 2L)).toDF("a", "b", "val_c")
    val out = CastPlanner.rename(df, spec, AliasType.Validation, AliasType.Validation)
    assert(out.columns.toSet === Set("a", "b", "val_c"))
  }

  test("rename with missing columns: only columns present are renamed (:540-558)") {
    val df = Seq((1L, 2L)).toDF("a", "ser_c")
    val out = CastPlanner.rename(df, spec, AliasType.Serialization, AliasType.Validation)
    assert(out.columns.toSet === Set("a", "val_c"))
  }

  test("rename identity when model declares no aliases (:527-538)") {
    val plain = TableSpec("m2", Seq(ColumnSpec("x", LongType), ColumnSpec("y", StringType)))
    val df = Seq((1L, "foo")).toDF("x", "y")
    val out = CastPlanner.rename(df, plain, AliasType.Serialization, AliasType.Validation)
    assert(out.columns.toSet === Set("x", "y"))
  }

  test("case-class spec derivation: Option fields nullable, rest required") {
    val derived = TableSpec.fromCaseClass[DerivedFixture]("fix")
    val byName = derived.columns.map(c => c.name -> c).toMap
    assert(byName("id").dataType === LongType)
    assert(!byName("id").nullable)
    assert(byName("name").dataType === StringType)
    assert(byName("score").dataType === DoubleType)
    assert(byName("score").nullable)
  }

  test("derivation optionality matrix: collections, maps, nested models (test_types_helper parity)") {
    // the reference's is_optional_type matrix over containers and nesting
    // (tests/core/test_types_helper.py), re-expressed for the encoder path
    val d = TableSpec.fromCaseClass[DerivedRichFixture]("rich")
    val byName = d.columns.map(c => c.name -> c).toMap
    // encoder semantics: primitive fields are required; reference-typed
    // fields (collections, strings, nested models) are nullable at the
    // column level — element/value nullability is still tracked precisely
    assert(byName("tags").dataType === ArrayType(IntegerType, containsNull = false))
    assert(byName("maybeTags").dataType === ArrayType(StringType))
    assert(byName("maybeTags").nullable) // Optional[list] -> nullable column
    assert(byName("attrs").dataType ===
      MapType(StringType, DoubleType, valueContainsNull = false))
    // nested model -> inline StructType with its own per-field nullability
    val nested = byName("addr").dataType.asInstanceOf[StructType]
    assert(nested("street").dataType === StringType)
    assert(nested("zip").dataType === IntegerType && nested("zip").nullable)
    // optional nested model
    assert(byName("backup").nullable)
    assert(byName("backup").dataType.isInstanceOf[StructType])
  }
}

case class DerivedFixture(id: Long, name: String, score: Option[Double])
case class DerivedAddr(street: String, zip: Option[Int])
case class DerivedRichFixture(
    tags: Seq[Int],
    maybeTags: Option[Seq[String]],
    attrs: Map[String, Double],
    addr: DerivedAddr,
    backup: Option[DerivedAddr])
