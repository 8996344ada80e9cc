package graft.spec

import graft.TestSpark
import graft.validate.RowValidator
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Annotation-convenience defaults (`polars/_types.py:144-162`): bare
  * `Decimal` → Decimal(10,2), `Categorical` → category-valued string.
  * Spark has no dictionary type, so categorical = StringType + optional
  * vocabulary constraint (documented deviation, SURVEY §1.3). */
class ConvenienceDefaultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decimalColumn defaults to the reference's Decimal(10, 2)") {
    val c = ColumnSpec.decimalColumn("price")
    assert(c.dataType === DecimalType(10, 2))
    assert(!c.nullable)
    assert(ColumnSpec.decimalColumn("p", nullable = true).nullable)
  }

  test("categoricalColumn is a string with an enforced vocabulary") {
    val c = ColumnSpec.categoricalColumn("codec",
      vocabulary = Seq("flac", "opus"))
    assert(c.dataType === StringType)
    val spec = TableSpec("t", Seq(c))
    val run = RowValidator.validate(Seq("flac", "mp3").toDF("codec"), spec)
    val bad = run.violations.collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("constraint_id") === "in_set")
    assert(bad.head.getAs[String]("observed_value") === "mp3")
  }

  test("categoricalColumn without vocabulary carries no constraint") {
    val c = ColumnSpec.categoricalColumn("tag")
    assert(c.constraints.isEmpty)
    assert(c.rowConstraints === Seq(NotNull)) // only the non-nullable default
  }
}
