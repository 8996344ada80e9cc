package graft.validate

import graft.TestSpark
import graft.spec._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral port of `/root/reference/tests/polars/test_validate.py` —
  * the spec for the distributed row validator — plus constraint-suite cases
  * the reference declares but never enforces (SURVEY.md §2.5). */
class RowValidatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // UserModel fixture: id required, name required, email optional
  val userSpec = TableSpec("user", Seq(
    ColumnSpec("id", LongType),
    ColumnSpec("name", StringType),
    ColumnSpec("email", StringType, nullable = true)))

  def userDf(rows: Seq[(Option[Long], Option[String], Option[String])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("email", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r._1.map(Long.box).orNull, r._2.orNull, r._3.orNull)), 2),
      schema)
  }

  test("validate_no_errors: clean == original, no errors (test_validate.py:13-38)") {
    val df = userDf(Seq(
      (Some(1L), Some("Alice"), None),
      (Some(2L), Some("Bob"), Some("bob@example.com")),
      (Some(3L), Some("Charlie"), Some("charlie@example.com"))))
    val run = RowValidator.validate(df, userSpec)
    assert(run.errors().isEmpty)
    assert(run.violations.count() === 0)
    assert(run.clean.count() === 3)
    val s = run.summary.head()
    assert(s.getAs[Long]("total_rows") === 3)
    assert(s.getAs[Long]("valid_rows") === 3)
    assert(s.getAs[Double]("success_rate") === 1.0)
    assert(s.getAs[Boolean]("passed"))
  }

  test("nulls in required fields (test_validate.py:40-77)") {
    val df = userDf(Seq(
      (Some(1L), Some("Alice"), None),
      (None, Some("Bob"), Some("bob@example.com")),
      (Some(3L), None, Some("charlie@example.com"))))
    val run = RowValidator.validate(df, userSpec)
    val errs = run.errors()
    assert(errs.size === 2)
    val idErr = errs.find(_.columnName == "id").get
    assert(idErr.errorType === "null_in_required_field")
    assert(idErr.errorDetails === "Required field 'id' contains null values")
    assert(errs.exists(_.columnName == "name"))
    val s = run.summary.head()
    assert(s.getAs[Long]("total_rows") === 3)
    assert(s.getAs[Long]("error_rows") === 2)
    assert(s.getAs[Long]("valid_rows") === 1)
    assert(math.abs(s.getAs[Double]("error_rate") - 2.0 / 3) < 1e-12)
    // clean keeps only the fully-valid row
    val clean = run.clean.collect()
    assert(clean.length === 1 && clean.head.getLong(0) === 1L)
    // violations carry (column, constraint, observed) — observed null here
    val v = run.violations.collect()
    assert(v.length === 2)
    assert(v.map(_.getAs[String]("constraint_id")).toSet === Set("not_null"))
  }

  test("all rows have errors (test_validate.py:79-105)") {
    val df = userDf(Seq(
      (None, Some("Alice"), None), (None, Some("Bob"), None),
      (None, Some("Charlie"), None)))
    val run = RowValidator.validate(df, userSpec)
    assert(run.errors().size === 1)
    val s = run.summary.head()
    assert(s.getAs[Long]("valid_rows") === 0)
    assert(s.getAs[Double]("success_rate") === 0.0)
    assert(s.getAs[Double]("error_rate") === 1.0)
    // clean is empty but keeps the schema
    assert(run.clean.count() === 0)
    assert(run.clean.schema.fieldNames.toSeq === Seq("id", "name", "email"))
  }

  test("optional fields with nulls don't error (test_validate.py:107-127)") {
    val df = userDf(Seq(
      (Some(1L), Some("a"), None), (Some(2L), Some("b"), None)))
    val run = RowValidator.validate(df, userSpec)
    assert(run.errors().isEmpty)
    assert(run.clean.count() === 2)
  }

  test("empty dataframe: success_rate 1.0 (test_validate.py:157)") {
    val df = userDf(Nil)
    val run = RowValidator.validate(df, userSpec)
    assert(run.errors().isEmpty)
    val s = run.summary.head()
    assert(s.getAs[Long]("total_rows") === 0)
    assert(s.getAs[Double]("error_rate") === 0.0)
    assert(s.getAs[Double]("success_rate") === 1.0)
  }

  test("missing required column ⇒ all rows invalid (test_validate.py:186-226)") {
    val df = Seq(("Alice"), ("Bob")).toDF("name")
    val run = RowValidator.validate(df, userSpec)
    val errs = run.errors()
    assert(errs.size === 1)
    assert(errs.head.errorType === "missing_required_column")
    assert(errs.head.errorDetails === "Required column 'id' is missing from DataFrame")
    assert(run.clean.count() === 0)
    val s = run.summary.head()
    assert(s.getAs[Long]("error_rows") === 2)
  }

  test("missing column on EMPTY df ⇒ no errors (test_validate.py:228-254)") {
    val df = Seq.empty[String].toDF("name")
    val run = RowValidator.validate(df, userSpec)
    assert(run.errors().isEmpty)
  }

  test("declared-but-unenforced constraints now enforced: range/regex/set") {
    val spec = TableSpec("clips", Seq(
      ColumnSpec("clip_id", StringType,
        constraints = Seq(Pattern("^clip-[0-9]{12}$"))),
      ColumnSpec("sr_hz", IntegerType,
        constraints = Seq(Minimum(8000), Maximum(48000))),
      ColumnSpec("dur_ms", IntegerType,
        constraints = Seq(ExclusiveMinimum(0), Maximum(30000))),
      ColumnSpec("codec", StringType,
        constraints = Seq(InSet(Seq("pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw"))))),
      keyCols = Seq("clip_id"), partitionCols = Seq("codec"))

    val df = Seq(
      ("clip-000000000001", 16000, 1200, "pcm_s16le"), // ok
      ("clip-000000000002", 96000, 1200, "flac"), // sr out of range
      ("bad-id", 16000, 0, "pcm_s16le"), // bad id + dur=0
      ("clip-000000000004", 16000, 1200, "wav") // bad codec
    ).toDF("clip_id", "sr_hz", "dur_ms", "codec")

    val run = RowValidator.validate(df, spec)
    val v = run.violations.collect()
    val byClip = v.groupBy(_.getAs[String]("clip_id"))
      .view.mapValues(_.map(_.getAs[String]("constraint_id")).toSet).toMap
    assert(byClip("clip-000000000002") === Set("maximum"))
    assert(byClip("bad-id") === Set("pattern", "exclusive_minimum"))
    assert(byClip("clip-000000000004") === Set("in_set"))
    // observed values are the offending raw values
    val srViol = v.find(_.getAs[String]("clip_id") == "clip-000000000002").get
    assert(srViol.getAs[String]("observed_value") === "96000")
    assert(run.clean.count() === 1)
    // per-codec summary
    val sm = run.summary.collect().map(r =>
      r.getAs[String]("codec") -> (r.getAs[Long]("total_rows"), r.getAs[Long]("error_rows"))).toMap
    assert(sm("pcm_s16le") === ((2L, 1L)))
    assert(sm("flac") === ((1L, 1L)))
    assert(sm("wav") === ((1L, 1L)))
    // per-constraint counters in the summary map
    val m = run.summary.where($"codec" === "flac").head()
      .getAs[Map[String, Long]]("violations_by_constraint")
    assert(m("sr_hz.maximum") === 1L)
  }

  test("nulls pass non-NotNull constraints (no double reporting)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("s", StringType, nullable = true,
        constraints = Seq(MinLength(3), Pattern("^[a-z]+$")))))
    val df = Seq(Some("abc"), None, Some("x")).toDF("s")
    val run = RowValidator.validate(df, spec)
    val v = run.violations.collect()
    // only "x" violates (minLength); null row is silent
    assert(v.length === 1)
    assert(run.clean.count() === 2)
  }

  test("array constraints: min/max items + uniqueItems") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("xs", ArrayType(IntegerType),
        constraints = Seq(MinItems(1), MaxItems(3), UniqueItems))))
    val df = Seq(Seq(1, 2), Seq(), Seq(1, 1), Seq(1, 2, 3, 4)).toDF("xs")
    val run = RowValidator.validate(df, spec)
    val ids = run.violations.collect().map(_.getAs[String]("constraint_id")).sorted
    assert(ids === Array("max_items", "min_items", "unique_items"))
  }

  test("multiple_of and length bounds") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("n", LongType, constraints = Seq(MultipleOf(5))),
      ColumnSpec("s", StringType, constraints = Seq(graft.spec.MaxLength(3)))))
    val df = Seq((10L, "ok"), (7L, "toolong")).toDF("n", "s")
    val run = RowValidator.validate(df, spec)
    val ids = run.violations.collect().map(_.getAs[String]("constraint_id")).sorted
    assert(ids === Array("max_length", "multiple_of"))
  }
}
