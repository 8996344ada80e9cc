package graft.validate

import graft.TestSpark
import graft.io.IcebergEmulation
import graft.spec._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Index-level parity port of `tests/polars/test_validate.py` — the cases
  * that assert exact `error_rows` indices and clean-data ordering. */
class IndexedValidationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

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

  test("null indices match the reference exactly (test_validate.py:40-77)") {
    val df = userDf(Seq(
      (Some(1L), Some("Alice"), None),
      (None, Some("Bob"), Some("bob@example.com")),
      (Some(3L), None, Some("charlie@example.com"))))
    val r = IndexedValidation.validate(df, userSpec)
    assert(r.hasErrors)
    assert(r.errors.size === 2)
    assert(r.totalRows === 3)
    assert(r.validRows === 1)
    assert(r.errorRowIndices === Seq(1L, 2L))
    assert(math.abs(r.successRate - 1.0 / 3) < 1e-12)
    assert(math.abs(r.errorRate - 2.0 / 3) < 1e-12)
    val idErr = r.errors.find(_.columnName == "id").get
    assert(idErr.errorType === "null_in_required_field")
    assert(idErr.errorRows === Some(Seq(1L)))
    val nameErr = r.errors.find(_.columnName == "name").get
    assert(nameErr.errorRows === Some(Seq(2L)))
    // clean data: only row 0, original order and schema
    val clean = r.cleanData.collect()
    assert(clean.map(_.getLong(0)).toSeq === Seq(1L))
    assert(r.cleanData.columns.toSeq === Seq("id", "name", "email"))
  }

  test("all rows bad: indices 0..n-1, rates pinned (test_validate.py:79-105)") {
    val df = userDf(Seq(
      (None, Some("Alice"), None), (None, Some("Bob"), None),
      (None, Some("Charlie"), None)))
    val r = IndexedValidation.validate(df, userSpec)
    assert(r.errors.size === 1)
    assert(r.errorRowIndices === Seq(0L, 1L, 2L))
    assert(r.validRows === 0)
    assert(r.errorRate === 1.0)
    assert(r.successRate === 0.0)
    assert(r.cleanData.count() === 0)
    assert(r.cleanData.schema.fieldNames.toSeq === Seq("id", "name", "email"))
  }

  test("no errors: clean equals original in order (test_validate.py:13-38)") {
    val df = userDf(Seq(
      (Some(1L), Some("Alice"), None),
      (Some(2L), Some("Bob"), Some("bob@example.com"))))
    val r = IndexedValidation.validate(df, userSpec)
    assert(!r.hasErrors)
    assert(r.errorRate === 0.0 && r.successRate === 1.0)
    assert(r.cleanData.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("missing column: error_rows covers all rows (test_validate.py:186-226)") {
    val df = Seq("Alice", "Bob").toDF("name")
    val r = IndexedValidation.validate(df, userSpec)
    assert(r.errors.size === 1)
    assert(r.errors.head.errorType === "missing_required_column")
    assert(r.errors.head.errorRows === Some(Seq(0L, 1L)))
    assert(r.validRows === 0)
  }

  test("empty frame: no errors even with missing column (test_validate.py:228-254)") {
    val df = Seq.empty[String].toDF("name")
    val r = IndexedValidation.validate(df, userSpec)
    assert(!r.hasErrors)
    assert(r.totalRows === 0)
    assert(r.errorRate === 0.0)
    assert(r.successRate === 1.0)
  }

  test("extended constraints carry indices too") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("v", LongType, constraints = Seq(Minimum(10)))))
    val df = Seq(11L, 3L, 15L, 4L).toDF("v")
    val r = IndexedValidation.validate(df.coalesce(1), spec)
    val err = r.errors.find(_.errorType == "minimum").get
    assert(err.errorRows === Some(Seq(1L, 3L)))
  }
}

class IcebergEmulationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("DDL renders iceberg schema with partition transforms") {
    val ddl = IcebergEmulation.createTableDdl(
      graft.io.ClipsGenerator.spec, "lake.audio.clips")
    assert(ddl.startsWith("CREATE TABLE lake.audio.clips ("))
    assert(ddl.contains("clip_id STRING NOT NULL"))
    assert(ddl.contains("bytes BINARY NOT NULL"))
    assert(ddl.contains("sr_hz INT NOT NULL"))
    assert(ddl.contains("USING iceberg"))
    assert(ddl.contains("PARTITIONED BY (codec, bucket(256, clip_id))"))
  }

  test("emulated round-trip preserves rows and partition layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ice").toString
    val clips = graft.io.ClipsGenerator.clips(spark, 500, 4).toDF()
    IcebergEmulation.write(clips, graft.io.ClipsGenerator.spec, s"$tmp/clips")
    val back = IcebergEmulation.read(spark, s"$tmp/clips")
    assert(back.count() === 500)
    // Hive layout: codec=... subdirectories exist
    val dirs = new java.io.File(s"$tmp/clips").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("codec=")))
    // partition pruning: reading one codec scans a subset
    val one = back.where(org.apache.spark.sql.functions.col("codec") === "flac")
    assert(one.count() > 0 && one.count() < 500)
  }
}
