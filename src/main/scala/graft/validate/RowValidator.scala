package graft.validate

import graft.result.ValidationError
import graft.spec._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named check = (column, constraint), with a stable position in the
  * per-row violation array so per-check counters need no explode. */
final case class CheckRef(columnName: String, constraint: Constraint) {
  def id: String = s"${constraint.id}"
  def qualified: String = s"$columnName.${constraint.id}"
}

/** Distributed row-level validation — replaces the reference's eager
  * driver-side loop (`/root/reference/src/fastdataframe/polars/model.py:351-466`,
  * the O(n·k) per-row slice+concat at :439-456 that SURVEY.md §3.3 flags as
  * the single-node bottleneck) with ONE declarative projection evaluated by
  * Tungsten codegen:
  *
  *   annotated = df + array<struct<column_name, constraint_id, observed_value>>
  *               (fixed positions; NULL entry = check passed)
  *
  * from which violations (explode of non-null entries), clean rows
  * (all-null array) and per-partition summaries (groupBy + positional
  * counters) all derive without any driver materialization. Violation rows
  * are keyed by business key, not row index (north rule:
  * `(clip_id, constraint_id, observed_value)`) — global row numbers don't
  * distribute (SURVEY.md §7.4 risk 3).
  *
  * Scale notes (100 TB / 10^12 rows):
  *  - The violation array is computed in the scan's projection: no shuffle,
  *    whole-stage codegen, and Parquet column pruning still applies to
  *    columns without checks (never read `bytes` unless a constraint needs it).
  *  - `violations` and `summary` project only key/partition/check columns —
  *    the wide payload column is pruned from those plans.
  *  - `summary` is a partial-aggregated groupBy on low-cardinality partition
  *    columns: map-side combine reduces it to O(partitions) rows.
  */
object RowValidator {

  val ViolationsCol = "_graft_violations"

  private val violStruct = (name: String, cid: String, obs: Column) =>
    struct(lit(name).as("column_name"), lit(cid).as("constraint_id"),
      obs.as("observed_value"))

  /** Observed value rendered as string; binary via base64 (a raw audio blob
    * cast to string is not meaningful). */
  private def observed(c: Column, dt: DataType): Column = dt match {
    case BinaryType => base64(c)
    case _ => c.cast(StringType)
  }

  /** All (column, constraint) checks for the columns present in `schema`;
    * required-but-absent columns are returned separately. */
  def planChecks(spec: TableSpec, schema: StructType,
      alias: AliasType = AliasType.Serialization): (Seq[CheckRef], Seq[String]) = {
    val present = schema.fieldNames.toSet
    val checks = spec.columns.flatMap { c =>
      val n = c.nameFor(alias)
      if (present.contains(n)) c.rowConstraints.map(CheckRef(n, _)) else Nil
    }
    val missingRequired = spec.columns
      .filter(c => !c.nullable && !present.contains(c.nameFor(alias)))
      .map(_.nameFor(alias))
    (checks, missingRequired)
  }

  /** The per-row violation entry for one check: NULL iff the check passes. */
  def violationExpr(spec: TableSpec, check: CheckRef): Column = {
    val cSpec = spec.columns.find(c => c.name == check.columnName ||
      c.serializationAlias.contains(check.columnName) ||
      c.validationAlias.contains(check.columnName)).get
    val c = col(check.columnName)
    when(!check.constraint.holds(c),
      violStruct(check.columnName, check.constraint.id, observed(c, cSpec.dataType)))
  }

  /** df + the fixed-position violation array. */
  def annotate(df: DataFrame, spec: TableSpec,
      alias: AliasType = AliasType.Serialization): (DataFrame, Seq[CheckRef], Seq[String]) = {
    val (checks, missing) = planChecks(spec, df.schema, alias)
    val entries: Seq[Column] =
      checks.map(violationExpr(spec, _)) ++
        // a required-but-absent column poisons every row (reference semantics:
        // missing column ⇒ all rows invalid, polars/model.py:427-437)
        missing.map(m => violStruct(m, "missing_required_column", lit(null).cast(StringType)))
    val arr = if (entries.isEmpty) array().cast(
      ArrayType(StructType(Seq(
        StructField("column_name", StringType),
        StructField("constraint_id", StringType),
        StructField("observed_value", StringType)))))
    else array(entries: _*)
    (df.withColumn(ViolationsCol, arr), checks, missing)
  }

  def validate(df: DataFrame, spec: TableSpec,
      alias: AliasType = AliasType.Serialization): ValidationRun = {
    val (annotated, checks, missing) = annotate(df, spec, alias)
    ValidationRun(df, annotated, spec, checks, missing)
  }
}

/** Lazy handles over the annotated plan; each member is its own Spark plan
  * (no eager work at construction). */
final case class ValidationRun(
    source: DataFrame,
    annotated: DataFrame,
    spec: TableSpec,
    checks: Seq[CheckRef],
    missingRequired: Seq[String],
) {
  import RowValidator.ViolationsCol

  private def keyCols: Seq[Column] = spec.keyCols.map(col)
  private def partCols: Seq[Column] = spec.partitionCols.map(col)

  private def failedEntries: Column =
    filter(col(ViolationsCol), _.isNotNull)

  /** Row-level violations: (keys..., partitions..., column_name,
    * constraint_id, observed_value). Column-pruned: only key/partition/check
    * columns are read. */
  def violations: DataFrame = {
    val v = explode(failedEntries).as("v")
    annotated
      .select((keyCols ++ partCols :+ v): _*)
      .select((spec.keyCols ++ spec.partitionCols).map(col) ++ Seq(
        col("v.column_name"), col("v.constraint_id"), col("v.observed_value")): _*)
  }

  /** Rows passing every check, original schema. Reference parity: any
    * missing required column empties the result while keeping the schema
    * (`tests/polars/test_validate.py` "missing column ⇒ all rows invalid"). */
  def clean: DataFrame =
    annotated.where(size(failedEntries) === 0).drop(ViolationsCol)

  /** Per-partition pass/fail summary with per-constraint counters — one
    * partial-aggregated job, no explode (positional counters over the fixed
    * array layout). */
  def summary: DataFrame = {
    val n = checks.size + missingRequired.size
    val perCheck: Seq[Column] = (0 until n).map { i =>
      coalesce(sum(when(col(ViolationsCol)(i).isNotNull, 1L).otherwise(0L)), lit(0L))
    }
    val ids: Seq[String] =
      checks.map(_.qualified) ++ missingRequired.map(m => s"$m.missing_required_column")
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("total_rows"),
      coalesce(sum(when(size(failedEntries) > 0, 1L).otherwise(0L)), lit(0L))
        .as("error_rows")) ++
      (if (n > 0) Seq(map_from_arrays(
        array(ids.map(lit): _*),
        array(perCheck: _*)).as("violations_by_constraint"))
      else Nil)
    val grouped =
      if (spec.partitionCols.nonEmpty)
        annotated.groupBy(partCols: _*).agg(aggs.head, aggs.tail: _*)
      else annotated.agg(aggs.head, aggs.tail: _*)
    grouped
      .withColumn("valid_rows", col("total_rows") - col("error_rows"))
      // 0-row partition ⇒ error_rate 0.0 / success 1.0 (core/validation.py:41-56)
      .withColumn("error_rate",
        when(col("total_rows") === 0, 0.0)
          .otherwise(col("error_rows").cast(DoubleType) / col("total_rows")))
      .withColumn("success_rate", lit(1.0) - col("error_rate"))
      .withColumn("passed", col("error_rows") === 0)
  }

  /** Driver-side error list, reference taxonomy
    * (`polars/model.py:411-437`): one aggregation job over projected columns.
    * NotNull failures ⇒ error_type "null_in_required_field", message
    * "Required field '{f}' contains null values" (:420-421); absent required
    * columns ⇒ "missing_required_column", "Required column '{f}' is missing
    * from DataFrame" (:432-433) — except on an empty frame, where the
    * reference emits nothing (`tests/polars/test_validate.py:228-254`). */
  def errors(): Seq[ValidationError] = {
    val n = checks.size + missingRequired.size
    val perCheck: Seq[Column] = (0 until n).map { i =>
      coalesce(sum(when(col(RowValidator.ViolationsCol)(i).isNotNull, 1L)
        .otherwise(0L)), lit(0L)).as(s"c$i")
    }
    val row = annotated.agg(count(lit(1)).as("total"), perCheck: _*).head()
    val total = row.getLong(0)
    val all = checks.map(c => (c.columnName, c.constraint.id)) ++
      missingRequired.map(m => (m, "missing_required_column"))
    all.zipWithIndex.flatMap { case ((colName, cid), i) =>
      val cnt = row.getLong(i + 1)
      if (cnt == 0) None
      else Some(cid match {
        case "not_null" => ValidationError(colName, "null_in_required_field",
          s"Required field '$colName' contains null values")
        case "missing_required_column" => ValidationError(colName, "missing_required_column",
          s"Required column '$colName' is missing from DataFrame")
        case other => ValidationError(colName, other,
          s"Field '$colName' violates constraint '$other' on $cnt of $total rows")
      })
    }
  }
}
