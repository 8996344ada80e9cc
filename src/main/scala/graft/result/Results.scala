package graft.result

/** Structured validation error — field-for-field parity with the reference's
  * `ValidationError` (`/root/reference/src/fastdataframe/core/validation.py:11-17`:
  * column_name, error_type, error_details, error_rows). `errorRows` is only
  * populated by the small-scale index-parity path; the scale path keys
  * violations on business keys instead (SURVEY.md §7.4 risk 3). */
final case class ValidationError(
    columnName: String,
    errorType: String,
    errorDetails: String,
    errorRows: Option[Seq[Long]] = None,
)

/** One row-level violation — the north rule's
  * `(clip_id, constraint_id, observed_value)` triple generalized: `key` is the
  * row's business key rendered as string(s) upstream, here the flattened
  * violation payload. */
final case class Violation(
    columnName: String,
    constraintId: String,
    observedValue: String,
)

/** Per-partition pass/fail summary row (north rule: "per-partition pass/fail
  * summaries"). Rates follow `core/validation.py:41-56`: 0 rows ⇒
  * errorRate 0.0, successRate 1.0. */
final case class PartitionSummary(
    partition: Map[String, String],
    totalRows: Long,
    errorRows: Long,
    validRows: Long,
) {
  def errorRate: Double = if (totalRows == 0) 0.0 else errorRows.toDouble / totalRows
  def successRate: Double = 1.0 - errorRate
  def passed: Boolean = errorRows == 0
}
