package graft.validate

import graft.spec.TableSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level profiling (north rule: "column stats"): per-partition
  * min/max/count/null-count/mean/stddev plus approximate distinct counts —
  * all in ONE partial-aggregated pass (map-side combine ⇒ O(groups) shuffle
  * rows, no second scan). The reference computes nothing like this; its only
  * "stats" are Python `len` counts (`polars/model.py:390`). */
object ColumnStats {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Wide stats row per group: for each requested column —
    * nulls, distinct (HLL), and for numerics min/max/avg/stddev. */
  def profile(df: DataFrame, cols: Seq[String], groupBy: Seq[String] = Nil): DataFrame = {
    val schema = df.schema
    val aggs: Seq[Column] = Seq(count(lit(1)).as("total_rows")) ++ cols.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}_nulls"),
        approx_count_distinct(col(c)).as(s"${c}_approx_distinct"))
      val numeric = if (isNumeric(dt)) Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        avg(col(c)).as(s"${c}_avg"),
        stddev_samp(col(c)).as(s"${c}_stddev"))
      else Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
      base ++ numeric
    }
    if (groupBy.nonEmpty)
      df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    else df.agg(aggs.head, aggs.tail: _*)
  }

  /** Profile every column of a spec'd table, grouped by its partition
    * columns. */
  def profile(df: DataFrame, spec: TableSpec): DataFrame =
    profile(df,
      spec.columns.map(_.name).filterNot(spec.partitionCols.contains),
      spec.partitionCols)
}
