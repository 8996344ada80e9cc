package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential quality-filter pipeline with per-rule attribution — the
  * C4/Gopher-style curation step ("drop too-short, then too-long, then
  * low-stopword, then low-quality docs") whose published artifact is the
  * per-rule removal report.
  *
  * Rules are `(name, passPredicate)` applied IN ORDER; a row is removed by
  * the FIRST rule it fails and kept iff it passes all. A NULL predicate
  * value counts as a FAIL of that rule (a row the rule cannot score must
  * be flagged there, not silently passed along).
  *
  * Scale shape — the contrast with [[graft.dedup.Dedup.cascade]] is the
  * point: dedup stages need cross-row joins, so the cascade pays one
  * materialization per stage; quality rules are ROW-LOCAL, so the
  * sequential semantics collapse into a single when-chain — attribution,
  * filtering, and the full report are each ONE scan with no joins, no
  * repeated passes, and only a rule-name-keyed count exchange regardless
  * of rule count. At 100 TB the report costs exactly one read.
  */
object FilterReport {

  /** Attribution label for rows that pass every rule. */
  val KeptLabel = "_kept"

  /** The input plus an attribution column: the name of the first rule the
    * row fails, or [[KeptLabel]]. One when-chain — no joins, no state. */
  def attributed(df: DataFrame, rules: Seq[(String, Column)],
      attrCol: String = "_removed_by"): DataFrame = {
    require(rules.nonEmpty, "FilterReport needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique (they key the report)")
    require(!rules.exists(_._1 == KeptLabel),
      s"'$KeptLabel' is the reserved pass-through label")
    // withColumn would silently CLOBBER an existing column of this name
    // (e.g. re-filtering a previously attributed frame) — refuse instead;
    // that is what the attrCol parameter is for
    require(!df.columns.contains(attrCol),
      s"input already has a '$attrCol' column — pass a different attrCol")
    val attr = rules.foldRight(lit(KeptLabel)) { case ((name, pass), acc) =>
      when(!coalesce(pass, lit(false)), lit(name)).otherwise(acc)
    }
    df.withColumn(attrCol, attr)
  }

  /** Rows surviving every rule (attribution column dropped). */
  def keep(df: DataFrame, rules: Seq[(String, Column)],
      attrCol: String = "_removed_by"): DataFrame =
    attributed(df, rules, attrCol).where(col(attrCol) === KeptLabel)
      .drop(attrCol)

  /** The curation report: one row per rule,
    * `(rule, removed, surviving)` — removed = rows whose FIRST failure is
    * this rule, surviving = rows left after it (order-sensitive, like the
    * dedup cascade's report). One scan + one tiny grouped count; the
    * cumulative arithmetic runs on O(rules) driver-side longs. */
  def report(df: DataFrame, rules: Seq[(String, Column)],
      attrCol: String = "_removed_by"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = attributed(df, rules, attrCol)
      .groupBy(col(attrCol)).agg(count(lit(1)).as("n"))
      .collect() // O(rules + 1) rows
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var surviving = counts.values.sum
    val rows = rules.map { case (name, _) =>
      val removed = counts.getOrElse(name, 0L)
      surviving -= removed
      (name, removed, surviving)
    }
    rows.toDF("rule", "removed", "surviving")
  }
}
