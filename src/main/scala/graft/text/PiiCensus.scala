package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / sensitive-pattern census — the standard training-data hygiene scan
  * (emails, phone numbers, IP addresses) run BEFORE a corpus ships: per-class
  * counts of affected documents and total matches, plus a per-document
  * annotation for the redaction pass. (The reference library is schema-only;
  * this is one of the pipeline extensions the task mandates.)
  *
  * Scale shape — the [[FilterReport]] discipline: the rules are row-local
  * regex counts, so the whole census is ONE scan-only projection at any rule
  * count; the only exchange carries (pii_class, partial counts) — classes ×
  * partitions rows, never documents. Regexes stick to the portable
  * character-class subset (no lookaround, no backrefs) so Java regex (Spark)
  * and RE2 (DuckDB et al.) match identically and an external SQL engine can
  * replay the census byte-for-byte.
  */
object PiiCensus {

  /** (class name, regex) — the three standard scrub classes. Patterns are
    * deliberately simple structural matchers (the census/redaction
    * trade-off: recall over precision; a validator flags, it doesn't
    * adjudicate). */
  val DefaultRules: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4" -> "([0-9]{1,3}[.]){3}[0-9]{1,3}",
  )

  private def validateRules(rules: Seq[(String, String)]): Unit = {
    require(rules.nonEmpty, "PiiCensus needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule class names must be unique (they key the census)")
  }

  /** Per-document match counts: the input plus one `<class>_matches` column
    * per rule — the annotation a redaction pass filters on. NULL text
    * counts 0 for every class (nothing to scrub). One projection. */
  def perDocument(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = DefaultRules): DataFrame = {
    validateRules(rules) // a duplicate name would silently CLOBBER its column
    rules.foldLeft(df) { case (acc, (name, re)) =>
      acc.withColumn(s"${name}_matches",
        coalesce(regexp_count(col(textCol), lit(re)), lit(0)))
    }
  }

  /** The census: one row per rule class,
    * `(pii_class, docs_hit, total_matches)` — classes with zero hits are
    * KEPT (a hygiene report must positively state "0 emails found", not
    * omit the class). One scan; the per-row rule evaluations are exploded
    * as (class, count) pairs and partially aggregated map-side, so the
    * exchange is counts-only. */
  def census(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = DefaultRules): DataFrame = {
    validateRules(rules)
    val entries = rules.map { case (name, re) =>
      struct(lit(name).as("pii_class"),
        coalesce(regexp_count(col(textCol), lit(re)), lit(0)).as("matches"))
    }
    df.select(explode(array(entries: _*)).as("_e"))
      .select(col("_e.pii_class").as("pii_class"), col("_e.matches").as("_m"))
      .groupBy(col("pii_class"))
      .agg(sum(when(col("_m") > 0, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("_m")).cast("long").as("total_matches"))
  }
}
