package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & split assignment for training-data pipelines.
  *
  * Everything here is keyed on a CONTENT identifier, never on randomness or
  * layout: the same row lands in the same sample/split on every run, every
  * cluster size, every partition order — the property a reproducible
  * train/val/test separation (and an incremental pipeline that must not
  * re-shuffle history) actually needs. `Dataset.sample` gives none of that
  * (seed + partition-layout dependent), which is why this module exists.
  *
  * The uniform is engine-portable by construction (md5 → hex slice →
  * integer divide, no engine-specific hash), so an external system — or the
  * DuckDB oracle — reproduces membership bit-for-bit.
  *
  * Scale shape: every operator is a scan-only projection/filter (codegen'd
  * md5 + substring + conv per row, no shuffle, no state). Sampling 100 TB
  * is exactly one pass that writes the kept fraction.
  */
object Sampling {

  /** 2^60 — the uniform's denominator (15 hex digits = 60 bits). */
  private val Denom = 1152921504606846976d

  /** Deterministic unit-uniform in [0, 1): top 60 bits of md5(key) over
    * 2^60. 60 bits keeps the value exactly representable as both a Long and
    * a Double (IEEE doubles hold 2^53 integers exactly — but the QUOTIENT
    * here is a dyadic rational either engine computes identically from the
    * same 60-bit integer, which is what membership compares). NULL keys get
    * a NULL uniform — callers decide (filters drop, splits label). */
  def unitUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(Denom)

  /** Salted uniform: decorrelates two decisions on the same key (a row's
    * sample membership must not predict its split, so each decision salts
    * its own purpose string). */
  def unitUniform(key: Column, purpose: String): Column =
    unitUniform(concat(key.cast("string"), lit(":" + purpose)))

  /** Stratified deterministic sample: keep a row iff
    * unitUniform(id, "sample") < rate(stratum). Per-stratum rates with a
    * default for unlisted strata; a NULL stratum uses the default. Expected
    * kept fraction per stratum is exactly the rate; membership is stable
    * under any append/reorder of OTHER rows. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame =
    df.where(sampleFlag(df, idCol, strataCol, rates, defaultRate))

  /** The membership predicate behind [[stratifiedSample]], exposed so a
    * summary query can COUNT members without materializing them. */
  def sampleFlag(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): Column = {
    val u = unitUniform(col(idCol), "sample")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    u < rate
  }

  /** Deterministic split assignment: label each row by where its uniform
    * falls in the cumulative [0,1) bands of `splits` (label → fraction,
    * fractions sum to ≤ 1; a remainder would be unlabeled — callers pass a
    * full partition). Assignment is per-row independent, so every split is
    * itself an unbiased sample and splits are DISJOINT by construction.
    * Prefer dyadic fractions (0.75/0.125/0.125): their cumulative sums are
    * exact in binary, so band edges carry no accumulated rounding and any
    * external reimplementation (SQL oracle included) lands identical rows.
    * A NULL id yields a NULL label (flag, don't guess). */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    val fracSum = splits.map(_._2).sum
    require(fracSum <= 1.0 + 1e-12, s"split fractions sum to $fracSum > 1")
    val u = unitUniform(col(idCol), "split")
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    val labeled = splits.zip(cums).foldRight(lit(null).cast("string")) {
      case (((label, _), cum), acc) => when(u < cum, label).otherwise(acc)
    }
    // foldRight builds when(u<c1, l1).otherwise(when(u<c2, l2)...) — the
    // FIRST band whose upper edge exceeds u wins, matching a SQL CASE chain
    df.withColumn(splitCol, labeled)
  }

  /** LEAKAGE-SAFE split assignment: rows whose ids share a GROUP (a
    * near-dup cluster from [[graft.dedup.Dedup.connectedComponents]], a
    * source-document family, any equivalence class) must land in the SAME
    * split — otherwise the eval set leaks training data through
    * near-copies, the standard contamination failure row-level splitting
    * cannot see. Each row's split is decided by the uniform of its GROUP
    * KEY — the group label where one exists, the row's own id for
    * singletons — so group cohesion is STRUCTURAL (one key, one label,
    * decided by arithmetic), not checked after the fact. `groups` is an
    * `(idCol, groupCol)` frame with at most one row per id (components
    * output qualifies: one label per node).
    *
    * Scale shape: one left join of the corpus against the grouped subset
    * (tiny — only docs that belong to some cluster; broadcast when it
    * fits), then the identical scan-only band arithmetic as
    * [[assignSplits]]. The salt is the same "split" purpose string, so a
    * singleton doc keeps the exact label plain [[assignSplits]] would give
    * it — adding the leakage guard never reshuffles unclustered history. */
  def assignGroupedSplits(df: DataFrame, idCol: String, groups: DataFrame,
      groupCol: String, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    val g = groups.select(col(idCol), col(groupCol).as("_grp"))
    val keyed = df.join(g, Seq(idCol), "left_outer")
      .withColumn("_split_key", coalesce(col("_grp"), col(idCol)))
    assignSplits(keyed, "_split_key", splits, splitCol)
      .drop("_grp", "_split_key")
  }
}
