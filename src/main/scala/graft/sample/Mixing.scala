package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixture resampling — the "source weights" step of a
  * training-data pipeline: each source (domain, language, quality tier)
  * gets a target rate, where a rate below 1 downsamples and a rate above 1
  * UPSAMPLES (the row is emitted multiple times — epoch repetition for
  * high-value sources, the standard mixture recipe).
  *
  * A rate `r` expands to copies `k ∈ [0, ceil(r))`: copy k survives iff
  * `unitUniform(id:mix:k) < r − k`. Every copy below `floor(r)` survives
  * unconditionally (`r − k ≥ 1` there) and the final fractional copy
  * survives with exactly the fractional probability, so the expected
  * multiplicity is exactly `r` — and membership is a pure function of
  * (id, k) through the same md5 uniform as [[Sampling]], so the same row
  * expands to the same copies on every run, any cluster size, and in any
  * external replay (the DuckDB oracle reproduces membership
  * bit-for-bit). Prefer dyadic fractional parts (2.5, 1.25, 0.0625): the
  * survival compare `u < r − k` is then exact in double on every engine.
  *
  * Scale shape: one scan — a bounded `explode(sequence(0, maxCopies−1))`
  * (maxCopies = ceil(max rate), a mixture-config constant) followed by a
  * codegen'd filter; no shuffle, no state. The summary's (source, count)
  * pairs are the only thing that ever enters an exchange.
  */
object Mixing {

  /** Solve the per-source rates that hit a TOKEN BUDGET at target mixture
    * proportions — the planning step in front of [[resample]]: given each
    * source's token count `tokens`, desired proportions `props`
    * (normalized internally), and total budget `budgetTokens`, source s
    * must contribute `budget · p_s` tokens, so
    * `rate_s = budget · p_s / tokens_s`. Exact in expectation because
    * [[resample]]'s multiplicity is exactly the rate. Rates above
    * `maxRepetition` (epoch-repetition runaway on a tiny high-weight
    * source — the standard mixture failure) are CLAMPED and reported, so
    * the caller decides between accepting the shortfall and re-weighting;
    * the returned rates are what a run would actually use. Driver-side
    * pure function of O(sources) inputs (a pipeline gets `tokens` from
    * one aggregate over the corpus). */
  def ratesForBudget(tokens: Map[String, Long], props: Map[String, Double],
      budgetTokens: Long, maxRepetition: Double = 16.0)
      : (Map[String, Double], Map[String, Double]) = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    require(maxRepetition > 0, s"maxRepetition must be positive: $maxRepetition")
    require(props.nonEmpty, "props must be non-empty")
    val missing = props.keySet -- tokens.keySet
    require(missing.isEmpty, s"props name unknown sources: $missing")
    val bad = props.filter(_._2 < 0)
    require(bad.isEmpty, s"negative proportions: $bad")
    val total = props.values.sum
    require(total > 0, "proportions sum to zero")
    val raw = props.map { case (s, p) =>
      val t = tokens(s)
      require(t > 0, s"source $s has no tokens but positive proportion")
      s -> budgetTokens * (p / total) / t
    }
    val clamped = raw.filter(_._2 > maxRepetition)
    (raw.map { case (s, r) => s -> math.min(r, maxRepetition) }, clamped)
  }

  /** The per-row rate column for a source→rate map with a default. */
  private def rateCol(srcCol: String, rates: Map[String, Double],
      defaultRate: Double): Column =
    rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(srcCol) === s, lit(r)).otherwise(acc)
    }

  private def validate(rates: Map[String, Double],
      defaultRate: Double): Unit = {
    val bad = (rates.values.toSeq :+ defaultRate).filter(r => r < 0.0)
    require(bad.isEmpty, s"negative mixture rates: ${bad.mkString(", ")}")
  }

  /** Resampled frame: every surviving (row, copy) pair, with the copy
    * index in `copyCol` (0-based; downstream shuffling/packing treats each
    * copy as an independent row). Rows from unlisted sources use
    * `defaultRate`; a NULL source uses the default rate; a NULL id yields
    * a NULL uniform and the row is dropped (flag upstream — [[Sampling]]'s
    * filter posture). */
  def resample(df: DataFrame, idCol: String, srcCol: String,
      rates: Map[String, Double], defaultRate: Double,
      copyCol: String = "copy"): DataFrame = {
    validate(rates, defaultRate)
    val maxRate = (rates.values.toSeq :+ defaultRate).max
    val maxCopies = math.max(1, math.ceil(maxRate).toInt)
    val r = rateCol(srcCol, rates, defaultRate)
    val k = col(copyCol)
    val u = Sampling.unitUniform(
      concat(col(idCol).cast("string"), lit(":mix:"), k.cast("string")))
    df.withColumn(copyCol,
        explode(sequence(lit(0), lit(maxCopies - 1))))
      .where(u < r - k.cast("double"))
  }

  /** One-scan mixture summary: per source, input rows and output rows
    * (post-resampling multiplicity). Runs the identical survival
    * arithmetic as [[resample]] but keeps every (row, copy) candidate and
    * aggregates flags, so the report costs one scan + one
    * (source, counts) exchange and can never drift from the operator. */
  def resampleSummary(df: DataFrame, idCol: String, srcCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    validate(rates, defaultRate)
    val maxRate = (rates.values.toSeq :+ defaultRate).max
    val maxCopies = math.max(1, math.ceil(maxRate).toInt)
    val r = rateCol(srcCol, rates, defaultRate)
    val k = col("_copy")
    val u = Sampling.unitUniform(
      concat(col(idCol).cast("string"), lit(":mix:"), k.cast("string")))
    df.withColumn("_copy", explode(sequence(lit(0), lit(maxCopies - 1))))
      .withColumn("_kept", u < r - k.cast("double"))
      .groupBy(col(srcCol))
      .agg(
        sum(when(k === 0, 1L).otherwise(0L)).as("in_rows"),
        sum(when(coalesce(col("_kept"), lit(false)), 1L).otherwise(0L))
          .as("out_rows"))
  }
}
