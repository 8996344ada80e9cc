package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column validation census — the vector hygiene scan an
  * ANN/near-dup pipeline needs BEFORE it trusts `Array[Float]` payloads:
  * a single NaN poisons every dot product it touches (NaN propagates
  * through sums and breaks top-k ordering), a wrong-dimension vector
  * crashes or silently truncates the kernel, a zero vector makes cosine
  * undefined, and an un-normalized vector silently re-weights
  * inner-product similarity. All five failure shapes are cheap to detect
  * in one scan and expensive to debug downstream.
  *
  * Verdict bands, first match wins (the when-chain order any oracle
  * replay must mirror):
  *   - `null_vector`   — column NULL
  *   - `wrong_dim`     — length ≠ the declared model dimension
  *   - `null_element`  — any element NULL (three-valued logic would
  *     otherwise slide such a vector past EVERY later test to `ok`:
  *     `exists(isnan)` over a null element is NULL, the aggregate norm is
  *     NULL, and a NULL compare never fires a when-branch — yet the null
  *     element still poisons downstream dot products)
  *   - `non_finite`    — any element NaN or ±Inf
  *   - `zero_vector`   — all elements exactly 0 (norm 0; cosine undefined)
  *   - `not_unit_norm` — |norm − 1| > tolerance (default 1e-3; organic
  *     vectors in this table sit within 2e-7 of 1, so the band has ~4
  *     orders of margin on both sides — a planted 2× scale lands at 2.0)
  *   - `ok`
  *
  * Everything is native codegen'd higher-order functions (`size`,
  * `exists`, `aggregate`) — no UDF, no deserialization of the array into
  * JVM objects; the census exchanges only (band, count) pairs, vectors
  * never move.
  */
object EmbeddingCheck {

  val Bands: Seq[String] = Seq("null_vector", "wrong_dim", "null_element",
    "non_finite", "zero_vector", "not_unit_norm", "ok")

  /** Squared L2 norm as a codegen'd fold (float summed in double). */
  def normSq(vec: Column): Column =
    aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** The band column for a vector column and declared dimension. */
  def bandCol(vec: Column, dim: Int, normTol: Double): Column = {
    val sq = normSq(vec)
    when(vec.isNull, "null_vector")
      .when(size(vec) =!= dim, "wrong_dim")
      .when(exists(vec, _.isNull), "null_element")
      .when(exists(vec, x => isnan(x) ||
        abs(x.cast("double")) === lit(Double.PositiveInfinity)),
        "non_finite")
      .when(sq === 0.0d, "zero_vector")
      .when(abs(sqrt(sq) - 1.0d) > normTol, "not_unit_norm")
      .otherwise("ok")
  }

  /** Per-row verdicts: the input plus `band` (and `norm` for triage). */
  def measure(df: DataFrame, vecCol: String, dim: Int,
      normTol: Double = 1e-3): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    require(normTol > 0, s"normTol must be positive: $normTol")
    df.withColumn("norm", sqrt(normSq(col(vecCol))))
      .withColumn("band", bandCol(col(vecCol), dim, normTol))
  }

  /** The census rollup: (band, vecs) — the only exchange. */
  def census(df: DataFrame, vecCol: String, dim: Int,
      normTol: Double = 1e-3): DataFrame =
    measure(df, vecCol, dim, normTol)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("vecs"))
}
