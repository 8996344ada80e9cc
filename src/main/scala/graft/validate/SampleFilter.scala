package graft.validate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-sampling predicate shared by the sampled audio
  * checks ([[AudioInvariantCheck]], [[FrequencyCheck]], the fused
  * [[ValidationSuite]]): `xxhash64(key) pmod sampleEvery == 0`.
  *
  * Null-safe (round-5 verdict): a NULL key hashes as the empty string —
  * the raw form's `pmod(xxhash64(NULL), k)` is NULL, which silently drops
  * the row from the sample on foreign data with null keys. For non-null
  * keys the predicate is value-identical to the raw form (`coalesce` is a
  * no-op), so sampled subsets and their oracles are unchanged. At
  * `sampleEvery <= 1` [[sampledOrAll]] returns a constant-true predicate —
  * a full census must not pay (or depend on) the hash at all; use it
  * rather than re-implementing the guard at each call site.
  */
object SampleFilter {
  def hashSampled(key: Column, sampleEvery: Int): Column =
    pmod(xxhash64(coalesce(key.cast("string"), lit(""))), lit(sampleEvery)) === 0

  /** The predicate every sampled check should use: constant true for a
    * full census, the hash filter otherwise (Catalyst folds `lit(true)`
    * away, so the census plan carries no trace of the sampler). */
  def sampledOrAll(key: Column, sampleEvery: Int): Column =
    if (sampleEvery <= 1) lit(true) else hashSampled(key, sampleEvery)
}
