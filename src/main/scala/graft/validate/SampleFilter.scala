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
  * no-op), so sampled subsets and their oracles are unchanged. Callers
  * skip the filter entirely at `sampleEvery <= 1` — a full census must
  * not pay (or depend on) the hash at all.
  */
object SampleFilter {
  def hashSampled(key: Column, sampleEvery: Int): Column =
    pmod(xxhash64(coalesce(key.cast("string"), lit(""))), lit(sampleEvery)) === 0
}
