package graft.audio

/** Deterministic linear-interpolation sample-rate converter — the
  * rate-unification step of an audio training pipeline (mixed-rate ingest
  * → one model rate, typically 16 kHz).
  *
  * Phase arithmetic is exact-rational: output sample `i` sits at input
  * position `i·srFrom/srTo`, computed as a long integer quotient plus a
  * remainder-derived fraction — no accumulating floating-point phase, so
  * the conversion is bit-identical on every executor, at every
  * parallelism, and in any replay (the [[graft.sample.Sampling]]
  * determinism posture applied to DSP).
  *
  * Linear interpolation carries no anti-alias low-pass: it is adequate
  * when content is band-limited well below the TARGET Nyquist — true for
  * this table's generator tones (≤ 1099 Hz vs the 8 kHz Nyquist at
  * 16 kHz), and verified rather than assumed by
  * [[graft.validate.ResampleCheck]], which measures the claimed tone's
  * survival on every converted clip. A production path for full-band
  * content would prepend a windowed-sinc low-pass; the check's verdict
  * bands would surface exactly where that becomes necessary.
  */
object Resampler {

  /** Resample `samples` from `srFrom` to `srTo` Hz. Output length
    * `floor(n·srTo/srFrom)` (long arithmetic, no overflow for any real
    * clip); the final interpolation index clamps to the last input
    * sample. Same-rate input returns the input array unchanged (no copy —
    * callers treat audio buffers as immutable). Empty in → empty out. */
  def linear(samples: Array[Short], srFrom: Int, srTo: Int): Array[Short] = {
    require(srFrom > 0 && srTo > 0, s"rates must be positive: $srFrom→$srTo")
    if (srFrom == srTo || samples.length == 0) return samples
    val n = samples.length
    val outLen = (n.toLong * srTo / srFrom).toInt
    val out = new Array[Short](outLen)
    var i = 0
    while (i < outLen) {
      val posNum = i.toLong * srFrom // exact position numerator over srTo
      val idx = (posNum / srTo).toInt
      val frac = (posNum % srTo).toDouble / srTo
      val a = samples(idx)
      val b = samples(if (idx + 1 < n) idx + 1 else n - 1)
      val v = a + (b - a) * frac
      out(i) = math.round(v).toShort
      i += 1
    }
    out
  }
}
