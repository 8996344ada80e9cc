package graft.validate

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-modal TEXT↔AUDIO consistency (round-5 verdict #8): a transcript
  * and its clip's duration must be jointly plausible — humans speak in a
  * bounded words-per-second band, so a 3-word transcript on a 9-second
  * clip (or a 12-word transcript on a 250 ms clip) is a labeling or
  * alignment error even when BOTH columns pass their per-column
  * constraints. This is the metadata-level sibling of the decode invariant
  * ([[AudioInvariantCheck]] checks bytes↔id, [[FrequencyCheck]] checks
  * bytes↔claimed content; this checks transcript↔dur_ms) — and unlike
  * those it needs no decode at all: a scan-only projection plus one
  * summary groupBy, so it runs on every row of 100 TB for the cost of
  * reading two narrow columns (the payload is never touched — keep it
  * pruned by selecting only the needed columns upstream).
  *
  * The rate arithmetic is one multiply and one divide of exact integers
  * (`tokens * 1000.0 / dur_ms`), so an external SQL engine reproduces
  * every verdict bit-for-bit — the same engine-portability discipline as
  * the exact-KS drift check. */
object CrossModalCheck {

  /** Speech below ~0.5 words/s means the audio mostly lacks the transcript
    * (or the duration is inflated); above ~40 words/s no human utterance
    * fits (normal speech is ~1.5-4 wps — the wide default band flags only
    * physical implausibility, not style). */
  val DefaultMinWps = 0.5
  val DefaultMaxWps = 40.0

  /** Claimed speaking rate in words per second. NULL-safe: null transcript
    * or null/non-positive duration yields NULL (its own verdict class). */
  def wordsPerSecond(transcript: Column, durMs: Column): Column =
    when(transcript.isNull || durMs.isNull || durMs <= 0, lit(null))
      .otherwise(TextAnalysis.tokenCount(transcript).cast("double") * 1000.0 /
        durMs.cast("double"))

  /** Per-row verdict: `unscorable` (either modality missing),
    * `too_slow`, `too_fast`, or `ok`. Boundary values are `ok` (strict
    * inequalities), so the band is closed — deterministic on exact-integer
    * rates. */
  def verdict(transcript: Column, durMs: Column,
      minWps: Double = DefaultMinWps, maxWps: Double = DefaultMaxWps): Column = {
    val wps = wordsPerSecond(transcript, durMs)
    when(wps.isNull, "unscorable")
      .when(wps < minWps, "too_slow")
      .when(wps > maxWps, "too_fast")
      .otherwise("ok")
  }

  /** Row-level view: (passthrough keyCols..., words_per_second, verdict). */
  def check(clips: DataFrame, keyCols: Seq[String],
      transcriptCol: String = "transcript", durMsCol: String = "dur_ms",
      minWps: Double = DefaultMinWps, maxWps: Double = DefaultMaxWps): DataFrame =
    clips.select(keyCols.map(col) ++ Seq(
      wordsPerSecond(col(transcriptCol), col(durMsCol)).as("words_per_second"),
      verdict(col(transcriptCol), col(durMsCol), minWps, maxWps)
        .as("verdict")): _*)

  /** Per-group roll-up: one row per group with the verdict-class counts —
    * the monitoring shape (counts are exact integers; nothing
    * engine-specific leaves the operator). */
  def summary(clips: DataFrame, groupCols: Seq[String],
      transcriptCol: String = "transcript", durMsCol: String = "dur_ms",
      minWps: Double = DefaultMinWps, maxWps: Double = DefaultMaxWps): DataFrame = {
    val v = verdict(col(transcriptCol), col(durMsCol), minWps, maxWps)
    def n(cls: String) =
      coalesce(sum(when(v === cls, 1L).otherwise(0L)), lit(0L))
    clips
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("total_rows"),
        n("ok").as("ok_rows"),
        n("too_slow").as("too_slow_rows"),
        n("too_fast").as("too_fast_rows"),
        n("unscorable").as("unscorable_rows"))
  }
}
