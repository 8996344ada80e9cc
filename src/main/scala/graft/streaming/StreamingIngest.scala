package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest classification against a FROZEN corpus store — the
  * [[graft.dedup.Dedup.incrementalExact]] ingest shape at stream time:
  * every arriving document is fingerprinted and classified against the
  * corpus's `(fingerprint, keeper_id)` store ([[graft.dedup.Dedup
  * .fingerprintStore]]) the moment it lands, so an ingest pipeline knows
  * its duplicate-against-corpus rate per window WHILE streaming instead
  * of in the next batch job.
  *
  * Design notes for scale:
  *  - The store side is STATIC (a stream-static left join — stateless in
  *    Structured Streaming: each micro-batch joins against the table as
  *    of that batch; no state store involvement). With the store bucketed
  *    by fingerprint (the q39/q51 discipline) the static side is read in
  *    place; only the arriving batch's (fingerprint, id) pairs move.
  *  - The fingerprint is the SAME `TextAnalysis.fingerprint` the batch
  *    path uses — shared definition, the two paths cannot drift.
  *  - Classification here is two-status (dup_of_corpus / new): corpus
  *    membership is a pure per-row lookup. Duplicates WITHIN the stream
  *    are the stateful problem [[StreamingDedup.duplicateCounts]] already
  *    monitors; compose both for the full three-status ingest picture.
  *  - State per key is one count per (window, status) — two fixed
  *    statuses, bounded by the watermark horizon, row-volume independent.
  */
object StreamingIngest {

  /** Per-row classification: input plus (fingerprint, status, dup_of).
    * NULL text fingerprints to NULL and lands `new` with no keeper —
    * upstream null checks (q01) own that hygiene. */
  def classify(stream: DataFrame, textCol: String,
      store: DataFrame): DataFrame =
    stream
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .join(store.select(col("fingerprint"),
        col("keeper_id").as("dup_of")), Seq("fingerprint"), "left_outer")
      .withColumn("status",
        when(col("dup_of").isNotNull, "dup_of_corpus").otherwise("new"))

  /** The windowed ingest census: (window, status, docs) per event-time
    * window — the live duplicate-against-corpus rate. */
  def classifyCounts(stream: DataFrame, textCol: String, store: DataFrame,
      tsCol: String, windowDuration: String,
      watermarkDelay: String): DataFrame =
    classify(stream.withColumn(tsCol, col(tsCol).cast("timestamp")),
      textCol, store)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("status"))
      .agg(count(lit(1)).as("docs"))
}
