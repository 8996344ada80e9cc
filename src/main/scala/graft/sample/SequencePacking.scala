package graft.sample

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Concat-and-chunk sequence packing — the layout step between a curated
  * corpus and a token-budgeted training run: documents are concatenated in
  * a deterministic id order and sliced into fixed-size token chunks, so
  * every doc needs its exact GLOBAL token offset (the running sum of all
  * earlier docs' token counts).
  *
  * A naive `sum(...).over(Window.orderBy(id))` computes that prefix sum in
  * ONE task (an unpartitioned window collapses the whole table into a
  * single sort) — the classic scale killer. This module does the textbook
  * two-pass distributed scan instead:
  *
  *   1. range-partition the narrow `(id, size)` projection by id and pin
  *      the layout (`localCheckpoint` — partition ids must be identical
  *      across the two downstream actions; range boundaries come from a
  *      sample, so an unpinned plan may re-draw them per action);
  *   2. per-partition totals → driver prefix-scan (O(partitions), the
  *      [[graft.checkpoint.ManifestCheckpoint]] collect discipline) →
  *      broadcast base offsets back;
  *   3. a within-partition cumulative window (each range partition is one
  *      window group, so the sort parallelism IS the partition count).
  *
  * The result is exact and partitioning-invariant: offsets depend only on
  * the id order, never on where the range boundaries landed, so the same
  * corpus packs identically at any cluster size — the reproducibility a
  * resumable training run needs.
  *
  * Scale shape: one narrow range shuffle (id + one long per row; the text
  * payload never moves), one O(partitions) driver collect, scan-local
  * chunk arithmetic. Packing 100 TB is two passes over 16 bytes/row.
  */
object SequencePacking {

  /** Exact global token offset per row: sum of `sizeCol` over all rows
    * with a strictly smaller `idCol` (NULL sizes count 0; ids must be
    * unique — ties would make the offsets among tied rows arbitrary).
    * Returns `(id, size, offsetCol)`, one row per input row. */
  def withOffsets(df: DataFrame, idCol: String, sizeCol: String,
      offsetCol: String = "token_offset", partitions: Int = 0): DataFrame = {
    val s = df.sparkSession
    val p = if (partitions > 0) partitions
      else s.sparkContext.defaultParallelism
    val ranged = df
      .select(col(idCol), coalesce(col(sizeCol).cast("long"), lit(0L))
        .as(sizeCol))
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin _pid across the totals action + the window
    val totals = ranged.groupBy(col("_pid"))
      .agg(sum(col(sizeCol)).as("_t"))
      .collect() // O(partitions) — same discipline as manifest collects
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // base offset for pid = sum of totals of all SMALLER pids: the plain
    // exclusive prefix sum of the pid-sorted totals
    val baseRows = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
      .map { case (pid, base) => Row(pid.toLong, base) }
    val baseDf = s.createDataFrame(
      s.sparkContext.parallelize(baseRows.toSeq, 1),
      StructType(Seq(StructField("_pidl", LongType, nullable = false),
        StructField("_base", LongType, nullable = false))))
    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(baseDf), col("_pid") === col("_pidl"))
      .withColumn(offsetCol,
        col("_base") + coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .drop("_pid", "_pidl", "_base")
  }

  /** Packing report for a token budget of `chunkTokens` per training
    * sequence: per doc, its exact offset, the first and last chunk it
    * lands in, and whether it crosses a chunk boundary (docs a
    * non-splitting loader would have to drop or truncate — the number a
    * pipeline tunes `chunkTokens` against). A zero/NULL-size doc occupies
    * no tokens: it reports its boundary chunk with `chunk_last` =
    * `chunk_first`. */
  def packReport(df: DataFrame, idCol: String, sizeCol: String,
      chunkTokens: Long, partitions: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val off = withOffsets(df, idCol, sizeCol, "token_offset", partitions)
    off
      .withColumn("chunk_first",
        expr(s"token_offset div ${chunkTokens}L"))
      .withColumn("chunk_last",
        expr(s"(token_offset + greatest(`$sizeCol`, 1L) - 1L) div " +
          s"${chunkTokens}L"))
      .withColumn("crosses_chunk", col("chunk_last") > col("chunk_first"))
  }

  /** Corpus-level packing census: total docs/tokens, chunk count, docs
    * crossing a boundary, and the fill fraction of the final chunk — the
    * one-row summary a budget-tuning sweep compares across `chunkTokens`
    * values (a low fill on the last chunk is waste; many crossing docs
    * means a non-splitting loader truncates). Empty input reports zeros,
    * not NULLs. */
  def packSummary(df: DataFrame, idCol: String, sizeCol: String,
      chunkTokens: Long, partitions: Int = 0): DataFrame = {
    val rep = packReport(df, idCol, sizeCol, chunkTokens, partitions)
    val total = coalesce(sum(col(sizeCol)), lit(0L))
    rep.agg(
        count(lit(1)).as("docs"),
        total.as("total_tokens"),
        coalesce(sum(when(col("crosses_chunk"), 1L).otherwise(0L)), lit(0L))
          .as("docs_crossing"))
      // ceil(total/chunkTokens) by exact integer `div`, NOT
      // max(chunk_last)+1: a trailing zero-size doc whose offset lands
      // exactly on a chunk boundary reports its boundary chunk one past
      // the last token-bearing one, which would over-count `chunks` by one
      // and read final_chunk_fill 0.0 for a perfectly filled corpus
      // (round-8 advice)
      .withColumn("chunks",
        expr(s"(total_tokens + ${chunkTokens - 1}L) div ${chunkTokens}L"))
      // tokens landing in the final chunk / chunkTokens; exactly 1.0 for
      // a perfectly filled last chunk, 0.0 for an empty corpus
      .withColumn("final_chunk_fill",
        when(col("chunks") === 0, 0.0)
          .otherwise((col("total_tokens")
            - (col("chunks") - 1) * chunkTokens)
            .cast("double") / chunkTokens))
      .select("docs", "total_tokens", "chunks", "docs_crossing",
        "final_chunk_fill")
  }
}
