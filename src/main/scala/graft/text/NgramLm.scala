package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From-scratch n-gram language-model perplexity scoring — the CCNet /
  * Gopher quality signal the published pipelines rank documents by
  * (reference has no analog; `validate_data`'s closest concern is
  * row-level constraint checks, `polars/model.py:439-456`). A bigram
  * model with add-one (Laplace) smoothing is trained on a deterministic
  * clean slice, then every document is scored by how surprising its
  * bigrams are under that model; gibberish scores high, boilerplate that
  * saturates the training slice scores low.
  *
  * **Exact-arithmetic scoring.** Engine `ln`/`log2` functions are not
  * bit-portable across engines (the round-5 categorical-drift lesson), so
  * the score is the SHANNON CODE LENGTH in whole bits, computed entirely
  * in integer arithmetic: for each bigram, with
  * `num = count(w1,w2) + 1` and `den = count(w1,·) + V`
  * (so p = num/den and den ≥ num always),
  *
  *   bits = floor(log2(den / num)) = length(binaryString(den DIV num)) - 1
  *
  * — exact because for integers `floor(log2(d/n)) = floor(log2(d DIV n))`
  * (a power of two crosses d/n iff it crosses its integer quotient).
  * Spark computes it as `length(conv(q, 10, 2)) - 1`, DuckDB as
  * `length(bin(q)) - 1`; both are pure integer/string ops, so a per-doc
  * `(ngrams, bits)` pair replays bit-for-bit in any engine — no float
  * ever enters the score. Banding compares `bits` against
  * `ngrams × threshold` in integers, so band edges are exact too.
  *
  * Scale shape (100 TB): training aggregates the train slice's bigram
  * stream to `(w1, w2, count)` / `(w1, count)` tables — partial
  * aggregation collapses hot bigrams map-side, and `minCount` pruning
  * bounds the table Zipf-style (pruned bigrams fall back to the unseen
  * path; a context prunes only when all its bigrams did, since
  * ctx ≥ bigram at equal thresholds). Scoring explodes each doc to
  * `(id, w1, w2)` — the text column never shuffles — joins the
  * (broadcast) count tables, and folds back to one row per doc. The
  * vocabulary size is a single driver scalar (the trainCentroids
  * discipline).
  */
object NgramLm {

  /** Trained model: bigram counts, context (first-position) counts, and
    * the train vocabulary size used as the smoothing denominator. */
  final case class NgramModel(bigrams: DataFrame, contexts: DataFrame,
      vocab: Long)

  /** Whitespace bigrams of `textCol` as exploded (w1, w2) rows. */
  private def bigramStream(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = greatest(size(toks) - 1, lit(0))
    val pairs = zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    df.select(explode(pairs).as("bg")).select(col("bg.w1"), col("bg.w2"))
  }

  /** Train on `docs` (pass the clean slice — e.g. the `assignSplits`
    * train band). `minCount` prunes bigrams AND contexts seen fewer
    * times, bounding the model at corpus scale. */
  def train(docs: DataFrame, textCol: String, minCount: Long = 1L): NgramModel = {
    val stream = bigramStream(docs, textCol)
    val bigrams = stream.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c")).where(col("c") >= minCount)
    val contexts = stream.groupBy("w1")
      .agg(count(lit(1)).as("c")).where(col("c") >= minCount)
    val vocab = docs.select(explode(split(col(textCol), " ")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    NgramModel(bigrams, contexts, vocab)
  }

  /** CCNet-style perplexity bucketing: label every scored doc
    * `head` / `middle` / `tail` by where its bits-per-ngram ratio falls
    * against the TERCILES of a reference sample (CCNet buckets a corpus
    * by LM perplexity against the distribution of a clean reference;
    * head = least surprising). Exactness discipline:
    *
    *  - the tercile thresholds are exact ORDER STATISTICS of the
    *    reference sample — ranks ceil(n/3) and ceil(2n/3) under
    *    `(ratio, id)` ordering (the id tiebreak makes selection
    *    deterministic even when ratios collide);
    *  - each threshold is carried as its INTEGER `(bits, ngrams)` pair,
    *    and membership compares by cross-multiplication
    *    (`bits·n_t ≤ b_t·ngrams`), so bucket edges are exact integer
    *    arithmetic — no float boundary can disagree between engines.
    *
    * `ref` must be a subset of scored rows (same integer columns); only
    * its `ngrams > 0` rows rank. Scale shape: the tercile thresholds are
    * found by DISTRIBUTED order-statistic selection (the q62 two-pass
    * range-partition discipline) — range-partition the narrow
    * `(id, bits, ngrams, ratio)` projection by the ranking key, count per
    * partition (O(partitions) driver prefix), and rank WITHIN only the
    * partitions that hold the two target ranks — so no task ever sorts
    * more than one range partition's slice even when the caller passes a
    * corpus-proportional reference band (NgramLmSpec pins the
    * no-unpartitioned-window plan shape). The bucketing pass is
    * scan-local integer math. Returns `(idCol, ngrams, bits, bucket)`. */
  def perplexityBuckets(scored: DataFrame, idCol: String,
      ref: DataFrame): DataFrame = {
    val s = scored.sparkSession
    val scorable = ref.where(col("ngrams") > 0L)
      .withColumn("_r", col("bits").cast("double") / col("ngrams"))
    // pass 1: range-partition by the TOTAL order (ratio, id) — ids are
    // unique, so global rank = rows in earlier partitions + local rank —
    // and pin the layout (localCheckpoint): the partition counts and the
    // in-partition rank window below must see identical boundaries
    val p = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = scorable
      .select(col(idCol), col("bits"), col("ngrams"), col("_r"))
      .repartitionByRange(p, col("_r"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .collect() // O(partitions) — the SequencePacking collect discipline
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    require(n >= 3, s"reference sample has only $n scorable rows")
    val Seq(k1, k2) = Seq((n + 2) / 3, (2 * n + 2) / 3)
    // locate each global rank's (partition, local rank) via the exclusive
    // prefix sum of partition counts
    val bases = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    def locate(k: Long): (Int, Long) = counts.iterator
      .collectFirst { case (pid, c) if k > bases(pid) && k <= bases(pid) + c =>
        (pid, k - bases(pid)) }.get
    val (p1, l1) = locate(k1)
    val (p2, l2) = locate(k2)
    // pass 2: rank inside ONLY the partitions holding the targets
    val wanted = if (p1 == p2) Map(p1 -> Seq(l1, l2).distinct)
      else Map(p1 -> Seq(l1), p2 -> Seq(l2))
    val thr = selectByRank(ranged, idCol, wanted)
      .select(col("_pid"), col("_rk"), col("bits"), col("ngrams"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1).toLong) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    val (b1, n1) = thr((p1, l1))
    val (b2, n2) = thr((p2, l2))
    scored.select(col(idCol), col("ngrams"), col("bits"))
      .withColumn("bucket",
        when(col("ngrams") === 0L, "unscorable")
          .when(col("bits") * n1 <= lit(b1) * col("ngrams"), "head")
          .when(col("bits") * n2 <= lit(b2) * col("ngrams"), "middle")
          .otherwise("tail"))
  }

  /** Within-partition rank selection over a `_pid`-pinned, range-
    * partitioned frame: returns the rows whose in-partition `(ratio, id)`
    * rank matches a requested local rank, with the rank as `_rk`. The
    * window is PARTITIONED by `_pid` (each range partition is one window
    * group — the sort parallelism is the partition count, never a global
    * single-task sort; NgramLmSpec pins the plan shape). */
  private[graft] def selectByRank(ranged: DataFrame, idCol: String,
      wanted: Map[Int, Seq[Long]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_pid")).orderBy(col("_r"), col(idCol))
    val cond = wanted.toSeq.sortBy(_._1).map { case (pid, lrs) =>
      col("_pid") === pid && col("_rk").isin(lrs: _*) }.reduce(_ || _)
    ranged.where(col("_pid").isin(wanted.keys.toSeq: _*))
      .withColumn("_rk", row_number().over(w))
      .where(cond)
  }

  /** Score every doc: `(idCol, ngrams, bits, oov_ngrams, band)`.
    * `ngrams` = bigrams scored, `bits` = total Shannon code length,
    * `oov_ngrams` = bigrams unseen in training. Bands (integer-exact):
    * `unscorable` (no bigrams — empty, single-token, or NULL text),
    * `low_perplexity` (bits ≤ ngrams × loBits — boilerplate-like),
    * `high_perplexity` (bits ≥ ngrams × hiBits — gibberish-like),
    * `mid` otherwise. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: NgramModel, loBits: Long, hiBits: Long): DataFrame = {
    val perDoc = {
      val toks = split(col(textCol), " ")
      val n = greatest(size(toks) - 1, lit(0))
      val pairs = zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      docs.select(col(idCol), explode(pairs).as("bg"))
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .join(broadcast(model.bigrams.withColumnRenamed("c", "_bc")),
          Seq("w1", "w2"), "left_outer")
        .join(broadcast(model.contexts.withColumnRenamed("c", "_cc")),
          Seq("w1"), "left_outer")
        .withColumn("_num", coalesce(col("_bc"), lit(0L)) + 1L)
        .withColumn("_den", coalesce(col("_cc"), lit(0L)) + model.vocab)
        // den ≥ num always (ctx ≥ bigram count, vocab ≥ 1), so the
        // quotient is ≥ 1 and its binary length is the exact floor-log2
        .withColumn("_bits",
          (length(conv(expr("_den DIV _num"), 10, 2)) - 1).cast("long"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("ngrams"), sum(col("_bits")).as("bits"),
          sum(when(col("_bc").isNull, 1L).otherwise(0L)).as("oov_ngrams"))
    }
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("ngrams"), lit(0L)).as("ngrams"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        coalesce(col("oov_ngrams"), lit(0L)).as("oov_ngrams"))
      .withColumn("band",
        when(col("ngrams") === 0L, "unscorable")
          .when(col("bits") >= col("ngrams") * hiBits, "high_perplexity")
          .when(col("bits") <= col("ngrams") * loBits, "low_perplexity")
          .otherwise("mid"))
  }
}
