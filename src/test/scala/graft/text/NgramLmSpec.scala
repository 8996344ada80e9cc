package graft.text

import graft.TestSpark
import graft.sample.Sampling
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The n-gram LM: hand-computed Shannon-bits exactness (including the
  * power-of-two floor-log2 edges the integer formulation exists for),
  * Laplace smoothing on unseen bigrams/contexts, minCount pruning,
  * unscorable routing, plant-band capture on the real documents table
  * (the q79 recipe), and the text-never-shuffles plan shape. */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def model(train: Seq[String], minCount: Long = 1L) = {
    import spark.implicits._
    NgramLm.train(train.toDF("text"), "text", minCount)
  }

  private def scoreOne(m: NgramLm.NgramModel, text: String,
      lo: Long = 3L, hi: Long = 7L) = {
    import spark.implicits._
    NgramLm.score(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      m, lo, hi).select("ngrams", "bits", "oov_ngrams", "band")
      .as[(Long, Long, Long, String)].head()
  }

  test("hand-computed bits: counts, smoothing, vocab denominator") {
    // train: bigrams (a,b)=2 (b,a)=1 (a,c)=1; contexts a=3 b=1; V=3
    val m = model(Seq("a b a b", "a c"))
    assert(m.vocab === 3L)
    // "a b": num=2+1=3, den=3+3=6, q=2 → 1 bit
    assert(scoreOne(m, "a b", lo = 0L) === ((1L, 1L, 0L, "mid")))
    // "c a": unseen bigram AND unseen context: num=1, den=0+3=3 → 1 bit, oov
    assert(scoreOne(m, "c a", lo = 0L) === ((1L, 1L, 1L, "mid")))
    // "a z": unseen bigram, seen context: num=1, den=3+3=6 → 2 bits
    assert(scoreOne(m, "a z", lo = 0L) === ((1L, 2L, 1L, "mid")))
  }

  test("floor-log2 is exact at power-of-two boundaries") {
    // "p q x" ×5 joined: bigram (p,q)=5, contexts p=5, V={p,q,x}=3
    // scored (p,q): num=6, den=5+3=8 → q=1 → 0 bits (8/6 < 2)
    val m5 = model(Seq(Array.fill(5)("p q").mkString(" x ")))
    assert(scoreOne(m5, "p q")._2 === 0L)
    // unseen context in a 1-token-vocab world: den=V exactly a power of 2
    val m1 = model(Seq("u v u v u v")) // V={u,v}=2; unseen ctx → den=2, num=1 → 1 bit
    assert(scoreOne(m1, "z z")._2 === 1L)
  }

  test("minCount prunes singleton bigrams and contexts to the unseen path") {
    val m = model(Seq("a b a b", "a c"), minCount = 2L)
    // (a,c) pruned (count 1): num=1; context a survives (count 3): den=3+3
    val r = scoreOne(m, "a c")
    assert(r._2 === 2L && r._3 === 1L) // floor log2 6 = 2, counted oov
    // context c pruned everywhere it was a singleton
    assert(m.bigrams.count() === 1L && m.contexts.count() === 1L)
  }

  test("unscorable: empty, single-token, and NULL text") {
    val m = model(Seq("a b"))
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bands = NgramLm.score(docs, "doc_id", "text", m, 3L, 7L)
      .select("band").as[String].collect()
    assert(bands.toSeq === Seq("unscorable", "unscorable", "unscorable"))
  }

  test("q79 plants land their measured bands on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val sent = "click here to accept cookies and continue to the site"
    val gib = array_join(transform(sequence(lit(0), lit(11)),
      k => concat(lit("zzq"), ((col("doc_id") * 7 + k) % 9999))), " ")
    val planted = docs.withColumn("text",
      when(col("doc_id") % 23 === 4, gib)
        .when(col("doc_id") % 29 === 6, lit(s"$sent $sent $sent"))
        .otherwise(col("text")))
    val train = Sampling.assignSplits(planted, "doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .where(col("split") === "train").select("doc_id", "text")
    val m = NgramLm.train(train, "text", minCount = 2L)
    val byClass = NgramLm.score(planted, "doc_id", "text", m, 3L, 7L)
      .withColumn("cls",
        when(col("doc_id") % 23 === 4, "gibberish")
          .when(col("doc_id") % 29 === 6, "boilerplate")
          .otherwise("normal"))
      .groupBy("cls", "band").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byClass.keys.filter(_._1 == "gibberish").map(_._2).toSet
      === Set("high_perplexity"))
    assert(byClass.keys.filter(_._1 == "boilerplate").map(_._2).toSet
      === Set("low_perplexity"))
    assert(byClass.keys.filter(_._1 == "normal").map(_._2).toSet
      === Set("mid")) // measured [4.6, 5.3] bits/ngram — inside (3, 7)
  }

  test("perplexityBuckets: exact tercile order statistics, integer edges") {
    import spark.implicits._
    // six scorable docs with ratios 1, 2, 3, 4, 5, 6 bits/ngram:
    // k1 = ceil(6/3) = 2 → threshold (2,1); k2 = ceil(12/3) = 4 → (4,1)
    val scored = Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L),
      (4L, 1L, 4L), (5L, 1L, 5L), (6L, 1L, 6L), (7L, 0L, 0L))
      .toDF("doc_id", "ngrams", "bits")
    val out = NgramLm.perplexityBuckets(scored, "doc_id", scored)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail", 7L -> "unscorable"))
    // boundary EQUALITY stays in the lower bucket (≤, cross-multiplied):
    // a doc at exactly 2 bits/ngram with different integers is head
    val probe = Seq((8L, 3L, 6L)).toDF("doc_id", "ngrams", "bits")
    val b = NgramLm.perplexityBuckets(probe, "doc_id", scored)
      .select("bucket").as[String].head()
    assert(b === "head")
  }

  test("perplexityBuckets: real-table terciles are balanced and monotone") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val split = Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val m = NgramLm.train(
      split.where(col("split") === "train").select("doc_id", "text"),
      "text", minCount = 2L)
    val scored = NgramLm.score(docs, "doc_id", "text", m, 3L, 7L)
      .localCheckpoint()
    val ref = scored.join(
      split.where(col("split") === "val").select("doc_id"), Seq("doc_id"))
    val out = NgramLm.perplexityBuckets(scored, "doc_id", ref)
      .where(col("ngrams") > 0)
      .withColumn("r", col("bits").cast("double") / col("ngrams"))
    val byBucket = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("r").as("lo"), max("r").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // every bucket populated, and the ratio ranges are ordered; exact
    // balance is NOT asserted — this corpus's ratio distribution is
    // discrete with heavy ties, and the ≤-edge deterministically pulls
    // each whole tie group into the lower bucket
    assert(Set("head", "middle", "tail").subsetOf(byBucket.keySet),
      byBucket.toString)
    assert(byBucket("head")._3 <= byBucket("middle")._2 + 1e-12)
    assert(byBucket("middle")._3 <= byBucket("tail")._2 + 1e-12)
  }

  test("plan: tercile selection has no unpartitioned window (r8 verdict #1)") {
    // the reference band is corpus-proportional (q84 feeds the full val
    // band), so the rank selection must never plan a global single-task
    // sort: every Window in the selection path is partitioned by the
    // range-partition id
    import org.apache.spark.sql.execution.window.WindowExec
    import spark.implicits._
    val scorable = (0L until 100L).map(i => (i, i % 7 + 1, i % 13))
      .toDF("doc_id", "ngrams", "bits")
      .withColumn("_r", col("bits").cast("double") / col("ngrams"))
      .repartitionByRange(4, col("_r"), col("doc_id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val windows =
      try NgramLm.selectByRank(scorable, "doc_id",
        Map(0 -> Seq(1L), 2 -> Seq(3L)))
        .queryExecution.executedPlan.collect {
          case w: WindowExec => w.partitionSpec
        }
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(windows.nonEmpty, "selection plan lost its rank window")
    assert(windows.forall(_.nonEmpty),
      s"unpartitioned window in tercile selection: $windows")
    // and the full operator still yields identical buckets to the naive
    // global-window form on the same input
    import org.apache.spark.sql.expressions.Window
    val ranked = scorable.withColumn("_rk",
      row_number().over(Window.orderBy(col("_r"), col("doc_id"))))
    val n = scorable.count()
    val Seq(k1, k2) = Seq((n + 2) / 3, (2 * n + 2) / 3)
    val naive = ranked.where(col("_rk") === k1 || col("_rk") === k2)
      .orderBy("_rk").select("bits", "ngrams")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val scored = scorable.select("doc_id", "ngrams", "bits")
    val buckets = NgramLm.perplexityBuckets(scored, "doc_id", scored)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val naiveBuckets = scored
      .withColumn("bucket",
        when(col("ngrams") === 0L, "unscorable")
          .when(col("bits") * naive(0)._2 <= lit(naive(0)._1) * col("ngrams"),
            "head")
          .when(col("bits") * naive(1)._2 <= lit(naive(1)._1) * col("ngrams"),
            "middle")
          .otherwise("tail"))
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(buckets === naiveBuckets)
  }

  test("plan: scoring never shuffles the text column") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"w$i common tokens here"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(docs, "text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchanges = NgramLm.score(docs, "doc_id", "text", m, 3L, 7L)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.output.map(_.name).toSeq
        }
      assert(exchanges.forall(out => !out.exists(_.contains("text"))),
        exchanges.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
