package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine.
  * All candidate generation is bucket-local (band hash / bit-chunk /
  * hyperplane bucket): no all-pairs O(n²) stage ever materializes — the only
  * quadratic work is INSIDE a bucket, which LSH keeps tiny by construction.
  * That is the property that survives a 100×/10^12-row scale-up. */
object Dedup {

  /** Rebalance a frame whose partitioning is far below the session's
    * parallelism before a compute-dense per-row stage (signature hashing is
    * ~64 hashes/shingle — a single 2 MB parquet file would otherwise run
    * single-task). At scale the input's own partitioning already exceeds
    * core count and this is a no-op — no shuffle added. */
  private def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  // ---------------------------------------------------------------- exact

  /** Exact dedup on a normalized fingerprint. Returns the kept rows
    * (smallest id per duplicate group wins — deterministic). One shuffle on
    * the 16-byte fingerprint, payload carried once. */
  def exactKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Duplicate groups: (text_hash, dup_count, keeper_id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keeper_id"))
      .where(col("dup_count") > 1)

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles (multiset — duplicates kept; min-hashing is
    * invariant to them and `array_distinct` is O(n²) per row). Use
    * [[shingleSet]] where true set semantics matter (exact Jaccard). */
  def shingles(c: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(c)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  def shingleSet(c: Column, n: Int): Column = array_distinct(shingles(c, n))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 1.0).otherwise(inter / uni)
  }

  // ------------------------------------------------------------- minhash

  /** MinHash signature: `numHashes` minima of per-seed shingle hashes,
    * computed in a SINGLE traversal of the shingle array — an `aggregate`
    * whose accumulator is the running-min vector, with xxhash64(seed, s) as
    * the seed-indexed hash family. (The naive form — one `array_min(
    * transform(...))` per seed — duplicates the shingle-array expression
    * `numHashes` times in the projection; Catalyst does not CSE across
    * higher-order-function lambdas, which measured 246 s vs ~4 s on 5k
    * docs.) Pure array ops → codegen'd, no UDF, no shuffle. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    aggregate(
      shinglesCol,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(i, s)),
        (a, b) => least(a, b)))

  /** LSH candidate pairs: signatures banded into `bands`; docs sharing any
    * band hash become candidates. Returns (id_a, id_b) with id_a < id_b,
    * deduped. Collision probability for Jaccard s: 1-(1-s^r)^b. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignature(shingles(col(textCol), shingleLen), numHashes)
    val bandHashes = array((0 until bands).map(b =>
      xxhash64(lit("band"), lit(b), slice(col("_sig"), b * r + 1, r))): _*)
    val banded = ensureParallelism(df)
      .select(col(idCol).as("_id"), sig.as("_sig"))
      .select(col("_id"), posexplode(bandHashes))
      .select(col("_id"), col("pos").as("_band"), col("col").as("_bandhash"))
    val a = banded.select(col("_band"), col("_bandhash"), col("_id").as("id_a"))
    val b = banded.select(col("_band"), col("_bandhash"), col("_id").as("id_b"))
    a.join(b, Seq("_band", "_bandhash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash LSH near-dup pairs, verified with exact shingle Jaccard:
    * (id_a, id_b, jaccard). The verify join re-reads only (id, text). */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleLen: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleLen, numHashes, bands)
    val sh = ensureParallelism(df)
      .select(col(idCol), shingleSet(col(textCol), shingleLen).as("_sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("_sh").as("_sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("_sh").as("_sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over token hashes: per-bit majority vote of ±1,
    * computed in ONE traversal — the aggregate accumulator is the 64-long
    * vote vector, bit-tested against a literal mask array (variable shifts
    * aren't expressible, constant masks are; and 64 separate aggregates
    * would re-hash every token 64×). */
  def simhash64(c: Column): Column = {
    val masks = typedlit((0 until 64).map(k => 1L << k))
    // hash each token ONCE via transform (a lambda variable is a
    // materialized value, so the 64 mask tests below don't re-hash)
    val votes = aggregate(
      transform(TextAnalysis.tokens(c), t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, masks,
        (cnt, m) => cnt + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, masks, (cnt, m) => when(cnt > 0, m).otherwise(0L)),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming ≤ maxHamming, found by the
    * pigeonhole chunk trick: split the 64-bit hash into `maxHamming+1`
    * chunks — any pair within the bound must agree on ≥1 whole chunk, so
    * bucketing by (chunk_idx, chunk_value) finds all of them without an
    * all-pairs join. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val withSig = ensureParallelism(df)
      .select(col(idCol).as("_id"), simhash64(col(textCol)).as("_sim"))
    val chunkVals = array((0 until chunks).map(k =>
      shiftright(col("_sim"), k * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1))): _*)
    val banded = withSig.select(col("_id"), col("_sim"), posexplode(chunkVals))
      .select(col("_id"), col("_sim"), col("pos").as("_chunk"), col("col").as("_cv"))
    val a = banded.select(col("_chunk"), col("_cv"),
      col("_id").as("id_a"), col("_sim").as("_sim_a"))
    val b = banded.select(col("_chunk"), col("_cv"),
      col("_id").as("id_b"), col("_sim").as("_sim_b"))
    a.join(b, Seq("_chunk", "_cv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("_sim_a"), col("_sim_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicates via random-hyperplane LSH buckets +
    * in-bucket exact cosine verify. Hyperplanes are deterministic (seeded).
    * See [[graft.vector.Similarity]] for the primitives. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, cosThreshold: Double = 0.95, planes: Int = 12,
      seed: Long = 42L): DataFrame = {
    import graft.vector.Similarity
    val withBucket = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_bucket", Similarity.hyperplaneBucket(col("_v"), dim, planes, seed))
    val a = withBucket.select(col("_bucket"), col("_id").as("id_a"), col("_v").as("_va"))
    val b = withBucket.select(col("_bucket"), col("_id").as("id_b"), col("_v").as("_vb"))
    a.join(b, Seq("_bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("_va"), col("_vb")))
      .where(col("cosine") >= cosThreshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }
}
