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

  /** Word n-gram shingles as a distinct array (set semantics for Jaccard). */
  def shingles(c: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(c)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 1.0).otherwise(inter / uni)
  }

  // ------------------------------------------------------------- minhash

  /** MinHash signature: array of `numHashes` minima of per-seed shingle
    * hashes. Pure array ops → codegen'd, no UDF, no shuffle. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map(seed =>
      array_min(transform(shinglesCol, s => xxhash64(lit(seed), s)))): _*)

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
    val banded = df
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
    val sh = df.select(col(idCol), shingles(col(textCol), shingleLen).as("_sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("_sh").as("_sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("_sh").as("_sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over token hashes: per-bit majority vote of ±1. The
    * bit loop is unrolled at plan-build time (shift amounts must be
    * literals), yielding 64 codegen'd array-aggregate expressions per row —
    * still a pure scan projection, no shuffle. */
  def simhash64(c: Column): Column = {
    val tokHashes = transform(TextAnalysis.tokens(c), t => xxhash64(t))
    val bits = (0 until 64).map { k =>
      val vote = aggregate(tokHashes, lit(0),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << k)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
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
    val withSig = df.select(col(idCol).as("_id"), simhash64(col(textCol)).as("_sim"))
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
