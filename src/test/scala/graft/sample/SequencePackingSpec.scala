package graft.sample

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SequencePackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // uneven sizes incl. zero and NULL; ids deliberately NOT in insertion
  // order so the range shuffle has real work to do
  lazy val docs = Seq(
    (7L, Some(10L)), (1L, Some(3L)), (4L, Some(0L)), (2L, None),
    (9L, Some(25L)), (3L, Some(7L)), (8L, Some(1L)), (5L, Some(12L)),
    (6L, Some(4L)), (0L, Some(5L)),
  ).toDF("id", "toks").repartition(5)

  /** The naive truth: driver-side prefix sum over the id-sorted sizes. */
  def naive(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    val sorted = rows.sortBy(_._1)
    sorted.map(_._1)
      .zip(sorted.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
  }

  test("withOffsets equals the naive prefix sum; NULL size counts 0") {
    val got = SequencePacking.withOffsets(docs, "id", "toks")
      .select("id", "token_offset").as[(Long, Long)].collect().toMap
    val sizes = docs.select(col("id"),
      coalesce(col("toks"), lit(0L))).as[(Long, Long)].collect().toSeq
    assert(got === naive(sizes))
  }

  test("offsets are partitioning-invariant (1, 3, 8 partitions identical)") {
    val expected = SequencePacking
      .withOffsets(docs, "id", "toks", partitions = 1)
      .select("id", "token_offset").as[(Long, Long)].collect().toMap
    for (p <- Seq(3, 8)) {
      val got = SequencePacking
        .withOffsets(docs, "id", "toks", partitions = p)
        .select("id", "token_offset").as[(Long, Long)].collect().toMap
      assert(got === expected, s"partitions=$p")
    }
  }

  test("packReport chunk math: boundaries, zero-size docs, crossing flag") {
    // chunk = 8: offsets (id-sorted sizes 5,3,0,7,0,12,4,10,1,25)
    val rep = SequencePacking.packReport(docs, "id", "toks", chunkTokens = 8)
      .select("id", "token_offset", "chunk_first", "chunk_last",
        "crosses_chunk")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // id=0: offset 0, size 5 → chunk 0 only
    assert(rep(0L) === ((0L, 0L, 0L, 0L, false)))
    // id=3: offset 5+3+0=8, size 7 → tokens 8..14, chunk 1 only
    assert(rep(3L) === ((3L, 8L, 1L, 1L, false)))
    // id=5: offset 15, size 12 → tokens 15..26 → chunks 1..3, crosses
    assert(rep(5L) === ((5L, 15L, 1L, 3L, true)))
    // zero-size id=4 (offset 8): occupies nothing, reports its boundary
    // chunk with last == first
    assert(rep(4L)._3 === rep(4L)._4 && !rep(4L)._5)
    // NULL-size id=2 behaves as zero
    assert(rep(2L)._3 === rep(2L)._4 && !rep(2L)._5)
  }

  test("packSummary: docs, totals, chunks, crossing census, final fill") {
    val s = SequencePacking.packSummary(docs, "id", "toks", chunkTokens = 8)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(s._1 === 10L) // docs
    assert(s._2 === 67L) // total tokens
    assert(s._3 === 9L)  // 67 tokens → last chunk index 8 → 9 chunks
    val crossing = SequencePacking
      .packReport(docs, "id", "toks", chunkTokens = 8)
      .where(col("crosses_chunk")).count()
    assert(s._4 === crossing)
    assert(s._5 === (67.0 - 64.0) / 8.0) // 3 tokens in the final chunk
    // empty input: zeros, never NULLs
    val empty = SequencePacking
      .packSummary(docs.where(lit(false)), "id", "toks", chunkTokens = 8)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(empty === ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("trailing zero-size doc on an exact chunk boundary: chunks counts " +
      "token-bearing chunks, final fill reads 1.0") {
    // total = 16 = 2×8; the zero-size doc's boundary chunk (index 2) must
    // NOT inflate the census (round-8 advice: derive chunks from total
    // tokens, not max(chunk_last)+1)
    val d = Seq((0L, 8L), (1L, 8L), (2L, 0L)).toDF("id", "toks")
    val s = SequencePacking.packSummary(d, "id", "toks", chunkTokens = 8)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(s === ((3L, 16L, 2L, 0L, 1.0)))
  }

  test("chunkTokens must be positive") {
    intercept[IllegalArgumentException] {
      SequencePacking.packReport(docs, "id", "toks", chunkTokens = 0)
    }
  }

  test("scale shape: no unpartitioned window in the plan") {
    val plan = SequencePacking.withOffsets(docs, "id", "toks")
      .queryExecution.executedPlan.toString
    // the whole point: the window must be partitioned by _pid — an empty
    // partitionBy would collapse the table into one task
    assert(!plan.contains("Window [")
      || !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"))
  }
}
