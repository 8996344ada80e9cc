package graft.sketch

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish stream: item j occurs ~ n/(j+1) times, deterministic. */
  def stream(seed: Int, n: Int, vocab: Int): Seq[String] = {
    val rnd = new Random(seed)
    Seq.fill(n) {
      val u = rnd.nextDouble()
      val j = math.min(vocab - 1, (math.pow(vocab + 1.0, u) - 1.0).toInt)
      s"tok$j"
    }
  }

  test("proof-carrying bound: est ≤ true ≤ est + deducted, every seed/k") {
    for (seed <- 1 to 5; k <- Seq(4, 16, 64)) {
      val xs = stream(seed, 20000, 500)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mg = new MisraGries(k)
      xs.foreach(mg.add(_))
      val est = mg.estimates
      assert(est.size <= k, s"seed=$seed k=$k")
      // the total-deducted envelope holds for EVERY item, present or not
      for ((x, t) <- truth) {
        val e = est.getOrElse(x, 0L)
        assert(e <= t, s"overestimate seed=$seed k=$k $x")
        assert(t <= e + mg.deducted, s"bound broken seed=$seed k=$k $x")
      }
      // mergeable-summaries guarantee: deducted ≤ n/(k+1)
      assert(mg.deducted <= 20000L / (k + 1), s"seed=$seed k=$k")
    }
  }

  test("candidates(T) is a complete superset whenever deducted < T") {
    for (seed <- 1 to 3; k <- Seq(16, 128)) {
      val xs = stream(seed, 20000, 500)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mg = new MisraGries(k)
      xs.foreach(mg.add(_))
      for (t <- Seq(100L, 500L, 2000L)) {
        val cand = mg.candidates(t).toSet
        val real = truth.collect { case (x, c) if c >= t => x }.toSet
        if (mg.deducted < t) // the documented completeness precondition
          assert(real.subsetOf(cand), s"seed=$seed k=$k T=$t missing="
            + (real -- cand))
        // the per-item rule itself never drops a SKETCHED heavy hitter
        assert(real.filter(mg.estimates.contains).subsetOf(cand),
          s"seed=$seed k=$k T=$t")
      }
      // k=128 over n=20000: deducted ≤ 155 < 500, so the strong branch
      // genuinely runs for T ∈ {500, 2000}
      if (k == 128) assert(mg.deducted < 500)
    }
  }

  test("merge preserves the bound over a partitioned stream") {
    val xs = stream(42, 30000, 300)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val parts = xs.grouped(3700).toSeq // uneven final chunk
    val merged = parts.map { chunk =>
      val m = new MisraGries(16)
      chunk.foreach(m.add(_))
      m
    }.reduce(_ merge _)
    val est = merged.estimates
    for ((x, t) <- truth) {
      val e = est.getOrElse(x, 0L)
      assert(e <= t && t <= e + merged.deducted, x)
    }
  }

  test("HeavyHitters.overThreshold is EXACT vs the naive groupBy count") {
    val xs = stream(7, 40000, 800)
    val df = xs.toDF("item").repartition(6)
    val expected = df.groupBy("item").count()
      .where(col("count") >= 200)
      .as[(String, Long)].collect().toMap
    assert(expected.nonEmpty) // the test must actually test something
    // k=8 is deliberately undersized (deducted ≥ T) to force the
    // escalation loop; k=64 is conclusive in one pass — both must be exact
    for (k <- Seq(8, 64)) {
      val got = HeavyHitters
        .overThreshold(df, "item", threshold = 200L, k = k)
        .as[(String, Long)].collect().toMap
      assert(got === expected, s"k=$k")
    }
  }

  test("NULLs are skipped; impossible threshold yields an empty frame") {
    val df = Seq("a", null, "a", null, "b").toDF("item")
    val got = HeavyHitters.overThreshold(df, "item", threshold = 2L, k = 4)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L))
    val empty = HeavyHitters
      .overThreshold(df, "item", threshold = 100L, k = 4)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("item", "occurrences"))
  }

  test("no sentinel channel: an item equal to the old reserved key is " +
      "counted and reported like any other") {
    // round 7 smuggled `deducted` through a reserved map key; the struct
    // output means no input bytes can shadow the bound any more
    val hostile = " graft:deducted"
    val df = (Seq.fill(10)(hostile) ++ Seq("x", "y")).toDF("item")
    val got = HeavyHitters.overThreshold(df, "item", threshold = 5L, k = 4)
      .as[(String, Long)].collect().toMap
    assert(got === Map(hostile -> 10L))
  }

  test("maxK cap forces the exact-groupBy fallback, result still exact") {
    // threshold=2 over a long-tailed stream makes every small sketch
    // inconclusive (deducted >= 2), so escalation hits maxK immediately
    val xs = stream(11, 20000, 4000)
    val df = xs.toDF("item").repartition(4)
    val expected = df.groupBy("item").count()
      .where(col("count") >= 2)
      .as[(String, Long)].collect().toMap
    assert(expected.size > 500) // the fallback path carries real volume
    val got = HeavyHitters
      .overThreshold(df, "item", threshold = 2L, k = 4, maxK = 8)
      .as[(String, Long)].collect().toMap
    assert(got === expected)
  }

  test("per-group maxK cap falls back to the exact groupBy, still exact") {
    val rows = stream(12, 10000, 2000).map(("a", _)) ++
      stream(13, 10000, 2000).map(("b", _))
    val df = rows.toDF("grp", "item").repartition(4)
    val expected = df.groupBy("grp", "item").count()
      .where(col("count") >= 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(expected.size > 500)
    val got = HeavyHitters
      .overThresholdByGroup(df, "grp", "item", threshold = 2L, k = 4,
        maxK = 8)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected)
  }

  test("per-group: EXACT vs the naive count, with group isolation") {
    val rows = (stream(3, 15000, 300).map(("a", _))
      ++ stream(4, 15000, 300).map(("b", _))
      ++ Seq.fill(250)((null: String, "nullish"))) // NULL group is a group
    val df = rows.toDF("grp", "item").repartition(5)
    val expected = df.groupBy("grp", "item").count()
      .where(col("count") >= 200)
      .as[(Option[String], String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(expected.nonEmpty)
    assert(expected.contains((None, "nullish")))
    // an item heavy in one group must not leak into the other: the two
    // Zipf streams have different seeds, so per-group counts differ
    for (k <- Seq(8, 64)) { // k=8 forces the per-group escalation path
      val got = HeavyHitters
        .overThresholdByGroup(df, "grp", "item", threshold = 200L, k = k)
        .as[(Option[String], String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === expected, s"k=$k")
    }
  }

  test("per-group: impossible threshold yields an empty typed frame") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("grp", "item")
    val empty = HeavyHitters
      .overThresholdByGroup(df, "grp", "item", threshold = 100L, k = 4)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("grp", "item", "occurrences"))
  }
}
