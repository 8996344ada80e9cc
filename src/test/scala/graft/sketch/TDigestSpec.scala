package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TDigestSpec extends AnyFunSuite {

  test("quantiles of uniform data are accurate") {
    val rnd = new Random(42)
    val d = TDigest(100)
    (1 to 100000).foreach(_ => d.add(rnd.nextDouble()))
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
      assert(math.abs(d.quantile(q) - q) < 0.01, s"q=$q got ${d.quantile(q)}")
    assert(d.count === 100000)
  }

  test("tails are tighter than the middle (scale function works)") {
    val rnd = new Random(7)
    val d = TDigest(100)
    (1 to 200000).foreach(_ => d.add(rnd.nextGaussian()))
    // 99.9th percentile of N(0,1) ≈ 3.090
    assert(math.abs(d.quantile(0.999) - 3.090) < 0.15)
    assert(math.abs(d.quantile(0.5)) < 0.03)
  }

  test("merge equals single-digest within tolerance") {
    val rnd = new Random(11)
    val xs = Array.fill(50000)(rnd.nextDouble() * 100)
    val whole = TDigest(100)
    xs.foreach(whole.add)
    val parts = xs.grouped(5000).map { chunk =>
      val t = TDigest(100); chunk.foreach(t.add); t
    }.toSeq
    val merged = parts.reduce(_ merge _)
    assert(merged.count === 50000)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(merged.quantile(q) - whole.quantile(q)) < 1.5)
  }

  test("cdf is monotone and anchored at min/max") {
    val d = TDigest(100)
    (1 to 10000).foreach(i => d.add(i.toDouble))
    assert(d.cdf(0.5) === 0.0)
    assert(d.cdf(10000.0) === 1.0)
    assert(math.abs(d.cdf(5000) - 0.5) < 0.02)
    val pts = (0 to 100).map(i => d.cdf(i * 100.0))
    assert(pts.zip(pts.tail).forall { case (a, b) => a <= b + 1e-12 })
  }

  test("serialization round-trip preserves quantiles exactly") {
    val rnd = new Random(3)
    val d = TDigest(100)
    (1 to 20000).foreach(_ => d.add(rnd.nextDouble() * 10))
    val d2 = TDigest.fromBytes(d.toBytes)
    assert(d2.count === d.count)
    for (q <- Seq(0.05, 0.5, 0.95))
      assert(d2.quantile(q) === d.quantile(q))
  }

  test("centroid count stays bounded (compression)") {
    val rnd = new Random(9)
    val d = TDigest(100)
    (1 to 500000).foreach(_ => d.add(rnd.nextDouble()))
    // the 4·n·q(1−q)/δ bound yields O(δ·ln n) centroids (tail singletons):
    // ~700 at n=5e5, δ=100 → ≈11 KB serialized, fine for a shuffle payload
    assert(d.centroidCount < 1200, s"got ${d.centroidCount}")
    assert(d.toBytes.length < 32 * 1024)
  }

  test("property: quantile is monotone in q and bounded by min/max") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val d = TDigest(100)
      val xs = Array.fill(5000)(rnd.nextGaussian() * rnd.nextInt(100))
      xs.foreach(d.add)
      val qs = (0 to 20).map(i => d.quantile(i / 20.0))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b + 1e-9 }, s"seed=$seed")
      assert(qs.head >= xs.min - 1e-9 && qs.last <= xs.max + 1e-9)
    }
  }

  test("property: merge is order-insensitive within tolerance") {
    val rnd = new Random(5)
    val chunks = Array.fill(8)(Array.fill(2000)(rnd.nextDouble() * 50))
    def digestOf(order: Seq[Int]): TDigest =
      order.map { i => val t = TDigest(100); chunks(i).foreach(t.add); t }
        .reduce(_ merge _)
    val a = digestOf(0 until 8)
    val b = digestOf((0 until 8).reverse)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(a.quantile(q) - b.quantile(q)) < 1.0)
  }

  test("empty and single-value digests") {
    val e = TDigest(100)
    assert(e.quantile(0.5).isNaN)
    val one = TDigest(100)
    one.add(7.0)
    assert(one.quantile(0.0) === 7.0)
    assert(one.quantile(1.0) === 7.0)
  }
}
