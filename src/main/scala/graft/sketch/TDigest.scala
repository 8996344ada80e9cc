package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Mergeable t-digest quantile sketch (Dunning & Ertl's merging-digest
  * variant, "Computing Extremely Accurate Quantiles Using t-Digests",
  * arXiv:1902.04023): centroids sized by the scale-function limit
  * 4·n·q(1−q)/δ, so tails stay precise while the middle compresses.
  *
  * Written from scratch for the north rule's distribution-drift check
  * (per-partition digests of dur_ms/sr_hz merged associatively, then
  * KS/PSI-compared against a reference digest). Spark's built-in
  * `percentile_approx` wraps a similar sketch but exposes only quantile
  * output — drift needs `cdf` and bin mass, hence our own.
  *
  * Not thread-safe; one instance per aggregation buffer.
  */
final class TDigest(val compression: Double) extends Serializable {
  require(compression >= 10, "compression must be >= 10")

  private[sketch] var means: Array[Double] = Array.empty
  private[sketch] var weights: Array[Double] = Array.empty
  private var buffer: ArrayBuffer[Double] = ArrayBuffer.empty
  private var _count: Long = 0L
  private var _min: Double = Double.PositiveInfinity
  private var _max: Double = Double.NegativeInfinity

  private def bufferCap: Int = math.max(64, (8 * compression).toInt)

  def count: Long = _count
  def minValue: Double = _min
  def maxValue: Double = _max
  def centroidCount: Int = { flush(); means.length }
  def centroidMeans: Array[Double] = { flush(); means.clone() }

  def add(x: Double): Unit = {
    if (x.isNaN) return
    buffer += x
    _count += 1
    if (x < _min) _min = x
    if (x > _max) _max = x
    if (buffer.length >= bufferCap) flush()
  }

  def merge(other: TDigest): TDigest = {
    other.flush()
    var i = 0
    while (i < other.means.length) {
      // weighted insert via buffer path would lose weights; merge directly
      mergeCentroids(other.means(i), other.weights(i))
      i += 1
    }
    _count += other._count
    if (other._min < _min) _min = other._min
    if (other._max > _max) _max = other._max
    this
  }

  private val pendingMeans = ArrayBuffer.empty[Double]
  private val pendingWeights = ArrayBuffer.empty[Double]

  private def mergeCentroids(mean: Double, weight: Double): Unit = {
    pendingMeans += mean
    pendingWeights += weight
    if (pendingMeans.length >= bufferCap) compress()
  }

  /** Fold buffered raw points + pending centroids into the centroid array. */
  private def flush(): Unit = {
    if (buffer.nonEmpty) {
      buffer.foreach { x => pendingMeans += x; pendingWeights += 1.0 }
      buffer.clear()
    }
    if (pendingMeans.nonEmpty) compress()
  }

  private def compress(): Unit = {
    val n = means.length + pendingMeans.length
    if (n == 0) return
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, means.length)
    System.arraycopy(weights, 0, ws, 0, weights.length)
    var i = 0
    while (i < pendingMeans.length) {
      ms(means.length + i) = pendingMeans(i)
      ws(means.length + i) = pendingWeights(i)
      i += 1
    }
    pendingMeans.clear()
    pendingWeights.clear()
    // sort by mean
    val idx = ms.indices.toArray.sortBy(ms(_))
    val total = ws.sum
    val outM = ArrayBuffer.empty[Double]
    val outW = ArrayBuffer.empty[Double]
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    var accW = 0.0
    i = 1
    while (i < n) {
      val m = ms(idx(i))
      val w = ws(idx(i))
      val q = (accW + curW / 2) / total
      val limit = 4.0 * total * q * (1.0 - q) / compression
      if (curW + w <= math.max(limit, 1.0)) {
        // weighted mean update
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW; accW += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM += curM; outW += curW
    means = outM.toArray
    weights = outW.toArray
  }

  /** Quantile estimate for q ∈ [0,1], linear interpolation between centroid
    * means with min/max anchoring. */
  def quantile(q: Double): Double = {
    flush()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val total = weights.sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val half = weights(i) / 2
      if (cum + half >= target) {
        if (i == 0) {
          val frac = if (half == 0) 0.0 else target / half
          return _min + math.max(0, math.min(1, frac)) * (means(0) - _min)
        }
        val prevHalf = weights(i - 1) / 2
        val span = half + prevHalf
        val frac = if (span == 0) 0.0 else (target - (cum - prevHalf)) / span
        return means(i - 1) + math.max(0, math.min(1, frac)) * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    _max
  }

  /** CDF estimate: fraction of mass ≤ x. */
  def cdf(x: Double): Double = {
    flush()
    if (means.isEmpty) return Double.NaN
    if (x < _min) return 0.0
    if (x >= _max) return 1.0
    val total = weights.sum
    var cum = 0.0
    var i = 0
    while (i < means.length && means(i) < x) {
      cum += weights(i)
      i += 1
    }
    if (i < means.length && i > 0) {
      // interpolate within the gap [means(i-1), means(i))
      val frac = (x - means(i - 1)) / (means(i) - means(i - 1))
      (cum - weights(i - 1) / 2 + frac * (weights(i - 1) / 2 + weights(i) / 2)) / total
    } else if (i == 0) {
      val frac = if (means(0) == _min) 1.0 else (x - _min) / (means(0) - _min)
      math.max(0.0, frac * weights(0) / 2 / total)
    } else cum / total
  }

  /** Compact binary form: [compression, count, min, max, k centroids]. */
  def toBytes: Array[Byte] = {
    flush()
    val buf = ByteBuffer.allocate(8 * 4 + 4 + means.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putDouble(compression).putLong(_count).putDouble(_min).putDouble(_max)
    buf.putInt(means.length)
    var i = 0
    while (i < means.length) {
      buf.putDouble(means(i)).putDouble(weights(i)); i += 1
    }
    buf.array()
  }
}

object TDigest {
  def apply(compression: Double = 100.0): TDigest = new TDigest(compression)

  def fromBytes(bytes: Array[Byte]): TDigest = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val d = new TDigest(buf.getDouble)
    d._count = buf.getLong
    d._min = buf.getDouble
    d._max = buf.getDouble
    val k = buf.getInt
    d.means = new Array[Double](k)
    d.weights = new Array[Double](k)
    var i = 0
    while (i < k) { d.means(i) = buf.getDouble; d.weights(i) = buf.getDouble; i += 1 }
    d
  }
}
