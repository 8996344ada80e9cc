package graft.sketch

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Mergeable Misra–Gries heavy-hitter sketch (the mergeable-summaries
  * formulation: Agarwal et al., PODS 2012): at most `k` counters; when the
  * map outgrows `2k`, subtract the (k+1)-th largest count from everything
  * and drop the non-positive — every such compression destroys at least
  * (k+1)·v mass for a subtraction of v, so the TOTAL subtracted along any
  * add/merge tree is ≤ n/(k+1).
  *
  * The sketch is proof-carrying: `deducted` accumulates exactly how much
  * was ever subtracted on this sketch's merge tree, so for every item
  *
  *   est(x) ≤ true(x) ≤ est(x) + deducted      (est 0 if absent)
  *
  * which gives a NO-FALSE-NEGATIVE candidate rule for an absolute
  * threshold T: every item with true(x) ≥ T satisfies
  * est(x) + deducted ≥ T. The candidate set is then verified by one exact
  * targeted pass (see [[HeavyHitters]]) — the sketch only ever decides
  * what is CHEAP to count exactly, never what is true.
  */
final class MisraGries(val k: Int) extends Serializable {
  require(k > 0, s"k must be positive: $k")

  private[sketch] val counts = mutable.HashMap.empty[String, Long]
  private var _deducted: Long = 0L

  def deducted: Long = _deducted

  def add(x: String, w: Long = 1L): Unit = {
    counts.update(x, counts.getOrElse(x, 0L) + w)
    if (counts.size > 2 * k) compress()
  }

  def merge(other: MisraGries): MisraGries = {
    other.counts.foreach { case (x, w) =>
      counts.update(x, counts.getOrElse(x, 0L) + w)
    }
    _deducted += other._deducted
    if (counts.size > k) compress()
    this
  }

  /** Subtract the (k+1)-th largest count from every counter and drop the
    * non-positive, leaving ≤ k counters. */
  private def compress(): Unit = {
    if (counts.size <= k) return
    val vs = counts.values.toArray
    java.util.Arrays.sort(vs)
    val sub = vs(vs.length - (k + 1)) // (k+1)-th largest
    if (sub <= 0) return
    _deducted += sub
    counts.filterInPlace((_, v) => v > sub)
    counts.mapValuesInPlace((_, v) => v - sub)
  }

  /** Lower-bound estimates (compress first so the map honors the k cap). */
  def estimates: Map[String, Long] = {
    if (counts.size > k) compress()
    counts.toMap
  }

  /** Every SKETCHED item whose TRUE count could reach `threshold`:
    * est + deducted ≥ threshold. A complete superset of the true
    * over-threshold set iff `deducted < threshold` — an item absent from
    * the map has true ≤ deducted, so only then is "not sketched" proof of
    * "not heavy". Callers must check [[deducted]] (or use
    * [[HeavyHitters.overThreshold]], which escalates k until the
    * precondition holds). */
  def candidates(threshold: Long): Seq[String] =
    estimates.collect {
      case (x, est) if est + _deducted >= threshold => x
    }.toSeq
}

/** The sketch's typed result: the error bound travels in its OWN field, so
  * no input item — whatever its bytes — can collide with a side channel
  * (the round-7 design smuggled `deducted` through a reserved map key,
  * which a hostile/unlucky input string could shadow; round-8 advice). */
case class MgResult(estimates: Map[String, Long], deducted: Long)

/** Typed UDAF over a string column: partial Misra–Gries maps per task,
  * merged associatively — the same two-level ObjectHashAggregate shape as
  * [[TDigest]]'s `TDigestAgg`, O(k) state per task, no driver involvement
  * until the final O(k) result. NULL inputs are skipped. */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, MisraGries, MgResult] {
  def zero: MisraGries = new MisraGries(k)
  def reduce(b: MisraGries, a: String): MisraGries = {
    if (a != null) b.add(a)
    b
  }
  def merge(b1: MisraGries, b2: MisraGries): MisraGries = b1.merge(b2)
  def finish(r: MisraGries): MgResult = MgResult(r.estimates, r.deducted)
  def bufferEncoder: Encoder[MisraGries] = Encoders.kryo[MisraGries]
  def outputEncoder: Encoder[MgResult] = Encoders.product[MgResult]
}

/** Exact heavy hitters at 100 TB: the naive `groupBy(token).count()`
  * shuffles EVERY distinct token (web-scale corpora: billions of
  * singletons — the exchange is the whole vocabulary); this operator
  * spends one sketch pass (map-side O(k) state, merged — nothing but
  * O(partitions·k) sketch entries move) to learn the tiny candidate set,
  * then one exact pass whose exchange carries ONLY candidate tokens
  * (a broadcast candidate semi-join sits below the aggregate, so the
  * singleton tail never enters a shuffle). Output is EXACT — the sketch
  * bounds guarantee the candidate superset, the second pass does the
  * counting.
  *
  * Driver-safety bound (round-8 advice): an undersized sketch escalates
  * k ×8, but never past `maxK` — past it the per-task counter maps (2k
  * entries each) and the final collected sketch stop being "small", and a
  * pathological n/threshold would otherwise re-submit identical jobs at a
  * pinned k forever. At the cap the operator FALLS BACK to the exact
  * distributed `groupBy(item).count` — correct at any scale, just paying
  * the full-vocabulary exchange the sketch exists to avoid — and logs the
  * decision. */
object HeavyHitters extends Logging {

  /** Default escalation ceiling: 2²² counters ≈ a few hundred MB of task
    * state — the largest sketch that is still clearly cheaper than the
    * exact shuffle it would replace. */
  val DefaultMaxK: Int = 1 << 22

  /** Exact (item, occurrences) for every item occurring ≥ `threshold`
    * times in `itemCol`. `k` sizes the initial sketch; correctness never
    * depends on it: a sketch is CONCLUSIVE only when its total deducted
    * mass sits below the threshold (an item absent from the map has
    * true ≤ deducted — only then is absence proof of not-heavy), so an
    * undersized sketch escalates k ×8 and re-sketches; deducted ≤ n/(k+1)
    * guarantees k ≥ n/threshold terminates the loop — pick k ≳ n/threshold
    * up front to stay at one pass. Escalation stops at `maxK`; past it the
    * exact distributed groupBy runs instead (see object doc). */
  def overThreshold(df: DataFrame, itemCol: String, threshold: Long,
      k: Int = 512, outCol: String = "occurrences",
      maxK: Int = DefaultMaxK): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    require(k > 0, s"k must be positive: $k")
    require(maxK >= k, s"maxK ($maxK) must be >= k ($k)")
    var curK = k
    var est: Map[String, Long] = null
    var deducted = 0L
    var conclusive = false
    while (!conclusive) {
      val agg = udaf(new MisraGriesAgg(curK))
      val mg = df.select(agg(col(itemCol)).as("mg"))
        .head().getStruct(0)
      est = mg.getMap[String, Long](0).toMap
      deducted = mg.getLong(1)
      conclusive = deducted < threshold
      if (!conclusive) {
        if (curK >= maxK) {
          logWarning(s"heavy-hitters sketch inconclusive at maxK=$maxK " +
            s"(deducted=$deducted >= threshold=$threshold); falling back " +
            "to the exact distributed groupBy")
          return df.groupBy(col(itemCol))
            .agg(count(lit(1)).as(outCol))
            .where(col(outCol) >= threshold)
        }
        curK = if (curK > maxK / 8) maxK else curK * 8
      }
    }
    val cand = est.collect {
      case (x, v) if v + deducted >= threshold => x
    }.toSeq
    if (cand.isEmpty)
      return df.sparkSession.emptyDataFrame
        .withColumn(itemCol, lit(null).cast("string"))
        .withColumn(outCol, lit(null).cast("long"))
        .limit(0)
    // broadcast candidate semi-join, never an `isin` literal: after an ×8
    // escalation the candidate list can reach 10⁴⁺ entries, and a 10⁴-arm
    // In expression blows up codegen where a broadcast hash join is flat
    // (round-8 advice; same shape as overThresholdByGroup)
    val candDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(cand.map(Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_ci",
          org.apache.spark.sql.types.StringType))))
    df.join(broadcast(candDf), col(itemCol) === col("_ci"), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as(outCol))
      .where(col(outCol) >= threshold)
  }

  /** Exact per-GROUP heavy hitters: every (group, item) pair where the
    * item occurs ≥ `threshold` times WITHIN the group — the
    * boilerplate-per-source census (which tokens/lines dominate each
    * source or language). Same two-pass shape as [[overThreshold]], one
    * sketch per group: the sketch aggregation collects O(groups · k)
    * entries to the driver, so `groupCol` must be LOW-cardinality
    * (sources, languages, codecs — the q45/q55 drift-group contract, NOT
    * a row-scale key); the exact pass semi-joins against the broadcast
    * (group, item) candidate set, so the per-group singleton tail never
    * enters a shuffle. A NULL group is a group like any other (null-safe
    * join). Escalates k ×8 while ANY group's deducted mass reaches the
    * threshold — per-group n bounds deducted, so groups converge at
    * k ≥ max_g(n_g)/threshold — capped at `maxK` with the same exact
    * `groupBy(group, item).count` fallback as [[overThreshold]]. */
  def overThresholdByGroup(df: DataFrame, groupCol: String, itemCol: String,
      threshold: Long, k: Int = 512, outCol: String = "occurrences",
      maxK: Int = DefaultMaxK): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    require(k > 0, s"k must be positive: $k")
    require(maxK >= k, s"maxK ($maxK) must be >= k ($k)")
    val spark = df.sparkSession
    def exactFallback: DataFrame =
      df.groupBy(col(groupCol), col(itemCol))
        .agg(count(lit(1)).as(outCol))
        .where(col(outCol) >= threshold)
    var curK = k
    var cand: Seq[(Any, String)] = Seq.empty
    var conclusive = false
    while (!conclusive) {
      val agg = udaf(new MisraGriesAgg(curK))
      val perGroup = df.groupBy(col(groupCol))
        .agg(agg(col(itemCol)).as("mg")).collect()
        .map(r => (r.get(0), r.getStruct(1)))
        .map { case (g, mg) =>
          (g, mg.getMap[String, Long](0).toMap, mg.getLong(1))
        }
      conclusive = perGroup.forall(_._3 < threshold)
      if (conclusive)
        cand = perGroup.toSeq.flatMap { case (g, est, ded) =>
          // .toSeq BEFORE collect: collecting a Map into (g, x) pairs
          // would rebuild a Map keyed by g and silently collapse the
          // group's candidates to one
          est.toSeq.collect {
            case (x, v) if v + ded >= threshold => (g, x)
          }
        }
      else {
        if (curK >= maxK) {
          logWarning(s"per-group heavy-hitters sketch inconclusive at " +
            s"maxK=$maxK (threshold=$threshold); falling back to the " +
            "exact distributed groupBy")
          return exactFallback
        }
        curK = if (curK > maxK / 8) maxK else curK * 8
      }
    }
    val gField = df.schema(groupCol)
    if (cand.isEmpty)
      return df.select(col(groupCol), col(itemCol))
        .withColumn(outCol, lit(null).cast("long")).limit(0)
    val candSchema = org.apache.spark.sql.types.StructType(Seq(
      gField.copy(name = "_cg"),
      org.apache.spark.sql.types.StructField("_ci",
        org.apache.spark.sql.types.StringType)))
    val candDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cand.map { case (g, x) => Row(g, x) }, 1),
      candSchema)
    df.join(broadcast(candDf),
        col(groupCol) <=> col("_cg") && col(itemCol) === col("_ci"),
        "left_semi")
      .groupBy(col(groupCol), col(itemCol))
      .agg(count(lit(1)).as(outCol))
      .where(col(outCol) >= threshold)
  }
}
