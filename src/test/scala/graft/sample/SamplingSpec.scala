package graft.sample

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val ids = spark.range(2000)
    .select(concat(lit("row-"), col("id")).as("rid"),
      when(col("id") % 2 === 0, "even").otherwise("odd").as("stratum"))

  test("unitUniform is deterministic, in [0,1), and matches the md5 recipe") {
    val u = ids.select(Sampling.unitUniform(col("rid")).as("u"))
      .as[Double].collect()
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    // same input → same value (rerun the plan)
    val u2 = ids.select(Sampling.unitUniform(col("rid")).as("u"))
      .as[Double].collect()
    assert(u.toSeq === u2.toSeq)
    // spot-check one value against the documented formula
    val one = spark.sql(
      """SELECT cast(conv(substring(md5('row-7'), 1, 15), 16, 10) AS long)
        |  / 1152921504606846976.0d AS u""".stripMargin)
      .as[Double].head()
    val got = Seq("row-7").toDF("rid")
      .select(Sampling.unitUniform(col("rid")).as("u")).as[Double].head()
    assert(got === one)
  }

  test("salted uniforms are decorrelated across purposes") {
    val both = ids.select(
      Sampling.unitUniform(col("rid"), "split").as("a"),
      Sampling.unitUniform(col("rid"), "sample").as("b"))
      .as[(Double, Double)].collect()
    assert(both.forall { case (a, b) => a != b })
    // membership below 0.5 under each salt should be ~independent:
    // P(both) ≈ 0.25, far from the ≈0.5 a shared uniform would give
    val joint = both.count { case (a, b) => a < 0.5 && b < 0.5 }.toDouble
    assert(joint / both.length > 0.15 && joint / both.length < 0.35)
  }

  test("assignSplits: disjoint, exhaustive for full fractions, stable") {
    val s = Sampling.assignSplits(ids, "rid",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test")) // no null label
    assert(counts.values.sum === 2000L)
    // fractions land near the targets (60-bit uniform, n=2000: ±4σ bounds)
    assert(math.abs(counts("train") - 1500L) < 80)
    assert(math.abs(counts("val") - 250L) < 60)
    // membership is per-row stable: a disjoint re-run on a SUBSET assigns
    // the same labels (append/reorder cannot reshuffle history)
    val sub = Sampling.assignSplits(ids.where(col("stratum") === "even"),
      "rid", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val full = s.select("rid", "split").as[(String, String)].collect().toMap
    sub.select("rid", "split").as[(String, String)].collect().foreach {
      case (rid, lbl) => assert(full(rid) === lbl)
    }
  }

  test("assignSplits: partial fractions leave a NULL remainder; sum>1 rejected") {
    val s = Sampling.assignSplits(ids, "rid", Seq("train" -> 0.25))
    val n = s.where(col("split").isNull).count()
    assert(math.abs(n - 1500L) < 80)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids, "rid", Seq("a" -> 0.75, "b" -> 0.5))
    }
    // NULL id → NULL label, not a guessed band
    val nullRow = Seq(Option.empty[String]).toDF("rid")
    assert(Sampling.assignSplits(nullRow, "rid", Seq("a" -> 1.0))
      .where(col("split").isNull).count() === 1L)
  }

  test("stratifiedSample: per-stratum rates, default applies, deterministic") {
    val kept = Sampling.stratifiedSample(ids, "rid", "stratum",
      Map("even" -> 0.5), defaultRate = 0.0625)
    val byStratum = kept.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byStratum("even") - 500L) < 70)
    assert(math.abs(byStratum.getOrElse("odd", 0L) - 62L) < 40)
    // flag form counts the same members the filter keeps
    val flagged = ids.where(Sampling.sampleFlag(ids, "rid", "stratum",
      Map("even" -> 0.5), defaultRate = 0.0625)).count()
    assert(flagged === kept.count())
    // sample membership is independent of split membership (different salt)
    val s = Sampling.assignSplits(kept, "rid",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(s.groupBy("split").count().count() === 3L)
  }

  test("assignGroupedSplits: clusters are cohesive, singletons keep plain labels") {
    val docs = spark.range(200).select(col("id").as("doc_id"))
    // two clusters: {3, 50, 99} labeled 3 and {10, 20} labeled 10
    val groups = Seq((3L, 3L), (50L, 3L), (99L, 3L), (10L, 10L), (20L, 10L))
      .toDF("doc_id", "grp")
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val got = Sampling.assignGroupedSplits(docs, "doc_id", groups, "grp", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // cohesion: every cluster member carries its LABEL doc's split
    assert(got(50L) === got(3L) && got(99L) === got(3L), got.toString)
    assert(got(20L) === got(10L), got.toString)
    // singletons (and cluster labels themselves) = plain assignSplits
    val plain = Sampling.assignSplits(docs, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      val expected = if (Set(50L, 99L)(id)) plain(3L)
        else if (id == 20L) plain(10L) else plain(id)
      assert(got(id) === expected, s"doc $id: got ${got(id)}, want $expected")
    }
    // the leakage property directly: no group spans two splits
    val spans = Sampling.assignGroupedSplits(docs, "doc_id", groups, "grp", splits)
      .join(groups, Seq("doc_id"))
      .groupBy("grp").agg(countDistinct(col("split")).as("n"))
      .where(col("n") > 1).count()
    assert(spans === 0L)
  }
}
