package graft.sample

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = spark.range(4000)
    .select(concat(lit("d-"), col("id")).as("id"),
      when(col("id") % 4 === 0, "keepall")
        .when(col("id") % 4 === 1, "double")
        .when(col("id") % 4 === 2, "half")
        .otherwise("drop").as("src"))

  val rates = Map("double" -> 2.0, "half" -> 0.5, "drop" -> 0.0)

  test("integer rates are exact: 2.0 → every row exactly twice, 0.0 → gone") {
    val out = Mixing.resample(docs, "id", "src", rates, defaultRate = 1.0)
    val bySrc = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc("double") === 2000L) // 1000 rows × exactly 2 copies
    assert(bySrc("keepall") === 1000L) // default rate 1.0, copy 0 only
    assert(!bySrc.contains("drop"))
    // the two copies of a doubled row carry distinct copy indices
    val copies = out.where(col("src") === "double")
      .groupBy("id").agg(collect_set("copy").as("ks"))
      .select(size(col("ks"))).as[Int].collect()
    assert(copies.forall(_ === 2))
  }

  test("fractional rate keeps exactly the rows whose uniform clears it") {
    val out = Mixing.resample(docs, "id", "src", rates, defaultRate = 1.0)
    val gotHalf = out.where(col("src") === "half")
      .select("id").as[String].collect().toSet
    val expHalf = docs.where(col("src") === "half")
      .where(Sampling.unitUniform(
        concat(col("id"), lit(":mix:0"))) < 0.5)
      .select("id").as[String].collect().toSet
    assert(gotHalf === expHalf)
    // expected multiplicity 0.5 within a loose binomial band
    assert(gotHalf.size > 380 && gotHalf.size < 620)
  }

  test("membership is deterministic across reruns and repartitions") {
    def run(p: Int) = Mixing
      .resample(docs.repartition(p), "id", "src", rates, 1.0)
      .select("id", "copy").as[(String, Int)].collect().toSet
    assert(run(2) === run(7))
  }

  test("NULL source takes the default rate; NULL id is dropped") {
    val weird = Seq((null: String, "x1"), ("s", "x2"), ("s", null))
      .toDF("src", "id")
    // default 1.0: NULL-source row survives as copy 0; NULL id drops
    val out = Mixing.resample(weird, "id", "src", Map("s" -> 1.0), 1.0)
      .select("id").as[String].collect()
    assert(out.toSet === Set("x1", "x2"))
  }

  test("resampleSummary matches resample counts and input counts") {
    val sum = Mixing
      .resampleSummary(docs, "id", "src", rates, defaultRate = 1.0)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val out = Mixing.resample(docs, "id", "src", rates, 1.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    for ((src, (inRows, outRows)) <- sum) {
      assert(inRows === 1000L, src)
      assert(outRows === out.getOrElse(src, 0L), src)
    }
    assert(sum.keySet === Set("keepall", "double", "half", "drop"))
  }

  test("negative rates are rejected") {
    intercept[IllegalArgumentException] {
      Mixing.resample(docs, "id", "src", Map("bad" -> -0.5), 1.0)
    }
    intercept[IllegalArgumentException] {
      Mixing.resampleSummary(docs, "id", "src", Map.empty, -1.0)
    }
  }

  test("scale shape: no exchange in the resample plan") {
    val plan = Mixing.resample(docs, "id", "src", rates, 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("ratesForBudget hits the budget at the target proportions") {
    val tokens = Map("web" -> 800L, "books" -> 100L, "code" -> 100L)
    val (r, clamped) = Mixing.ratesForBudget(tokens,
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25),
      budgetTokens = 400L)
    assert(clamped.isEmpty)
    // expected contribution = tokens × rate = budget × proportion
    assert(r("web") * 800 === 200.0)
    assert(r("books") * 100 === 100.0)
    assert(r("code") * 100 === 100.0)
    // proportions are normalized: weights 2/1/1 give the same answer
    val (r2, _) = Mixing.ratesForBudget(tokens,
      Map("web" -> 2.0, "books" -> 1.0, "code" -> 1.0), 400L)
    assert(r2 === r)
  }

  test("ratesForBudget clamps repetition runaway and reports it") {
    val (r, clamped) = Mixing.ratesForBudget(
      Map("tiny" -> 10L, "big" -> 10000L),
      Map("tiny" -> 0.5, "big" -> 0.5),
      budgetTokens = 10000L, maxRepetition = 16.0)
    // tiny would need rate 500 — clamped to 16 and reported
    assert(r("tiny") === 16.0)
    assert(clamped.keySet === Set("tiny") && clamped("tiny") === 500.0)
    assert(r("big") === 0.5)
    // domain validation
    intercept[IllegalArgumentException] {
      Mixing.ratesForBudget(Map("a" -> 1L), Map("b" -> 1.0), 10L)
    }
    intercept[IllegalArgumentException] {
      Mixing.ratesForBudget(Map("a" -> 1L), Map("a" -> -1.0), 10L)
    }
  }
}
