package graft.validate

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingCheckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def unit(dim: Int, seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  lazy val rows = Seq(
    (1L, unit(8, 1)),                                   // ok
    (2L, null.asInstanceOf[Array[Float]]),              // null_vector
    (3L, unit(4, 3)),                                   // wrong_dim
    (4L, unit(8, 4).updated(2, Float.NaN)),             // non_finite
    (5L, unit(8, 5).updated(0, Float.PositiveInfinity)),// non_finite
    (6L, Array.fill(8)(0.0f)),                          // zero_vector
    (7L, unit(8, 7).map(_ * 2.0f)),                     // not_unit_norm
    (8L, unit(8, 8)),                                   // ok
  ).toDF("vec_id", "embedding")

  test("every band fires on its shape, first match wins") {
    val got = EmbeddingCheck.measure(rows, "embedding", dim = 8)
      .select("vec_id", "band").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "ok", 2L -> "null_vector", 3L -> "wrong_dim",
      4L -> "non_finite", 5L -> "non_finite", 6L -> "zero_vector",
      7L -> "not_unit_norm", 8L -> "ok"))
  }

  test("precedence: a wrong-dim NaN vector is wrong_dim, not non_finite") {
    val v = Seq((1L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val band = EmbeddingCheck.measure(v, "embedding", dim = 8)
      .select("band").as[String].head()
    assert(band === "wrong_dim")
  }

  test("a NULL element is banded, not slid to 'ok' by three-valued logic") {
    // build a correct-length vector with one NULL element via SQL (a
    // Scala Array[Float] cannot hold null) — the exact shape that made
    // exists(isnan)=NULL, norm=NULL, and every later compare fall through
    val v = spark.sql(
      """SELECT 1L AS vec_id,
        |  transform(array(0.5F, 0.5F, 0.5F, 0.5F),
        |    (x, i) -> IF(i = 2, CAST(NULL AS FLOAT), x)) AS embedding
        |""".stripMargin)
    val got = EmbeddingCheck.measure(v, "embedding", dim = 4)
      .select("band").as[String].head()
    assert(got === "null_element")
  }

  test("norm tolerance: organic float error passes, real drift fails") {
    // a unit vector perturbed by float rounding (~1e-7) stays ok
    val nearly = Seq((1L, unit(64, 42))).toDF("vec_id", "embedding")
    assert(EmbeddingCheck.measure(nearly, "embedding", 64)
      .select("band").as[String].head() === "ok")
    // a 0.5% scale error fails the default 1e-3 tolerance
    val off = Seq((1L, unit(64, 42).map(_ * 1.005f)))
      .toDF("vec_id", "embedding")
    assert(EmbeddingCheck.measure(off, "embedding", 64)
      .select("band").as[String].head() === "not_unit_norm")
  }

  test("census equals measure rolled up; no UDF in the plan") {
    val full = EmbeddingCheck.census(rows, "embedding", 8)
      .as[(String, Long)].collect().toMap
    assert(full === Map("ok" -> 2L, "null_vector" -> 1L,
      "wrong_dim" -> 1L, "non_finite" -> 2L, "zero_vector" -> 1L,
      "not_unit_norm" -> 1L))
    val plan = EmbeddingCheck.census(rows, "embedding", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("real table: every organic vector is ok at the default tolerance") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
    val bands = EmbeddingCheck.census(emb, "embedding", 64)
      .as[(String, Long)].collect().toMap
    assert(bands === Map("ok" -> 500L))
  }
}
