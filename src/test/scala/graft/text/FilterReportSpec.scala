package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FilterReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "z"),                        // fails minLen AND noZ — attributed to minLen (first)
    (2L, "zz long enough sample"),    // passes minLen, fails noZ
    (3L, "long enough clean sample"), // passes all
    (4L, "also clean and long"),      // passes all
    (5L, null.asInstanceOf[String])   // NULL: fails rule 1 (null = fail there)
  ).toDF("id", "text")
  val rules = Seq(
    "minLen" -> (length(col("text")) >= 5),
    "noZ" -> !col("text").contains("z"))

  test("first-failing-rule attribution, in order") {
    val attr = FilterReport.attributed(docs, rules)
      .select("id", "_removed_by").as[(Long, String)].collect().toMap
    assert(attr === Map(1L -> "minLen", 2L -> "noZ", 3L -> "_kept",
      4L -> "_kept", 5L -> "minLen"))
  }

  test("report: removed counts by rule, cumulative surviving; zero-removal rules present") {
    val r = FilterReport.report(docs,
      rules :+ ("never" -> lit(true)))
      .as[(String, Long, Long)].collect().toSeq
    assert(r === Seq(("minLen", 2L, 3L), ("noZ", 1L, 2L), ("never", 0L, 2L)))
  }

  test("keep returns exactly the all-rules survivors, attribution dropped") {
    val kept = FilterReport.keep(docs, rules)
    assert(kept.columns.toSeq === Seq("id", "text"))
    assert(kept.select("id").as[Long].collect().sorted === Array(3L, 4L))
  }

  test("rule order changes attribution but not the survivor set") {
    val rev = FilterReport.report(docs, rules.reverse)
      .as[(String, Long, Long)].collect().toSeq
    // noZ first now claims doc 1 (contains z) — and NULL text fails noZ
    // first too (null = fail at the first rule that cannot score it)
    assert(rev === Seq(("noZ", 3L, 2L), ("minLen", 0L, 2L)))
    assert(rev.last._3 === 2L) // same survivors as the forward order
    intercept[IllegalArgumentException] {
      FilterReport.report(docs, Seq("dup" -> lit(true), "dup" -> lit(false)))
    }
  }

  test("attribution column collisions are refused, not clobbered; attrCol threads through") {
    val pre = FilterReport.attributed(docs, rules)
    intercept[IllegalArgumentException] { FilterReport.attributed(pre, rules) }
    intercept[IllegalArgumentException] { FilterReport.keep(pre, rules) }
    // a re-filter of an attributed frame works under a fresh column name
    val kept = FilterReport.keep(pre, rules, attrCol = "_removed_by_2")
    assert(kept.columns.toSeq === Seq("id", "text", "_removed_by"))
    assert(kept.select("id").as[Long].collect().sorted === Array(3L, 4L))
  }
}
