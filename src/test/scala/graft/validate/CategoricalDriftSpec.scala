package graft.validate

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Categorical-mix drift (round-5 verdict #5): max per-category
  * |share delta| with union-of-both-sides categories. Hand-checkable
  * mixes pin the statistic, the union semantics, and the tiebreak. */
class CategoricalDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mix(rows: (String, String, Int)*) =
    rows.flatMap { case (g, c, n) => Seq.fill(n)((g, c)) }.toDF("g", "cat")

  test("identical mixes → zero shift, not drifted") {
    val df = mix(("x", "a", 30), ("x", "b", 70))
    val r = DriftCheck.categoricalCompare(df, df, "cat", Seq("g")).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("max_share_shift") === 0.0)
    assert(!r.head.getAs[Boolean]("drifted"))
    assert(r.head.getAs[Long]("n_categories") === 2L)
  }

  test("planted shift lands on the right category with the exact delta") {
    // ref 30/70, cur 50/50 → both categories shift by exactly 0.2; the
    // tie breaks to the smaller category string ('a')
    val ref = mix(("x", "a", 30), ("x", "b", 70))
    val cur = mix(("x", "a", 50), ("x", "b", 50))
    val r = DriftCheck.categoricalCompare(ref, cur, "cat", Seq("g"),
      maxShiftThreshold = 0.1).collect().head
    assert(math.abs(r.getAs[Double]("max_share_shift") - 0.2) < 1e-15)
    assert(r.getAs[String]("top_shift_category") === "a")
    assert(r.getAs[Boolean]("drifted"))
  }

  test("only the shifted group drifts; untouched groups stay clean") {
    val ref = mix(("x", "a", 50), ("x", "b", 50), ("y", "a", 80), ("y", "b", 20))
    val cur = mix(("x", "a", 90), ("x", "b", 10), ("y", "a", 80), ("y", "b", 20))
    val r = DriftCheck.categoricalCompare(ref, cur, "cat", Seq("g"))
      .collect().map(row => row.getString(0) -> row.getAs[Boolean]("drifted"))
      .toMap
    assert(r === Map("x" -> true, "y" -> false))
  }

  test("a category present on only one side counts as share 0 on the other") {
    // 'c' appears only in current (20% of it): shift 0.2, and it must be
    // visible in n_categories — disappearing/appearing categories are the
    // monitor's core job
    val ref = mix(("x", "a", 50), ("x", "b", 50))
    val cur = mix(("x", "a", 40), ("x", "b", 40), ("x", "c", 20))
    val r = DriftCheck.categoricalCompare(ref, cur, "cat", Seq("g"),
      maxShiftThreshold = 0.15).collect().head
    assert(r.getAs[Long]("n_categories") === 3L)
    assert(math.abs(r.getAs[Double]("max_share_shift") - 0.2) < 1e-15)
    assert(r.getAs[String]("top_shift_category") === "c")
    assert(r.getAs[Boolean]("drifted"))
  }

  test("NULL category is its own category, not silently dropped") {
    val ref = Seq(("x", "a"), ("x", "a"), ("x", "b"), ("x", "b")).toDF("g", "cat")
    val cur = Seq(("x", "a"), ("x", null), ("x", null), ("x", null))
      .toDF("g", "cat")
    val r = DriftCheck.categoricalCompare(ref, cur, "cat", Seq("g"))
      .collect().head
    assert(r.getAs[Long]("n_categories") === 3L)
    // null: 0 → 0.75 is the largest shift
    assert(math.abs(r.getAs[Double]("max_share_shift") - 0.75) < 1e-15)
    assert(r.getAs[String]("top_shift_category") === null)
  }

  test("NULL category on BOTH sides joins into one grid row (null-safe keys)") {
    // identical mixes incl. 50% NULL: a plain equi-join would split the
    // NULL category into a ref-only row (shift 0.5) and a cur-only row
    // (shift 0.5) and read spuriously drifted with n_categories 3
    val ref = Seq(("x", "a"), ("x", null), ("x", null), ("x", "a")).toDF("g", "cat")
    val cur = Seq(("x", null), ("x", "a"), ("x", "a"), ("x", null)).toDF("g", "cat")
    val r = DriftCheck.categoricalCompare(ref, cur, "cat", Seq("g"))
      .collect().head
    assert(r.getAs[Long]("n_categories") === 2L)
    assert(r.getAs[Double]("max_share_shift") === 0.0)
    assert(!r.getAs[Boolean]("drifted"))
    // and a NULL GROUP value on both sides is one group, not two
    val refG = Seq((null.asInstanceOf[String], "a"), (null.asInstanceOf[String], "b"))
      .toDF("g", "cat")
    val curG = Seq((null.asInstanceOf[String], "a"), (null.asInstanceOf[String], "b"))
      .toDF("g", "cat")
    val rows = DriftCheck.categoricalCompare(refG, curG, "cat", Seq("g")).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("max_share_shift") === 0.0)
  }

  test("no group columns → one global row") {
    val ref = mix(("x", "a", 10), ("y", "b", 10))
    val cur = mix(("x", "a", 10), ("y", "b", 30))
    val r = DriftCheck.categoricalCompare(ref.select("cat"), cur.select("cat"),
      "cat", Nil).collect()
    assert(r.length === 1)
    // ref 50/50, cur 25/75 → max shift 0.25
    assert(math.abs(r.head.getAs[Double]("max_share_shift") - 0.25) < 1e-15)
  }
}
