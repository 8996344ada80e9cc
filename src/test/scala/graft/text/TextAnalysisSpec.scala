package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).head().get(0)

  test("token and char counting") {
    assert(one(TextAnalysis.tokenCount(col("t")), "a b c") === 3)
    assert(one(TextAnalysis.tokenCount(col("t")), "single") === 1)
    assert(one(TextAnalysis.charCount(col("t")), "abc de") === 6)
  }

  test("quality score components") {
    val long = ("word " * 50).trim + " the end"
    assert(one(TextAnalysis.qualityScore(col("t")), long) === 3)
    assert(one(TextAnalysis.qualityScore(col("t")), "short") === 0)
    assert(one(TextAnalysis.qualityScore(col("t")), "the") === 1)
  }

  test("stopword / alpha / punct ratios") {
    assert(one(TextAnalysis.stopwordRatio(col("t")), "the cat and the dog")
      .asInstanceOf[Double] === 0.6)
    assert(one(TextAnalysis.alphaRatio(col("t")), "abc123")
      .asInstanceOf[Double] === 0.5)
    val p = one(TextAnalysis.punctRatio(col("t")), "a,b.c").asInstanceOf[Double]
    assert(math.abs(p - 0.4) < 1e-9)
  }

  test("language ID heuristic on crafted samples") {
    assert(one(TextAnalysis.langId(col("t")),
      "the cat is in the house and it was good") === "en")
    assert(one(TextAnalysis.langId(col("t")),
      "le chat est dans la maison et les oiseaux") === "fr")
    assert(one(TextAnalysis.langId(col("t")),
      "el gato esta en la casa con los perros") === "es")
    assert(one(TextAnalysis.langId(col("t")),
      "der Hund und die Katze ist nicht hier") === "de")
    assert(one(TextAnalysis.langId(col("t")), "你好 世界") === "zh")
    assert(one(TextAnalysis.langId(col("t")), "zzz qqq xxx") === "und")
  }

  test("fingerprint normalizes whitespace and case") {
    val a = one(TextAnalysis.fingerprint(col("t")), "Hello   World")
    val b = one(TextAnalysis.fingerprint(col("t")), "hello world ")
    val c = one(TextAnalysis.fingerprint(col("t")), "hello mars")
    assert(a === b)
    assert(a !== c)
  }

  test("rolling hash is order-sensitive (unlike set-based fingerprints)") {
    val ab = one(TextAnalysis.rollingHash(col("t")), "alpha beta")
    val ba = one(TextAnalysis.rollingHash(col("t")), "beta alpha")
    val ab2 = one(TextAnalysis.rollingHash(col("t")), "alpha beta")
    assert(ab === ab2)
    assert(ab !== ba)
  }

  test("subword estimate splits case/digit boundaries") {
    assert(one(TextAnalysis.subwordCountEstimate(col("t")), "fooBar baz42qux")
      .asInstanceOf[Int] >= 4)
  }

  test("native RollingHash is bit-identical to the composed column form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(col("doc_id"),
      TextAnalysis.rollingHash(col("text")).as("nat"),
      TextAnalysis.rollingHashColumnForm(col("text")).as("hof")).collect()
    assert(both.length === 500)
    assert(both.forall(r => r.getLong(1) == r.getLong(2)),
      both.collect { case r if r.getLong(1) != r.getLong(2) =>
        r.getLong(0).toString }.take(3))
    // empty text: fold over zero tokens → split("") yields [""], both forms
    // hash the single empty token identically
    assert(one(TextAnalysis.rollingHash(col("t")), "") ===
      one(TextAnalysis.rollingHashColumnForm(col("t")), ""))
  }

  test("duplicate-line fraction: repetition signal over newline lines") {
    assert(one(TextAnalysis.duplicateLineFraction(col("t")),
      "no newline here").asInstanceOf[Double] === 0.0)
    assert(one(TextAnalysis.duplicateLineFraction(col("t")),
      "nav bar\ncontent here\nnav bar\nfooter").asInstanceOf[Double] === 0.25)
    assert(one(TextAnalysis.duplicateLineFraction(col("t")),
      "same\nsame").asInstanceOf[Double] === 0.5)
    // the integer-inequality form of "fraction >= 1/2" agrees
    val t = col("t")
    val pred = (TextAnalysis.lineCount(t) - TextAnalysis.distinctLineCount(t))
      .multiply(2) >= TextAnalysis.lineCount(t)
    assert(one(pred, "same\nsame") === true)
    assert(one(pred, "nav\ncontent\nnav\nfooter") === false)
  }

  test("topCount finds the mode of an n-gram multiset (Dedup.shingles)") {
    // the repetition-mass numerator rides the native multiset shingler —
    // no composed duplicate of it lives in TextAnalysis
    import graft.dedup.Dedup
    val withNg = Seq("spam ham spam ham spam ham eggs").toDF("t")
      .withColumn("_ng", Dedup.shingles(col("t"), 2))
    val r = withNg.select(TextAnalysis.topCount(col("_ng")).as("top"),
      size(col("_ng")).as("n")).head()
    // bigrams: "spam ham" x3, "ham spam" x2, "ham eggs" x1
    assert(r.getAs[Int]("top") === 3 && r.getAs[Int]("n") === 6)
    // works on any array column, e.g. newline lines
    assert(one(TextAnalysis.topCount(TextAnalysis.lines(col("t"))),
      "nav\ncontent\nnav\nnav") === 3)
  }
}
