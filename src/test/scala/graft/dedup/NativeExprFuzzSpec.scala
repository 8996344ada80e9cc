package graft.dedup

import graft.TestSpark
import graft.vector.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded-random fuzz parity for every native codegen expression against
  * its composed-column baseline — deterministic (seed 42), heavy on edge
  * shapes the curated tests don't reach: unicode + empty + whitespace
  * tokens, null elements, zero/negative/tiny vector components, varying
  * lengths. A single ulp of divergence fails (the oracle gate depends on
  * bit-equality). */
class NativeExprFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(42)

  private def randToken(): String = {
    val alphabets = Seq("abcdef", "αβγδε", "测试中文字", "🙂🚀∑", " \t", "")
    val a = alphabets(rnd.nextInt(alphabets.size))
    if (a.isEmpty) "" else Seq.fill(1 + rnd.nextInt(6))(
      a.charAt(rnd.nextInt(a.length))).mkString
  }

  private def randTokens(withNulls: Boolean): Seq[String] =
    Seq.fill(rnd.nextInt(12))(
      if (withNulls && rnd.nextInt(10) == 0) null else randToken())

  test("fuzz: WordShingles + MinHashSignature parity on 300 random docs") {
    val docs = (1 to 300).map(i => (i.toLong, randTokens(withNulls = true)))
      .toDF("id", "toks")
    import org.apache.spark.sql.graft.ColumnBridge
    for (n <- Seq(1, 2, 3, 5)) {
      val natSh = ColumnBridge.column(
        WordShingles(ColumnBridge.expression(col("toks")), n))
      val hofSh = when(size(col("toks")) < n, array(concat_ws(" ", col("toks"))))
        .otherwise(transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
      val rows = docs.select(col("id"), natSh.as("nat"), hofSh.as("hof"),
        Dedup.minhashSignature(natSh, 32).as("natsig"),
        Dedup.minhashSignatureColumnForm(hofSh, 32).as("hofsig")).collect()
      assert(rows.forall(r => r.getSeq[String](1) == r.getSeq[String](2)),
        s"n=$n shingle mismatch")
      assert(rows.forall(r => r.getSeq[Long](3) == r.getSeq[Long](4)),
        s"n=$n signature mismatch")
    }
  }

  test("fuzz: SimHashSig parity on 300 random texts incl. empty/whitespace") {
    val texts = (1 to 300).map(i =>
      (i.toLong, randTokens(withNulls = false).mkString(" ")))
      .toDF("id", "text")
    for (bits <- Seq(8, 33, 64)) {
      val rows = texts.select(col("id"),
        Dedup.simhashSig(col("text"), bits).as("nat"),
        Dedup.simhashSigColumnForm(col("text"), bits,
          t => xxhash64(t)).as("hof")).collect()
      assert(rows.forall(r => r.getLong(1) == r.getLong(2)),
        s"bits=$bits: " + rows.collect {
          case r if r.getLong(1) != r.getLong(2) => r.getLong(0)
        }.take(3).mkString(","))
    }
  }

  test("fuzz: CosineSim parity on 300 random float vectors incl. zeros/negatives") {
    def randVec(dim: Int): Seq[Float] = Seq.fill(dim) {
      rnd.nextInt(8) match {
        case 0 => 0.0f
        case 1 => -rnd.nextFloat()
        case 2 => rnd.nextFloat() * 1e-30f // denormal-adjacent
        case 3 => rnd.nextFloat() * 1e30f
        case _ => rnd.nextFloat() * 2 - 1
      }
    }
    val dim = 16
    val pairs = (1 to 300).map(i => (i.toLong, randVec(dim), randVec(dim)))
      .toDF("id", "a", "b")
    // composed form inlined (the library one is package-private to vector)
    def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val d = sqrt(Similarity.dot(a, a)) * sqrt(Similarity.dot(b, b))
      when(d === 0, 0.0).otherwise(Similarity.dot(a, b) / d)
    }
    val rows = pairs.select(col("id"),
      Similarity.cosine(col("a"), col("b")).as("nat"),
      hofCos(col("a"), col("b")).as("hof")).collect()
    // bit-level equality, treating NaN == NaN
    assert(rows.forall(r =>
      java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2))),
      rows.collect { case r if java.lang.Double.doubleToLongBits(r.getDouble(1)) !=
        java.lang.Double.doubleToLongBits(r.getDouble(2)) =>
        s"${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}" }.take(3))
  }

  test("fuzz: HyperplaneBuckets parity on 200 random double vectors") {
    val dim = 24
    def randVec(): Seq[Double] = Seq.fill(dim)(rnd.nextGaussian())
    val vecs = (1 to 200).map(i => (i.toLong, randVec())).toDF("id", "v")
    val tables = 6; val planes = 7
    val rows = vecs.select(col("id"),
      Similarity.tableBuckets(col("v"), dim, planes, tables, 99L).as("nat"),
      array((0 until tables).map(t =>
        Similarity.hyperplaneBucket(col("v"), dim, planes, 99L + t * 7919L)): _*)
        .as("hof")).collect()
    assert(rows.forall(r => r.getSeq[Long](1) == r.getSeq[Long](2)),
      rows.collect { case r if r.getSeq[Long](1) != r.getSeq[Long](2) =>
        r.getLong(0) }.take(3).mkString(","))
  }
}
