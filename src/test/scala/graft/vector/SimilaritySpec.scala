package graft.vector

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  lazy val dim = emb.select(size($"embedding")).head().getInt(0)

  test("cosine primitives: parallel=1, orthogonal=0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(2.0f, 0.0f), Seq(0.0f, 3.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine($"a", $"b").as("par"),
      Similarity.cosine($"a", $"c").as("orth"),
      Similarity.dot($"a", $"b").as("dot")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1)) < 1e-9)
    assert(r.getDouble(2) === 2.0)
  }

  test("brute-force top-k: self excluded, ranks ordered, k respected") {
    val queries = emb.limit(3)
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .cache()
    assert(topk.groupBy("query_id").count().select(max("count")).head().getLong(0) === 5)
    assert(topk.where($"query_id" === $"neighbor_id").count() === 0)
    // ranks are 1..5 with non-increasing cosine
    val perQ = topk.where($"query_id" === topk.select("query_id").head().getLong(0))
      .orderBy("rank").collect()
    assert(perQ.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3, 4, 5))
    val cos = perQ.map(_.getAs[Double]("cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    topk.unpersist()
  }

  test("LSH top-k achieves decent recall@5 vs brute force with multi-probe") {
    val queries = emb.limit(10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      dim = dim, planes = 6, tables = 8, multiProbeBits = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // these synthetic embeddings are near-random (top-5 cosine ≈ 0.32) —
    // LSH's worst case; clustered real embeddings recall far higher
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("bucket histogram: buckets partition the corpus") {
    val hist = Similarity.bucketHistogram(emb, "embedding", dim, planes = 8)
    assert(hist.agg(sum("n")).head().getLong(0) === emb.count())
    assert(hist.count() > 1) // vectors actually spread across buckets
  }

  test("hyperplanes are deterministic across invocations") {
    val a = Similarity.hyperplanes(16, 4, 42L)
    val b = Similarity.hyperplanes(16, 4, 42L)
    assert(a.flatten.toSeq === b.flatten.toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("native HyperplaneBuckets is bit-identical to the composed column form") {
    // the codegen expression must reproduce the HOF buckets EXACTLY (same
    // seeds seed + t*7919, same ascending-element double accumulation) —
    // the LSH capture-margin analysis (q33) is done against the column form
    val tables = 16; val planes = 8; val seed = 42L
    val native = emb.select($"vec_id",
      Similarity.tableBuckets($"embedding", dim, planes, tables, seed).as("bs"))
    val composed = emb.select($"vec_id", array((0 until tables).map(t =>
      Similarity.hyperplaneBucket($"embedding", dim, planes, seed + t * 7919L)): _*)
      .as("bs"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n.keySet === c.keySet)
    assert(n.forall { case (k, v) => c(k) == v },
      n.collect { case (k, v) if c(k) != v => s"$k: $v vs ${c(k)}" }.take(3))
  }

  test("native buckets: interpreted eval agrees with the codegen path") {
    val tables = 4; val planes = 6
    val viaCodegen = emb.select(
      Similarity.tableBuckets($"embedding", dim, planes, tables).as("bs"))
      .collect().map(_.getSeq[Long](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaEval = emb.select(
        Similarity.tableBuckets($"embedding", dim, planes, tables).as("bs"))
        .collect().map(_.getSeq[Long](0))
      assert(viaCodegen.toSeq === viaEval.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("native CosineSim is bit-identical to the composed column form") {
    val pairs = emb.limit(40).select($"vec_id", $"embedding".as("a"))
      .crossJoin(emb.limit(40).select($"embedding".as("b")))
    val both = pairs.select(
      Similarity.cosine($"a", $"b").as("nat"),
      Similarity.cosineColumnForm($"a", $"b").as("hof")).collect()
    assert(both.nonEmpty)
    // bit-level: the three sums accumulate in the same order
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)),
      both.collect { case r if r.getDouble(0) != r.getDouble(1) =>
        s"${r.getDouble(0)} vs ${r.getDouble(1)}" }.take(3))
  }

  test("native CosineSim: zero vector → 0.0, length mismatch → null") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(0.0f, 0.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "z", "longer")
    val r = df.select(
      Similarity.cosine($"a", $"z").as("zero"),
      Similarity.cosine($"a", $"longer").as("mismatch")).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.isNullAt(1))
  }

  test("null vector elements: native matches composed (cosine→null, buckets→0)") {
    // composed forms: a null element nulls the dot fold → cosine NULL; and
    // nulls every projection → `when(proj>=0, bit)` contributes 0 in every
    // plane → bucket 0 per table. The natives must never read null as 0.0.
    val df = spark.range(1).select(
      array(lit(1.0f), lit(null).cast("float"), lit(2.0f)).as("a"),
      array(lit(1.0f), lit(2.0f), lit(3.0f)).as("b"))
    val r = df.select(
      Similarity.cosine($"a", $"b").as("natCos"),
      Similarity.cosineColumnForm($"a", $"b").as("hofCos"),
      Similarity.tableBuckets($"a", 3, 4, 2).as("natBk"),
      Similarity.hyperplaneBucket($"a", 3, 4, 42L).as("hofBk")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getSeq[Long](2) === Seq(0L, 0L))
    assert(r.getLong(3) === 0L)
  }

  test("native buckets reject short vectors instead of silently truncating") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    assertThrows[Exception] {
      df.select(Similarity.tableBuckets(col("v"), dim = 8, planes = 4,
        tables = 2)).collect()
    }
  }

  test("native buckets reject LONG vectors too (r3 advice: no silent truncation)") {
    // a 10-element vector against dim=8 previously projected on its first
    // 8 components — a wrong-but-plausible bucket; the check is now `!=`
    val df = Seq(Seq.tabulate(10)(i => i.toFloat)).toDF("v")
    assertThrows[Exception] {
      df.select(Similarity.tableBuckets(col("v"), dim = 8, planes = 4,
        tables = 2)).collect()
    }
  }
}
