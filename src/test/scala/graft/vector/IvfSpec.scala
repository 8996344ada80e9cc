package graft.vector

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF coarse-quantized ANN: correctness anchors (nprobe = nCells degenerates
  * to exact brute force), determinism of training, and recall behavior of
  * real probing on the synthetic embeddings (near-random vectors — LSH/IVF's
  * worst case, so the recall bound here is deliberately modest; clustered
  * real-world embeddings do far better). */
class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val queries = emb.where(col("vec_id") < 5)
  lazy val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding",
    nCells = 8, iters = 2)

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

  test("training is deterministic and yields nCells centroids") {
    val again = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2)
    assert(centroids.size === 8)
    assert(centroids === again)
    assert(centroids.forall(_.size === 64))
  }

  test("nprobe = nCells degenerates to exact brute-force top-k") {
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val ivfAll = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      centroids, nprobe = 8))
    assert(ivfAll === exact)
  }

  test("cell assignment partitions the corpus (every row lands in one cell)") {
    val cells = emb.select(Similarity.nearestCell(col("embedding"), centroids).as("c"))
    assert(cells.count() === emb.count())
    val histo = cells.groupBy("c").count().collect()
    assert(histo.map(_.getLong(1)).sum === emb.count())
    assert(histo.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
  }

  test("probing fewer cells trades recall for candidates, recall@5 stays useful") {
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val probed = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      centroids, nprobe = 4))
    val recall = (probed intersect exact).size.toDouble / exact.size
    // near-random 64-dim vectors: half the cells should still catch a
    // useful share of true neighbors (clustered data approaches 1.0)
    assert(recall >= 0.3, s"recall=$recall")
    assert(probed.size === exact.size) // still k results per query
  }

  // ---- round-2 verdict #4: training runs on a hash-selected sample ----

  test("training sample is ~sampleSize and layout-independent") {
    val s1 = Similarity.trainingSample(emb, "vec_id", "embedding", 50)
    val ids1 = s1.select("_id").collect().map(_.getLong(0)).toSet
    val ids2 = Similarity.trainingSample(emb.repartition(7), "vec_id",
      "embedding", 50).select("_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2, "sample must be a pure function of the id")
    // xxhash64 % K selection: expected n/K = 50 of 500, binomial sd ≈ 6.7
    assert(ids1.size > 20 && ids1.size < 100, s"sample size ${ids1.size}")
  }

  test("sampled training is deterministic across corpus partitionings") {
    val a = Similarity.trainCentroids(emb, "vec_id", "embedding", 4, 2,
      sampleSize = 50)
    val b = Similarity.trainCentroids(emb.repartition(11), "vec_id",
      "embedding", 4, 2, sampleSize = 50)
    assert(a === b)
    assert(a.size === 4 && a.forall(_.size === 64))
  }

  test("Lloyd iterations scan the SAMPLE, not the corpus (input-metrics pin)") {
    // task-level recordsRead across every job fired by trainCentroids: the
    // ids-only count + sample materialization read the corpus once each
    // (2 × 500); the seeds pass + each of 4 Lloyd iterations read only the
    // ~50-row persisted sample. The pre-fix code re-scanned the corpus per
    // iteration (≥ 500 × 5 = 2500 in this setup).
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.trainCentroids(emb, "vec_id", "embedding", 4, iters = 4,
        sampleSize = 50)
      Thread.sleep(500) // listener bus is asynchronous
    } finally spark.sparkContext.removeSparkListener(listener)
    val total = read.get()
    assert(total > 0, "listener saw no input metrics")
    assert(total < 2000,
      s"training read $total records — Lloyd iterations are scanning the corpus")
  }

  test("full-probe IVF with sample-trained centroids still equals brute force") {
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2,
      sampleSize = 50)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      cents, nprobe = 8))
    assert(ivf === exact)
  }

  test("short sample tops up instead of aborting (r3 advice: tiny corpus)") {
    // a 3-vector corpus cannot fill nCells=4 seeds from ANY sample; the old
    // require() aborted training where the full-corpus code succeeded.
    // Now training falls back to the full projection and lowers k to the
    // corpus size — and the degenerate full-probe search still works.
    val tiny = emb.where(col("vec_id") < 3)
    val cents = Similarity.trainCentroids(tiny, "vec_id", "embedding",
      nCells = 4, iters = 2, sampleSize = 4)
    assert(cents.size === 3)
    assert(cents.forall(_.size === 64))
    val exact = pairs(Similarity.bruteForceTopK(tiny,
      tiny.where(col("vec_id") < 1), "vec_id", "embedding", 2))
    val ivf = pairs(Similarity.ivfTopK(tiny, tiny.where(col("vec_id") < 1),
      "vec_id", "embedding", 2, cents, nprobe = cents.size))
    assert(ivf === exact)
  }
}
