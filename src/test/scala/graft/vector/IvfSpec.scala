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
}
