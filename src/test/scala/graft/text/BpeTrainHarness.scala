package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measurement harness (`sbt "Test/runMain graft.text.BpeTrainHarness"`):
  * trains the q80 BPE model on each scale's deterministic slice
  * (doc_id % 4 < 3, 60 merges) and prints the resulting vocabulary as
  * Scala literals — the committed constants the q80 oracle SQL embeds.
  * `BpeTokenizerSpec` re-trains live at both scales and pins equality
  * with the committed constants, so the constants stay honest training
  * outputs, not hand-edited lists. `ignore`d out of CI. */
class BpeTrainHarness extends AnyFunSuite {
  ignore("train") { BpeTrainHarness.run() }
}

object BpeTrainHarness {
  def main(args: Array[String]): Unit = run()

  val NumMerges = 60

  def trainedVocab(sfDir: String): Seq[String] = {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .where(col("doc_id") % 4 < 3)
    val freqs = BpeTokenizer.wordFreqs(docs, "text")
    BpeTokenizer.vocab(freqs, BpeTokenizer.trainMerges(freqs, NumMerges))
  }

  def run(): Unit =
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val v = trainedVocab(sf)
      println(s"// $sf: ${v.length} tokens")
      println(v.map(t => "\"" + t + "\"").grouped(10)
        .map(_.mkString(", ")).mkString("Seq(\n  ", ",\n  ", ")"))
    }
}
