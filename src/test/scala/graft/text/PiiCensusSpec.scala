package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiCensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "plain text with no sensitive content at all"),
    (2L, "reach me at alice.smith+work@mail.example.org thanks"),
    (3L, "two mails a@b.co and c.d@e-f.org in one doc"),
    (4L, "call 555-867-5309 now"),
    (5L, "server 192.168.1.77 and 10.0.0.1 respond"),
    (6L, null.asInstanceOf[String]),
  ).toDF("doc_id", "text")

  test("census counts docs and matches per class; zero-hit classes stay") {
    val out = PiiCensus.census(docs, "text")
      .collect().map(r => r.getAs[String]("pii_class") ->
        ((r.getAs[Long]("docs_hit"), r.getAs[Long]("total_matches")))).toMap
    assert(out === Map(
      "email" -> ((2L, 3L)),
      "phone" -> ((1L, 1L)),
      "ipv4" -> ((1L, 2L))), out.toString)
    // a corpus with zero hits still reports every class (positively "0")
    val clean = PiiCensus.census(docs.where(col("doc_id") === 1L), "text")
      .collect().map(r => r.getAs[String]("pii_class") ->
        r.getAs[Long]("docs_hit")).toMap
    assert(clean === Map("email" -> 0L, "phone" -> 0L, "ipv4" -> 0L))
  }

  test("perDocument annotates match counts for the redaction pass") {
    val row = PiiCensus.perDocument(docs, "text")
      .where(col("doc_id") === 3L).head()
    assert(row.getAs[Int]("email_matches") === 2)
    assert(row.getAs[Int]("phone_matches") === 0)
    // NULL text scores 0 everywhere, never NULL
    val nul = PiiCensus.perDocument(docs, "text")
      .where(col("doc_id") === 6L).head()
    assert(nul.getAs[Int]("email_matches") === 0)
    assert(nul.getAs[Int]("ipv4_matches") === 0)
  }

  test("duplicate class names and empty rule lists are rejected") {
    intercept[IllegalArgumentException] {
      PiiCensus.census(docs, "text", Seq("a" -> "x", "a" -> "y")).collect()
    }
    intercept[IllegalArgumentException] {
      PiiCensus.census(docs, "text", Nil).collect()
    }
    // perDocument too — a duplicate name would silently clobber its column
    intercept[IllegalArgumentException] {
      PiiCensus.perDocument(docs, "text", Seq("a" -> "x", "a" -> "y"))
    }
    intercept[IllegalArgumentException] {
      PiiCensus.perDocument(docs, "text", Nil)
    }
  }
}
