package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-query bench aggregation (round-4 verdict #1): the driver
  * artifact must be robust to a single host steal wave hitting one rep. */
class BenchSpec extends AnyFunSuite {

  test("one contaminated rep does not move the reported per-query wall") {
    // the round-4 incident shape: q32's true wall ~2.6 s, one rep caught a
    // steal wave at 56.2 s — the reported number must stay the clean min
    assert(Bench.reportedQueryWall(Seq(2.6, 56.2, 3.1)) === 2.6)
    // wave hits the FIRST rep instead: same answer
    assert(Bench.reportedQueryWall(Seq(56.2, 2.6, 3.1)) === 2.6)
  }

  test("a failed rep keeps the -1 sentinel regardless of other samples") {
    // a regression must never read as a fast success downstream
    assert(Bench.reportedQueryWall(Seq(2.6, -1.0)) === -1.0)
    assert(Bench.reportedQueryWall(Seq(-1.0)) === -1.0)
    assert(Bench.reportedQueryWall(Nil) === -1.0)
  }

  test("clean samples report their minimum (timeit rationale)") {
    assert(Bench.reportedQueryWall(Seq(1.2)) === 1.2)
    assert(Bench.reportedQueryWall(Seq(1.4, 1.2, 1.3)) === 1.2)
  }

  test("headline line fits the driver tail capture and carries no samples") {
    // round-5 verdict #1: the stdout line grew past the driver's ~2 KB tail
    // capture and BENCH_r05.json recorded parsed=null. Pin the budget with
    // MORE queries than the engine currently ships (60 vs ~47) so growth
    // trips this test before it trips the driver.
    val fakeQueries = (1 to 60).map(i => f"q$i%02d_some_operator_name" -> 123.456)
    val line = Bench.headlineJson(1234.567, fakeQueries, Seq("q59_some_operator_name"),
      "/root/testdata/sf0.1", 32, 8, 8000000L, 3456789.012, 2.345, 0.912,
      6.789, 1178781.234, 4, 16, 0.934, 0.897, 0.934)
    assert(line.getBytes("UTF-8").length < Bench.HeadlineBudgetBytes,
      s"headline is ${line.length} bytes")
    assert(!line.contains("query_samples"))
    // single line, brace-balanced object
    assert(!line.contains("\n") && line.startsWith("{") && line.endsWith("}"))
    assert(line.count(_ == '{') === line.count(_ == '}'))
  }

  test("real query list stays inside the headline budget") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val line = Bench.headlineJson(1234.567, names.map(_ -> 123.456), Nil,
      "/root/testdata/sf0.1", 32, 8, 8000000L, 3456789.012, 2.345, 0.912,
      6.789, 1178781.234, 4, 16, 0.934, 0.897, 0.934)
    assert(line.getBytes("UTF-8").length < Bench.HeadlineBudgetBytes,
      s"headline is ${line.length} bytes for ${names.size} queries")
  }
}
