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
}
