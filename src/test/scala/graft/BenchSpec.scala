package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention-outlier rule is pure arithmetic — pin it so a
  * threshold tweak can't silently stop re-timing (or start re-timing
  * the whole run). */
class BenchSpec extends AnyFunSuite {

  test("a single contention spike over a sub-second field is re-timed") {
    val times = (1 to 20).map(i => s"q$i" -> 0.5).toMap + ("q_slow" -> 15.1)
    assert(Bench.outlierSet(times) == Set("q_slow"))
  }

  test("genuinely heavy queries above 2s are re-timed too (min-of-two is harmless)") {
    val times = (1 to 20).map(i => s"q$i" -> 0.5).toMap + ("q_lsh" -> 3.4)
    assert(Bench.outlierSet(times) == Set("q_lsh"))
  }

  test("a uniformly slow run re-times nothing — 3x median scales the bar") {
    // median 4.0 -> threshold 12.0: nothing at 4-6s is an outlier
    val times = (1 to 20).map(i => s"q$i" -> (4.0 + (i % 3))).toMap
    assert(Bench.outlierSet(times).isEmpty)
  }

  test("sub-threshold times never re-time; empty run is a no-op") {
    assert(Bench.outlierSet((1 to 9).map(i => s"q$i" -> 1.9).toMap).isEmpty)
    assert(Bench.outlierSet(Map.empty).isEmpty)
  }

  test("a pathologically contended pass re-times only the MaxRetimes slowest") {
    // 60 fast + 60 stalled: cap keeps the extra sampling bounded, and
    // the retimed set is the slowest of the stalled, not arbitrary
    val times = (1 to 60).map(i => s"f$i" -> 0.3).toMap ++
      (1 to 60).map(i => s"s$i" -> (10.0 + i)).toMap
    val got = Bench.outlierSet(times)
    assert(got.size == Bench.MaxRetimes)
    assert(got == (61 - Bench.MaxRetimes to 60).map(i => s"s$i").toSet)
  }
}
