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

  test("a query 3x over a sub-second median is re-timed (no flat floor)") {
    val times = (1 to 20).map(i => s"q$i" -> 0.5).toMap + ("q_lsh" -> 3.4)
    assert(Bench.outlierSet(times) == Set("q_lsh"))
    // under the old max(2s, 3x median) rule a 1.8s sample at a 0.5s
    // median was exempt; median-relative it is a legitimate candidate
    assert(Bench.outlierSet(times + ("q_heavy" -> 1.8))
      == Set("q_lsh", "q_heavy"))
  }

  test("an sf1-shaped run re-times only genuine spikes, not the heavy tail") {
    // the r9 sf1 leg's shape: median ~0.8s, a legitimate heavy tail at
    // 2-6s (16 queries cleared the old flat 2s floor -> mass-retime at
    // the cap). Median-relative (threshold 2.4s) the 2-2.4s band is
    // exempt and only the genuinely slow plus a 10x contention spike
    // re-time — far from the cap.
    val body = (1 to 160).map(i => s"q$i" -> 0.8).toMap
    val tail = Map("t1" -> 2.0, "t2" -> 2.1, "t3" -> 2.2, "t4" -> 2.3,
      "t5" -> 2.9, "t6" -> 3.4, "t7" -> 5.0, "t8" -> 5.9)
    val got = Bench.outlierSet(body ++ tail + ("q_stall" -> 9.7))
    assert(got == Set("t5", "t6", "t7", "t8", "q_stall"))
    assert(got.size < Bench.MaxRetimes)
  }

  test("a uniformly slow run re-times nothing — 3x median scales the bar") {
    // median 4.0 -> threshold 12.0: nothing at 4-6s is an outlier
    val times = (1 to 20).map(i => s"q$i" -> (4.0 + (i % 3))).toMap
    assert(Bench.outlierSet(times).isEmpty)
  }

  test("noise-sized samples over a tiny median are NOT re-timed (abs floor)") {
    // tiny-SF shape: median 0.05s — 3x median flags scheduler-noise
    // samples whose min-of-two is a systematic downward bias; the
    // absolute floor exempts them while the genuinely slow still re-time
    val times = (1 to 20).map(i => s"q$i" -> 0.05).toMap +
      ("q_noise" -> 0.2) + ("q_real" -> 0.9)
    assert(Bench.RetimeFloorSec < 0.5) // floor stays far below sf0.1 signal
    assert(Bench.outlierSet(times) == Set("q_real"))
  }

  test("load_avg disclosure reports a plausible value") {
    // Linux always reports; the contract is only "never NaN, -1 where
    // unsupported" so the JSON field is parseable everywhere
    val v = Bench.loadAvg()
    assert(!v.isNaN && v >= -1.0)
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
