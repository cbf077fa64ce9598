package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contention-aware bench rules: the ratio gate that decides
  * when a measurement window was polluted by co-tenant load, and the
  * per-query min-merge across passes (a failure defers to the other
  * pass, never to a near-zero "fast success").
  */
class BenchContentionSpec extends AnyFunSuite {

  test("isContended fires above the ratio gate and not below") {
    assert(Bench.ContendedRatio === 1.5)
    // idle host: mt matches the single-thread quarter → clean
    assert(!Bench.isContended(0.125, 0.125))
    // mild scheduler noise stays under the gate
    assert(!Bench.isContended(0.18, 0.125))
    // exactly at the gate is NOT contended (strict >)
    assert(!Bench.isContended(0.125 * 1.5, 0.125))
    // the r8 driver reading: mt 0.277 vs 0.125-class single-thread
    assert(Bench.isContended(0.277, 0.125))
    // machine-independence: a slower host with st 0.25 and mt 0.30 is
    // clean, even though 0.30 would trip a hardcoded 0.125×1.5 gate
    assert(!Bench.isContended(0.30, 0.25))
    // degenerate denominator never divides by zero
    assert(Bench.isContended(0.01, 0.0))
  }

  test("mergePasses takes per-query min and defers failures") {
    val a = Seq("q1" -> 1.0, "q2" -> -1.0, "q3" -> 0.5, "q4" -> -1.0)
    val b = Seq("q1" -> 2.0, "q2" -> 3.0, "q3" -> 0.2, "q4" -> -1.0)
    assert(Bench.mergePasses(a, b) ===
      Seq("q1" -> 1.0, "q2" -> 3.0, "q3" -> 0.2, "q4" -> -1.0))
    // key order is a contract, not a coincidence
    assertThrows[IllegalArgumentException] {
      Bench.mergePasses(Seq("q1" -> 1.0), Seq("q2" -> 1.0))
    }
  }
}
