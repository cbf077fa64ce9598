package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function properties of the LSH constructions — the invariants
  * the bucketed joins silently rely on.
  */
class SimilarityPropsSpec extends AnyFunSuite {

  test("hamming2Deltas is exactly the XOR masks with popcount <= 2 over 8 bits") {
    val want = (0 until 256).filter(m => Integer.bitCount(m) <= 2)
      .map(_.toLong).toSet
    assert(Similarity.hamming2Deltas.toSet === want)
    // no duplicates: a duplicate delta would double-produce candidate
    // pairs (the near-dup join relies on exactly-once matching)
    assert(Similarity.hamming2Deltas.distinct.length
      === Similarity.hamming2Deltas.length)
    assert(Similarity.hamming2Deltas.length === 37) // 1 + 8 + C(8,2)
  }

  test("planePairs builds L disjoint perfect matchings of the 16-vector pool") {
    val tables = Similarity.LshTables
    val pp = Similarity.planePairs(tables)
    assert(pp.length === tables * 8)
    for (t <- 0 until tables) {
      val pairs = pp.filter(_._1 == t)
      assert(pairs.length === 8)
      // plane bit indices are 0..7 (they become 2^pair bucket bits)
      assert(pairs.map(_._2).sorted === (0 until 8))
      // a perfect matching: each pool vector used exactly once
      val used = pairs.flatMap(p => Seq(p._3, p._4))
      assert(used.sorted === (0 until 16))
      assert(pairs.forall(p => p._3 < p._4))
    }
    // no difference-plane repeats across tables (repeats would make
    // the "independent tables" OR-amplification partially redundant)
    val unordered = pp.map(p => (p._3, p._4))
    assert(unordered.distinct.length === unordered.length)
  }

  test("table 0 is the legacy (2p, 2p+1) pairing (bucket compatibility)") {
    val t0 = Similarity.planePairs(1)
    assert(t0 === (0 until 8).map(p => (0, p, 2 * p, 2 * p + 1)))
  }
}
