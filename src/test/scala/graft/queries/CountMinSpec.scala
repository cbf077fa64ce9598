package graft.queries

import java.security.MessageDigest

import graft.{SparkEntry, SparkSpec}

/** q_countmin_heavy — the Count-Min frequency sketch. Pins the
  * sketch's deterministic guarantee (min-of-cells NEVER
  * underestimates) and bit-parity of the whole query against an
  * imperative first-principles recomputation (plain Scala maps over
  * the collected key column — no Spark, no SQL), so the relational
  * formulation is proven against the textbook algorithm, not against
  * itself.
  */
class CountMinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The shared cross-engine 60-bit hash: first 15 hex digits of
    * md5("i:key"), as a nonnegative long. */
  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
      .take(15), 16)
  }

  test("q_countmin_heavy: bit-parity with imperative CMS + one-sided error") {
    val out = SparkEntry.queries("q_countmin_heavy")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 10)

    // first-principles CMS over the raw key stream
    val keys = graft.Tables(spark, sf, "lineitem")
      .select("l_suppkey").collect().map(_.getLong(0))
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (k <- keys; i <- 0 until 4) {
      val b = h60(s"$i:$k") % 256L
      cells((i, b)) = cells.getOrElse((i, b), 0L) + 1L
    }
    val exact = keys.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val top10 = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    val expected = top10.map { case (k, c) =>
      val est = (0 until 4).map(i => cells((i, h60(s"$i:$k") % 256L))).min
      (k, c, est, est - c)
    }
    assert(out.toSeq === expected)

    // the deterministic CMS guarantee: estimates never undershoot
    assert(out.forall { case (_, ex, est, over) => est >= ex && over === est - ex })
  }

  test("q_joinsize_sketch: one-sided, and collision mass near |R||S|/w") {
    val Array((exact, est, over)) =
      SparkEntry.queries("q_joinsize_sketch")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every true term r_k·s_k appears in each row's inner product, so
    // the min never undershoots — the structural guarantee
    assert(est >= exact && over === est - exact)
    // expected collision mass is |R|·|S|/w; min-of-4 sits well under
    // a few multiples of it (8x slack keeps the spec deterministic-ish)
    val o = graft.Tables(spark, sf, "orders").count()
    val e = graft.Tables(spark, sf, "events").count()
    assert(over <= 8L * o * e / 65536L, s"over=$over bound=${8L * o * e / 65536L}")
  }
}
