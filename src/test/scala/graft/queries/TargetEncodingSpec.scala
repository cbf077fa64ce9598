package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Imperative-reference pinning for q_target_encoding — the
  * leave-one-out and m-estimate smoothed category encodings are
  * re-derived in plain Scala (BigInt sums, explicit integer
  * division) and must match the relational formulation exactly,
  * plus the leakage property the operator exists for.
  */
class TargetEncodingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_target_encoding replays bit-for-bit in plain Scala") {
    val rows = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .as[(Long, String, Double)].collect().toSeq
      .map { case (k, p, t) =>
        (k, p, math.floor(t * 100 + 0.5).toLong) }

    val byCat = rows.groupBy(_._2).map { case (p, xs) =>
      p -> ((xs.map(x => BigInt(x._3)).sum, xs.length.toLong)) }
    val tSum = rows.map(x => BigInt(x._3)).sum
    val tCnt = rows.length.toLong
    val prior = tSum / tCnt

    val want = rows.map { case (k, p, cents) =>
      val (gSum, gCnt) = byCat(p)
      val loo =
        if (gCnt == 1) prior else (gSum - cents) / (gCnt - 1)
      val smooth = (gSum + 20 * prior) / (gCnt + 20)
      (k, p, cents, loo.toLong, smooth.toLong)
    }.sortBy(_._1)

    val got = SparkEntry.queries("q_target_encoding")(spark, sf)
      .select("o_orderkey", "o_orderpriority", "cents",
        "loo_mean_cents", "smooth_mean_cents")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("LOO excludes the row's own target (the anti-leakage property)") {
    val got = SparkEntry.queries("q_target_encoding")(spark, sf)
      .select("o_orderpriority", "cents", "loo_mean_cents")
      .as[(String, Long, Long)].collect().toSeq

    // plain (leaky) mean encoding gives every row of a category the
    // SAME value; LOO must differ across rows of one category
    // whenever their own targets differ — the self-exclusion doing
    // observable work
    val varying = got.groupBy(_._1).values.filter(_.map(_._2).distinct.size > 1)
    assert(varying.nonEmpty, "fixture degenerate: uniform targets")
    varying.foreach { xs =>
      assert(xs.map(_._3).distinct.size > 1,
        s"LOO constant within ${xs.head._1} despite varying targets")
    }

    // and a row with an above-group-mean target must see a LOO mean
    // BELOW the group mean (removing a high value lowers the rest)
    got.groupBy(_._1).values.foreach { xs =>
      val mean = xs.map(x => BigInt(x._2)).sum / xs.length
      val hi = xs.maxBy(_._2)
      val lo = xs.minBy(_._2)
      if (hi._2 != lo._2) {
        assert(hi._3 <= mean, s"${hi._1}: hi-target LOO above group mean")
        assert(lo._3 >= mean, s"${lo._1}: lo-target LOO below group mean")
      }
    }
  }

  test("smoothed encoding shrinks toward the global prior") {
    val rows = SparkEntry.queries("q_target_encoding")(spark, sf)
      .select("o_orderpriority", "cents", "smooth_mean_cents")
      .as[(String, Long, Long)].collect().toSeq
    val tSum = rows.map(x => BigInt(x._2)).sum
    val prior = (tSum / rows.length).toLong
    // per category: |smooth - prior| <= |raw group mean - prior|
    // (m-estimate pulls strictly inward, never past the raw mean)
    rows.groupBy(_._1).foreach { case (p, xs) =>
      val raw = (xs.map(x => BigInt(x._2)).sum / xs.length).toLong
      val smooth = xs.head._3
      assert(math.abs(smooth - prior) <= math.abs(raw - prior) + 1, p)
    }
  }
}
