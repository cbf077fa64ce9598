package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Imperative-reference pinning for the robust-stats + moment-matrix
  * queries: both are re-computed here in plain Scala (sort an array,
  * pick elements; accumulate BigInt moments) and must match the
  * relational formulation exactly — the same style of proof
  * TimeSeriesSpec gives the EMA fold.
  */
class RobustStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_mad_outliers matches an imperative median/MAD per type") {
    val rows = Tables(spark, sf, "events")
      .select("event_id", "event_type", "value").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    // lower median under the total order (value, event_id) — the
    // exact convention the query's rank filter encodes
    def lowerMedian(vs: Array[(Double, Long)]): Double = {
      val sorted = vs.sortBy(identity)
      sorted((vs.length - 1) / 2)._1
    }
    val expected = byType.map { case (t, rs) =>
      val vs = rs.map(r => (r.getAs[Double]("value"), r.getAs[Long]("event_id")))
      val med = lowerMedian(vs)
      val ads = vs.map { case (v, id) => (math.abs(v - med), id) }
      val mad = lowerMedian(ads)
      val outliers = ads.count(_._1 > mad * 3.0)
      t -> ((rs.length.toLong, med, mad, outliers.toLong))
    }
    val got = SparkEntry.queries("q_mad_outliers")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, med, mad, out) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === n, r.toString)
      assert(r.getAs[Double]("median") === med, r.toString) // bit-exact
      assert(r.getAs[Double]("mad") === mad, r.toString)
      assert(r.getAs[Long]("n_outliers") === out, r.toString)
    }
  }

  test("q_poisson_bootstrap: replicates center on the truth and actually vary") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_poisson_bootstrap")(spark, sf).collect()
    assert(got.length === 16)
    val orders = Tables(spark, sf, "orders")
    val n = orders.count()
    val trueMean = orders
      .agg(avg(floor(col("o_totalprice") * 100 + 0.5))).head().getDouble(0)
    val means = got.map(_.getAs[Double]("mean_price_e2"))
    // every replicate mean within 10% of truth (sf0.001 has ~1.5k
    // orders; bootstrap SE ~ sd/sqrt(n) « 10%)
    means.foreach(m =>
      assert(math.abs(m - trueMean) / trueMean < 0.10, s"$m vs $trueMean"))
    // replicates DIFFER (the hash draw isn't degenerate)...
    assert(means.distinct.length > 8, means.mkString(","))
    // ...and Poisson(1) totals stay near n (sd = sqrt(n))
    got.foreach { r =>
      val eff = r.getAs[Long]("n_eff")
      assert(math.abs(eff - n) < 5 * math.sqrt(n.toDouble), s"n_eff $eff vs $n")
    }
    val se = math.sqrt(
      means.map(m => (m - means.sum / 16) * (m - means.sum / 16)).sum / 15)
    info(f"true=$trueMean%.1f bootstrapSE=$se%.2f relSE=${se / trueMean}%.5f")
  }

  test("q_cusum_changepoint: window closed form == imperative recurrence; shift detected") {
    val out = SparkEntry.queries("q_cusum_changepoint")(spark, sf).collect()
    assert(out.length > 1000)
    // replay S_i = max(0, S_{i-1} + dev_i) imperatively from (c, mu)
    // reconstructed off the output itself: dev = 100c - mu - mu/20,
    // with mu100 recovered from totals (same integer arithmetic)
    val cs = out.map(_.getAs[Long]("c"))
    val cutoff = java.sql.Date.valueOf("2000-01-01")
    val boosted = out.map(r => !r.getAs[java.sql.Date]("d").before(cutoff))
    // un-boost to recover the raw series the query derived mu from
    val t0 = cs.zip(boosted).map { case (c, b) => if (b) 0L else c }.sum
    val n0 = out.length.toLong
    // boost = (t div nd) + 1 where t is the RAW total
    val rawTotal = {
      // solve: boosted c = c0 + (t div nd) + 1; sum over all days
      // iterate once — boost is a constant integer
      val nBoost = boosted.count(identity)
      var t = t0 // lower bound
      var prev = -1L
      while (t != prev) {
        prev = t
        val boost = t / n0 + 1
        t = cs.zip(boosted).map { case (c, b) => if (b) c - boost else c }.sum
      }
      t
    }
    val mu100 = 100 * rawTotal / n0
    var s = 0L
    out.foreach { r =>
      val dev = 100 * r.getAs[Long]("c") - mu100 - mu100 / 20
      s = math.max(0L, s + dev)
      assert(r.getAs[Long]("s100") === s, s"at ${r.getAs[java.sql.Date]("d")}")
      assert(r.getAs[Long]("flagged") === (if (s > 5 * mu100) 1L else 0L))
    }
    // detection: the planted level shift is flagged nearly everywhere
    // after the plant; spurious pre-plant flags stay rare (CUSUM on a
    // sparse small-count series has an honest false-positive rate)
    val (post, pre) = out.partition(r =>
      !r.getAs[java.sql.Date]("d").before(cutoff))
    val postRate = post.count(_.getAs[Long]("flagged") == 1L).toDouble / post.length
    val preRate = pre.count(_.getAs[Long]("flagged") == 1L).toDouble / pre.length
    assert(postRate > 0.9, s"postRate $postRate")
    assert(preRate < 0.05, s"preRate $preRate")
    info(f"postRate=$postRate%.3f preRate=$preRate%.4f mu100=$mu100")
  }

  test("q_corr_matrix matches imperative BigInt moments; r in [-1, 1]") {
    val rows = Tables(spark, sf, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect()
    val scaled = rows.map(r => Array(
      BigInt(math.floor(r.getAs[Double]("l_quantity") * 100 + 0.5).toLong),
      BigInt(math.floor(r.getAs[Double]("l_extendedprice") * 100 + 0.5).toLong),
      BigInt(math.floor(r.getAs[Double]("l_discount") * 100 + 0.5).toLong),
      BigInt(math.floor(r.getAs[Double]("l_tax") * 100 + 0.5).toLong)))
    val n = BigInt(scaled.length)
    def s(i: Int) = scaled.map(_(i)).sum
    def sp(i: Int, j: Int) = scaled.map(v => v(i) * v(j)).sum
    def r(i: Int, j: Int): Double = {
      val num = (n * sp(i, j) - s(i) * s(j)).toDouble
      val vi = (n * sp(i, i) - s(i) * s(i)).toDouble
      val vj = (n * sp(j, j) - s(j) * s(j)).toDouble
      num / math.sqrt(vi * vj)
    }
    val names = Seq("qty", "price", "disc", "tax")
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield (names(i), names(j)) -> r(i, j)).toMap
    val got = SparkEntry.queries("q_corr_matrix")(spark, sf).collect()
    assert(got.length === 6)
    got.foreach { row =>
      val key = (row.getAs[String]("col_a"), row.getAs[String]("col_b"))
      val rv = row.getAs[Double]("r")
      assert(rv === expected(key), s"$key: $rv vs ${expected(key)}") // bit-exact
      assert(rv >= -1.0 && rv <= 1.0, row.toString)
      assert(row.getAs[Long]("n") === scaled.length.toLong)
    }
  }

  test("q_ab_test replays bit-for-bit from an imperative 2x2 chi-square") {
    val rows = Tables(spark, sf, "events")
      .select("user_id", "event_type", "value").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // .toSeq BEFORE the map: mapping a Map to (variant, conv) tuples
    // would re-key by variant and silently collapse the users
    val users = byUser.toSeq.map { case (uid, es) =>
      (uid % 2, if (es.exists(r => r.getAs[String]("event_type") == "purchase"
        && r.getAs[Double]("value") >= 90.0)) 1L else 0L)
    }
    val (n0, k0) = (users.count(_._1 == 0L).toLong,
      users.filter(_._1 == 0L).map(_._2).sum)
    val (n1, k1) = (users.count(_._1 == 1L).toLong,
      users.filter(_._1 == 1L).map(_._2).sum)
    val adbc = BigInt(k1) * (n0 - k0) - BigInt(n1 - k1) * k0
    val num = BigInt(n0 + n1) * adbc * adbc
    val den = BigInt(n1) * n0 * (k0 + k1) * (n0 - k0 + n1 - k1)
    val chi2m = (num * 1000 / den).toLong
    val srmm = (BigInt(n0 - n1) * (n0 - n1) * 1000 / (n0 + n1)).toLong

    val got = graft.SparkEntry.queries("q_ab_test")(spark, sf).collect()(0)
    assert(got.getAs[Long]("n0") === n0)
    assert(got.getAs[Long]("k0") === k0)
    assert(got.getAs[Long]("n1") === n1)
    assert(got.getAs[Long]("k1") === k1)
    assert(got.getAs[Long]("p0_bp") === k0 * 10000 / n0)
    assert(got.getAs[Long]("lift_bp") === k1 * 10000 / n1 - k0 * 10000 / n0)
    assert(got.getAs[Long]("chi2_milli") === chi2m)
    assert(got.getAs[Long]("significant") === (if (chi2m >= 3841) 1L else 0L))
    assert(got.getAs[Long]("srm_chi2_milli") === srmm)
    // parity assignment on sequential user ids can never trip the
    // SRM guard — a tripped flag here means the statistic is wrong
    assert(got.getAs[Long]("srm_flag") === 0L)
    info(s"chi2_milli=$chi2m lift_bp=${got.getAs[Long]("lift_bp")}")
  }
}
