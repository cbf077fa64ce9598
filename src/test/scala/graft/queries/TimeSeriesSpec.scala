package graft.queries

import org.apache.spark.sql.Row

import graft.{SparkEntry, SparkSpec}

/** TimeSeriesQueries coverage beyond the DuckDB hash gate: the EMA
  * fold is pinned against an imperative per-user reference (the hash
  * proves Spark≡DuckDB; this proves both ≡ the textbook recurrence),
  * and the motif/drift outputs get their structural invariants.
  */
class TimeSeriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_ema_decay matches the imperative recurrence bit-for-bit") {
    val out = SparkEntry.queries("q_ema_decay")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // imperative reference: sort each user's events by (ts, event_id),
    // s_1 = x_1, s_i = 0.875*s_{i-1} + 0.125*x_i
    // micros = whole-second part + full fractional nanos/1000 (getTime
    // alone truncates to millis and would mis-order sub-milli events)
    val raw = graft.Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val micros = math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L
        (r.getLong(0), (micros, r.getLong(2), r.getDouble(3)))
      }
    val ref = raw.groupBy(_._1).map { case (u, rows) =>
      val xs = rows.map(_._2).sortBy(t => (t._1, t._2)).map(_._3)
      u -> (rows.length.toLong,
        xs.tail.foldLeft(xs.head)((acc, x) => acc * 0.875 + x * 0.125))
    }

    assert(out.keySet === ref.keySet)
    ref.foreach { case (u, (n, ema)) =>
      assert(out(u)._1 === n, s"user $u count")
      // bit-for-bit: the fold is the same IEEE op chain
      assert(java.lang.Double.doubleToLongBits(out(u)._2) ===
        java.lang.Double.doubleToLongBits(ema), s"user $u ema")
    }
  }

  test("q_holt_linear matches the imperative (level, trend) recurrence bit-for-bit") {
    val out = SparkEntry.queries("q_holt_linear")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    // imperative reference: per-nation daily order counts under date
    // order, then l_t = 0.5y + 0.5(l+b); b_t = 0.25(l_t − l) + 0.75b
    val cust = graft.Tables(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nation = graft.Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val daily = graft.Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderdate").collect()
      .map(r => (nation(cust(r.getLong(0))),
        // o_orderdate is TIMESTAMP_NTZ → LocalDateTime in Row
        r.getAs[java.time.LocalDateTime](1)
          .toEpochSecond(java.time.ZoneOffset.UTC)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toDouble }
    val ref = daily.groupBy(_._1._1).map { case (name, cells) =>
      val ys = cells.toSeq.sortBy(_._1._2).map(_._2)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val l2 = y * 0.5 + (l + b) * 0.5
        val b2 = (y * 0.5 + (l + b) * 0.5 - l) * 0.25 + b * 0.75
        l = l2; b = b2
      }
      name -> (ys.length.toLong, l, b, l + b, l + b * 7.0)
    }

    assert(out.keySet === ref.keySet)
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    ref.foreach { case (name, (n, l, b, f1, f7)) =>
      val o = out(name)
      assert(o._1 === n, s"$name n_days")
      assert(bits(o._2) === bits(l), s"$name level")
      assert(bits(o._3) === bits(b), s"$name trend")
      assert(bits(o._4) === bits(f1), s"$name fcst_1")
      assert(bits(o._5) === bits(f7), s"$name fcst_7")
    }
    // non-degenerate: some nation carries a real trend term
    assert(ref.values.exists(v => math.abs(v._3) > 1e-9), "all trends zero")
  }

  test("q_autocorr matches the exact-moment Pearson replay at every lag") {
    val out = SparkEntry.queries("q_autocorr")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === (1 to 7).toSet)

    // imperative reference with BigInt moments (exact, like the
    // DECIMAL/HUGEINT path), doubles only in the final r
    val daily = graft.Tables(spark, sf, "orders")
      .select("o_orderdate").collect()
      .map(_.getAs[java.time.LocalDateTime](0))
      .groupBy(identity).toSeq
      .sortBy(_._1.toEpochSecond(java.time.ZoneOffset.UTC))
      .map(_._2.length.toLong)
    (1 to 7).foreach { k =>
      val xs = daily.drop(k); val ys = daily.dropRight(k)
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum
      val syy = ys.map(b => BigInt(b) * b).sum
      val r = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      assert(out(k)._1 === xs.length.toLong, s"lag $k n")
      assert(java.lang.Double.doubleToLongBits(out(k)._2) ===
        java.lang.Double.doubleToLongBits(r), s"lag $k r")
      assert(out(k)._2 >= -1.0 && out(k)._2 <= 1.0, s"lag $k bounds")
    }
    // pair counts shrink by one day per extra lag
    assert((1 to 6).forall(k => out(k)._1 === out(k + 1)._1 + 1))
  }

  test("q_theil_sen matches the imperative pairwise-median replay bit-for-bit") {
    val rows = SparkEntry.queries("q_theil_sen")(spark, sf).collect()
    assert(rows.length === 1)
    val got = (rows(0).getLong(0), rows(0).getLong(1),
      rows(0).getDouble(2), rows(0).getDouble(3))

    val epoch = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val daily = graft.Tables(spark, sf, "orders")
      .select("o_orderdate").collect()
      .map(_.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay - epoch)
      .groupBy(identity).toSeq.map { case (x, xs) => (x, xs.length.toLong) }
      .sortBy(_._1)
    val pairs = for {
      (i, (x1, y1)) <- daily.zipWithIndex.map(_.swap)
      (x2, y2) <- daily.drop(i + 1)
    } yield (x1, x2, (y2 - y1).toDouble / (x2 - x1).toDouble)
    // lower median under the total order (slope, x1, x2)
    val sorted = pairs.sortBy(p => (p._3, p._1, p._2))
    val m = sorted((sorted.length - 1) / 2)._3
    val resid = daily.map { case (x, y) => (x, y.toDouble - m * x.toDouble) }
      .sortBy(r => (r._2, r._1))
    val b = resid((resid.length - 1) / 2)._2

    assert(got._1 === pairs.length.toLong, "n_pairs")
    assert(got._2 === daily.length.toLong, "n_days")
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    assert(bits(got._3) === bits(m), s"slope ${got._3} vs $m")
    assert(bits(got._4) === bits(b), s"intercept ${got._4} vs $b")
  }

  test("q_motif_mining output satisfies the symbol/rank invariants") {
    val rows = SparkEntry.queries("q_motif_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(tpe: String, rk: Long, motif: String, cnt: Long) =>
      assert(rk >= 1 && rk <= 5, s"$tpe rank $rk")
      assert(cnt >= 1)
      val syms = motif.split("-")
      assert(syms.length === 3, s"motif $motif")
      syms.foreach(s => assert((1 to 4).contains(s.toInt), s"symbol $s"))
    }
    // per type: counts non-increasing in rank (row_number total order)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"$tpe counts not ranked: ${byRank.mkString(",")}")
    }
  }

  test("q_drift_chi2 marginals are consistent and contributions sane") {
    val rows = SparkEntry.queries("q_drift_chi2")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val total = graft.Tables(spark, sf, "events").count()
    assert(rows.map(_._3).sum === total, "cells partition the events")
    // expectation marginals: sum of exp over periods = row total
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val obsTot = rs.map(_._3).sum.toDouble
      val expTot = rs.map(_._4).sum
      assert(math.abs(obsTot - expTot) < 1e-6 * obsTot,
        s"$tpe marginal: obs $obsTot vs exp $expTot")
    }
    rows.foreach { case (tpe, p, _, exp, contrib) =>
      assert(p == 0L || p == 1L)
      assert(exp > 0, s"$tpe exp")
      assert(contrib >= 0, s"$tpe contrib")
    }
  }

  test("q_stl_outliers decomposition identity holds on every day") {
    val rows = SparkEntry.queries("q_stl_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cents, trend, seasonal, resid, mad, flag) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(resid === cents - trend - seasonal, s"identity broken: $r")
      assert(mad >= 0L)
      assert(flag === (if (math.abs(resid) * 10000L > mad * 44478L) 1L
                       else 0L), s"flag rule broken: $r")
    }
    // mad is the lower median of |resid| — at most half the days
    // sit strictly below it
    val mad = rows.head.getLong(5)
    val below = rows.count(r => math.abs(r.getLong(4)) < mad)
    assert(below <= rows.length / 2, s"$below of ${rows.length} below mad")
  }

  test("q_stl_outliers flags a planted spike as its largest residual") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stl").toString
    // 35 flat days (one 10.00-value event each) with one 50x spike —
    // a weekly-seasonal-free series where the spike is the only
    // structure the decomposition should surface
    val rows = (0 until 35).map { d =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d.toLong)
      val ts = java.sql.Timestamp.valueOf(day.atTime(12, 0))
      (ts, if (d == 17) 500.0 else 10.0)
    }
    rows.toDF("ts", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_stl_outliers")(spark, dir).collect()
    assert(out.length === 35)
    val spike = out.maxBy(r => math.abs(r.getLong(4)))
    assert(spike.getDate(0).toString === "2024-03-18",
      s"largest residual not at the spike: $spike")
    assert(spike.getLong(6) === 1L, s"spike not flagged: $spike")
    // hand-derived exact decomposition: the spike (cents 50000) pulls
    // days 14..20 to trend 8000 (detr −7000, spike +42000); those 7
    // consecutive days contaminate each weekday pool exactly once, so
    // seasonal = 8400 on the spike's weekday and −1400 elsewhere;
    // |resid| is then 1400×24, 5600×6, 8400×4, 33600×1 and the lower
    // median (rank 18 of 35) is 1400
    assert(out.head.getLong(5) === 1400L,
      s"mad should be exactly 1400, got ${out.head.getLong(5)}")
  }
}
