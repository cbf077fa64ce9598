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
}
