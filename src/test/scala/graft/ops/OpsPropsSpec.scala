package graft.ops

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property specs for the distributed order-statistic and ordered-fold
  * operators: randomized inputs (duplicates, ties, hot keys) checked
  * against straight single-threaded Scala models. Same pattern as
  * WeatherPropsSpec — ScalaCheck generators driven through one Spark
  * job (no scalatestplus bridge in the offline cache).
  */
class OpsPropsSpec extends SparkSpec {
  import spark.implicits._

  test("ExactRank.selectRanks picks exactly the sorted-order elements " +
    "for arbitrary multisets and rank sets") {
    // duplicates on purpose: a narrow value domain forces ties, the
    // case where the unique tiebreak column must keep ranks total
    val values = Gen.listOfN(700, Gen.chooseNum(-50L, 50L)).sample.get
    val df = values.zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")

    val got = ExactRank.selectRanks(
        df, Seq(col("v"), col("id")),
        n => Seq(lit(1L), ExactRank.lowerMedian(n),
          floor(n / lit(3)).cast("long") + lit(1L), n))
      .select(col("rank"), col("v"), col("n_total"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    val n = values.length.toLong
    val sortedVals = values.sorted
    val wantRanks = Seq(1L, (n - 1) / 2 + 1, n / 3 + 1, n).distinct.sorted
    assert(got.map(_._1).toSeq === wantRanks)
    got.foreach { case (k, v, total) =>
      assert(total === n)
      assert(v === sortedVals((k - 1).toInt),
        s"rank $k: got $v, sorted says ${sortedVals((k - 1).toInt)}")
    }
  }

  test("OrderedFold.emaByUser == the sequential recurrence for " +
    "arbitrary users, tied timestamps, and one hot key") {
    val alpha = 0.125
    val gen = Gen.zip(
      Gen.chooseNum(1L, 8L),                    // user
      Gen.chooseNum(1700000000L, 1700000600L),  // ts (ties likely)
      Gen.chooseNum(-1000, 1000))               // value ×0.25
    val base = Gen.listOfN(600, gen).sample.get
    // one hot user: 400 more rows on user 1 (the skew case the
    // operator exists for — O(1) task memory however hot the key)
    val hot = Gen.listOfN(400, gen).sample.get.map(r => (1L, r._2, r._3))
    val rows = (base ++ hot).zipWithIndex.map { case ((u, t, v), i) =>
      (u, t, i.toLong, v * 0.25)
    }

    val events = rows.toDF("user_id", "epoch", "event_id", "value")
      .select(col("user_id"), to_timestamp(from_unixtime(col("epoch"))).as("ts"),
        col("event_id"), col("value"))
    val got = OrderedFold.emaByUser(events, alpha)
      .select("user_id", "n_events", "ema")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // the single-threaded model: identical op chain, (ts, event_id) order
    val want = rows.groupBy(_._1).map { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val ema = ordered.tail.foldLeft(ordered.head) { (s, x) =>
        (1.0 - alpha) * s + alpha * x
      }
      u -> (ordered.length.toLong, ema)
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (u, (cnt, ema)) =>
      assert(got(u)._1 === cnt, s"user $u count")
      // bit-for-bit: same IEEE chain, no tolerance needed
      assert(java.lang.Double.doubleToLongBits(got(u)._2) ===
        java.lang.Double.doubleToLongBits(ema), s"user $u ema")
    }
  }
}
