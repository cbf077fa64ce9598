package graft.ops

import java.sql.Date

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The interval-coverage construction vs the brute-force definition
  * ("distinct keys with activity in [d−W+1, d]") at RANDOM window
  * lengths — the generality the operator claims (O(pairs) whatever
  * W) that the fixed-W oracle query can't exercise. Random activity
  * sets force every interval case: gaps longer than W (interval
  * truncates at day+W−1), denser than W (interval truncates at
  * next_active−1, adjacent and disjoint), and last-activity tails.
  */
class RollingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val epoch = Date.valueOf("2020-01-01").toLocalDate

  test("activeCount == brute force for random activity sets and random W") {
    val gen = Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(0, 120))
    for (w <- Seq(1, 3, 7, Gen.chooseNum(2, 60).sample.get,
        Gen.chooseNum(61, 200).sample.get)) {
      val pairs = Gen.listOfN(400, gen).sample.get.distinct
      val df = pairs.toDF("k", "off")
        .select(col("k"), date_add(lit(Date.valueOf(epoch)), col("off"))
          .as("day"))

      val got = RollingDistinct.activeCount(df, col("k"), col("day"), w)
        .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap

      val (lo, hi) = (pairs.map(_._2).min, pairs.map(_._2).max)
      val want = (lo to hi).map { d =>
        val active = pairs.filter { case (_, o) => o <= d && o > d - w }
          .map(_._1).distinct.size.toLong
        epoch.plusDays(d.toLong) -> active
      }.toMap
      assert(got === want, s"window=$w")
    }
  }
}
