package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic proof for q_pareto_frontier beyond the oracle: the
  * returned set is exactly a skyline — mutually non-dominated, and
  * COMPLETE (every excluded supplier is dominated by some frontier
  * member). The oracle's NOT EXISTS already proves equivalence to the
  * quadratic definition; this asserts the definition's two halves
  * directly against the data, independent of any SQL.
  */
class SkylineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("frontier is mutually non-dominated and dominates every outsider") {
    val points = Tables(spark, sf, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double").as("rev"),
        sum(floor(col("l_discount") * 100 + 0.5)).cast("long").as("disc"))
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Double]("rev"),
        r.getAs[Long]("disc")))
    val frontier = SparkEntry.queries("q_pareto_frontier")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Double]("rev"),
        r.getAs[Long]("disc_e2")))
    assert(frontier.length >= 3, s"near-vacuous fixture: ${frontier.length}")

    def dominates(a: (Long, Double, Long), b: (Long, Double, Long)): Boolean =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)

    for (a <- frontier; b <- frontier)
      assert(!dominates(a, b), s"frontier member $a dominates $b")

    val inFrontier = frontier.map(_._1).toSet
    for (p <- points if !inFrontier(p._1))
      assert(frontier.exists(f => dominates(f, p)),
        s"outsider $p is dominated by no frontier member")
  }
}
