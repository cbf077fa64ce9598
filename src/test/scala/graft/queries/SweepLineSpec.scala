package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic proof for q_sweepline_concurrency: the +1/−1 prefix-sum
  * formulation must agree with the naive definition (count of
  * intervals stabbing each day) — checked directly on sampled days —
  * and the sweep must close (every opened interval eventually closes,
  * so the running sum returns to zero past the last end date).
  */
class SweepLineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("in_flight matches direct interval stabbing; sweep closes to zero") {
    val out = SparkEntry.queries("q_sweepline_concurrency")(spark, sf)
      .collect()
    assert(out.length > 100)
    assert(out.last.getAs[Long]("in_flight") === 0L,
      s"sweep did not close: ${out.last}")
    out.foreach(r => assert(r.getAs[Long]("in_flight") >= 0L, r.toString))

    // the naive definition, evaluated on three sampled days spread
    // across the span: |{intervals : d0 <= d <= d1}|
    val iv = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(Tables(spark, sf, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        least(to_date(col("o_orderdate")), to_date(col("l_shipdate")))
          .as("d0"),
        greatest(to_date(col("o_orderdate")), to_date(col("l_shipdate")))
          .as("d1"))
    for (idx <- Seq(out.length / 4, out.length / 2, 3 * out.length / 4)) {
      val row = out(idx)
      val d = row.getAs[java.sql.Date]("d")
      val direct = iv
        .filter(col("d0") <= lit(d) && col("d1") >= lit(d)).count()
      assert(row.getAs[Long]("in_flight") === direct,
        s"day $d: sweep ${row.getAs[Long]("in_flight")} != direct $direct")
    }
  }
}
