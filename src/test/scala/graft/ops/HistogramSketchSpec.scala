package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.QuantileSketch.QSketch

/** Histogram.sketchBoundaries: boundaries read off the sketch's own
  * order statistics (the QSketch.quantile rule), buckets PARTITION the
  * domain (counts sum to n exactly, rows above the sketch max land in
  * the last bucket), and every boundary's exact rank sits within the
  * sketch's 5σ certificate.
  */
class HistogramSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 256
  private val B = 8

  private def rowsDf() = Tables(spark, sfDir, "lineitem").select(
    round(col("l_extendedprice") * 100).cast("long").as("v"),
    QuantileSketch.hash60(
      concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("h"))

  test("boundaries are the sketch's own order statistics") {
    val rows = rowsDf()
    val sk = QuantileSketch.sketchRows(rows, K)
    val bnds = Histogram.sketchBoundaries(sk, B).orderBy("bucket").collect()
    assert(bnds.length === B)
    val model = QSketch.fromRows(
      rows.collect().map(r => (r.getLong(1), r.getLong(0))), K)
    val byVH = model.items.map(p => (p._2, p._1)).sorted
    bnds.foreach { r =>
      val b = r.getLong(0)
      val pos = math.max(1L, b * byVH.size / B)
      assert(r.getLong(2) === byVH((pos - 1).toInt)._1,
        s"bucket $b ub mismatch")
    }
    // lo chains: lo(b) == ub(b-1), lo(1) is null
    assert(r0IsNull(bnds.head))
    bnds.sliding(2).foreach { case Array(a, c) =>
      assert(c.getLong(1) === a.getLong(2))
    }
  }

  private def r0IsNull(r: org.apache.spark.sql.Row): Boolean = r.isNullAt(1)

  test("buckets partition the domain: exact counts sum to n, tail lands last") {
    val rows = rowsDf()
    val sk = QuantileSketch.sketchRows(rows, K)
    val bnds = Histogram.sketchBoundaries(sk, B)
    val n = rows.count()
    val joined = rows.join(broadcast(bnds),
      (col("lo").isNull || col("v") > col("lo")) &&
        (col("v") <= col("ub") || col("bucket") === B.toLong))
    // every row in exactly one bucket
    assert(joined.count() === n)
    val cnts = joined.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    assert(cnts.agg(sum("cnt")).head().getLong(0) === n)
    // rows strictly above the sketch max exist only in the last bucket
    val skMax = bnds.agg(max("ub")).head().getLong(0)
    val above = rows.filter(col("v") > skMax).count()
    if (above > 0) {
      val lastCnt = cnts.filter(col("bucket") === B.toLong)
        .head().getLong(1)
      assert(lastCnt >= above)
    }
  }

  test("every boundary rank within the 5 sigma certificate") {
    val rows = rowsDf()
    val sk = QuantileSketch.sketchRows(rows, K)
    val bnds = Histogram.sketchBoundaries(sk, B).collect()
    val n = rows.count()
    val m = bnds.head.getLong(5)
    bnds.foreach { r =>
      val b = r.getLong(0)
      val ub = r.getLong(2)
      val phiBp = b * 10000L / B
      val exactRank =
        if (b == B) n // last bucket is upper-unbounded by contract
        else rows.filter(col("v") <= ub).count()
      val errX = math.abs(exactRank * 10000L - phiBp * n)
      val lhs = BigInt(errX) * BigInt(errX) * m
      val rhs = BigInt(25) * phiBp * (10000L - phiBp) * n * n
      assert(lhs <= rhs, s"bucket $b: rank $exactRank of n=$n m=$m")
    }
  }
}
