package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ops/Histogram — exact equi-depth boundaries and the bracketed
  * selectivity estimate built on them. The operator's value is two
  * PROVABLE properties a sampled histogram cannot offer, so the spec
  * asserts them directly on every probe:
  *   - bracketing: actual ∈ [est_lo, est_hi] for any `v <= x`
  *     predicate (the bounds derive from exact order statistics);
  *   - bounded width: est_hi − est_lo ≤ ⌈n/B⌉ (consecutive boundary
  *     ranks differ by at most one bucket depth).
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private val B = 20
  // deterministic skewed data: heavy ties at small values, long tail
  private val rows = (1 to 10007)
    .map(i => (((i * 2654435761L) % 997) * ((i * 40503L) % 7 + 1) / 10.0,
      i.toLong))
  private lazy val df = rows.toDF("v", "id")

  private lazy val bounds = Histogram
    .equiDepth(df, Seq(col("v"), col("id")), B)
    .select(col("v"), col("rank"), col("n_total"))

  test("boundaries are the exact order statistics at ranks (n*b) div B") {
    val sorted = rows.sortBy(r => (r._1, r._2)).map(_._1)
    val n = rows.size
    val want = (1 to B).map(b => (n.toLong * b / B, sorted(n * b / B - 1)))
      .distinct.toMap
    val got = bounds.collect()
      .map(r => r.getLong(1) -> r.getDouble(0)).toMap
    assert(got === want)
  }

  test("estimateLe brackets the true count within one bucket depth") {
    val n = rows.size.toLong
    val probes = (0 to 60).map(i => i * 12.0 - 10.0).map(Tuple1(_))
      .toDF("threshold")
    val est = Histogram.estimateLe(bounds, "v", probes).collect()
    assert(est.length === 61)
    val vs = rows.map(_._1)
    val depth = (n + B - 1) / B
    est.foreach { r =>
      val (x, lo, hi) = (r.getDouble(0), r.getLong(1), r.getLong(2))
      val actual = vs.count(_ <= x).toLong
      assert(lo <= actual && actual <= hi,
        s"x=$x actual=$actual not in [$lo,$hi]")
      assert(hi - lo <= depth, s"x=$x bracket ${hi - lo} > depth $depth")
      assert(r.getLong(3) === n, "n_rows")
    }
    // edges: below the minimum the bracket starts at 0; at/above the
    // maximum the last boundary (rank n) pins the estimate exactly
    val below = est.find(_.getDouble(0) < 0).get
    assert(below.getLong(1) === 0L)
    val above = est.maxBy(_.getDouble(0))
    assert(above.getLong(1) === n && above.getLong(2) === n)
  }

  test("histogram-licensed broadcast: selective range flips the join") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, SortMergeJoinExec}
    val right = (1 to 5000).map(i => (i.toLong, s"k$i")).toDF("id", "tag")
    val left = rows.toDF("v", "id")
    // kill the size-estimate broadcast so the decision under test is
    // the histogram's alone (the BucketingSpec pattern)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def planOf(threshold: Double, maxRows: Long) = {
        val filtered = left.filter(col("v") <= threshold)
        val hinted = Histogram.broadcastIfRangeSmall(
          filtered, bounds, "v", lit(threshold), maxRows)
        val j = right.join(hinted, "id")
        j.collect()
        execNodes(j)
      }
      // selective predicate: est_hi <= cap proves the filtered side
      // small, the hint fires, and the broadcast CANNOT OOM (true
      // count <= est_hi by the bracketing property)
      val selective = planOf(30.0, 2000L)
      assert(selective.collect {
        case b: BroadcastHashJoinExec => b }.nonEmpty, "broadcast expected")
      // wide predicate: the certain bound exceeds the cap, no hint —
      // the shuffle join stands
      val wide = planOf(1e9, 2000L)
      assert(wide.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        "no histogram hint on a wide range")
      assert(wide.collect { case s: SortMergeJoinExec => s }.nonEmpty,
        "shuffle join on a wide range")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("write/read round-trips the boundary frame") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hist").toString + "/h"
    Histogram.write(bounds, dir)
    val back = Histogram.read(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
    val want = bounds.collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sorted
    assert(back === want)
  }
}
