package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinRewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  RangeJoinRewriteRule.install(spark)

  private def sensors = Seq((1L, 100L), (2L, 158L), (3L, 160L), (4L, 300L),
    (5L, -40L), (6L, -100L)).toDF("a_id", "a_ts")
  private def alerts = Seq((10L, 99L), (11L, 161L), (12L, 500L),
    (13L, -42L), (14L, 0L)).toDF("b_id", "b_ts")

  private def expected(d: Long) = (for {
    (aId, aTs) <- Seq((1L, 100L), (2L, 158L), (3L, 160L), (4L, 300L), (5L, -40L), (6L, -100L))
    (bId, bTs) <- Seq((10L, 99L), (11L, 161L), (12L, 500L), (13L, -42L), (14L, 0L))
    if math.abs(aTs - bTs) <= d
  } yield (aId, bId)).sorted

  test("abs-band join is rewritten to a banded equi-join (no nested loop)") {
    val joined = sensors.join(alerts, abs(col("a_ts") - col("b_ts")) <= 60)
    val optimized = joined.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("__range_bucket"), optimized)

    val physical = joined.queryExecution.executedPlan.toString()
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"), physical)

    val got = joined.select("a_id", "b_id").as[(Long, Long)]
      .collect().toSeq.sorted
    assert(got === expected(60))
  }

  test("boundary pairs (|a-b| == d exactly) are kept, no duplicates produced") {
    // 158 vs 161: d=3 boundary; bucket edge cases around negatives too
    val joined = sensors.join(alerts, abs(col("a_ts") - col("b_ts")) <= 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(joined === expected(3))
    assert(joined.distinct === joined) // each qualifying pair exactly once
  }

  test("joins that already have an equi key are left alone") {
    val l = Seq((1L, 5L), (2L, 9L)).toDF("k", "x")
    val r = Seq((1L, 7L), (2L, 90L)).toDF("k2", "y")
    val joined = l.join(r, col("k") === col("k2") &&
      abs(col("x") - col("y")) <= 10)
    val optimized = joined.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("__range_bucket"), optimized)
    assert(joined.select("k").as[Long].collect().toSeq.sorted === Seq(1L))
  }

  test("long values above 2^53 bucket exactly (no double rounding)") {
    // Above 2^53 a Double cast rounds to multiples of >=2: with the old
    // floor(x/d) double bucketing these neighbors could land more than
    // one bucket apart and the pair silently vanished from the result.
    val base = (1L << 60) + 12345L // unrepresentable in Double
    val l = Seq((1L, base), (2L, base + 1000L)).toDF("id", "x")
    val r = Seq((10L, base + 3L), (11L, base + 999L), (12L, base + 5000L))
      .toDF("id2", "y")
    val joined = l.join(r, abs(col("x") - col("y")) <= 7)
    val optimized = joined.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("__range_bucket"), optimized) // rewrite fired
    val got = joined.select("id", "id2").as[(Long, Long)]
      .collect().toSeq.sorted
    assert(got === Seq((1L, 10L), (2L, 11L)))
  }

  test("fractional delta over integer columns still buckets exactly") {
    val base = (1L << 60) + 777L
    val l = Seq((1L, base)).toDF("id", "x")
    val r = Seq((10L, base + 2L), (11L, base + 9L)).toDF("id2", "y")
    // ceil(2.5) = 3 becomes the integer bucket width; predicate keeps
    // exactness
    val got = l.join(r, abs(col("x") - col("y")) <= 2.5)
      .select("id", "id2").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L)))
  }

  test("randomized equivalence: rewritten join == brute force, all regimes") {
    val rnd = new scala.util.Random(42)
    // value regimes: small, negative, near-2^53, near-2^62
    val regimes = Seq(
      () => rnd.nextLong() % 1000L,
      () => (1L << 53) + rnd.nextLong() % 1000L,
      () => (1L << 62) + rnd.nextLong() % 1000L)
    for ((gen, i) <- regimes.zipWithIndex; d <- Seq(1L, 7L, 63L)) {
      val xs = Seq.fill(60)(gen()).distinct
      val ys = Seq.fill(60)(gen()).distinct
      val l = xs.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toDF("lid", "x")
      val r = ys.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toDF("rid", "y")
      val got = l.join(r, abs(col("x") - col("y")) <= d)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      // brute force in Scala over the same values (abs-free, no overflow:
      // compare via BigInt)
      val want = (for {
        (x, lj) <- xs.zipWithIndex; (y, rj) <- ys.zipWithIndex
        if (BigInt(x) - BigInt(y)).abs <= d
      } yield (lj.toLong, rj.toLong)).sorted
      assert(got === want, s"regime=$i d=$d")
    }
  }

  test("double-typed band columns work") {
    val l = Seq((1L, 1.05), (2L, 2.0)).toDF("id", "x")
    val r = Seq((10L, 1.1), (11L, 5.0)).toDF("id2", "y")
    val got = l.join(r, abs(col("x") - col("y")) <= 0.1)
      .select("id", "id2").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L)))
  }
}
