package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Both custom optimizer rules firing in ONE plan under AQE — guards
  * against rule-interaction regressions as Spark versions move (each
  * rule's own spec runs it in isolation; a real query composes them:
  * band-join candidates, then keep the top matches per left key).
  *
  * The [[RangeJoinRewriteRule]] injects a Generate + equi-Join where a
  * nested-loop join stood; the [[TopKRewriteRule]] then replaces the
  * downstream row_number window with the bounded-heap TopKPerKey
  * operator; AQE re-plans both exchanges at runtime. The result must
  * be bit-identical to the un-rewritten formulation on a fresh
  * session.
  */
class RuleInteractionSpec extends SparkSpec {
  import spark.implicits._

  private def sensorRows = (1L to 400L).map(i => (i, (i * 37) % 5000))
  private def alertRows = (1L to 300L).map(j => (j, (j * 91) % 5000))

  private def composed(s: SparkSession): DataFrame = {
    val sess = s // stable identifier for implicits
    import sess.implicits._
    val sensors = sensorRows.toDF("s_id", "s_ts")
    val alerts = alertRows.toDF("a_id", "a_ts")
    // stage 1: band join (rewritable: pure |a-b| <= d, no equi key)
    val paired = sensors.join(alerts, abs(col("s_ts") - col("a_ts")) <= 25)
    // stage 2: top-3 nearest alerts per sensor (rewritable: row_number
    // rank filtered and then dropped from the output)
    val w = Window.partitionBy("s_id")
      .orderBy(abs(col("s_ts") - col("a_ts")).asc, col("a_id").asc)
    paired.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("s_id", "a_id", "s_ts", "a_ts")
  }

  test("band-join rewrite + top-k rewrite fire together under AQE, results unchanged") {
    RangeJoinRewriteRule.install(spark)
    TopKRewriteRule.install(spark)
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = composed(spark)

      val optimized = df.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("__range_bucket"), optimized)
      assert(optimized.contains("TopKPerKey"), optimized)

      val got = df.orderBy("s_id", "a_id").collect().toSeq
      assert(got.nonEmpty)

      // physical: the nested-loop join and the Window are both gone,
      // and AQE actually owns the plan. collect() first: AQE finalizes
      // the executed plan lazily
      val physical = df.queryExecution.executedPlan.toString()
      assert(physical.contains("AdaptiveSparkPlan"), physical)
      assert(physical.contains("TopKPerKeyFinal"), physical)
      assert(!physical.contains("Window"), physical)
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"), physical)

      // reference: plain-Scala model, rule-independent by construction
      // (a "fresh session, no rules" baseline was ORDER-FRAGILE: any
      // earlier suite that getOrCreate'd with extensions mutates the
      // shared session's extension set, and newSession() inherits it
      // — found when a suite pair ran in the wrong order)
      val plain = sensorRows.flatMap { case (sId, sTs) =>
        alertRows.map { case (aId, aTs) => (sId, aId, sTs, aTs) }
          .filter { case (_, _, s, a) => math.abs(s - a) <= 25 }
          .sortBy { case (_, aId, s, a) => (math.abs(s - a), aId) }
          .take(3)
      }.sortBy(t => (t._1, t._2))
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))) === plain)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }
}
