package graft

import org.apache.spark.sql.functions._

import graft.ext.PipelineOps

/** [[PipelineOps.waterfill]] against hand-solved allocations: the cap
  * is feasible AND maximal on a skewed frame, the all-fit and
  * nothing-fits-whole (K = 0) edges degrade correctly, and the query's
  * half-the-corpus budget is respected at the fixture scale.
  */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  private def fill(rows: Seq[(String, Long)], budget: Long) =
    PipelineOps.waterfill(
      rows.toDF("source", "t").withColumn("n_docs", lit(1L)),
      lit(budget))
      .select("source", "t", "cap", "alloc", "capped")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq

  test("skewed frame: cap feasible and maximal (hand-solved c*=6)") {
    val rows = Seq("a" -> 1L, "b" -> 2L, "c" -> 4L, "d" -> 8L,
      "e" -> 100L)
    val got = fill(rows, budget = 20L)
    // segments: K=3 (P_3=7, A(t_3)=7+2*4=15 <= 20; A(t_4)=15+8=23 > 20)
    // c* = (20-7) div 2 = 6
    assert(got.map(_._3).distinct === Seq(6L))
    assert(got === Seq(
      ("a", 1L, 6L, 1L, 0L), ("b", 2L, 6L, 2L, 0L),
      ("c", 4L, 6L, 4L, 0L), ("d", 8L, 6L, 6L, 1L),
      ("e", 100L, 6L, 6L, 1L)))
    // feasible: sum(alloc) <= budget; maximal: cap+1 overruns
    assert(got.map(_._4).sum <= 20L)
    assert(rows.map { case (_, t) => math.min(t, 7L) }.sum > 20L)
  }

  test("all-fit edge: K=n, cap is max(t), nothing capped") {
    val got = fill(Seq("a" -> 1L, "b" -> 2L, "c" -> 100L), budget = 1000L)
    assert(got.map(_._3).distinct === Seq(100L))
    assert(got.map(r => r._4 === r._2).forall(identity))
    assert(got.map(_._5).sum === 0L)
  }

  test("K=0 edge: even the smallest source exceeds a uniform share") {
    // t=[50,60], budget=30: A(t_1)=50+50=100 > 30 -> K=0,
    // cap = 30 div 2 = 15, both capped
    val got = fill(Seq("a" -> 50L, "b" -> 60L), budget = 30L)
    assert(got === Seq(("a", 50L, 15L, 15L, 1L), ("b", 60L, 15L, 15L, 1L)))
  }

  test("q_token_budget_fill: half-corpus budget respected at sf0.001") {
    val out = SparkEntry.queries("q_token_budget_fill")(
        spark, "/root/testdata/sf0.001")
      .select("n_tokens", "budget", "alloc", "capped")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val budget = out.map(_._2).distinct
    assert(budget.size === 1)
    assert(budget.head === out.map(_._1).sum / 2)
    assert(out.map(_._3).sum <= budget.head)
    // maximality at the fixture: raising the cap by 1 overruns
    val cap = SparkEntry.queries("q_token_budget_fill")(
        spark, "/root/testdata/sf0.001")
      .select("cap").as[Long].collect().head
    assert(out.map(r => math.min(r._1, cap + 1)).sum > budget.head)
  }
}
