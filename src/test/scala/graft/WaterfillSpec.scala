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

  test("q_budget_admission: imperative replay of the prefix-truncation admission") {
    val dir = "/root/testdata/sf0.001"
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // doc-grain inputs, replayed with plain Scala (same tokenizer
    // semantics: whitespace split, empties dropped)
    val docs = Tables(spark, dir, "documents")
      .select("source", "doc_id", "text")
      .as[(String, Long, String)].collect().toSeq
      .map { case (s, id, t) =>
        (s, id, t.split("[ \t\n\f\r]+").count(_.nonEmpty).toLong)
      }
    val per = docs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val budget = per.values.sum / 2
    // waterfill by definition: largest integer cap whose total fits
    val tmax = per.values.max
    val cap = (0L to tmax).reverse
      .find(c => per.values.map(math.min(_, c)).sum <= budget).get
    val alloc = per.map { case (s, t) => s -> math.min(t, cap) }
    // prefix-truncation admission in md5(doc_id) order
    val expected = docs.groupBy(_._1).map { case (s, ds) =>
      var cum = 0L
      val adm = ds.sortBy(d => (md5hex(d._2.toString), d._2))
        .takeWhile { d => cum += d._3; cum <= alloc(s) }
      val xor = adm.map(d =>
          java.lang.Long.parseLong(md5hex(d._2.toString).take(15), 16))
        .foldLeft(0L)(_ ^ _)
      s -> ((alloc(s), adm.size.toLong, adm.map(_._3).sum, xor))
    }
    val got = SparkEntry.queries("q_budget_admission")(spark, dir)
      .select("source", "alloc", "n_admitted", "tok_admitted", "ids_xor60")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (s, a, n, tk, x) =>
      assert((a, n, tk, x) === ((expected(s)._1, expected(s)._2,
        expected(s)._3, expected(s)._4)), s"source $s")
      assert(tk <= a)
    }
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
