package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("collect: one pass yields exact counts and sane ndv/min/max per column") {
    val nation = Tables(spark, sf, "nation")
    val stats = TableStats.collect(nation).persist()
    try {
      val n = nation.count()
      assert(TableStats.rowCount(stats) === n)
      val key = stats.filter(col("column") === "n_nationkey")
        .as[(String, Long, Long, Long, String, String)].head()
      assert(key._3 === n) // no nulls in the key
      // ndv is HLL++ (default 5% rsd): approximate even on tiny sets
      // (measured 26 for 25 distinct values) — bound, don't pin
      assert(math.abs(key._4 - n) <= math.max(2L, n / 10),
        s"ndv ${key._4} vs $n")
      assert(key._5.toLong === 0L && key._6.toLong === n - 1)
    } finally stats.unpersist()
  }

  test("collect handles column names containing dots") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("user.id", "v")
    val stats = TableStats.collect(df)
    assert(stats.count() === 2)
    assert(TableStats.rowCount(stats) === 2L)
    assert(stats.filter(col("column") === "user.id").count() === 1L)
  }

  test("statsJoin: measured counts pick the broadcast side; big-big degrades to shuffle") {
    val dir = Files.createTempDirectory("tstats").toString
    val nation = Tables(spark, sf, "nation")
    val supplier = Tables(spark, sf, "supplier")
      .withColumnRenamed("s_nationkey", "n_nationkey")
    TableStats.write(nation, s"$dir/nation")
    TableStats.write(supplier, s"$dir/supplier")
    val nStats = TableStats.read(spark, s"$dir/nation")
    val sStats = TableStats.read(spark, s"$dir/supplier")

    // small dim side -> broadcast hash join on the dim
    val joined = TableStats.statsJoin(supplier, sStats, nation, nStats,
      Seq("n_nationkey"))
    assert(joined.count() === supplier.count())
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)

    // both sides over the row cap -> NO planted hint: the optimized
    // plan must carry no ResolvedHint/JoinHint from us (the cost
    // model may still broadcast at this tiny SF — that's its call,
    // and exactly the graceful-degradation contract)
    val big = TableStats.statsJoin(supplier, sStats, nation, nStats,
      Seq("n_nationkey"), maxBroadcastRows = 1L)
    assert(big.count() === supplier.count())
    val withHint = joined.queryExecution.analyzed.toString()
    val noHint = big.queryExecution.analyzed.toString()
    assert(withHint.contains("UnresolvedHint") || withHint.contains("ResolvedHint"),
      withHint)
    assert(!noHint.contains("UnresolvedHint") && !noHint.contains("ResolvedHint"),
      noHint)
  }

  test("statsMultiJoin orders by estimated size, not written order; rows == any-order join") {
    // crafted skew: two BIG relations joined to each other AND to a
    // tiny dim. Written order (bigA, bigB, dim) would do the big-big
    // join first; measured stats must start from the cheap
    // (bigB ⋈ dim) edge — dim membership is selective (10 of 1000
    // groups), so the big-big join runs over the reduced side.
    val bigA = (0L until 20000L).map(i => (i % 1000, i)).toDF("a_k", "a_id")
    val bigB = (0L until 20000L).map(i => (i % 1000, i, i % 50))
      .toDF("b_k", "b_id", "b_g")
    val dim = (0L until 1000L by 100).map(k => (k, s"d$k")).toDF("d_k", "d_name")

    def rel(n: String, df: org.apache.spark.sql.DataFrame) =
      TableStats.Rel(n, df, TableStats.collect(df))
    val rels = Seq(rel("bigA", bigA), rel("bigB", bigB), rel("dim", dim))
    val edges = Seq(
      TableStats.JoinEdge("bigA", "bigB", Seq(("a_k", "b_k"))),
      TableStats.JoinEdge("bigB", "dim", Seq(("b_k", "d_k"))))

    val (joined, order) = TableStats.statsMultiJoinOrdered(rels, edges,
      maxBroadcastRows = 1000L)
    // the cheap edge seeds the order; bigA joins LAST
    assert(order.last === "bigA", s"order was $order")
    assert(order.toSet === Set("bigA", "bigB", "dim"))

    val plain = bigA
      .join(bigB, col("a_k") === col("b_k"))
      .join(dim, col("b_k") === col("d_k"))
    // column ORDER differs with the join order — align before except
    val cols = plain.columns.sorted.map(col).toSeq
    assert(joined.count() === plain.count())
    assert(joined.select(cols: _*).except(plain.select(cols: _*)).isEmpty &&
      plain.select(cols: _*).except(joined.select(cols: _*)).isEmpty)

    // broadcast gate: the tiny dim (10 rows <= 1000) is hinted; the
    // 20k-row sides are not
    val analyzed = joined.queryExecution.analyzed.toString()
    assert(analyzed.contains("ResolvedHint") ||
      analyzed.contains("UnresolvedHint"), analyzed)

    // a disconnected relation refuses loudly instead of cross-joining
    val lonely = rel("lonely", Seq((1L, "x")).toDF("l_k", "l_v"))
    intercept[IllegalArgumentException] {
      TableStats.statsMultiJoinOrdered(rels :+ lonely, edges)
    }
  }
}
