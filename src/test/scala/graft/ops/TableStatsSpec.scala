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
}
