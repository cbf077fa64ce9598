package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join result on a skewed key distribution") {
    // 10k rows of one hot key + a uniform tail (the skew shape)
    val left = (Seq.tabulate(10000)(i => (1L, i.toLong)) ++
      Seq.tabulate(500)(i => ((i % 50 + 2).toLong, (10000 + i).toLong)))
      .toDF("k", "row_id")
    val right = (1L to 51L).map(k => (k, s"dim_$k")).toDF("k", "payload")

    val plain = left.join(right, "k")
    val salted = ScaleJoins.saltedJoin(left, right, "k", "row_id", salts = 8)

    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val left = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "row_id")
    val buckets = left
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(buckets.length === 8) // every bucket gets a share
    assert(buckets.map(_.getLong(1)).max < 1000 * 0.3) // no bucket dominates
  }

  test("adaptiveSaltedJoin salts only the sketch-detected hot keys") {
    // one hot key (10k rows, ~95% share) + a uniform tail
    val left = (Seq.tabulate(10000)(i => (1L, i.toLong)) ++
      Seq.tabulate(500)(i => ((i % 50 + 2).toLong, (10000 + i).toLong)))
      .toDF("k", "row_id")
    val right = (1L to 51L).map(k => (k, s"dim_$k")).toDF("k", "payload")

    val plain = left.join(right, "k")
    val adaptive = ScaleJoins.adaptiveSaltedJoin(
      left, right, "k", "row_id", salts = 8, denom = 16)

    // result parity with the plain join
    assert(adaptive.count() === plain.count())
    assert(adaptive.except(plain).isEmpty && plain.except(adaptive).isEmpty)

    // the sketch's thresholded detection finds EXACTLY the hot key:
    // the 50 cold keys (each ~0.1% of rows) must NOT be salted even
    // though all 51 keys survive in the sketch's counter set (k=64 >
    // distinct keys, so nothing is ever evicted)
    assert(ScaleJoins.hotKeys(left, "k", denom = 16, k = 64) === Set("1"))
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — the session default
    // (spark-warehouse/, gitignored) is used; tables are dropped after
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    val orders = (1L to 1000L).map(i => (i % 100, i, i * 1.5)).toDF("cust", "ord", "amt")
    val customer = (0L until 100L).map(i => (i, s"c$i")).toDF("cust", "name")
    orders.write.bucketBy(8, "cust").sortBy("cust").saveAsTable("b_orders")
    customer.write.bucketBy(8, "cust").saveAsTable("b_customer")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "cust")
      val plan = joined.queryExecution.executedPlan.toString()
      // co-located bucketed join: sort-merge with NO ShuffleExchange
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
