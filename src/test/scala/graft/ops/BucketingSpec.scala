package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("matching-bucket join is exchange-free and agrees with the plain join") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)

    // disable broadcast so the join must co-locate rows (sort-merge);
    // bucketing is what makes that exchange-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect() // materialize so AQE finalizes the physical plan
      assert(Bucketing.isExchangeFree(joined),
        joined.queryExecution.executedPlan.toString())

      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() === expected)

      // aggregation on the bucket key is exchange-free too (partial =
      // final grouping: data is already hash-distributed by the key)
      val agg = spark.table("b_lineitem")
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      agg.collect()
      assert(Bucketing.isExchangeFree(agg),
        agg.queryExecution.executedPlan.toString())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts still join correctly (one side shuffles)") {
    val orders = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val lineitem = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"))
    Bucketing.writeBucketed(orders, "b_orders8", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem4", "o_orderkey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders8", "b_lineitem4", "o_orderkey")
      assert(joined.count() ===
        orders.join(lineitem, "o_orderkey").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders8")
      spark.sql("DROP TABLE IF EXISTS b_lineitem4")
    }
  }
}
