package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKRewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  private def orders = (1L to 1000L).map { i =>
    (i % 23, i, (i * 6007 % 9973).toDouble)
  }.toDF("cust", "ord", "price")

  private def windowTopK(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("cust").orderBy(col("price").desc, col("ord").asc)
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("cust", "ord", "price") // rank NOT in output => rewritable
  }

  test("rewrites window row_number top-k to the TopKPerKey operator") {
    TopKRewriteRule.install(spark)
    val df = windowTopK(orders)
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("TopKPerKeyFinal"), physical)
    assert(!physical.contains("Window"), physical)
  }

  test("rewritten plan returns exactly the window formulation's rows") {
    TopKRewriteRule.install(spark)
    val rewritten = windowTopK(orders).orderBy("cust", "ord").collect().toSeq

    // reference result computed WITHOUT the rule on a fresh session
    val fresh = spark.newSession()
    val freshOrders = {
      import fresh.implicits._
      (1L to 1000L).map(i => (i % 23, i, (i * 6007 % 9973).toDouble))
        .toDF("cust", "ord", "price")
    }
    val plain = windowTopK(freshOrders).orderBy("cust", "ord").collect().toSeq
    assert(rewritten === plain)
  }

  test("does NOT fire when the rank column is in the output") {
    TopKRewriteRule.install(spark)
    val w = Window.partitionBy("cust").orderBy(col("price").desc, col("ord").asc)
    val df = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("cust", "ord", "rk") // rank IS consumed
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("Window"), physical)
    assert(!physical.contains("TopKPerKey"), physical)
  }

  test("does NOT fire for rank() (non-row_number window functions)") {
    TopKRewriteRule.install(spark)
    val w = Window.partitionBy("cust").orderBy(col("price").desc)
    val df = orders.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select("cust", "ord", "price")
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("Window"), physical)
  }
}
