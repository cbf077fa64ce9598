package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def orders = (1L to 2000L).map { i =>
    (i % 37, i, (i * 7919 % 10007).toDouble)
  }.toDF("cust", "ord", "price").repartition(5)

  test("TopK.perKey == window row_number formulation") {
    val viaOperator = TopK.perKey(orders, 3,
        Seq("cust"), Seq("price" -> false, "ord" -> true))
      .select("cust", "ord", "price")
      .orderBy("cust", "ord")
      .collect().toSeq
    val w = Window.partitionBy("cust").orderBy(col("price").desc, col("ord").asc)
    val viaWindow = orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("cust", "ord", "price")
      .orderBy("cust", "ord")
      .collect().toSeq
    assert(viaOperator === viaWindow)
  }

  test("k larger than group size returns whole groups") {
    val out = TopK.perKey(orders.filter(col("cust") < 2), 1000,
      Seq("cust"), Seq("price" -> false, "ord" -> true))
    assert(out.count() === orders.filter(col("cust") < 2).count())
  }

  test("plans as partial -> exchange -> final (map-side reduction)") {
    val df = TopK.perKey(orders, 2, Seq("cust"), Seq("price" -> false, "ord" -> true))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.indexOf("TopKPerKeyFinal") < plan.indexOf("TopKPerKeyPartial"))
    assert(plan.contains("Exchange hashpartitioning"), plan)
    // partial pass bounds what reaches the shuffle: <= k * keys * partitions
    assert(df.count() === 37 * 2)
  }

  test("works on a session without pre-registered extensions (self-installs)") {
    val fresh = spark.newSession()
    val out = TopK.perKey(fresh.range(100).withColumn("g", col("id") % 4),
      1, Seq("g"), Seq("id" -> false))
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(96L, 97L, 98L, 99L))
  }
}
