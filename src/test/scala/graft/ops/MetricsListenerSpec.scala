package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsListenerSpec extends SparkSpec {
  import spark.implicits._

  private def awaitMetrics(l: MetricsListener, timeoutMs: Long = 30000) = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (l.snapshot.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    l.snapshot
  }

  test("records duration and output rows for completed actions") {
    val listener = MetricsListener.attach(spark)
    try {
      val n = (1L to 500L).toDF("id")
        .groupBy((col("id") % 7).as("k")).count()
      n.collect()
      // listener events are delivered asynchronously; poll
      val m = awaitMetrics(listener)
      assert(m.nonEmpty)
      assert(m.exists(q => q.funcName == "collect" && !q.failed))
      assert(m.filter(_.funcName == "collect").exists(_.durationNs > 0))
    } finally spark.listenerManager.unregister(listener)
  }

  test("captures shuffle volume for wide queries") {
    val listener = MetricsListener.attach(spark)
    try {
      (1L to 5000L).toDF("id").repartition(4)
        .groupBy((col("id") % 100).as("k"))
        .agg(sum("id")).collect()
      assert(awaitMetrics(listener).exists(_.shuffleBytesWritten > 0))
    } finally spark.listenerManager.unregister(listener)
  }
}
