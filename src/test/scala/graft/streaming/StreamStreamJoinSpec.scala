package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Stream-stream interval join: clicks joined to the same user's views
  * within the preceding 10 minutes, both sides watermarked (bounded
  * state — Spark evicts view state older than watermark + interval).
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked interval join of two file streams matches the batch join") {
    val views = Seq(
      (1L, 7L, "view", 0.0, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 7L, "view", 0.0, Timestamp.valueOf("2024-01-01 10:20:00")),
      (3L, 8L, "view", 0.0, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val clicks = Seq(
      (11L, 7L, "click", 1.0, Timestamp.valueOf("2024-01-01 10:05:00")), // joins view 1
      (12L, 7L, "click", 1.0, Timestamp.valueOf("2024-01-01 10:25:00")), // joins views 1(no: >10m) and 2
      (13L, 8L, "click", 1.0, Timestamp.valueOf("2024-01-01 10:30:00")), // no view in window
      (14L, 9L, "click", 1.0, Timestamp.valueOf("2024-01-01 10:10:00"))) // user has no views
      .toDF("event_id", "user_id", "event_type", "value", "ts")

    val vDir = Files.createTempDirectory("ss_views").toString
    val cDir = Files.createTempDirectory("ss_clicks").toString
    views.write.mode("overwrite").parquet(vDir)
    clicks.write.mode("overwrite").parquet(cDir)

    def stream(dir: String, alias: String) = {
      val schema = spark.read.parquet(dir).schema
      spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as(s"${alias}_id"), col("user_id"),
          col("ts").as(s"${alias}_ts"))
    }
    val v = stream(vDir, "view").withColumnRenamed("user_id", "v_user")
    val c = stream(cDir, "click")
    val joined = c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 10 minutes"))
      .select("click_id", "user_id", "view_id")

    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("t_ss_join").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("t_ss_join")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((11L, 7L, 1L), (12L, 7L, 2L)))
  }
}
