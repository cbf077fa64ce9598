package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents = Seq(
    (1L, 10L, "click", 5.0, Timestamp.valueOf("2024-01-01 10:05:00")),
    (2L, 10L, "click", 7.0, Timestamp.valueOf("2024-01-01 10:55:00")),
    (3L, 11L, "view", 1.0, Timestamp.valueOf("2024-01-01 11:10:00")),
    (2L, 10L, "click", 7.0, Timestamp.valueOf("2024-01-01 10:55:00")) // dup event_id
  ).toDF("event_id", "user_id", "event_type", "value", "ts")

  test("streaming hourly rollup (AvailableNow) matches batch on deduped input") {
    val dir = Files.createTempDirectory("events_stream").toString
    mkEvents.write.mode("overwrite").parquet(dir)

    val q = EventsStream.streamingHourlyRollup(spark, dir, "t_rollup")
    q.awaitTermination(60000)

    val streamed = spark.table("t_rollup")
      .orderBy("hour_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // batch twin over the deduplicated frame (streaming applied
    // dropDuplicatesWithinWatermark on event_id)
    val batch = EventsStream.hourlyRollup(mkEvents.dropDuplicates("event_id"))
      .orderBy("hour_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.map(_._3).sum === 3) // dup collapsed: 3 events, not 4
  }

  test("streaming sliding rollup (AvailableNow) matches batch twin") {
    val dir = Files.createTempDirectory("events_sliding").toString
    mkEvents.write.mode("overwrite").parquet(dir)

    val q = EventsStream.streamingSlidingRollup(spark, dir, "t_sliding")
    q.awaitTermination(60000)

    val streamed = spark.table("t_sliding")
      .orderBy("win_start", "event_type")
      .as[(String, String, Long)].collect().toSeq
    val batch = EventsStream.slidingRollup(mkEvents.dropDuplicates("event_id"))
      .orderBy("win_start", "event_type")
      .as[(String, String, Long)].collect().toSeq
    assert(streamed === batch)
    // every event is in exactly two overlapping 2h/1h windows
    assert(streamed.map(_._3).sum === 6)
  }

  test("stream-static dimension join matches batch; static side broadcast, no join state") {
    val dir = Files.createTempDirectory("events_dim").toString
    mkEvents.write.mode("overwrite").parquet(dir)
    val userDim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "tier")

    val q = EventsStream.streamingEnrichedRollup(spark, dir, userDim, "t_dim")
    q.awaitTermination(60000)

    val streamed = spark.table("t_dim")
      .orderBy("hour_start", "tier")
      .as[(String, String, Long)].collect().toSeq
    val batch = EventsStream
      .enrichedRollup(mkEvents.dropDuplicates("event_id"), userDim)
      .orderBy("hour_start", "tier")
      .as[(String, String, Long)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.map(_._3).sum === 3) // dedup collapsed the replay
    // the join must be a broadcast hash join IN THE MICRO-BATCH PLAN
    // (static side broadcast per micro-batch, no stream-stream state
    // store) — asserting on a batch twin's plan would not catch a
    // streaming-specific planner regression, so read the streaming
    // query's own last incremental execution
    val lastPlan = q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        w.streamingQuery.lastExecution.executedPlan.toString()
    }
    assert(lastPlan.contains("BroadcastHashJoin"), lastPlan)
    assert(!lastPlan.contains("StreamingSymmetricHashJoin"), lastPlan)
  }

  test("stream-stream interval join matches the batch twin") {
    val dir = Files.createTempDirectory("events_ssjoin").toString
    val events = Seq(
      (1L, 10L, "click", 0.0, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 10L, "purchase", 9.0, Timestamp.valueOf("2024-01-01 10:04:00")), // within 10m of 1
      (3L, 10L, "purchase", 5.0, Timestamp.valueOf("2024-01-01 10:15:00")), // outside
      (4L, 11L, "click", 0.0, Timestamp.valueOf("2024-01-01 10:03:00")),
      (5L, 11L, "purchase", 2.0, Timestamp.valueOf("2024-01-01 10:03:30")), // within
      (6L, 12L, "purchase", 1.0, Timestamp.valueOf("2024-01-01 10:02:00")), // no click
      (7L, 10L, "click", 0.0, Timestamp.valueOf("2024-01-01 10:10:00")),    // 3 within 10m
      (8L, 13L, "view", 0.0, Timestamp.valueOf("2024-01-01 12:00:00"))      // advances watermark
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    events.write.mode("overwrite").parquet(dir)

    val q = EventsStream.streamingClickAttribution(spark, dir, "t_attrib")
    q.awaitTermination(120000)

    val streamed = spark.table("t_attrib")
      .orderBy("click_id", "purchase_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = EventsStream.clickAttribution(
        events.filter($"event_type" === "click"),
        events.filter($"event_type" === "purchase"))
      .orderBy("click_id", "purchase_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.map(r => (r._1, r._2)) === Seq((1L, 2L), (4L, 5L), (7L, 3L)))
    assert(streamed.map(_._4) === Seq(240000000L, 30000000L, 300000000L))
  }

  test("batch hourlyRollup buckets by event-time hour") {
    val out = EventsStream.hourlyRollup(mkEvents.dropDuplicates("event_id"))
      .orderBy("hour_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01 10:00:00", "click", 2L, 12.0),
      ("2024-01-01 11:00:00", "view", 1L, 1.0)))
  }
}
