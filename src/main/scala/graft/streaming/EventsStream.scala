package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming surface (SURVEY.md §2 O-25 + §2.1 streaming).
  *
  * The reference's 5-minute Airflow cron is an at-least-once micro-batch
  * with no watermarks and duplicate facts on retry (dags/etl.py:103,129).
  * This module is the Spark-native upgrade: the same transformations,
  * defined ONCE as DataFrame -> DataFrame functions, run identically in
  * batch mode (oracle-checked via [[graft.queries.EventsQueries]]) and
  * in a streaming query with event-time watermarking and
  * `dropDuplicatesWithinWatermark` fixing the duplicate-on-retry defect.
  */
object EventsStream {

  /** Tumbling 1-hour event counts/volume per event_type. Works on both
    * batch and streaming frames (same logical definition). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding 2-hour / 1-hour-slide event counts per event_type — the
    * same definition serves batch (oracle-checked as
    * `q_events_sliding`) and streaming (each event lands in both
    * overlapping windows; Spark assigns them at group time, so the
    * streaming state is per (window, type)).
    *
    * State-boundedness caveat: the memory-sink runs below use
    * COMPLETE output mode, where the watermark does NOT evict
    * aggregation state — that is a replay-harness convenience (the
    * full result table is what the specs compare), not the
    * production shape. A continuously-triggered deployment uses
    * UPDATE mode into a durable sink with per-partition overwrite —
    * exactly [[RollupMaintenance]], whose state IS watermark-bounded.
    */
  def slidingRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Interval join (click→purchase attribution): pair each purchase
    * with every click by the SAME user in the preceding 10 minutes.
    * One definition serves batch (oracle-checked as
    * `q_click_attribution`) and the watermarked stream-stream join
    * ([[streamingClickAttribution]]).
    *
    * Scale shape: the user_id equality is the join KEY, so this plans
    * as a shuffle hash/sort-merge equi-join with the time bounds as a
    * post-join filter — never a nested loop. Per-key work is
    * |clicks_u| x |purchases_u| only within one user; a pathological
    * hot user calls for salting ([[graft.ops.ScaleJoins.saltedJoin]])
    * or time-bucket banding ([[graft.plans.RangeJoinRewriteRule]]'s
    * construction) on top of the same definition. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    c.join(p,
      col("c_user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("purchase_id"),
        col("c_user_id").as("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("micros_after"))
  }

  /** Stream-stream form of [[clickAttribution]]: both sides watermarked
    * 30 minutes, so the join state for a click is dropped once the
    * purchase-side watermark passes click_ts + 10 minutes — bounded
    * state, append-mode output (rows emit when matched; an inner
    * time-interval join needs no end-of-window wait). Each side is
    * deduplicated by event_id within the watermark: an at-least-once
    * source replaying an event would otherwise produce duplicate
    * attribution rows (each copy joins independently). */
  def streamingClickAttribution(
      spark: SparkSession,
      sourceDir: String,
      queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    def src = spark.readStream.schema(schema).parquet(sourceDir)
    val clicks = src.filter(col("event_type") === "click")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val purchases = src.filter(col("event_type") === "purchase")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    clickAttribution(clicks, purchases)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming variant: watermarked, exactly-once per (event_id) within
    * the watermark horizon. `sourceDir` is a parquet directory treated
    * as a file stream (the standard replay harness). */
  def streamingHourlyRollup(
      spark: SparkSession,
      sourceDir: String,
      queryName: String): StreamingQuery =
    startMemoryQuery(spark, sourceDir, queryName, hourlyRollup)

  /** Streaming twin of [[slidingRollup]] (same dedup + watermark). */
  def streamingSlidingRollup(
      spark: SparkSession,
      sourceDir: String,
      queryName: String): StreamingQuery =
    startMemoryQuery(spark, sourceDir, queryName, slidingRollup)

  /** Stream-static dimension enrichment: events joined against a
    * STATIC user-tier dimension, rolled up per (hour, tier). The
    * batch/stream-shared definition — Spark plans the stream-static
    * equi-join with the static side broadcast fresh each micro-batch
    * (dimension updates between batches are picked up; the STREAM
    * side never shuffles for the join and carries no join state,
    * unlike a stream-stream join). This is the standard streaming
    * dimension-lookup shape for a warehouse ingest at any scale: the
    * dim must fit in a broadcast, the stream is unbounded. */
  def enrichedRollup(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), "user_id")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("tier"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("tier"), col("n_events"))

  /** Streaming twin of [[enrichedRollup]] (same watermark + dedup
    * harness as the other rollups). */
  def streamingEnrichedRollup(
      spark: SparkSession,
      sourceDir: String,
      userDim: DataFrame,
      queryName: String): StreamingQuery =
    startMemoryQuery(spark, sourceDir, queryName, enrichedRollup(_, userDim))

  private def startMemoryQuery(
      spark: SparkSession,
      sourceDir: String,
      queryName: String,
      rollup: DataFrame => DataFrame): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val events = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    rollup(events)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
