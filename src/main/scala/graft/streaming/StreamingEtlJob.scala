package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{StarSink, WeatherEtl}

/** Structured-Streaming variant of the ETL (SURVEY.md §2 O-25's
  * alternative): observations arrive as files in a watched directory,
  * the SAME enrichment plan runs on the stream, and each micro-batch
  * lands in the star warehouse through `foreachBatch` -> [[StarSink]]
  * (per-batch directory => idempotent replay, mirroring the batch
  * job's rerun-safety instead of the reference's duplicate-on-retry).
  *
  * `dropDuplicatesWithinWatermark` on the natural key fixes at-least-
  * once delivery from the source side; the reference has no such
  * guard (dags/etl.py:103 mints fresh uuids per attempt).
  */
object StreamingEtlJob {

  /** Start the streaming ETL over `sourceDir`; batches are written
    * under `warehouseDir/batch=<id>`. AvailableNow processes the
    * current backlog then stops — swap for
    * `Trigger.ProcessingTime("5 minutes")` for the reference cadence. */
  def start(spark: SparkSession, sourceDir: String, warehouseDir: String,
      checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val obs = spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("event_ts",
        org.apache.spark.sql.functions.timestamp_seconds(
          org.apache.spark.sql.functions.col("timestamp")))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("obs_id")
      .drop("event_ts")

    obs.writeStream
      .queryName("streaming_etl")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // no isEmpty guard: it costs an extra job re-reading the batch
        // source, and an empty batch just writes an empty (manifested)
        // batch dir — harmless and cheaper than the check.
        // clustered=false: a micro-batch is small and latency-bound —
        // the range-layout shuffle belongs to the nightly compaction
        // pass, not the hot path
        StarSink.write(WeatherEtl.enrich(batch), s"$warehouseDir/batch=$batchId",
          clustered = false)
        ()
      }
      .start()
  }
}
