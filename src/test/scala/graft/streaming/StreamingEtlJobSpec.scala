package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingEtlJobSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ETL lands deduped micro-batches in the star warehouse") {
    val src = Files.createTempDirectory("setl_src").toString
    val wh = Files.createTempDirectory("setl_wh").toString
    val ckpt = Files.createTempDirectory("setl_ckpt").toString

    val obs = Seq(
      (1L, 2L, 6.26, 61L, 1013L, 10000L, 40L, 3.6, 200.0,
        1700000000L, 1699980000L, 1700014920L, -18000L, 4.0, 8.0, 5.1),
      (2L, 3L, -5.0, 80L, 990L, 8000L, 90L, 8.0, 10.0,
        1700003600L, 1699960000L, 1700010000L, 3600L, -7.0, -3.0, -9.2),
      (1L, 2L, 6.26, 61L, 1013L, 10000L, 40L, 3.6, 200.0,
        1700000000L, 1699980000L, 1700014920L, -18000L, 4.0, 8.0, 5.1) // dup obs_id
    ).toDF("obs_id", "station_id", "temp", "humidity", "pressure",
      "visibility", "cloudiness", "wind_speed", "wind_direction",
      "timestamp", "sunrise_ts", "sunset_ts", "timezone",
      "temp_min", "temp_max", "feels_like")
    obs.write.mode("overwrite").parquet(src)

    val q = StreamingEtlJob.start(spark, src, wh, ckpt)
    q.awaitTermination(120000)

    val batches = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getPath)
    assert(batches.nonEmpty)
    val fact = spark.read.parquet(batches.map(b => s"$b/fact"): _*)
    assert(fact.count() === 2) // duplicate obs_id collapsed
    val time = spark.read.parquet(batches.map(b => s"$b/time_dim"): _*)
    assert(fact.join(time, "time_id").count() === 2)
  }
}
