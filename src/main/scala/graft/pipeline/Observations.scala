package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.enrich.Weather

/** Deterministic pseudo-observations derived from the driver's `events`
  * table, shaped like the reference's in-flight observation record
  * (FIXTURES.md §1 / dags/utils/api.py:30-34). The derivation is pure
  * column arithmetic so the DuckDB oracle can reproduce it bit-for-bit
  * ([[oracleCte]] mirrors [[fromEvents]] expression-by-expression:
  * same tree shape => same IEEE-754 result).
  */
object Observations {

  /** events -> 15-field observation record (one row per event). */
  def fromEvents(events: DataFrame): DataFrame = {
    val e = events
    val tsEpoch = unix_timestamp(col("ts"))
    val tempC = (col("value") / lit(5)) - lit(20)
    e.select(
      col("event_id").as("obs_id"),
      ((col("user_id") % 4) + 1).as("station_id"),
      tempC.as("temp"),
      (col("event_id") % 101).as("humidity"),
      (lit(980) + (col("event_id") % 60)).as("pressure"),
      ((col("event_id") * 7) % 10001).as("visibility"),
      ((col("event_id") * 13) % 101).as("cloudiness"),
      (col("value") / lit(10)).as("wind_speed"),
      (col("event_id") % 360).cast("double").as("wind_direction"),
      tsEpoch.as("timestamp"),
      (tsEpoch - (col("event_id") % 40000)).as("sunrise_ts"),
      ((tsEpoch + ((col("event_id") * 31) % 50000)) - lit(10000)).as("sunset_ts"),
      ((col("user_id") % 25) - lit(12)) * lit(3600) as "timezone",
      (tempC - ((col("event_id") % 10) / lit(2))).as("temp_min"),
      (tempC + ((col("event_id") % 7) / lit(2))).as("temp_max"),
      (tempC - (col("value") / lit(100))).as("feels_like")
    )
  }

  /** DuckDB CTE producing the identical observation relation. Append
    * query-specific SELECTs after it. */
  val oracleCte: String =
    """WITH obs AS (
      |  SELECT event_id AS obs_id,
      |         user_id % 4 + 1 AS station_id,
      |         value / 5 - 20 AS temp,
      |         event_id % 101 AS humidity,
      |         980 + event_id % 60 AS pressure,
      |         (event_id * 7) % 10001 AS visibility,
      |         (event_id * 13) % 101 AS cloudiness,
      |         value / 10 AS wind_speed,
      |         CAST(event_id % 360 AS DOUBLE) AS wind_direction,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |         CAST(floor(epoch(ts)) AS BIGINT) - event_id % 40000 AS sunrise_ts,
      |         CAST(floor(epoch(ts)) AS BIGINT) + (event_id * 31) % 50000 - 10000 AS sunset_ts,
      |         (user_id % 25 - 12) * 3600 AS timezone,
      |         (value / 5 - 20) - (event_id % 10) / 2 AS temp_min,
      |         (value / 5 - 20) + (event_id % 7) / 2 AS temp_max,
      |         (value / 5 - 20) - value / 100 AS feels_like
      |  FROM events
      |)""".stripMargin
}
