package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def enriched = {
    val obs = Seq(
      (1L, 2L, 6.26, 61L, 1013L, 10000L, 40L, 3.6, 200.0,
        1700000000L, 1699980000L, 1700014920L, -18000L, 4.0, 8.0, 5.1),
      (2L, 3L, -5.0, 80L, 990L, 8000L, 90L, 8.0, 10.0,
        1720000000L, 1719960000L, 1720010000L, 3600L, -7.0, -3.0, -9.2)
    ).toDF("obs_id", "station_id", "temp", "humidity", "pressure",
      "visibility", "cloudiness", "wind_speed", "wind_direction",
      "timestamp", "sunrise_ts", "sunset_ts", "timezone",
      "temp_min", "temp_max", "feels_like")
    WeatherEtl.enrich(obs)
  }

  test("enrich adds the 12 derived columns and drops raw epochs (O-9)") {
    val cols = enriched.columns.toSet
    val added = Set("recorded_datetime_local", "recorded_date_local",
      "sunset_datetime_local", "sunrise_datetime_local",
      "recorded_quarter_local", "recorded_season_local",
      "recorded_weekday_local", "recorded_month_local",
      "recorded_year_local", "daylight_duration_minutes",
      "dew_point", "heat_index")
    assert(added.subsetOf(cols))
    assert(!cols.contains("timestamp") && !cols.contains("sunset_ts") &&
      !cols.contains("sunrise_ts"))
  }

  test("split fans one enriched row into 5 star tables with aligned keys") {
    val star = StarSchema.split(enriched)
    assert(star.fact.count() === 2)
    assert(star.timeDim.count() === 2)
    assert(star.paramDim.count() === 2)
    assert(star.tempDim.count() === 2)
    assert(star.heatIndexDim.count() === 2)
    // fact joins back to every dim losslessly (FK integrity)
    val joined = star.fact
      .join(star.timeDim, "time_id")
      .join(star.paramDim, "parameter_id")
      .join(star.tempDim, "temp_id")
      .join(star.heatIndexDim, "heat_index_id")
    assert(joined.count() === 2)
  }

  test("deterministic keys are stable across invocations; uuid mode is not") {
    val k1 = StarSchema.split(enriched).fact.select("record_id").as[String].collect().sorted
    val k2 = StarSchema.split(enriched).fact.select("record_id").as[String].collect().sorted
    assert(k1 === k2)
    val u1 = StarSchema.split(enriched, deterministicKeys = false)
      .fact.select("record_id").as[String].collect().sorted
    assert(u1 !== k1)
  }

  test("heat index dim carries the hardcoded category/description (O-23)") {
    val hi = StarSchema.split(enriched).heatIndexDim
      .select("heat_index_category", "description").distinct().collect()
    assert(hi.length === 1)
    assert(hi(0).getLong(0) === 1L && hi(0).getString(1) === "")
  }
}
