package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.enrich.Weather

/** The reference pipeline's transform stages as one narrow Spark plan.
  *
  * The reference runs `enrich_datetime` (dags/etl.py:20-69) and
  * `add_calc_attributes` (dags/etl.py:71-84) as parallel Airflow tasks
  * and zip-merges them positionally (dags/etl.py:93). Both branches are
  * pure projections of the same extract output, so in Spark the diamond
  * collapses into a single `select` over one lineage — the merge is free,
  * order-safe, and whole-stage-codegen'd (SURVEY.md §2 O-20).
  */
object WeatherEtl {

  /** Observation record -> fully enriched record (O-7..O-19 + O-20).
    * Input columns per FIXTURES.md §1; output adds the 10 datetime
    * attributes and the 2 calculated metrics, drops the raw epochs
    * (dags/etl.py:34,61 — O-9).
    */
  def enrich(obs: DataFrame): DataFrame = {
    val local = Weather.localTs(col("timestamp"), col("timezone"))
    val sunsetLocal = Weather.localTs(col("sunset_ts"), col("timezone"))
    val sunriseLocal = Weather.localTs(col("sunrise_ts"), col("timezone"))
    obs
      .withColumns(Map(
        "recorded_datetime_local" -> Weather.datetimeStr(local),
        "recorded_date_local" -> Weather.dateStr(local),
        "sunset_datetime_local" -> Weather.datetimeStr(sunsetLocal),
        "sunrise_datetime_local" -> Weather.datetimeStr(sunriseLocal),
        "recorded_quarter_local" -> Weather.quarterLabel(local),
        "recorded_season_local" -> Weather.seasonLabel(local),
        "recorded_weekday_local" -> Weather.weekdayName(local),
        "recorded_month_local" -> Weather.monthName(local),
        "recorded_year_local" -> year(local).cast("long"),
        "daylight_duration_minutes" ->
          Weather.daylightMinutes(col("sunrise_ts"), col("sunset_ts")),
        // add_calc_attributes branch (dags/etl.py:78-82), merged for free:
        "dew_point" -> Weather.dewPoint(col("temp"), col("humidity")),
        "heat_index" -> Weather.heatIndexC(col("temp"), col("humidity"))
      ))
      .drop("timestamp", "sunset_ts", "sunrise_ts")
  }
}

/** Star-schema fan-out (SURVEY.md §2 O-21..O-23): one enriched row ->
  * one row in the fact table and each of the four dimension tables.
  * Schemas mirror /root/reference/SQL/create_tables.sql:11-55.
  *
  * Surrogate keys: the reference uses fresh `uuid4()` per row
  * (dags/etl.py:103 — nondeterministic). For testability we default to
  * deterministic keys: `sha2(concat_ws('|', <table>, <natural key>), 256)`
  * (SURVEY.md §7.4.2). Pass `deterministicKeys = false` for uuid parity.
  *
  * At 100 TB: the fan-out is five narrow projections off ONE cached
  * scan — no shuffle, no join; callers should `persist` the enriched
  * frame before writing all five tables (one pass over the data).
  */
object StarSchema {

  private def key(table: String, naturalKey: Column, deterministic: Boolean): Column =
    if (deterministic) sha2(concat_ws("|", lit(table), naturalKey), 256)
    else expr("uuid()")

  final case class Star(
      fact: DataFrame,
      timeDim: DataFrame,
      paramDim: DataFrame,
      tempDim: DataFrame,
      heatIndexDim: DataFrame)

  /** Append the five surrogate-key columns in ONE projection. Persist
    * the RESULT of this (not the bare enriched frame) before fanning
    * out: the five split branches then only select cached columns —
    * otherwise every branch recomputes its keys (9 sha2/row across the
    * five projections). */
  def withKeys(enriched: DataFrame, deterministicKeys: Boolean = true): DataFrame =
    enriched.withColumns(Map(
      "record_id" -> key("record", col("obs_id"), deterministicKeys),
      "time_id" -> key("time", col("obs_id"), deterministicKeys),
      "parameter_id" -> key("parameter", col("obs_id"), deterministicKeys),
      "temp_id" -> key("temp", col("obs_id"), deterministicKeys),
      "heat_index_id" -> key("heat_index", col("obs_id"), deterministicKeys)))

  /** Split a [[withKeys]]-keyed frame into the 5 tables (pure selects). */
  def splitKeyed(keyed: DataFrame): Star = {
    val fact = keyed.select(
      col("record_id"),
      col("station_id"),
      col("time_id"),
      col("parameter_id"),
      col("temp_id"),
      col("heat_index_id"))
    val timeDim = keyed.select(
      col("time_id"),
      col("recorded_datetime_local").as("record_datetime"),
      col("recorded_date_local").as("record_date"),
      col("recorded_month_local").as("record_month"),
      col("recorded_year_local").as("record_year"),
      col("recorded_quarter_local").as("record_quarter"),
      col("recorded_season_local").as("record_season"),
      col("recorded_weekday_local").as("record_weekday"))
    val paramDim = keyed.select(
      col("parameter_id"),
      col("humidity"), col("pressure"), col("visibility"),
      col("cloudiness"), col("dew_point"), col("wind_speed"),
      col("wind_direction"))
    val tempDim = keyed.select(
      col("temp_id"),
      col("temp"),
      col("temp_min").as("temp_range_min"),
      col("temp_max").as("temp_range_max"),
      col("feels_like"))
    // heat_index_category = 1, description = '' are hardcoded by the
    // reference (dags/etl.py:120 — O-23).
    val heatIndexDim = keyed.select(
      col("heat_index_id"),
      col("heat_index"),
      lit(1L).as("heat_index_category"),
      lit("").as("description"))
    Star(fact, timeDim, paramDim, tempDim, heatIndexDim)
  }

  /** Convenience: key + split in one call (branches recompute the key
    * projection unless the caller persists `withKeys` first). */
  def split(enriched: DataFrame, deterministicKeys: Boolean = true): Star =
    splitKeyed(withKeys(enriched, deterministicKeys))
}
