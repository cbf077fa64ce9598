package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.sources.ObservationSource

/** The end-to-end batch ETL job — the Spark re-expression of the
  * reference DAG's extract >> [enrich ∥ calc] >> merge >> load
  * (dags/etl.py:159), collapsed into one Catalyst plan: source →
  * enrichment (one narrow projection pipeline) → star fan-out →
  * warehouse write (dims first, fact last, manifest).
  *
  * Scheduled externally (Airflow `spark-submit`, see
  * `airflow/weatherflow_spark_dag.py`) — the reference's 5-minute
  * micro-batch cadence with each run idempotent per output directory.
  *
  * Usage: EtlJob <outDir> [stations] [ticks] [tzOffsetSec]
  */
object EtlJob {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val stations = if (args.length > 1) args(1).toInt else 4
    val ticks = if (args.length > 2) args(2).toInt else 12
    val tz = if (args.length > 3) args(3).toLong else -18000L

    val spark = SparkSession.builder()
      .appName("weatherflow-etl")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val counts = run(spark, outDir, stations, ticks, tz)
    println(s"""{"written":${counts("fact")},"out":"$outDir"}""")
    spark.stop()
  }

  /** Library entry (testable without spark-submit). */
  def run(spark: SparkSession, outDir: String, stations: Int, ticks: Int,
      tzOffsetSec: Long): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    val obs = spark.read.format("graft.sources.ObservationSource")
      .option("stations", stations).option("ticks", ticks).load()
      .withColumn("timezone", lit(tzOffsetSec))
      // (station, timestamp) is the natural identity; the wide
      // multiplier keeps ids unique without wrapping (timestamp ~1.7e9
      // << 1e12 — the old modulo collided ticks 1e6/300 apart)
      .withColumn("obs_id",
        col("station_id") * 1000000000000L + col("timestamp"))
    StarSink.write(WeatherEtl.enrich(obs), outDir)
  }
}
