package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ObservationSourceSpec extends SparkSpec {

  private def read(stations: Int, ticks: Int) =
    spark.read.format("graft.sources.ObservationSource")
      .option("stations", stations).option("ticks", ticks).load()

  test("produces stations x ticks rows across one partition per station") {
    val df = read(4, 24)
    assert(df.count() === 96)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.select("station_id").distinct().count() === 4)
  }

  test("schema is the 15-field observation record") {
    assert(read(2, 1).schema.fieldNames.length === 15)
    assert(read(2, 1).schema.fieldNames.take(2).toSeq === Seq("station_id", "city"))
  }

  test("column pruning is pushed into the scan") {
    val df = read(2, 3).select("city", "temp")
    // physical scan description advertises the pruned column set
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("pruned=city,temp"), physical)
    val rows = df.collect()
    assert(rows.length === 6)
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq === Seq("city_0", "city_1"))
  }

  test("deterministic: two reads agree bit-for-bit") {
    val a = read(3, 5).orderBy("station_id", "timestamp").collect()
    val b = read(3, 5).orderBy("station_id", "timestamp").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("feeds the enrichment pipeline end-to-end") {
    val obs = read(4, 6).withColumn("timezone", lit(-18000L))
    val enriched = graft.pipeline.WeatherEtl.enrich(obs)
    assert(enriched.filter(col("dew_point").isNotNull).count() === 24)
  }
}
