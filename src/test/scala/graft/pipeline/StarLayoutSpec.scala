package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Layout

/** The warehouse analog of [[graft.ops.LayoutSpec]]: proves the
  * clustered star fact layout ([[StarSink]] `clustered = true`) turns
  * the reference-implied warehouse access patterns
  * (SQL/dbdiagram.txt:59-63 — date windows, per-station slices, FK
  * point lookups) into bounded-fraction scans, via scan metrics, not
  * vibes.
  */
class StarLayoutSpec extends SparkSpec {

  // 4 local dates (one per month: Nov..Feb => seasons Autumn + Winter)
  // × 4 stations × 125 rows — every (date, station) run is big enough
  // to fill its own file under factFiles = 16
  private def enriched = {
    val obs = spark.range(2000).select(
      col("id").as("obs_id"),
      ((col("id") / 4) % 4 + 1).cast("long").as("station_id"),
      (col("id") % 35).cast("double").as("temp"),
      (col("id") % 101).as("humidity"),
      (lit(980L) + col("id") % 60).as("pressure"),
      lit(10000L).as("visibility"),
      (col("id") % 100).as("cloudiness"),
      lit(3.5).as("wind_speed"),
      lit(180.0).as("wind_direction"),
      (lit(1700000000L) + (col("id") % 4) * lit(2592000L)).as("timestamp"),
      (lit(1700000000L) + (col("id") % 4) * lit(2592000L) - 20000L).as("sunrise_ts"),
      (lit(1700000000L) + (col("id") % 4) * lit(2592000L) + 20000L).as("sunset_ts"),
      lit(0L).as("timezone"),
      (col("id") % 35).cast("double").as("temp_min"),
      (col("id") % 35 + 3).cast("double").as("temp_max"),
      (col("id") % 35).cast("double").as("feels_like"))
    WeatherEtl.enrich(obs)
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("star_layout").toString
    StarSink.write(enriched, d, factFiles = 16)
    d
  }

  test("date+station slice: partition pruning plus station-range file pruning") {
    val fact = spark.read.parquet(s"$dir/fact")
    val dates = fact.select(col("record_date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(dates.length === 4, dates.toSeq)

    val sliced = fact.filter(
      col("record_date") === dates.head && col("station_id") === 2)
    assert(sliced.collect().length === 125)

    // partition pruning is in the plan...
    val plan = sliced.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("record_date"), plan)
    // ...and the station filter prunes FILES via footer min/max: of
    // the pruned date's 500 rows, only the station-disjoint file(s)
    // covering station 2 materialize (≤ 60% leaves slack for a range
    // boundary landing mid-station)
    val scanned = Layout.scannedRows(sliced)
    assert(scanned <= 300, s"scanned $scanned of 2000 (500 in the date)")
  }

  test("record_id point probe: bloom filter prunes row groups across all partitions") {
    val fact = spark.read.parquet(s"$dir/fact")
    val someId = fact.filter(col("station_id") === 3).select("record_id")
      .orderBy("record_id").limit(1).collect()(0).getString(0)

    val probed = fact.filter(col("record_id") === someId)
    assert(probed.collect().length === 1)
    // record_id is a sha2 surrogate scattered across every file:
    // min/max can't prune it, the bloom filter rules out every file
    // that can't contain the value (~1 file of 16 survives)
    val scanned = Layout.scannedRows(probed)
    assert(scanned <= 300, s"scanned $scanned of 2000")
  }

  test("season-filtered star query: dim-side filter prunes fact partitions dynamically") {
    val fact = spark.read.parquet(s"$dir/fact")
    val timeDim = spark.read.parquet(s"$dir/time_dim")
    // the season predicate lives in the DIMENSION; record_date is both
    // the fact's hive partition column and a time_dim attribute, so
    // joining the filtered dim ON record_date lets dynamic partition
    // pruning turn the season filter into a fact partition filter at
    // runtime — the 100 TB star-query pattern (a time_id join could
    // never prune: surrogate keys say nothing about placement)
    val fallDates = timeDim.filter(col("record_season") === "Fall")
      .select("record_date").distinct()
    val q = fact.join(fallDates, Seq("record_date"), "left_semi")
      .groupBy(lit(1).as("one"))
      .agg(count(lit(1)).as("n"))
    val rows = q.collect()
    assert(rows.length === 1 && rows(0).getLong(1) === 500L, rows.toSeq)

    // exactly one of the four date partitions is Fall (Nov); DPP must
    // keep the fact scan to that partition's 500 rows (the 2000-row
    // dim scan is also counted by scannedRows)
    val scanned = Layout.scannedRows(q)
    assert(scanned <= 500L + 2000L, s"fact+dim scanned $scanned")
  }

  test("q_weather_star_warehouse: statically pruned fact scan + broadcast time-dim join") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q_weather_star_warehouse")(spark, sf)
    val scans = fileScans(df)
    // the fact scan reads ONLY the 7-day window's hive partitions —
    // a literal cutoff, so the pruning is static (PartitionFilters),
    // not a runtime DPP filter
    val factScans = scans.filter(_._1.contains("/fact"))
    assert(factScans.nonEmpty, scans.mkString("\n"))
    val whRoot = factScans.head._1.stripSuffix("/fact")
    val totalDates = spark.read.parquet(s"$whRoot/fact")
      .select("record_date").distinct().count()
    factScans.foreach { case (path, pf, nParts) =>
      assert(pf.contains("record_date"), s"$path: $pf")
      assert(nParts > 0 && nParts < totalDates,
        s"$path read $nParts of $totalDates date partitions")
    }
    // the date-filtered time-dim join is a broadcast hash join (the
    // filtered slice is the small side); the other three dims are
    // cost-model-chosen on purpose — no assertion
    val joins = execNodes(df).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.mkString(",") + "|" + j.rightKeys.mkString(",")
    }
    assert(joins.exists(_.contains("time_id")),
      s"no broadcast join on time_id in:\n${joins.mkString("\n")}")
  }
}
