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

  test("options are case-insensitive (DSv2 contract)") {
    // a mis-cased option must not silently fall back to defaults
    val df = spark.read.format("graft.sources.ObservationSource")
      .option("Stations", 3).option("TICKS", 2).load()
    assert(df.count() === 6)
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

  test("micro-batch streaming read delivers every (station, tick) exactly once") {
    import java.nio.file.Files
    val q = spark.readStream.format("graft.sources.ObservationSource")
      .option("stations", 3).option("ticks", 5).load()
      .writeStream.format("memory").queryName("t_obs_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("obs_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table("t_obs_stream")
      .select("station_id", "timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = read(3, 5)
      .select("station_id", "timestamp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.length === 15)
  }

  test("admission control caps ticks per micro-batch (rate limiting)") {
    import java.nio.file.Files
    val q = spark.readStream.format("graft.sources.ObservationSource")
      .option("stations", 2).option("ticks", 5)
      .option("maxTicksPerBatch", 2).load()
      .writeStream.format("memory").queryName("t_obs_limited")
      .option("checkpointLocation",
        Files.createTempDirectory("obs_ckpt_lim").toString)
      .start()
    q.processAllAvailable() // drains the backlog through rate-limited batches
    q.stop()

    // 5 ticks at <=2 per batch => 3 non-empty batches, all rows once
    assert(spark.table("t_obs_limited").count() === 10)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length === 3, batches.map(_.numInputRows).toSeq)
    assert(batches.map(_.numInputRows).toSeq === Seq(4, 4, 2))
  }

  test("endpoint mode issues HTTP GETs per station and matches fixture mode") {
    import java.net.InetSocketAddress
    import java.util.concurrent.ConcurrentLinkedQueue
    import com.sun.net.httpserver.{HttpExchange, HttpServer}

    // local stub server speaking the OWM response shape
    // (reference: dags/utils/api.py:27-34)
    val requested = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/data/2.5/weather", (ex: HttpExchange) => {
      val params = ex.getRequestURI.getQuery.split("&")
        .map(_.split("=", 2)).map(kv => kv(0) -> kv(1)).toMap
      requested.add(params("q") + "|" + params("appid"))
      val station = params("q").stripPrefix("city_").takeWhile(_.isDigit).toLong
      val body = HttpObservations.fixtureJson(station, params("tick").toLong)
        .getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/data/2.5/weather"
      // no orderBy: range partitioning would add a sampling pass that
      // re-reads the source (and doubles the GET count); sort locally
      val http = spark.read.format("graft.sources.ObservationSource")
        .option("stations", 3).option("ticks", 4)
        .option("endpoint", url).option("apiKeys", "key_a,key_b")
        .load().collect().map(_.toSeq).sortBy(_.toString)
      val fixture = read(3, 4).collect().map(_.toSeq).sortBy(_.toString)
      assert(http.toSeq === fixture.toSeq)
      // 3 stations x 4 ticks GETs; keys rotate deterministically per station
      val reqs = requested.toArray(Array.empty[String]).toSeq
      assert(reqs.size === 12)
      assert(reqs.filter(_.startsWith("city_0,")).forall(_.endsWith("|key_a")))
      assert(reqs.filter(_.startsWith("city_1,")).forall(_.endsWith("|key_b")))
    } finally server.stop(0)
  }
}
