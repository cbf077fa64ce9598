package graft.pipeline

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-trips the star schema through an embedded Derby database —
  * the JDBC deployment mode of O-1/O-24 (the reference's MySQL shape,
  * dags/utils/database.py:16-34), verified without external services.
  */
class JdbcStarSpec extends SparkSpec {
  import spark.implicits._

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftstar;create=true"

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

  test("star schema round-trips through JDBC; manifest commits last") {
    val counts = JdbcStar.writeStar(enriched, url, driver, maxConnections = 2,
      batchId = 7L)
    assert(counts.values.toSet === Set(2L))

    def read(table: String) =
      JdbcStar.readTable(spark, url, table, driver)

    // manifest present (written last => batch complete), batch stamped
    val manifest = read(JdbcStar.manifestTable)
      .select("batch_id", "rows").as[(Long, Long)].collect()
    assert(manifest.toSeq === Seq((7L, 2L)))

    // every fact row joins back to all four dims with intact values
    val joined = read("F_WEATHER")
      .join(read("D_TIME"), "time_id")
      .join(read("D_WEATHER_PARAMETERS"), "parameter_id")
      .join(read("D_TEMPERATURE"), "temp_id")
      .join(read("D_HEAT_INDEX"), "heat_index_id")
    assert(joined.count() === 2)
    assert(joined.filter(col("station_id") === 2L)
      .select("temp").as[Double].head() === 6.26)

    // JDBC mode agrees with the parquet StarSink on the same input
    val star = StarSchema.split(enriched)
    assert(read("D_TIME").orderBy("time_id").collect().toSeq ===
      star.timeDim.orderBy("time_id").collect().toSeq)
  }

  test("rewriting a batch replaces the manifest (no stale complete marker)") {
    JdbcStar.writeStar(enriched, url, driver, maxConnections = 2, batchId = 8L)
    JdbcStar.writeStar(enriched, url, driver, maxConnections = 2, batchId = 9L)
    val manifest = JdbcStar.readTable(spark, url, JdbcStar.manifestTable, driver)
      .select("batch_id").as[Long].collect()
    // exactly one row, and it names the LATEST batch: the previous
    // batch's marker was cleared before any star table was touched
    assert(manifest.toSeq === Seq(9L))
  }

  test("station seed read pushes the enabled=1 predicate down (O-1)") {
    // seed W_STATION the way the reference's DDL does
    // (/root/reference/SQL/create_tables.sql + seed data)
    val cxn = DriverManager.getConnection(url)
    val st = cxn.createStatement()
    try st.execute("DROP TABLE W_STATION") catch { case _: Exception => () }
    st.execute(
      """CREATE TABLE W_STATION (
        |  station_id BIGINT, city VARCHAR(64),
        |  country_code VARCHAR(4), enabled INT)""".stripMargin)
    st.execute("INSERT INTO W_STATION VALUES (1, 'delhi', 'in', 1)")
    st.execute("INSERT INTO W_STATION VALUES (2, 'mumbai', 'in', 1)")
    st.execute("INSERT INTO W_STATION VALUES (3, 'pune', 'in', 0)")
    st.close(); cxn.close()

    val stations = JdbcStar.readEnabledStations(spark, url, driver)
    // the filter must be pushed into the remote scan, not run in Spark
    // (Derby reports identifiers uppercased: EqualTo(ENABLED,1))
    val pushed = stations.queryExecution.executedPlan.toString()
    assert(pushed.contains("PushedFilters") &&
      pushed.toLowerCase.contains("equalto(enabled,1)"), pushed)
    assert(stations.orderBy("station_id").as[(Long, String, String)]
      .collect().toSeq === Seq((1L, "delhi", "in"), (2L, "mumbai", "in")))
  }

  test("star DDL resolves under BOTH the Derby and MySQL dialects") {
    // the deployment the sandbox can't run (a live MySQL) is still
    // smoke-checked at the dialect seam: Spark's own JdbcDialects
    // registry must produce a complete CREATE TABLE column list for
    // every star table under the MySQL dialect (the reference's
    // warehouse, dags/utils/database.py:13-14) exactly as it does for
    // the round-trip-proven Derby one — a schema change introducing a
    // type either dialect can't express fails HERE, before any
    // deployment sees it.
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    val star = StarSchema.splitKeyed(StarSchema.withKeys(enriched))
    val tables = Seq(
      "D_TIME" -> star.timeDim,
      "D_WEATHER_PARAMETERS" -> star.paramDim,
      "D_TEMPERATURE" -> star.tempDim,
      "D_HEAT_INDEX" -> star.heatIndexDim,
      "F_WEATHER" -> star.fact,
      JdbcStar.manifestTable ->
        Seq((1L, 1L, 5)).toDF("batch_id", "rows", "tables"))
    for (u <- Seq(url, "jdbc:mysql://warehouse.invalid/weather");
         (name, df) <- tables) {
      val dialect = JdbcDialects.get(u)
      val ddl = JdbcUtils.schemaString(
        dialect, df.schema, caseSensitive = false)
      df.schema.fields.foreach { f =>
        assert(ddl.toLowerCase.contains(f.name.toLowerCase),
          s"dialect ${dialect.getClass.getSimpleName} table $name: " +
            s"column ${f.name} (${f.dataType}) missing from DDL: $ddl")
      }
    }
  }

  test("partitioned JDBC read fans out across predicates") {
    // Spark's JDBC writer creates quoted (case-exact) columns; Derby
    // uppercases unquoted identifiers, so the predicate must quote
    val df = JdbcStar.readTable(spark, url, "D_TIME", driver,
      predicates = Seq("\"record_year\" < 2024", "\"record_year\" >= 2024"))
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 2)
  }
}
