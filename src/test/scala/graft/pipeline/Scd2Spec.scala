package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // the reference's 4 seed stations (SQL/insert_stations.sql)
  private def seed = Seq(
    (1L, "windsor", "ca", 1, ts("2023-01-01 00:00:00")),
    (2L, "toronto", "ca", 1, ts("2023-01-01 00:00:00")),
    (3L, "london", "ca", 0, ts("2023-01-01 00:00:00")),
    (4L, "sudbury", "ca", 0, ts("2023-01-01 00:00:00"))
  ).toDF("station_id", "city", "country_code", "enabled", "effective_ts")

  private val attrs = Seq("city", "country_code", "enabled")

  test("changed keys close the old version and open a new one") {
    val dim = Scd2.init(seed)
    val updates = Seq(
      (3L, "london", "ca", 1, ts("2023-06-01 00:00:00")), // enabled flips
      (2L, "toronto", "ca", 1, ts("2023-06-01 00:00:00")), // unchanged
      (5L, "ottawa", "ca", 1, ts("2023-06-01 00:00:00"))   // new key
    ).toDF("station_id", "city", "country_code", "enabled", "effective_ts")

    val v2 = Scd2.apply(dim, updates, "station_id", attrs)

    // 4 seeds + 1 new key + 1 extra version for station 3
    assert(v2.count() === 6)
    assert(v2.filter(col("is_current")).count() === 5)

    val hist3 = v2.filter(col("station_id") === 3)
      .orderBy("valid_from")
      .select("enabled", "valid_to", "is_current")
      .as[(Int, Option[Timestamp], Boolean)].collect().toSeq
    assert(hist3 === Seq(
      (0, Some(ts("2023-06-01 00:00:00")), false),
      (1, None, true)))

    // unchanged update is a no-op (no spurious version)
    assert(v2.filter(col("station_id") === 2).count() === 1)
  }

  test("point-in-time lookup resolves the version valid at ts") {
    val dim = Scd2.init(seed)
    val v2 = Scd2.apply(dim,
      Seq((1L, "windsor-east", "ca", 1, ts("2023-06-01 00:00:00")))
        .toDF("station_id", "city", "country_code", "enabled", "effective_ts"),
      "station_id", attrs)

    def cityAt(t: String) =
      Scd2.asOf(v2, lit(ts(t))).filter(col("station_id") === 1)
        .select("city").as[String].collect().toSeq
    assert(cityAt("2023-03-01 00:00:00") === Seq("windsor"))
    assert(cityAt("2023-07-01 00:00:00") === Seq("windsor-east"))
    // exactly one version covers any instant
    assert(Scd2.asOf(v2, lit(ts("2023-06-01 00:00:00")))
      .groupBy("station_id").count().filter(col("count") > 1).count() === 0)
  }

  test("incremental apply equals one-shot rebuild on the same change log") {
    // randomized log: 12 keys x up to 8 timestamped changes drawn from
    // 3 attribute values (guaranteeing plenty of no-op entries)
    val rnd = new scala.util.Random(7)
    val log = (for {
      k <- 1L to 12L
      (t, i) <- (1 to rnd.nextInt(8) + 1).map(i => (ts(f"2023-${i}%02d-01 00:00:00"), i))
    } yield (k, s"city_${rnd.nextInt(3)}", "ca", rnd.nextInt(2), t))
      .toDF("station_id", "city", "country_code", "enabled", "effective_ts")

    // incremental: fold one batch per distinct effective_ts, in order
    val batches = log.select("effective_ts").distinct()
      .orderBy("effective_ts").as[Timestamp].collect()
    var dim = Scd2.init(log.filter(col("effective_ts") === batches.head)
      .filter(lit(false))) // empty seed with the right schema
    for (b <- batches) {
      dim = Scd2.apply(dim, log.filter(col("effective_ts") === b),
        "station_id", attrs)
      // materialize between folds (a real pipeline reads the dim store
      // back each batch; without this the 8-fold nested plan dominates
      // the test's runtime)
      dim = spark.createDataFrame(
        java.util.Arrays.asList(dim.collect(): _*), dim.schema)
    }

    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getString(1),
      r.getString(2), r.getInt(3), Option(r.get(4)).map(_.toString),
      Option(r.get(5)).map(_.toString), r.getBoolean(6))
    val cols = Seq("station_id", "city", "country_code", "enabled",
      "valid_from", "valid_to", "is_current")
    val applied = dim.select(cols.map(col): _*).collect().map(key).sorted
    val rebuilt = Scd2.rebuild(log, "station_id", attrs)
      .select(cols.map(col): _*).collect().map(key).sorted
    assert(applied.toSeq === rebuilt.toSeq)
    assert(applied.nonEmpty)
  }

  test("repeated batches accumulate history with one open version per key") {
    var dim = Scd2.init(seed)
    for ((city, month) <- Seq(("v2", "02"), ("v3", "03"), ("v4", "04"))) {
      dim = Scd2.apply(dim,
        Seq((1L, city, "ca", 1, ts(s"2023-$month-01 00:00:00")))
          .toDF("station_id", "city", "country_code", "enabled", "effective_ts"),
        "station_id", attrs)
    }
    assert(dim.filter(col("station_id") === 1).count() === 4)
    assert(dim.filter(col("station_id") === 1 && col("is_current")).count() === 1)
    // the version chain tiles time: each valid_to equals the next valid_from
    val chain = dim.filter(col("station_id") === 1).orderBy("valid_from")
      .select("valid_from", "valid_to").as[(Timestamp, Option[Timestamp])]
      .collect().toSeq
    chain.sliding(2).foreach {
      case Seq((_, Some(to)), (from, _)) => assert(to === from)
      case _ => ()
    }
  }
}
