package graft.enrich

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Formula-level specs for the reference enrichment semantics
  * (SURVEY.md §2 O-10..O-19), pinned to hand-computed values including
  * the /root/reference/sample.json golden record.
  */
class WeatherSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c).collect()(0).get(0).asInstanceOf[T]

  test("dew point matches sample.json golden (temp 6.26, humidity 61 -> -1.54)") {
    assert(one[Double](Weather.dewPoint(lit(6.26), lit(61))) === -1.54)
  }

  test("heat index matches sample.json golden (temp 6.26, humidity 61 -> 4.53)") {
    assert(one[Double](Weather.heatIndexC(lit(6.26), lit(61))) === 4.53)
  }

  test("heat index F intermediate (Steadman simplified)") {
    // 0.5*(T_F + 61 + (T_F-68)*1.2 + RH*0.094), T_F = 6.26*1.8+32 = 43.268
    val expected = 0.5 * (43.268 + 61.0 + (43.268 - 68.0) * 1.2 + 61 * 0.094)
    assert(math.abs(one[Double](Weather.heatIndexF(lit(6.26), lit(61))) - expected) < 1e-12)
  }

  test("daylight minutes: normal day (sunset - sunrise = 34920s -> 582min)") {
    assert(one[Long](Weather.daylightMinutes(lit(1000000L), lit(1034920L))) === 582L)
  }

  test("daylight minutes reproduces Python timedelta.seconds on negative diff") {
    // Python: (sunset - sunrise) = -3600s => timedelta.seconds = 82800 => //60 = 1380
    assert(one[Long](Weather.daylightMinutes(lit(1000000L), lit(996400L))) === 1380L)
  }

  test("daylight minutes: multi-day diff keeps only the sub-day component") {
    // 90061s = 1 day + 1h1m1s => Python .seconds = 3661 => 61 min
    assert(one[Long](Weather.daylightMinutes(lit(0L), lit(90061L))) === 61L)
  }

  test("quarter and season labels are total and correct over all 12 months") {
    val expected = Map(
      1 -> ("Q1", "Winter"), 2 -> ("Q1", "Winter"), 3 -> ("Q1", "Spring"),
      4 -> ("Q2", "Spring"), 5 -> ("Q2", "Spring"), 6 -> ("Q2", "Summer"),
      7 -> ("Q3", "Summer"), 8 -> ("Q3", "Summer"), 9 -> ("Q3", "Fall"),
      10 -> ("Q4", "Fall"), 11 -> ("Q4", "Fall"), 12 -> ("Q4", "Winter"))
    val rows = (1 to 12).map(m => (m, f"2023-$m%02d-15 12:00:00"))
      .toDF("m", "s")
      .select(col("m"), Weather.quarterLabel(col("s").cast("timestamp")).as("q"),
        Weather.seasonLabel(col("s").cast("timestamp")).as("season"))
      .collect()
    rows.foreach { r =>
      val (q, s) = expected(r.getInt(0))
      assert(r.getString(1) === q, s"month ${r.getInt(0)}")
      assert(r.getString(2) === s, s"month ${r.getInt(0)}")
    }
  }

  test("weekday/month names use full English names (reference strftime %A/%B)") {
    val ts = lit("2023-11-18 14:39:40").cast("timestamp") // sample.json Saturday/November
    assert(one[String](Weather.weekdayName(ts)) === "Saturday")
    assert(one[String](Weather.monthName(ts)) === "November")
  }

  test("localTs applies the epoch+offset trick under UTC session tz") {
    // dags/etl.py:30-32: fromtimestamp(ts + tz). 1700000000 + 3600 offset
    // = 2023-11-14 23:13:20 UTC.
    assert(one[String](Weather.datetimeStr(Weather.localTs(lit(1700000000L), lit(3600L))))
      === "2023-11-14 23:13:20")
  }
}
