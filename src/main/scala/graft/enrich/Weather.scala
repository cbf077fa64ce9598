package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WeatherFlow's enrichment semantics re-expressed as codegen-friendly
  * `Column` functions (no UDFs — everything stays inside whole-stage
  * codegen). Reference citations are into `/root/reference/`.
  *
  * All datetime math assumes `spark.sql.session.timeZone=UTC`, which
  * reproduces the reference's epoch+offset local-time trick
  * (dags/etl.py:30-32) deterministically.
  */
object Weather {

  /** Epoch seconds + station UTC-offset seconds -> "local" timestamp.
    * Reference: dags/etl.py:30-32 (`datetime.fromtimestamp(ts + timezone)`).
    */
  def localTs(epochSec: Column, tzOffsetSec: Column): Column =
    timestamp_seconds(epochSec + tzOffsetSec)

  /** Month -> "Q1".."Q4". Reference: dags/etl.py:36-44 (if/elif chain);
    * identical to `concat("Q", quarter)`. */
  def quarterLabel(ts: Column): Column =
    concat(lit("Q"), quarter(ts).cast("string"))

  /** Meteorological season. Reference: dags/etl.py:46-53. */
  def seasonLabel(ts: Column): Column = {
    val m = month(ts)
    when(m.between(3, 5), "Spring")
      .when(m.between(6, 8), "Summer")
      .when(m.between(9, 11), "Fall")
      .otherwise("Winter")
  }

  /** strftime("%A") -> "Saturday". Reference: dags/etl.py:55. */
  def weekdayName(ts: Column): Column = date_format(ts, "EEEE")

  /** strftime("%B") -> "November". Reference: dags/etl.py:56. */
  def monthName(ts: Column): Column = date_format(ts, "MMMM")

  /** strftime('%Y-%m-%d'). Reference: dags/etl.py:63. */
  def dateStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** strftime('%Y-%m-%d %H:%M:%S'). Reference: dags/etl.py:64-66. */
  def datetimeStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH:mm:ss")

  /** Daylight duration in whole minutes, reproducing Python
    * `(sunset - sunrise).seconds // 60` (dags/etl.py:59-60) exactly:
    * `.seconds` is the non-negative sub-day component of the timedelta,
    * so a negative difference (sunset < sunrise: polar/bad data) yields
    * the positive remainder — `pmod` gives identical semantics.
    */
  def daylightMinutes(sunriseEpoch: Column, sunsetEpoch: Column): Column =
    floor(pmod(sunsetEpoch - sunriseEpoch, lit(86400L)) / lit(60)).cast("long")

  /** 2-decimal rounding, half toward +inf, computed entirely in IEEE
    * double math: `floor(x*100 + 0.5) / 100`. Spark's `round()` goes
    * through BigDecimal HALF_UP while DuckDB rounds the raw double —
    * they disagree on half-way doubles, so oracle-checked outputs use
    * this explicit formula, which is bit-identical on any engine that
    * evaluates the same double expression tree. */
  def round2(x: Column): Column = floor(x * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Dew-point approximation, unrounded. Reference: dags/etl.py:78. */
  def dewPointRaw(tempC: Column, humidity: Column): Column =
    tempC - ((lit(100) - humidity) / lit(5))

  /** Dew point with the reference's `round(x, 2)`. */
  def dewPoint(tempC: Column, humidity: Column): Column =
    round2(dewPointRaw(tempC, humidity))

  /** Celsius -> Fahrenheit (transient, feeds heat index).
    * Reference: dags/etl.py:80. */
  def tempF(tempC: Column): Column = (tempC * lit(1.8)) + lit(32)

  /** Simplified Steadman heat index in Fahrenheit.
    * Reference: dags/etl.py:81. */
  def heatIndexF(tempC: Column, humidity: Column): Column = {
    val tF = tempF(tempC)
    lit(0.5) * (tF + lit(61.0) + ((tF - lit(68.0)) * lit(1.2)) + (humidity * lit(0.094)))
  }

  /** Heat index converted back to Celsius, unrounded.
    * Reference: dags/etl.py:82. */
  def heatIndexCRaw(tempC: Column, humidity: Column): Column =
    ((heatIndexF(tempC, humidity) - lit(32)) * lit(5)) / lit(9)

  /** Heat index (C) with the reference's `round(x, 2)`. */
  def heatIndexC(tempC: Column, humidity: Column): Column =
    round2(heatIndexCRaw(tempC, humidity))
}
