package graft.enrich

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property specs: the daylight-minutes pmod expression must equal the
  * Python `timedelta(seconds=d).seconds // 60` model for ANY epoch pair
  * (SURVEY.md §7.4.1). Uses ScalaCheck generators driven through one
  * Spark job (no scalatestplus bridge in the offline cache).
  */
class WeatherPropsSpec extends SparkSpec {
  import spark.implicits._

  /** The Python model: timedelta .seconds is the non-negative sub-day
    * remainder; floordiv 60. */
  private def pythonModel(diffSec: Long): Long = {
    val subDay = ((diffSec % 86400) + 86400) % 86400
    subDay / 60
  }

  test("daylightMinutes == Python timedelta.seconds // 60 for arbitrary epochs") {
    val gen = Gen.zip(Gen.chooseNum(0L, 2000000000L), Gen.chooseNum(-200000L, 200000L))
    val pairs = Gen.listOfN(500, gen).sample.get :+ ((0L, 0L)) :+ ((0L, -1L)) :+ ((0L, 86400L))
    val rows = pairs.toDF("rise", "diff")
      .select(col("rise"), col("diff"),
        Weather.daylightMinutes(col("rise"), col("rise") + col("diff")).as("m"))
      .collect()
    assert(rows.length === pairs.length)
    rows.foreach { r =>
      assert(r.getLong(2) === pythonModel(r.getLong(1)),
        s"rise=${r.getLong(0)} diff=${r.getLong(1)}")
    }
  }
}
