package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Malformed-input handling — the ingestion-side data-quality surface
  * a large pipeline needs: quarantine (PERMISSIVE + corrupt-record
  * column), silent drop (DROPMALFORMED), and hard fail (FAILFAST).
  */
class CorruptRecordsSpec extends SparkSpec {

  private def writeJsonl(): String = {
    val dir = Files.createTempDirectory("corrupt_json").toString
    Files.writeString(Paths.get(s"$dir/part-0.json"),
      """{"id": 1, "text": "good one"}
        |{"id": 2 "text": "missing comma"}
        |{"id": 3, "text": "another good"}
        |not json at all
        |""".stripMargin)
    dir
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType),
    StructField("_corrupt", StringType)))

  test("PERMISSIVE quarantines malformed rows into the corrupt column") {
    val dir = writeJsonl()
    // caching first is Spark's documented pattern: queries touching
    // ONLY the corrupt column on a raw file scan are disallowed
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .cache()
    val good = df.filter(col("_corrupt").isNull)
    val bad = df.filter(col("_corrupt").isNotNull)
    assert(good.count() === 2)
    assert(bad.count() === 2) // quarantined, not lost
    assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("DROPMALFORMED silently drops bad rows") {
    val df = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "DROPMALFORMED")
      .json(writeJsonl())
    assert(df.count() === 2)
  }

  test("FAILFAST throws on the first malformed row") {
    val df = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "FAILFAST")
      .json(writeJsonl())
    intercept[SparkException] { df.collect() }
  }
}
