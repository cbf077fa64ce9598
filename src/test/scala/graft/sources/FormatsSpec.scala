package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source/sink format coverage beyond parquet: CSV and JSON round-trip
  * with explicit schemas (never inference in production paths —
  * SURVEY.md §1.3), plus partitioned writes.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, "2024-01-01"),
    (2L, "beta", -2.25, "2024-01-02"),
    (3L, "with,comma \"quoted\"", 0.0, "2024-01-02")
  ).toDF("id", "name", "score", "day")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("day", StringType)))

  test("CSV round-trip with explicit schema, header, quoting") {
    val dir = Files.createTempDirectory("csv_rt").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().toSeq === sample.orderBy("id").collect().toSeq)
  }

  test("JSON lines round-trip with explicit schema") {
    val dir = Files.createTempDirectory("json_rt").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy("id").collect().toSeq === sample.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet write prunes on the partition column") {
    val dir = Files.createTempDirectory("part_rt").toString
    sample.write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    assert(pruned.count() === 2)
    // partition pruning is visible in the scan's partition filters
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("day"), scan)
  }
}
