package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges many small files without changing the data") {
    val dir = Files.createTempDirectory("compact").toString + "/events"
    // simulate 20 micro-batch appends => 20+ small files
    val df = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    df.repartition(20).write.parquet(dir)
    val before = Compaction.dataFileCount(spark, dir)
    assert(before >= 20)
    val checksum = spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).first()

    val after = Compaction.compact(spark, dir, targetBytes = 1L << 30)

    assert(after === 1) // tiny data, one target file
    assert(Compaction.dataFileCount(spark, dir) === 1)
    assert(spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).first() === checksum)
  }

  test("compaction plan has no shuffle (coalesce, not repartition)") {
    val dir = Files.createTempDirectory("compact2").toString + "/t"
    (1 to 100).toDF("id").repartition(8).write.parquet(dir)
    val plan = spark.read.parquet(dir).coalesce(1)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Coalesce"), plan)
  }
}
