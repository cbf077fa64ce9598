package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental micro-batch writes with dynamic partition overwrite —
  * the idempotent-rerun story at warehouse scale: a rerun of one
  * micro-batch rewrites ONLY the partitions it touches, leaving the
  * rest of the table intact (no read-modify-write of 100 TB).
  */
class IncrementalWriteSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partitionOverwriteMode rewrites only touched partitions") {
    val dir = Files.createTempDirectory("incr_write").toString
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 30.0))
        .toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(dir)

      // micro-batch rerun for d2 only, with corrected data
      Seq((3L, "d2", 33.0), (4L, "d2", 44.0)).toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(dir)

      val out = spark.read.parquet(dir).orderBy("id")
        .as[(Long, Double, String)].collect().toSeq
      // d1 untouched, d2 fully replaced
      assert(out === Seq((1L, 10.0, "d1"), (2L, 20.0, "d1"),
        (3L, 33.0, "d2"), (4L, 44.0, "d2")))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }
}
