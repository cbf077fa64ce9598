package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class EtlJobSpec extends SparkSpec {

  test("EtlJob runs source -> enrich -> star warehouse end-to-end") {
    val dir = Files.createTempDirectory("etl_job").toString
    val counts = EtlJob.run(spark, dir, stations = 3, ticks = 8, tzOffsetSec = 3600L)
    assert(counts("fact") === 24L)

    val fact = spark.read.parquet(s"$dir/fact")
    assert(fact.count() === 24)
    // every fact row resolves its dimensions (dims committed first)
    val resolved = fact
      .join(spark.read.parquet(s"$dir/time_dim"), "time_id")
      .join(spark.read.parquet(s"$dir/param_dim"), "parameter_id")
    assert(resolved.count() === 24)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/_BATCH_COMPLETE")))
  }

  test("EtlJob reruns are idempotent (same output, no duplicate facts)") {
    val dir = Files.createTempDirectory("etl_job_rerun").toString
    EtlJob.run(spark, dir, 2, 5, 0L)
    EtlJob.run(spark, dir, 2, 5, 0L) // simulated Airflow retry
    assert(spark.read.parquet(s"$dir/fact").count() === 10)
    // deterministic surrogate keys => rerun produces identical key sets
    val keys = spark.read.parquet(s"$dir/fact").select("record_id")
    assert(keys.distinct().count() === 10)
  }
}
