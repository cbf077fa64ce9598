package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  // distinct long documents (shingle sets far apart), plus
  // near-duplicates made by light token edits
  private val baseA = (1 to 60).map(i => s"alpha$i").mkString(" ")
  private val baseB = (1 to 60).map(i => s"beta$i").mkString(" ")
  private val baseC = (1 to 60).map(i => s"gamma$i").mkString(" ")
  private def perturb(t: String) = t.split(" ").updated(5, "CHANGED").mkString(" ")

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("near-dups are rejected across batches via the signature index") {
    val base = Files.createTempDirectory("inc_neardup").toString
    val idx = s"$base/idx"

    // batch 0: A and B admitted
    val a0 = IncrementalNearDup.processBatch(spark,
      docs((1L, baseA), (2L, baseB)), idx, batchId = 0L)
      .as[Long].collect().sorted.toSeq
    assert(a0 === Seq(1L, 2L))

    // batch 1: near-dup of A (rejected vs INDEX), fresh C (admitted),
    // in-batch near-dup pair (4 keeps, 5 drops)
    val a1 = IncrementalNearDup.processBatch(spark,
      docs((3L, perturb(baseA)), (4L, baseC), (5L, perturb(baseC))),
      idx, batchId = 1L)
      .as[Long].collect().sorted.toSeq
    assert(a1 === Seq(4L))

    // the index accumulated exactly the admitted docs
    val indexed = spark.read.option("basePath", s"$idx/sigs")
      .parquet(s"$idx/sigs").select("doc_id").as[Long].collect().sorted.toSeq
    assert(indexed === Seq(1L, 2L, 4L))
  }

  test("a retried batch converges (replay-idempotent index)") {
    val base = Files.createTempDirectory("inc_retry").toString
    val idx = s"$base/idx"
    IncrementalNearDup.processBatch(spark, docs((1L, baseA)), idx, 0L)

    val b1 = docs((2L, baseB), (3L, perturb(baseA)))
    val first = IncrementalNearDup.processBatch(spark, b1, idx, 1L)
      .as[Long].collect().sorted.toSeq
    val retry = IncrementalNearDup.processBatch(spark, b1, idx, 1L)
      .as[Long].collect().sorted.toSeq
    assert(first === Seq(2L))
    assert(retry === first) // own half-written partition excluded

    val indexed = spark.read.option("basePath", s"$idx/sigs")
      .parquet(s"$idx/sigs").select("doc_id").as[Long].collect().sorted.toSeq
    assert(indexed === Seq(1L, 2L)) // no duplicated index rows
  }

  test("file-stream form admits one keeper per near-dup family") {
    val base = Files.createTempDirectory("inc_stream").toString
    val (src, idx, out) = (s"$base/src", s"$base/idx", s"$base/out")
    docs((1L, baseA), (2L, baseB)).write.parquet(src)
    docs((3L, perturb(baseB)), (4L, baseC)).coalesce(1)
      .write.mode("append").parquet(src)

    val q = IncrementalNearDup.start(spark, src, idx, out)
    q.awaitTermination(120000)

    val admitted = spark.read.option("basePath", out).parquet(out)
      .select("doc_id").as[Long].collect().toSet
    // exactly one of {2,3} (whichever file arrived first), plus 1 and 4
    assert(admitted.contains(1L) && admitted.contains(4L))
    assert(admitted.intersect(Set(2L, 3L)).size === 1)
    assert(admitted.size === 3)
  }
}
