package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.VectorFunctions.asDouble

class VectorIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("materialized IVF index: partition-pruned probe matches the in-memory IVF query") {
    val dir = Files.createTempDirectory("ivf_index").toString + "/index"
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // the SAME Lloyd-trained centroids q_ann_ivf uses — bit-parity of
    // the materialized path depends on identical centroids
    val centroids = graft.ext.Similarity.trainedCentroids(emb, iters = 2)
    VectorIndex.build(emb, centroids, dir)

    // one hive partition per centroid bucket on disk
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(bucketDirs.length > 1 && bucketDirs.length <= 16, bucketDirs.toSeq)

    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val probed = VectorIndex.probe(spark, dir, queries, centroids,
      nprobe = 2, k = 5)

    // partition pruning is in the plan: the index scan carries a
    // PartitionFilters entry on the bucket column
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)

    // and the result matches the fully in-memory IVF formulation
    // (same centroids, same nprobe/k, same tiebreaks)
    val inMemory = graft.SparkEntry.queries("q_ann_ivf")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.toString)
    val fromIndex = probed.collect().map(_.toSeq).sortBy(_.toString)
    assert(fromIndex.toSeq === inMemory.toSeq)
  }
}
