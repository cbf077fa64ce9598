package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomSketch

class BloomDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom probe has no false negatives over the sketched keys") {
    val keys = (0L until 1000L).toDF("k").select(xxhash64(col("k")).as("h"))
    val bloom = keys.agg(BloomSketch.bloomAgg(col("h"), 10000L, 1L << 16))
      .head().getAs[Array[Byte]](0)
    val misses = keys
      .filter(!BloomSketch.mightContain(lit(bloom), col("h"))).count()
    assert(misses === 0L)
  }

  test("bloom probe rejects the bulk of unseen keys (sketch is selective)") {
    val keys = (0L until 1000L).toDF("k").select(xxhash64(col("k")).as("h"))
    val bloom = keys.agg(BloomSketch.bloomAgg(col("h"), 10000L, 1L << 16))
      .head().getAs[Array[Byte]](0)
    val unseen = (100000L until 101000L).toDF("k")
      .select(xxhash64(col("k")).as("h"))
    val falsePositives = unseen
      .filter(BloomSketch.mightContain(lit(bloom), col("h"))).count()
    // 64K bits / 1K keys => fp rate well under 1%
    assert(falsePositives < 20L, s"$falsePositives of 1000 unseen passed")
  }

  test("q_bloom_delta: result identical to the plain anti-join") {
    val viaBloom = graft.SparkEntry.queries("q_bloom_delta")(spark, sf)
      .as[(Long, String)].collect().sorted
    val docs = graft.Tables(spark, sf, "documents")
    val hash = md5(DedupFunctions.normText(col("text")).cast("binary"))
    val prev = docs.filter(col("doc_id") % 10 < 3)
      .select(hash.as("content_hash"))
    val incoming = docs.filter(col("doc_id") % 10 >= 1)
      .unionByName(docs.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 600000).as("doc_id"),
          upper(col("text")).as("text"),
          col("lang"), col("source"), col("n_chars")))
    val plain = incoming.select(col("doc_id"), hash.as("content_hash"))
      .join(prev, Seq("content_hash"), "left_anti")
      .select("doc_id", "content_hash")
      .as[(Long, String)].collect().sorted
    assert(viaBloom === plain)
  }

  test("q_bloom_delta: only bloom-positives reach the anti-join") {
    val p = graft.SparkEntry.queries("q_bloom_delta")(spark, sf)
      .queryExecution.executedPlan.toString()
    // the exact-confirm anti-join exists (the optimizer may clone it
    // into both branches of the incoming union — PushdownLeftSemiAntiJoin)
    assert(p.contains("LeftAnti"), p)
    // the definitely-new branch short-circuits with the negated probe
    // and carries NO join above it
    assert(p.contains("NOT might_contain"), p)
    // every anti-join's streamed input is pre-filtered by the positive
    // probe: below each LeftAnti line, a might_contain filter appears
    // before any scan-level leaf ends the branch
    val lines = p.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("LeftAnti")).foreach {
      case (_, i) =>
        val below = lines.drop(i + 1).takeWhile(!_.contains("LeftAnti"))
        assert(below.exists(l =>
          l.contains("might_contain") && !l.contains("NOT might_contain")),
          s"anti-join at line $i lacks a positive bloom pre-filter")
    }
  }
}
