package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Behavioral invariants of the round-4 pipeline operators: sequence
  * packing (token-budget slicing of the shard token stream) and
  * temperature domain resampling.
  */
class PipelineOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables(spark, sf, "documents")

  test("packSequences: offsets stay inside the budget and tile the stream") {
    val seqLen = 512
    val packed = PipelineOps.packSequences(docs, seqLen).persist()
    try {
      assert(packed.count() === docs.count())
      // every offset is a valid in-sequence position
      assert(packed.filter(col("seq_offset") < 0 ||
        col("seq_offset") >= seqLen).count() === 0L)
      // the packing is gapless: reconstructing each doc's global start
      // position (seq_id * seqLen + seq_offset) and adding its tokens
      // must land exactly on the next doc's start, per shard
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("start")
      val gaps = packed
        .withColumn("start", col("seq_id") * seqLen + col("seq_offset"))
        .withColumn("next_start", lead("start", 1).over(w))
        .filter(col("next_start").isNotNull &&
          col("next_start") =!= col("start") + col("n_tokens"))
      assert(gaps.count() === 0L)
    } finally packed.unpersist()
  }

  test("packSequences: every shard's token total matches its last boundary") {
    val packed = PipelineOps.packSequences(docs, 512)
    val bad = packed.groupBy("shard")
      .agg(sum("n_tokens").as("total"),
        max(col("seq_id") * 512 + col("seq_offset") + col("n_tokens"))
          .as("end"))
      .filter(col("total") =!= col("end"))
    assert(bad.count() === 0L)
  }

  test("connectedComponents: pointer jumping resolves a 1024-link chain in O(log n) rounds") {
    import spark.implicits._
    // the adversarial shape for plain min-label propagation: a path
    // 0-1-2-…-1024 has diameter 1024, so one-hop propagation needs
    // 1024 rounds (and would trip any sane runaway guard); pointer
    // jumping doubles covered distance per round
    val n = 1024
    val nodes = (0L to n.toLong).toDF("id")
    val edges = (0L until n.toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = PipelineOps.connectedComponents(nodes, edges)
    assert(labels.filter(col("cluster") =!= 0L).count() === 0L,
      "every node on the path must resolve to the minimum id 0")
    val rounds = PipelineOps.lastIterations.get()
    info(s"1024-link chain converged in $rounds rounds")
    assert(rounds <= 15, s"expected O(log n) ~ 11 rounds, got $rounds")
  }

  test("connectedComponents: disjoint clusters + singletons label correctly") {
    import spark.implicits._
    // two components {0,1,2}, {10,11}, singleton {20}
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (0L, 1L), (11L, 10L)).toDF("src", "dst")
    val got = PipelineOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("temperatureMix: smallest domain keeps everything, rates flatten the skew") {
    val mix = PipelineOps.temperatureMix(docs, "lang").collect()
    val byN = mix.sortBy(_.getAs[Long]("n_docs"))
    // the smallest domain's threshold is exactly 1e6 — keep rate 1.0
    assert(byN.head.getAs[Long]("keep_threshold") === 1000000L)
    // thresholds are monotone non-increasing in domain size: bigger
    // domains are cut harder (that IS the flattening)
    byN.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(0).getAs[Long]("keep_threshold") >=
        p(1).getAs[Long]("keep_threshold"))
    }
    // admission never exceeds the domain size
    mix.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("temperatureMix: admission is deterministic across runs") {
    val a = PipelineOps.temperatureMix(docs, "lang").collect().toSeq
    val b = PipelineOps.temperatureMix(docs, "lang").collect().toSeq
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted)
  }
}
