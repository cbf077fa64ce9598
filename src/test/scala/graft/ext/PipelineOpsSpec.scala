package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

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

  test("q_leakage_split: no duplicate group straddles splits; all docs land") {
    import graft.SparkEntry
    // rebuild the query's own planted-twin corpus at DOC level (the
    // query aggregates, so the invariant must be checked underneath):
    // every content_hash maps to exactly one split — the twin pairs
    // (doc, upper twin) are the adversarial case, sharing a hash by
    // construction
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 500000).as("doc_id"), upper(col("text")).as("text"),
      col("lang"), col("source"), col("n_chars")))
    val h = md5(concat(lit("split:"),
      md5(DedupFunctions.normText(col("text")).cast("binary"))).cast("binary"))
    val assigned = corpus.select(
      md5(DedupFunctions.normText(col("text")).cast("binary"))
        .as("content_hash"),
      when(h < "cc", "train").when(h < "e6", "val")
        .otherwise("test").as("split"))
    val straddlers = assigned.groupBy("content_hash")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1)
    assert(straddlers.count() === 0L)

    val agg = SparkEntry.queries("q_leakage_split")(spark, sf)
      .collect().map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs"))
      .toMap
    // every doc lands in exactly one split (the CASE is total)
    assert(agg.values.sum === corpus.count())
    // the 80/10/10 thresholds actually produce a dominant train split
    assert(agg("train") > agg.getOrElse("val", 0L) &&
      agg("train") > agg.getOrElse("test", 0L))
  }

  test("q_canonical_docs: keeps the argmax-quality copy of every group") {
    import graft.SparkEntry
    val out = SparkEntry.queries("q_canonical_docs")(spark, sf).persist()
    try {
      val rows = out.collect()
      // one canonical doc per group, groups cover the planted corpus
      assert(rows.map(_.getAs[String]("content_hash")).distinct.length ===
        rows.length)
      assert(rows.map(_.getAs[Long]("n_copies")).sum === docs.count() * 2)
      // planted upper-case twins lower the stopword term, so the
      // canonical copy is never drawn from the twin id range unless
      // quality ties (then min doc_id wins — also the original)
      assert(rows.forall(_.getAs[Long]("canonical_doc_id") < 500000L))
    } finally out.unpersist()
  }

  test("q_curation_funnel: monotone stages, exact stage independently recomputed") {
    val row = graft.SparkEntry.queries("q_curation_funnel")(spark, sf).head()
    val Seq(nRaw, nExact, nNearDup, nClean, nFinal) =
      Seq("n_raw", "n_exact", "n_neardup", "n_clean", "n_final")
        .map(row.getAs[Long])
    // the funnel only ever narrows, and no stage may drain it
    assert(nRaw >= nExact && nExact >= nNearDup &&
      nNearDup >= nClean && nClean >= nFinal,
      s"non-monotone funnel: $nRaw/$nExact/$nNearDup/$nClean/$nFinal")
    assert(nFinal > 0L, "funnel drained to zero — degenerate fixture")
    // stage-1/2 parity from first principles: raw corpus size and the
    // distinct normalized-content-hash count of docs >= 10
    val corpus = docs.filter(col("doc_id") >= 10)
    assert(nRaw === corpus.count())
    val distinctHashes = corpus
      .select(md5(DedupFunctions.normText(col("text")).cast("binary"))
        .as("h"))
      .distinct().count()
    assert(nExact === distinctHashes,
      s"exact-keeper count $nExact vs $distinctHashes distinct hashes")
  }

  test("q_importance_weights: shortlist enriches the target domain") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_importance_weights")(spark, sf)
      .collect()
    assert(out.length === 50)
    out.foreach { r =>
      val (nTok, score, norm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTok > 0L && score > 0L)
      assert(norm === score / nTok, s"norm identity broken: $r")
    }
    // the point of importance weighting: the top-50 must hold a higher
    // share of lang='en' (the target domain) than the corpus baseline
    val docs = graft.Tables(spark, sf, "documents")
    val corpusShare = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val topShare = out.count(_.getString(1) == "en").toDouble / out.length
    assert(topShare > corpusShare,
      s"no enrichment: top-50 en share $topShare vs corpus $corpusShare")
    // deterministic: the collected-weights literal must not wobble
    val again = SparkEntry.queries("q_importance_weights")(spark, sf)
      .collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
