package graft.ext

import org.apache.spark.sql.Row

import graft.{SparkEntry, SparkSpec}

/** q_hybrid_rrf coverage beyond the DuckDB hash: the fused score is
  * recomputed from the emitted ranks (pinning the RRF formula), the
  * fusion genuinely draws from BOTH legs, and both-leg docs dominate
  * the ordering the way RRF is supposed to make them.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_hybrid_rrf fuses both legs and the score matches its ranks") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 20)

    def rankOf(r: Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))

    val parsed = rows.map(r =>
      (r.getLong(0), rankOf(r, 1), rankOf(r, 2), r.getDouble(3)))

    // the fused list must contain contributions from BOTH retrievers
    assert(parsed.exists(_._2.isDefined), "no lexical contribution")
    assert(parsed.exists(_._3.isDefined), "no semantic contribution")

    // score is exactly the RRF of the emitted ranks (k = 60)
    parsed.foreach { case (doc, rl, rs, rrf) =>
      val expected = rl.map(r => 1.0 / (r + 60).toDouble).getOrElse(0.0) +
        rs.map(r => 1.0 / (r + 60).toDouble).getOrElse(0.0)
      assert(java.lang.Double.doubleToLongBits(rrf) ===
        java.lang.Double.doubleToLongBits(expected), s"doc $doc")
      assert(rl.isDefined || rs.isDefined, s"doc $doc in neither leg")
      rl.foreach(r => assert(r >= 1 && r <= RetrievalQueries.FuseDepth))
      rs.foreach(r => assert(r >= 1 && r <= RetrievalQueries.FuseDepth))
    }

    // output is ordered by fused score desc (doc_id tie-break)
    val scores = parsed.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })

    // a doc found by both retrievers at rank r beats any doc found by
    // one retriever alone at the same rank — the consensus property
    // that makes RRF the production fusion
    for {
      (_, Some(rl), Some(rs), both) <- parsed
      (_, orl, ors, single) <- parsed
      if orl.isEmpty || ors.isEmpty
      r = orl.orElse(ors).get
      if r >= rl && r >= rs
    } assert(both > single)
  }

  test("q_hybrid_rrf_indexed: lex leg identical to full-scan; probes pruned") {
    val idx = SparkEntry.queries("q_hybrid_rrf_indexed")(spark, sf)
    val rows = idx.collect()

    // the lexical ranks must MATCH the full-scan variant's exactly
    // (InvertedIndex.probe is bit-identical to the scan) — only the
    // semantic leg may differ (IVF is approximate by design)
    val full = SparkEntry.queries("q_hybrid_rrf")(spark, sf).collect()
    def lexRanks(rs: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
      rs.flatMap(r => if (r.isNullAt(1)) None
        else Some(r.getLong(0) -> r.getLong(1))).toMap
    val fullLex = lexRanks(full)
    lexRanks(rows).foreach { case (doc, r) =>
      assert(fullLex.get(doc).forall(_ == r), s"doc $doc lex rank drift")
    }

    // the semantic leg's index scan is statically partition-pruned to
    // the probed buckets (PartitionFilters on the hive layout)
    val prunedScan = fileScans(idx).find(_._1.contains("graft_hybrid_vec_index"))
    assert(prunedScan.isDefined, fileScans(idx).mkString("\n"))
    assert(prunedScan.get._2.contains("bucket"),
      s"no bucket partition filter: ${prunedScan.get}")
  }
}
