package graft.ext

import graft.SparkSpec

/** The phash pigeonhole blocking's recall/cost frontier, measured the
  * way the LSH frontier is (AnnRecallSpec): vary the block count and
  * the Hamming radius over the EXACT production fingerprints
  * (FingerprintQueries.phashFps) and log, per point, the recall of
  * true pairs and the fraction of all-pairs the blocking probes. The
  * pigeonhole guarantee — B blocks catch EVERY pair within Hamming
  * B-1 — is asserted exactly, not sampled.
  */
class PhashFrontierSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // the production 64-bit fingerprints, reassembled from the two
  // 32-bit halves (bit 63 lands in the Long sign bit — fine for the
  // xor/popcount arithmetic below, exactly as the query's bit_count
  // over halves computes it)
  private lazy val fps: Array[(Long, Long)] =
    FingerprintQueries.phashFps(spark, sf)
      .select("doc_id", "f_lo", "f_hi").as[(Long, Long, Long)]
      .collect().map { case (id, lo, hi) => (id, lo | (hi << 32)) }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  /** Ordered-pair set caught by B pigeonhole blocks (≥1 equal block). */
  private def blockedPairs(nBlocks: Int): Set[(Long, Long)] = {
    val width = (64 + nBlocks - 1) / nBlocks
    val byBlock = scala.collection.mutable.Map
      .empty[(Int, Long), List[(Long, Long)]].withDefaultValue(Nil)
    fps.foreach { case (id, fp) =>
      var j = 0
      while (j * width < 64) {
        val lo = j * width
        val w = math.min(width, 64 - lo)
        val v = (fp >>> lo) & (if (w == 64) -1L else (1L << w) - 1)
        byBlock((j, v)) = (id, fp) :: byBlock((j, v))
        j += 1
      }
    }
    byBlock.values.flatMap { bucket =>
      for {
        (a, _) <- bucket
        (b, _) <- bucket
        if a < b
      } yield (a, b)
    }.toSet
  }

  test("phash (blocks, radius) frontier: pigeonhole recall is exact, cost is the dial") {
    val allPairs = fps.length.toLong * (fps.length - 1) / 2
    def truth(maxH: Int): Set[(Long, Long)] = (for {
      i <- fps.indices
      j <- (i + 1) until fps.length
      if hamming(fps(i)._2, fps(j)._2) <= maxH
    } yield {
      val (a, b) = (fps(i)._1, fps(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet

    val radii = Seq(1, 4, 7)
    val truths = radii.map(h => h -> truth(h)).toMap
    radii.foreach(h => assert(truths(h).nonEmpty, s"no true pairs at H<=$h"))

    val frontier = for (b <- Seq(2, 3, 5, 8)) yield {
      val cand = blockedPairs(b)
      val cost = cand.size.toDouble / allPairs
      val recalls = radii.map { h =>
        val t = truths(h)
        h -> t.intersect(cand).size.toDouble / t.size
      }
      info(f"B=$b: cost ${cost * 100}%.1f%% of all-pairs, " +
        recalls.map { case (h, r) => f"recall@H<=$h $r%.3f" }.mkString(", "))
      (b, cost, recalls.toMap)
    }

    // the pigeonhole GUARANTEE: B blocks catch every pair at Hamming
    // <= B-1 — recall exactly 1.0, not approximately
    frontier.foreach { case (b, _, recalls) =>
      radii.filter(_ <= b - 1).foreach { h =>
        assert(recalls(h) == 1.0, s"pigeonhole broken at B=$b, H<=$h")
      }
    }
    // the production point (B=5, H<=4) is lossless AND probes a small
    // fraction of all-pairs — the reason the operator is an equi-join,
    // not an all-pairs scan
    val (_, cost5, recalls5) = frontier.find(_._1 == 5).get
    assert(recalls5(4) == 1.0)
    assert(cost5 <= 0.25, f"B=5 probes ${cost5 * 100}%.1f%% of all-pairs")
    // more blocks widen the caught radius but probe more pairs:
    // candidate cost must be monotone in B (coarser blocks collide
    // more per block but there are fewer of them — the dial the
    // operator exposes)
    frontier.sliding(2).foreach { case Seq((b1, c1, _), (b2, c2, _)) =>
      assert(c2 >= c1 - 1e-12, f"cost fell from B=$b1 ($c1%.4f) to B=$b2 ($c2%.4f)")
    }
  }
}
