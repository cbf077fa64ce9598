package graft.ext

import graft.{SparkEntry, SparkSpec}

/** Recall of the approximate ANN paths against the brute-force truth
  * (`q_ann_cosine_topk`) on the same fixture — the quality metric the
  * hash-equality oracle can't express: the oracle proves each
  * approximate query computes ITS OWN definition exactly; this spec
  * measures how close that definition gets to the exact answer.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def neighbors(q: String): Map[Long, Set[Long]] =
    SparkEntry.queries(q)(spark, sf)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def meanRecall(approx: String): Double = {
    val truth = neighbors("q_ann_cosine_topk")
    val got = neighbors(approx)
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test("IVF (nprobe=2 of 16, Lloyd-trained) recall@5 clears its floor") {
    val r = meanRecall("q_ann_ivf")
    // Measured ceiling, not a tuning gap: this synthetic corpus is
    // ISOTROPIC (mean pairwise cosine ~ -0.0003 within AND across
    // labels, max ~ 0.48), so recall at fixed nprobe is bound by the
    // ~12% corpus coverage 2-of-16 buckets give — training moved
    // recall 0.83 -> 0.78 at identical cost while balancing cluster
    // sizes (min/max 20/42 -> 25/42), which is the property that
    // matters at 100 TB (no hot bucket => no skewed partition). On a
    // genuinely clustered corpus the same training raises recall; the
    // honest quality dial HERE is nprobe, exercised by the oracle at
    // nprobe=2 for determinism.
    info(f"IVF (Lloyd iters=2) mean recall@5 = $r%.3f")
    assert(r >= 0.75, f"recall $r%.3f")
  }

  test("q_ann_recall monitor agrees with the spec-side recall measurement") {
    // the in-engine monitor must report EXACTLY the overlap the two
    // published queries imply — no off-by-one on zero-hit queries, no
    // tie-handling drift between the exact and served legs
    val truth = neighbors("q_ann_cosine_topk")
    val served = neighbors("q_ann_ivf")
    val monitor = SparkEntry.queries("q_ann_recall")(spark, sf)
      .select("q_id", "hits", "n_truth", "recall_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(monitor.length === truth.size, "monitor dropped a query id")
    monitor.foreach { case (q, hits, nTruth, bp) =>
      val expect = served.getOrElse(q, Set.empty)
        .intersect(truth(q)).size.toLong
      assert(hits === expect, s"query $q: monitor says $hits, spec $expect")
      assert(nTruth === truth(q).size.toLong,
        s"query $q: denominator $nTruth vs exact-set size ${truth(q).size}")
      assert(bp === hits * 10000L / nTruth, s"query $q: bp $bp")
    }
  }

  test("IVF nprobe dial: recall rises monotonically with probed buckets") {
    val truth = neighbors("q_ann_cosine_topk")
    def recallAt(nprobe: Int): Double = {
      val got = SimilarityQueries.ivfTopK(spark, sf, nprobe)
        .select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    val curve = Seq(2, 4, 8, 16).map(np => np -> recallAt(np))
    info(curve.map { case (np, r) => f"nprobe=$np%2d -> $r%.3f" }
      .mkString("IVF recall curve: ", ", ", ""))
    // the dial works: recall never decreases as coverage grows, and
    // probing everything recovers the exact answer (IVF with
    // nprobe=nlist IS brute force — a hard correctness anchor)
    curve.sliding(2).foreach { case Seq((_, a), (np, b)) =>
      assert(b >= a - 1e-9, f"recall fell at nprobe=$np: $a%.3f -> $b%.3f")
    }
    assert(curve.last._2 >= 0.999, f"nprobe=nlist recall ${curve.last._2}%.3f")
    val at8 = curve.find(_._1 == 8).get._2 // already measured above
    assert(at8 >= 0.85, f"nprobe=8 recall $at8%.3f")
  }

  test("OR-amplified multi-table LSH recall@5 clears its floor, at a bounded probe cost") {
    val r = meanRecall("q_ann_lsh")
    // the cost side of the recall/cost dial: candidates actually
    // scored per query, as a fraction of the corpus a brute-force
    // query would touch
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count() - 1
    val cands = SimilarityQueries.lshCandidates(spark, sf).count()
    val frac = cands.toDouble / (20.0 * corpus)
    info(f"LSH mean recall@5 = $r%.3f (L=${Similarity.LshTables}, " +
      f"Hamming<=2 probes; candidates/query = ${cands / 20}, " +
      f"${frac * 100}%.1f%% of corpus)")
    assert(r >= 0.7, f"recall $r%.3f")
    assert(frac <= 0.8, f"candidate fraction $frac%.3f")
  }

  test("LSH (tables, radius) frontier: OR-amplification buys real recall") {
    val truth = neighbors("q_ann_cosine_topk")
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count() - 1
    def point(tables: Int, radius: Int): (Double, Double) = {
      val got = SimilarityQueries.lshTopK(spark, sf, tables, radius)
        .select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      val cost = SimilarityQueries.lshCandidates(spark, sf, tables, radius)
        .count().toDouble / (20.0 * corpus)
      (per.sum / per.size, cost)
    }
    val frontier = Seq((1, 2), (2, 2), (4, 1), (4, 2))
      .map { case (l, h) => (l, h, point(l, h)) }
    info(frontier.map { case (l, h, (r, c)) =>
      f"(L=$l,H<=$h) -> recall $r%.2f @ ${c * 100}%.0f%% corpus" }
      .mkString("LSH frontier: ", ", ", ""))
    // more tables at fixed radius must never lose recall (candidate
    // sets are supersets) — the OR-amplification claim, tested
    val byTables = frontier.filter(_._2 == 2).map { case (l, _, (r, _)) => (l, r) }
    byTables.sliding(2).foreach { case Seq((_, a), (l, b)) =>
      assert(b >= a - 1e-9, f"recall fell adding tables at L=$l: $a%.3f -> $b%.3f")
    }
  }

  test("int8 quantize + exact re-rank is near-lossless") {
    val r = meanRecall("q_ann_sq8_rerank")
    info(f"SQ8+rerank mean recall@5 = $r%.3f")
    assert(r >= 0.9, f"recall $r%.3f")
  }

  test("IVF-PQ composed recall@5 clears its floor") {
    val r = meanRecall("q_ann_ivfpq")
    // the composed index pays BOTH approximations: IVF's ~12% corpus
    // coverage (nprobe=2 of 16) caps it like q_ann_ivf, and PQ-ADC
    // ordering inside the probed buckets loses more on this isotropic
    // corpus. The floor pins the composition above the random baseline
    // within the probed coverage; the real claims are the anchors
    // below (each stage degenerates to its single-stage twin)
    info(f"IVF-PQ (nprobe=2, m=8) mean recall@5 = $r%.3f")
    assert(r >= 0.3, f"recall $r%.3f")
  }

  test("IVF-PQ with nprobe=nlist degenerates to pure PQ — composition anchor") {
    // probing every bucket makes the IVF stage a no-op (all candidates
    // survive), so the ADC ordering — same codebooks, same tie-breaks —
    // must reproduce q_ann_pq row for row
    val full = SimilarityQueries.ivfPqTopK(spark, sf, nprobe = 16)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().toSet
    val pq = SparkEntry.queries("q_ann_pq")(spark, sf)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().toSet
    assert(full == pq, s"ivfpq(nprobe=nlist) diverged from pq: " +
      s"${(full -- pq).take(3)} vs ${(pq -- full).take(3)}")
  }

  test("PQ-ADC + exact re-rank recall@5 clears its floor") {
    val r = meanRecall("q_ann_pq")
    // 64 doubles -> 8 codeword nibbles is a 128x compression; the ADC
    // top-20 then exact re-rank keeps over half of the true top-5 ON
    // THIS ISOTROPIC CORPUS (the same property that caps IVF recall —
    // quantization cells carry little signal when vectors are nearly
    // orthogonal; m=8 measured 0.59 vs 0.47 at m=4, and a second
    // Lloyd round moved it -0.02, so m is the live dial). The floor
    // pins that the codebooks beat the random-candidate baseline
    // (top-20 of 49 ~ 0.41 recall) by a wide margin
    info(f"PQ(m=8,k=16)+rerank mean recall@5 = $r%.3f")
    assert(r >= 0.5, f"recall $r%.3f")
  }
}
