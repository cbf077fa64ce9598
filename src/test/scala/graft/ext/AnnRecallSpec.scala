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

  test("IVF (nprobe=2 of 16) recall@5 clears its floor") {
    val r = meanRecall("q_ann_ivf")
    info(f"IVF mean recall@5 = $r%.3f")
    assert(r >= 0.55, f"recall $r%.3f")
  }

  test("hyperplane-LSH bucketed recall@5 clears its floor") {
    val r = meanRecall("q_ann_lsh")
    info(f"LSH mean recall@5 = $r%.3f")
    assert(r >= 0.3, f"recall $r%.3f")
  }

  test("int8 quantize + exact re-rank is near-lossless") {
    val r = meanRecall("q_ann_sq8_rerank")
    info(f"SQ8+rerank mean recall@5 = $r%.3f")
    assert(r >= 0.9, f"recall $r%.3f")
  }
}
