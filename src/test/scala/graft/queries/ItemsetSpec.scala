package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q_itemset_pairs / q_rfm_segments property coverage. The DuckDB
  * oracle hash-checks both queries' full results on the testdata;
  * these specs pin what the hash can't: prune-losslessness on a corpus
  * where the a-priori prune actually FIRES (every testdata brand is
  * frequent, so the gate alone never exercises a dropped item), and
  * the bucket invariants of the RFM quartiles.
  */
class ItemsetSpec extends SparkSpec {
  import spark.implicits._

  test("frequentPairs: a-priori prune fires and is lossless for top-k") {
    // 10 baskets; A and B co-occur in 8, C in 5, "rare" in exactly 1 —
    // below the 0.2 share floor, so the prune must drop it, and
    // dropping it must not change any pair that could reach top-k
    val rows =
      (1 to 8).flatMap(b => Seq((b.toLong, "A"), (b.toLong, "B"))) ++
        (4 to 8).map(b => (b.toLong, "C")) ++
        Seq((1L, "rare")) ++
        (9 to 10).map(b => (b.toLong, "A"))
    val items = rows.toDF("ok", "item")
    val baskets = (1 to 10).map(_.toLong).toDF("ok")

    // sanity: the fixture is non-degenerate — "rare" is below floor
    val sup = items.groupBy("item").count().as[(String, Long)].collect().toMap
    assert(sup("rare") < (0.2 * 10).toLong + 1)

    val pruned = AdvancedQueries.frequentPairs(items, baskets, 0.2, 5)
      .as[(String, String, Long)].collect().toSeq
    val brute = AdvancedQueries.frequentPairs(items, baskets, 0.0, 5)
      .as[(String, String, Long)].collect().toSeq
      .filterNot { case (a, b, _) => a == "rare" || b == "rare" }
    assert(pruned === brute)
    assert(pruned.head === (("A", "B", 8L)))
    assert(pruned.map(_._1) ++ pruned.map(_._2) contains "C")
    assert(!pruned.exists { case (a, b, _) => a == "rare" || b == "rare" })
  }

  test("q_rfm_segments: buckets partition customers near-evenly and " +
    "score is consistent") {
    val res = graft.SparkEntry.queries("q_rfm_segments")(
      spark, "/root/testdata/sf0.001")
      .select("custkey", "segment", "r_bucket", "f_bucket", "m_bucket", "rfm")
      .as[(Long, String, Int, Int, Int, Int)].collect()
    assert(res.nonEmpty)
    // every bucket value in 1..4 and the score is the positional code
    res.foreach { case (ck, _, r, f, m, s) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4, ck)
      assert(s === r * 100 + f * 10 + m, ck)
    }
    // within each segment, monetary quartiles are value-balanced: no
    // bucket holds more than half the segment (loose — ties can skew)
    res.groupBy(_._2).foreach { case (seg, xs) =>
      val byM = xs.groupBy(_._5).view.mapValues(_.size)
      assert(byM.keySet === Set(1, 2, 3, 4), s"$seg missing m-buckets: $byM")
      byM.foreach { case (b, n) =>
        assert(n <= xs.size / 2 + 1, s"$seg m-bucket $b holds $n/${xs.size}")
      }
    }
  }
}
