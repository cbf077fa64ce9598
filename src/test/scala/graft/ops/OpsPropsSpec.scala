package graft.ops

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property specs for the distributed order-statistic and ordered-fold
  * operators: randomized inputs (duplicates, ties, hot keys) checked
  * against straight single-threaded Scala models. Same pattern as
  * WeatherPropsSpec — ScalaCheck generators driven through one Spark
  * job (no scalatestplus bridge in the offline cache).
  */
class OpsPropsSpec extends SparkSpec {
  import spark.implicits._

  test("ExactRank.selectRanks picks exactly the sorted-order elements " +
    "for arbitrary multisets and rank sets") {
    // duplicates on purpose: a narrow value domain forces ties, the
    // case where the unique tiebreak column must keep ranks total
    val values = Gen.listOfN(700, Gen.chooseNum(-50L, 50L)).sample.get
    val df = values.zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")

    val got = ExactRank.selectRanks(
        df, Seq(col("v"), col("id")),
        n => Seq(lit(1L), ExactRank.lowerMedian(n),
          floor(n / lit(3)).cast("long") + lit(1L), n))
      .select(col("rank"), col("v"), col("n_total"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    val n = values.length.toLong
    val sortedVals = values.sorted
    val wantRanks = Seq(1L, (n - 1) / 2 + 1, n / 3 + 1, n).distinct.sorted
    assert(got.map(_._1).toSeq === wantRanks)
    got.foreach { case (k, v, total) =>
      assert(total === n)
      assert(v === sortedVals((k - 1).toInt),
        s"rank $k: got $v, sorted says ${sortedVals((k - 1).toInt)}")
    }
  }

  test("OrderedFold.emaByUser == the sequential recurrence for " +
    "arbitrary users, tied timestamps, and one hot key") {
    val alpha = 0.125
    val gen = Gen.zip(
      Gen.chooseNum(1L, 8L),                    // user
      Gen.chooseNum(1700000000L, 1700000600L),  // ts (ties likely)
      Gen.chooseNum(-1000, 1000))               // value ×0.25
    val base = Gen.listOfN(600, gen).sample.get
    // one hot user: 400 more rows on user 1 (the skew case the
    // operator exists for — O(1) task memory however hot the key)
    val hot = Gen.listOfN(400, gen).sample.get.map(r => (1L, r._2, r._3))
    val rows = (base ++ hot).zipWithIndex.map { case ((u, t, v), i) =>
      (u, t, i.toLong, v * 0.25)
    }

    val events = rows.toDF("user_id", "epoch", "event_id", "value")
      .select(col("user_id"), to_timestamp(from_unixtime(col("epoch"))).as("ts"),
        col("event_id"), col("value"))
    val got = OrderedFold.emaByUser(events, alpha)
      .select("user_id", "n_events", "ema")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // the single-threaded model: identical op chain, (ts, event_id) order
    val want = rows.groupBy(_._1).map { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val ema = ordered.tail.foldLeft(ordered.head) { (s, x) =>
        (1.0 - alpha) * s + alpha * x
      }
      u -> (ordered.length.toLong, ema)
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (u, (cnt, ema)) =>
      assert(got(u)._1 === cnt, s"user $u count")
      // bit-for-bit: same IEEE chain, no tolerance needed
      assert(java.lang.Double.doubleToLongBits(got(u)._2) ===
        java.lang.Double.doubleToLongBits(ema), s"user $u ema")
    }
  }

  test("ExactRank.prefixSum == the sequential running totals for " +
    "arbitrary multisets with heavy ties") {
    // narrow key domain → ties; unique id tiebreak keeps rows stable
    val gen = Gen.zip(Gen.chooseNum(-20L, 20L), Gen.chooseNum(-9L, 9L))
    val rows = Gen.listOfN(800, gen).sample.get.zipWithIndex
      .map { case ((v, x), i) => (v, i.toLong, x) }
    val df = rows.toDF("v", "id", "x")
    val got = ExactRank.prefixSum(df, Seq(col("v"), col("id")),
        Seq("cum" -> col("x"), "cnt" -> lit(1L)))
      .select("v", "id", "cum", "cnt")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // single-threaded model: same (v, id) total order
    var run = 0L
    var cnt = 0L
    val want = rows.sortBy(r => (r._1, r._2)).map { case (v, id, x) =>
      run += x; cnt += 1
      (v, id) -> (run, cnt)
    }.toMap
    assert(got === want)
  }

  test("CdcMerge == the sequential latest-wins replay for arbitrary " +
    "base/log mixes of upserts and deletes") {
    val keyGen = Gen.chooseNum(1L, 30L) // hot keys: many ops per key
    val base = (1L to 20L).map(k => (k, s"b$k"))
    val opsGen = Gen.zip(keyGen, Gen.oneOf("U", "D"))
    val log = Gen.listOfN(300, opsGen).sample.get.zipWithIndex.map {
      case ((k, op), i) => (k, if (op == "U") s"u$i" else "", op,
        (i + 1).toLong)
    }
    val got = graft.pipeline.CdcMerge(
        base.toDF("k", "payload"),
        log.toDF("k", "payload", "op", "seq"), keys = Seq("k"))
      .as[(Long, String)].collect().toMap
    // model: base seeds, replay in seq order, delete removes
    val state = scala.collection.mutable.Map(base.map {
      case (k, p) => k -> p
    }: _*)
    log.sortBy(_._4).foreach { case (k, p, op, _) =>
      if (op == "D") state.remove(k) else state(k) = p
    }
    assert(got === state.toMap)
  }

  test("PipelineOps.dbscanRoles == the sequential DBSCAN for random " +
    "sparse graphs at several minPts") {
    val n = 40L
    val edgeGen = Gen.zip(Gen.chooseNum(1L, n), Gen.chooseNum(1L, n))
    val rawEdges = Gen.listOfN(70, edgeGen).sample.get
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val nodes = (1L to n).toDF("id")
    val und = rawEdges.toDF("a", "b")
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val adj = rawEdges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    for (minPts <- Seq(1, 2, 3)) {
      val got = graft.ext.PipelineOps
        .dbscanRoles(nodes, edges, minPts)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // model: core by degree, clusters = BFS over core subgraph
      // labeled by min core id, border = min core-neighbor cluster
      val core = (1L to n).filter(adj(_).size >= minPts).toSet
      val cluster = scala.collection.mutable.Map[Long, Long]()
      core.toSeq.sorted.foreach { s =>
        if (!cluster.contains(s)) {
          var frontier = Set(s)
          while (frontier.nonEmpty) {
            frontier.foreach(cluster(_) = s)
            frontier = frontier.flatMap(adj(_))
              .filter(core).filterNot(cluster.contains)
          }
        }
      }
      val want = (1L to n).map { v =>
        if (core(v)) v -> ("core", cluster(v))
        else {
          val coreNbr = adj(v).filter(core)
          if (coreNbr.nonEmpty)
            v -> ("border", coreNbr.map(cluster).min)
          else v -> ("noise", -1L)
        }
      }.toMap
      assert(got === want, s"minPts=$minPts")
    }
  }
}
