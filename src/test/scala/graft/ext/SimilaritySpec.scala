package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._
  import VectorFunctions._

  test("dot product: sequential fold over zip_with") {
    val d = Seq(1).toDF("x").select(
      dot(array(lit(1.0), lit(2.0), lit(3.0)),
        array(lit(4.0), lit(5.0), lit(6.0))).as("d")).as[Double].head()
    assert(d === 32.0)
  }

  test("cosine: identical vectors -> 1.0, orthogonal -> 0.0, opposite -> -1.0") {
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      Seq(1).toDF("x").select(
        cosine(array(a.map(lit): _*), array(b.map(lit): _*)).as("c"))
        .as[Double].head()
    assert(math.abs(cos(Seq(1, 2, 3), Seq(1, 2, 3)) - 1.0) < 1e-12)
    assert(cos(Seq(1, 0), Seq(0, 1)) === 0.0)
    assert(math.abs(cos(Seq(1, 2), Seq(-1, -2)) + 1.0) < 1e-12)
  }

  test("asDouble casts float arrays for double math") {
    val d = Seq(Seq(1.5f, 2.5f)).toDF("v")
      .select(dot(asDouble(col("v")), asDouble(col("v"))).as("d"))
      .as[Double].head()
    assert(d === 1.5 * 1.5 + 2.5 * 2.5)
  }

  private val sf = "/root/testdata/sf0.001"

  test("near-dup LSH blocking still finds every planted pair") {
    val found = graft.SparkEntry.queries("q_embedding_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // planted = vec_id % 10 == 0 (nonzero norm) copied to id+1000000
    // with a 0.01 first-component nudge => cosine ~ 1 with its source
    val planted = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .filter(dot(col("v"), col("v")) > 0)
      .filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.nonEmpty)
    val missed = planted -- found
    assert(missed.isEmpty, s"planted pairs missed by the blocking: $missed")
  }

  test("LSH blocking is lossless vs the unblocked all-pairs join on this corpus") {
    val blocked = graft.SparkEntry.queries("q_embedding_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the pre-round-4 formulation: same planted union, same-label
    // ALL-pairs (the quadratic shape the blocking replaced) — ground
    // truth for what a >= 0.99 pair is
    val (all, _) = SimilarityQueries.neardupCandidates(spark, sf)
    val a = all.select(col("vec_id").as("id_a"), col("label").as("la"),
      col("v").as("v_a"))
    val b = all.select(col("vec_id").as("id_b"), col("label").as("lb"),
      col("v").as("v_b"))
    val unblocked = a.join(b, col("la") === col("lb") && col("id_a") < col("id_b"))
      .withColumn("sim", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked === unblocked,
      s"missed: ${unblocked -- blocked}; extra: ${blocked -- unblocked}")
  }

  test("build-once memo is bounded: overflow clears instead of growing") {
    // the shared mechanics every build-once artifact (training,
    // index layouts, warehouse) goes through — after MemoMaxEntries+1
    // distinct keys the memo must have shrunk, never exceeded the
    // cap, still returned the value it built, and be covered by the
    // registry's clearAll (the invariance-test hook)
    import graft.ops.BuildOnce
    val m = BuildOnce.memo[Int, Long]()
    val n = BuildOnce.MemoMaxEntries + 1
    val vals = (0 until n).map(i => BuildOnce.cached(m, i)(i.toLong))
    assert(vals.zipWithIndex.forall { case (v, i) => v == i.toLong })
    assert(m.size <= BuildOnce.MemoMaxEntries)
    assert(m.size < n) // the clear actually fired
    BuildOnce.clearAll()
    assert(m.isEmpty) // registered: the test hook resets it
  }

  test("near-dup candidates are an equi-join on (label, bucket), never label alone") {
    val (_, cand) = SimilarityQueries.neardupCandidates(spark, sf)
    val joinConds = cand.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
    }
    val labelJoins = joinConds.filter(_.contains("label"))
    assert(labelJoins.nonEmpty, joinConds.mkString("\n"))
    // every join that touches label also carries the sign-bucket key —
    // the all-pairs-within-a-label shape is gone
    labelJoins.foreach(c => assert(c.contains("bucket"), c))
  }
}
