package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PipelineOps.dbscanRoles — the core/border/noise classification on a
  * crafted graph where every role is forced by construction (the
  * q_dbscan query proves scale shape + hash-match on real embeddings,
  * where the planted geometry only yields core and noise; this fixture
  * covers the branches real data can't reach).
  *
  * Fixture (minPts = 2), edges undirected:
  *
  *   1—2—3—4      chain: 2,3 have degree 2 → CORE, one cluster
  *                labeled min(2,3)=2; 1,4 have degree 1 but a core
  *                neighbor → BORDER in cluster 2
  *   5—6          isolated pair: both degree 1, no core anywhere →
  *                NOISE (the case plain connected components gets
  *                "wrong": CC would cluster {5,6})
  *   7            isolated node: degree 0 → NOISE
  *   8—9—10, 8—10 triangle: all degree 2 → all CORE, cluster 8
  */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  test("chain / pair / singleton / triangle roles, minPts=2") {
    val und = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain
      (5L, 6L), // isolated pair
      (8L, 9L), (9L, 10L), (8L, 10L) // triangle
    ).toDF("a", "b")
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val nodes = (1L to 10L).toDF("id")
    val got = PipelineOps.dbscanRoles(nodes, edges, minPts = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = Seq(
      (1L, "border", 2L),
      (2L, "core", 2L),
      (3L, "core", 2L),
      (4L, "border", 2L),
      (5L, "noise", -1L),
      (6L, "noise", -1L),
      (7L, "noise", -1L),
      (8L, "core", 8L),
      (9L, "core", 8L),
      (10L, "core", 8L))
    assert(got.toSeq === want)
  }

  test("minPts=3 demotes the chain to noise, keeps nothing but density") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val nodes = (1L to 4L).toDF("id")
    val got = PipelineOps.dbscanRoles(nodes, edges, minPts = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.forall { case (_, role, cl) => role == "noise" && cl == -1L })
  }
}
