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
}
