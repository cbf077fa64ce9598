package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextFunctions

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch candidates are a superset of true heavy hitters") {
    // 3 hot tokens + 5000-token long tail, vocab >> k so the sketch
    // must actually evict (decrement) counters
    val hot = Seq.fill(2000)("alpha") ++ Seq.fill(1500)("beta") ++
      Seq.fill(900)("gamma")
    val tail = (0 until 5000).map(i => s"tail_$i")
    val tokens = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(hot ++ tail), 8).toDF("token")

    val row = tokens
      .select(MisraGries.sketch(col("token"), 32).as("s"))
      .select(col("s.candidates"), col("s.total")).head()
    val (cands, total) = (row.getSeq[String](0).toSet, row.getLong(1))

    assert(total === (hot.size + tail.size).toLong)
    // every token with freq > total/33 must survive: alpha, beta, gamma
    assert(Set("alpha", "beta", "gamma").subsetOf(cands), cands.take(10))
    assert(cands.size <= 32)
  }

  test("two-pass heavy hitters are exact and partitioning-independent") {
    val words = Seq.fill(800)("the") ++ Seq.fill(500)("of") ++
      (0 until 3000).map(i => s"w$i")
    val docs = scala.util.Random.shuffle(words).grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")

    // brute-force truth at threshold total/64
    val toks = docs.select(explode(split(col("text"), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val total = toks.count()
    val truth = toks.groupBy("token").count()
      .filter(col("count") * 64 > total)
      .select("token").as[String].collect().toSet

    for (parts <- Seq(1, 7)) {
      val got = TextFunctions.heavyHitters(docs.repartition(parts), denom = 64)
        .select("token").as[String].collect().toSet
      assert(got === truth, s"parts=$parts")
    }
  }
}
