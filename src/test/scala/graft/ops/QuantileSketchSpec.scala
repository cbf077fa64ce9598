package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.QuantileSketch.QSketch

/** QuantileSketch: the three constructions (Scala model, Aggregator,
  * DataFrame plan) produce the SAME sketch bit-for-bit; merge of any
  * split equals the from-scratch build (the mergeability contract);
  * and the sketch's quantile estimates carry a verified rank-error
  * certificate against ExactRank.selectRanks.
  */
class QuantileSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 256 // small capacity so raising actually happens at sf0.001

  private def liRows(): Seq[(Long, Long)] = { // (h, v)
    val li = Tables(spark, sfDir, "lineitem")
    li.select(
        QuantileSketch.hash60(
          concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("h"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("model == DataFrame plan == Aggregator, bit-for-bit") {
    val rows = liRows()
    val model = QSketch.fromRows(rows, K)
    assert(model.total === rows.size)
    assert(model.items.size <= K && model.items.nonEmpty)
    assert(model.level > 0, "capacity 256 must force at least one raise")

    // DataFrame plan (the query's path)
    val df = Tables(spark, sfDir, "lineitem").select(
      round(col("l_extendedprice") * 100).cast("long").as("v"),
      QuantileSketch.hash60(
        concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("h"))
    val planned = QuantileSketch.sketchRows(df, K).collect()
    assert(planned.head.getLong(2) === model.level.toLong)
    assert(planned.head.getLong(3) === model.total)
    assert(planned.map(r => (r.getLong(1), r.getLong(0))).toVector.sorted
      === model.canonical)

    // Aggregator (distributed reduce/merge over arbitrary partitions)
    import spark.implicits._
    val agg = new QuantileSketch.QuantileSketchAgg(K)
    val viaAgg = rows.toDS().repartition(7)
      .select(agg.toColumn).head()
    assert(viaAgg.level === model.level)
    assert(viaAgg.total === model.total)
    assert(viaAgg.canonical === model.canonical)
  }

  test("merge of any split, in any order, equals the from-scratch sketch") {
    val rows = liRows()
    val whole = QSketch.fromRows(rows, K)
    val parts = rows.grouped(math.max(1, rows.size / 5)).toVector
      .map(QSketch.fromRows(_, K))
    val leftFold = parts.reduceLeft(_.merge(_))
    val rightFold = parts.reduceRight(_.merge(_))
    val shuffled = (parts.drop(3) ++ parts.take(3)).reduceLeft(_.merge(_))
    for (m <- Seq(leftFold, rightFold, shuffled)) {
      assert(m.level === whole.level)
      assert(m.total === whole.total)
      assert(m.canonical === whole.canonical)
    }
  }

  test("quantile estimates within 5 sigma of ExactRank truth") {
    val rows = liRows()
    val sk = QSketch.fromRows(rows, K)
    val df = Tables(spark, sfDir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
    val n = rows.size.toLong
    val m = sk.items.size.toLong
    for (phiBp <- Seq(100L, 2500L, 5000L, 7500L, 9900L)) {
      val est = sk.quantile(phiBp).get
      // exact rank of the estimate over the full data
      val exactRank = df.filter(col("v") <= est).count()
      val errX = math.abs(exactRank * 10000L - phiBp * n)
      val lhs = BigInt(errX) * BigInt(errX) * m
      val rhs = BigInt(25) * phiBp * (10000L - phiBp) * n * n
      assert(lhs <= rhs,
        s"phi=$phiBp est=$est exactRank=$exactRank n=$n m=$m: $lhs > $rhs")
      // and the certificate agrees with the exact quantile from
      // ExactRank.selectRanks: the estimate's exact rank must bracket
      // the target rank within the same bound
      val target = math.max(1L, phiBp * n / 10000L)
      val exactQ = ExactRank.selectRanks(df, Seq(col("v")),
          nTot => Seq(lit(target)))
        .select("v").head().getLong(0)
      val rankOfExact = df.filter(col("v") <= exactQ).count()
      val drift = BigInt(math.abs(exactRank - rankOfExact)) * 10000L
      assert(drift * drift * m <= rhs * 4,
        s"phi=$phiBp sketch est drifted past the certified band")
    }
  }
}
