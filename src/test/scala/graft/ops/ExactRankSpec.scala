package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops/ExactRank (distributed global rank selection) must be
  * bit-identical to the single-partition window formulation — the
  * selected row is a data element under a total order, and the
  * parallel shape (range partition + local rank + offset join) must
  * pick exactly the same element. Also pins the plan invariants the
  * operator's correctness rests on: one materialized range exchange
  * shared by both branches (exchange reuse), and no single-partition
  * exchange of the full frame.
  */
class ExactRankSpec extends SparkSpec {
  import spark.implicits._

  /** The single-partition window formulation of the lower median —
    * the reference ExactRank must match bit-for-bit. */
  private def windowedLowerMedian(
      df: org.apache.spark.sql.DataFrame): (Double, Long) = {
    val r = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v"), col("id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .filter(col("rn") === shiftright(col("n") - 1, 1) + 1)
      .select("v", "n").head()
    (r.getDouble(0), r.getLong(1))
  }

  test("parallel rank selection == single-partition window, with ties") {
    // deterministic data with heavy ties on v (unique tiebreak id)
    val df = (1 to 10007)
      .map(i => ((i * 2654435761L) % 97 / 10.0, i.toLong))
      .toDF("v", "id")
    val got = ExactRank
      .selectRank(df, Seq(col("v"), col("id")), ExactRank.lowerMedian)
      .select("v", "n_total").head()
    val want = windowedLowerMedian(df)
    assert(java.lang.Double.doubleToLongBits(got.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(want._1), "median value")
    assert(got.getLong(1) === want._2, "total count")
  }

  test("every rank 1..n selects exactly the sorted element") {
    val df = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 7.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val sortedVals = Seq(1.0, 2.0, 3.0, 3.0, 5.0, 7.0, 9.0)
    for (k <- 1 to 7) {
      val row = ExactRank
        .selectRank(df, Seq(col("v"), col("id")), _ => lit(k.toLong))
        .select("v").collect()
      assert(row.length === 1, s"rank $k emits one row")
      assert(row.head.getDouble(0) === sortedVals(k - 1), s"rank $k")
    }
  }

  test("selectRanks: all four quartile elements from one pass") {
    val df = (1 to 10007)
      .map(i => ((i * 2654435761L) % 997 / 7.0, i.toLong))
      .toDF("v", "id")
    def k(n: org.apache.spark.sql.Column, q: Int) =
      ((n - 1) * q / 100).cast("long") + 1
    val got = ExactRank.selectRanks(df, Seq(col("v"), col("id")),
      n => Seq(25, 50, 75, 99).map(q => k(n, q)))
      .select("rank", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: plain sorted sequence
    val sortedV = (1 to 10007)
      .map(i => ((i * 2654435761L) % 997 / 7.0, i.toLong)).sorted
    val n = 10007L
    val want = Seq(25, 50, 75, 99)
      .map(q => ((n - 1) * q / 100) + 1)
      .map(r => r -> sortedV((r - 1).toInt)._1).toMap
    assert(got === want)
  }

  test("correct with spark.sql.exchange.reuse=false (no reuse assumption)") {
    // the superseded two-Catalyst-branch formulation was only correct
    // while Catalyst materialized one shared range exchange; the
    // pinned-RDD construction must not care. A DEDICATED session
    // (isolated SQLConf) disables exchange reuse AND AQE's stage
    // cache, then rank selection and rankAll must still be
    // bit-identical to the single-partition window formulation.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.exchange.reuse", "false")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "5")
    import s2.implicits._
    val df = (1 to 10007)
      .map(i => ((i * 2654435761L) % 97 / 10.0, i.toLong))
      .toDF("v", "id")
    assert(!s2.sessionState.conf.exchangeReuseEnabled, "conf applied")
    val got = ExactRank
      .selectRank(df, Seq(col("v"), col("id")), ExactRank.lowerMedian)
      .select("v", "n_total").head()
    val want = windowedLowerMedian(df)
    assert(java.lang.Double.doubleToLongBits(got.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(want._1), "median value")
    assert(got.getLong(1) === want._2, "total count")
    // rankAll transform: every rank matches the window formulation
    val ranks = ExactRank.rankAll(df, Seq(col("v"), col("id")))
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantRanks = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v"), col("id"))))
      .select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(ranks.size === 10007)
    assert(ranks === wantRanks)
  }

  test("plan: no single-partition exchange of the full frame") {
    // the pinned-RDD construction's only wide step is the range
    // exchange inside the RDD lineage; the final Catalyst plan over
    // the LogicalRDD must not re-exchange everything to one partition
    val df = (1 to 5000).map(i => (i * 37 % 1009, i.toLong)).toDF("v", "id")
    val sel = ExactRank.selectRank(df, Seq(col("v"), col("id")),
      ExactRank.lowerMedian)
    sel.collect()
    val single = execNodes(sel).collect {
      case s: ShuffleExchangeExec
        if s.outputPartitioning.toString.contains("SinglePartition") => s
    }
    assert(single.isEmpty,
      s"no SinglePartition exchange expected, got ${single.size}")
  }

  test("distributed prefix sum == single-partition window, multi-column") {
    // deterministic data with duplicate sort keys (unique id tiebreak
    // NOT needed: prefixSum folds rows in the partition-local sorted
    // order, and equal-key rows contribute the same running totals to
    // every row after the group — assert on the per-key MAX, which is
    // order-free within a key)
    val df = (1 to 4999)
      .map { i =>
        val k = (i * 2654435761L) % 53
        (k / 10.0, k % 7 + 1, (k % 3).toLong)
      }
      .toDF("v", "a", "b")
    val got = ExactRank
      .prefixSum(df, Seq(col("v")), Seq("ca" -> col("a"), "cb" -> col("b")))
      .groupBy("v").agg(max("ca").as("ca"), max("cb").as("cb"))
      .orderBy("v").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .groupBy("v").agg(max("ca").as("ca"), max("cb").as("cb"))
      .orderBy("v").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("prefix sum is shuffle-partition-count invariant (integral sums)") {
    val df = (1 to 3001)
      .map(i => ((i * 48271L) % 101, (i % 5).toLong))
      .toDF("v", "x")
    def run(): Seq[(Long, Long)] = ExactRank
      .prefixSum(df, Seq(col("v")), Seq("cx" -> col("x")))
      .groupBy("v").agg(max("cx").as("cx"))
      .orderBy("v").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val base = run()
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try Seq("3", "17").foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      assert(run() === base, s"divergence at shuffle.partitions=$parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }
}
