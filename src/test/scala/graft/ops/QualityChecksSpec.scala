package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  test("planted violations are counted per check") {
    val orders = Seq(
      (1L, Some(10L), "O", 100.0),
      (2L, Some(11L), "F", -5.0),  // nonpositive price
      (2L, Some(11L), "F", -5.0),  // duplicate key
      (3L, None, "X", 50.0)        // null FK + bad status
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val customer = Seq(10L).toDF("c_custkey") // 11 missing -> 2 orphans

    val got = QualityChecks.report(
      QualityChecks.columnChecks(orders,
        "null_custkey" -> col("o_custkey").isNull,
        "nonpositive_totalprice" -> (col("o_totalprice") <= 0),
        "bad_orderstatus" -> !col("o_orderstatus").isin("O", "F", "P")),
      QualityChecks.duplicateKeys(orders, "dup_orderkey", "o_orderkey"),
      QualityChecks.orphans(orders.filter(col("o_custkey").isNotNull),
        "o_custkey", customer, "c_custkey", "orphan_orders"))
      .as[(String, Long)].collect().toMap

    assert(got === Map(
      "null_custkey" -> 1L,
      "nonpositive_totalprice" -> 2L,
      "bad_orderstatus" -> 1L,
      "dup_orderkey" -> 1L,
      "orphan_orders" -> 2L))
  }

  test("column checks run as a single aggregation pass") {
    val df = Seq((1L, "a"), (2L, null)).toDF("k", "v")
    val rpt = QualityChecks.columnChecks(df,
      "null_v" -> col("v").isNull, "neg_k" -> (col("k") < 0))
    // one Aggregate over one scan — no per-check re-reads
    val scans = rpt.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.getClass.getSimpleName.contains("Relation") => r
    }
    assert(scans.length === 1, rpt.queryExecution.optimizedPlan)
    assert(rpt.as[(String, Long)].collect().toMap ===
      Map("null_v" -> 1L, "neg_k" -> 0L))
  }
}
