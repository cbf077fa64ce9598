package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pipeline/CdcMerge — latest-wins CDC-log replay semantics, each rule
  * forced by a dedicated key (the q_cdc_merge query proves the same
  * operator hash-matches DuckDB end-to-end on orders-derived data):
  *
  *   k=1  base only                    → base row survives
  *   k=2  base + U                     → update wins
  *   k=3  base + U + D                 → deleted
  *   k=4  base + D + U (later seq)     → resurrected with the U payload
  *   k=5  log-only U (no base row)     → inserted
  *   k=6  base + U(seq 1) + U(seq 2)   → the LATER update wins
  *   k=7  log-only D (no base row)     → stays absent
  */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert / delete / resurrect / insert / latest-wins") {
    val base = Seq(
      (1L, "b1"), (2L, "b2"), (3L, "b3"), (4L, "b4"), (6L, "b6")
    ).toDF("k", "payload")
    val log = Seq(
      (2L, "u2", "U", 1L),
      (3L, "u3", "U", 1L), (3L, "", "D", 2L),
      (4L, "", "D", 1L), (4L, "u4", "U", 2L),
      (5L, "u5", "U", 1L),
      (6L, "u6a", "U", 1L), (6L, "u6b", "U", 2L),
      (7L, "", "D", 1L)
    ).toDF("k", "payload", "op", "seq")
    val got = CdcMerge(base, log, keys = Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = Seq(
      (1L, "b1"), (2L, "u2"), (4L, "u4"), (5L, "u5"), (6L, "u6b"))
    assert(got.toSeq === want)
  }

  test("the merge collapses map-side: partial max_by before the exchange") {
    val base = Seq((1L, "b")).toDF("k", "payload")
    val log = (1 to 1000).map(i => (1L, s"u$i", "U", i.toLong))
      .toDF("k", "payload", "op", "seq")
    val merged = CdcMerge(base, log, keys = Seq("k"))
    // semantics: the key's maximum sequence wins
    assert(merged.collect().map(r => r.getString(1)).toSeq === Seq("u1000"))
    // plan: a partial aggregate below the exchange (max_by is
    // associative — the raw log never shuffles)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial"),
      s"expected a partial aggregate below the exchange:\n$plan")
  }
}
