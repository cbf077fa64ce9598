package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** PipelineOps.admissionCum regime gate: the per-source window regime
  * and the hot-source ExactRank.prefixSum regime produce BIT-EQUAL
  * cumulative sums (forced via the threshold param), and each regime
  * plans the shape it promises — a partitioned window below the gate,
  * the pinned-RDD prefix-sum fold (no corpus-sized single-partition
  * window) above it.
  */
class AdmissionRegimeSpec extends SparkSpec {

  private def docs() = {
    val toks = filter(TextFunctions.wsTokens(col("text")), t => t =!= "")
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("doc_id"), size(toks).cast("long").as("nt"))
  }

  test("both regimes are bit-equal") {
    val d = docs()
    val win = PipelineOps.admissionCum(d, hotSourceRows = Long.MaxValue)
      .select("source", "doc_id", "nt", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val fold = PipelineOps.admissionCum(d, hotSourceRows = 0L)
      .select("source", "doc_id", "nt", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(win.length === fold.length && win.nonEmpty)
    assert(win === fold)
  }

  test("window regime plans a source-partitioned window") {
    val df = PipelineOps.admissionCum(docs(), hotSourceRows = Long.MaxValue)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("hashpartitioning(source"), p.take(2000))
  }

  test("hot-source regime plans the prefix-sum fold, no corpus window") {
    val df = PipelineOps.admissionCum(docs(), hotSourceRows = 0L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the pinned-RDD two-job core of ExactRank.prefixSum
    assert(p.contains("ExistingRDD"), p.take(2000))
    // the only Window allowed is the registry-frame offset window,
    // which runs over the |sources|-row aggregate — assert no window
    // partitioned over the corpus hash order
    assert(!p.contains("hashpartitioning(source, doc_id"), p.take(2000))
  }
}
