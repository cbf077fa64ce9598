package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Runs the arithmetic-critical queries under `spark.sql.ansi.enabled
  * = true` and asserts results identical to the default mode — the
  * complement of PartitionInvarianceSpec: that spec proves partition
  * order can't change an answer; this one proves no answer silently
  * RELIES on non-ANSI semantics (wrapping overflow, null-on-div-zero,
  * lenient casts). Under ANSI every such reliance ERRORS instead, so
  * a pass here means the DECIMAL(38,0) widenings and nullif guards
  * the scale claims cite are actually load-bearing at fixture scale —
  * and a future query that quietly wraps fails this suite loudly
  * instead of hash-matching DuckDB by coincidence of both engines
  * wrapping the same way.
  */
class AnsiInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the decimal-widened / integer-division / fixed-point families:
  // money aggregation past Long (gini, lorenz), encodings and evals
  // built on div + nullif (target encoding, AUC, A/B, nDCG), the
  // rank/prefix-sum machinery (median, trimmed mean), fixed-point
  // graph iteration (pagerank, hits), scaled-integer time series
  // (cusum, stl, ks), and the digit-string audit (benford)
  private val names = Seq(
    "q_gini_spend", "q_lorenz_share", "q_target_encoding",
    "q_roc_auc", "q_ab_test", "q_ndcg_eval",
    "q_exact_median", "q_trimmed_mean", "q_weighted_median",
    "q_pagerank", "q_hits",
    "q_cusum_changepoint", "q_stl_outliers", "q_ks_drift",
    "q_benford",
    // round-8: the waterfill closed form ((budget-P_K) div (n-K),
    // segment products) and the admission's div-based fill_bp must
    // not rely on silent wrap anywhere
    "q_token_budget_fill", "q_budget_admission",
    // round-9: the quantile family's integer certificate arithmetic
    // (err² · m vs 25·φ(10⁴−φ)·n² products) runs in DECIMAL(38,0) —
    // ANSI must not change any product or the position div math
    "q_quantile_sketch", "q_histogram_sketch", "q_group_quantiles",
    // round-9 storage wave: the 60-bit conv() id checksums, soft
    // dedup's floor(sqrt) quota, and the version-diff anti-join
    // arithmetic must not rely on silent wrap anywhere
    "q_soft_dedup", "q_delete_ledger", "q_version_diff",
    "q_zonemap_pruned", "q_zorder_box")

  private def run(name: String, ansi: Boolean): Seq[String] = {
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", ansi.toString)
    try SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  for (name <- names)
    test(s"$name: identical under ANSI mode (no silent-wrap reliance)") {
      assert(run(name, ansi = true) === run(name, ansi = false))
    }
}
