package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Approximate aggregates have no hash oracle (sketch algorithms are
  * engine-specific) — this spec enforces the error bounds against
  * exact answers on the sf0.001 data.
  */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 2% rsd bound (with slack) of exact") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
      .select(col("exact").cast("double"), col("approx").cast("double"))
      .as[(Double, Double)].collect()
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) / exact < 0.08,
        s"exact=$exact approx=$approx") // 4x the 2% rsd
    }
  }

  test("kmv estimate within 4 standard errors of the exact distinct count") {
    // k=64 => relative standard error ~ 1/sqrt(k-2) ~ 12.7%
    val rows = graft.SparkEntry.queries("q_kmv_distinct")(spark, dir)
      .select(col("n_sketch"), col("exact_distinct").cast("double"),
        col("est_distinct"))
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nSketch, exact, est) =>
      if (nSketch < 64) assert(est === exact, s"unsaturated sketch must be exact")
      else assert(math.abs(est - exact) / exact < 4.0 / math.sqrt(62.0),
        s"exact=$exact est=$est")
    }
  }

  test("percentile_approx lands between neighboring exact percentiles") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val (p40, p60, approx50) = li.agg(
      percentile(col("l_extendedprice"), lit(0.4)),
      percentile(col("l_extendedprice"), lit(0.6)),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .as[(Double, Double, Double)].head()
    assert(approx50 >= p40 && approx50 <= p60, s"[$p40, $p60] vs $approx50")
  }

  test("hll raw estimate within 4 standard errors; registers well-formed") {
    // m=64 => relative standard error ~ 1.04/sqrt(64) = 13%; the raw
    // estimator (no small-range correction) needs the count to be
    // comfortably past m (it is: hundreds of distinct custkeys/group)
    val rows = graft.SparkEntry.queries("q_hll_distinct")(spark, dir)
      .select(col("n_hit"), col("max_reg"), col("scaled_sum"),
        col("exact_distinct").cast("double"), col("est_raw"))
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.length === 3)
    rows.foreach { case (nHit, maxReg, scaledSum, exact, est) =>
      assert(nHit >= 1L && nHit <= 64L)
      assert(maxReg >= 1L && maxReg <= 55L)
      // the scaled harmonic sum is bounded by its two extremes:
      // all-zero registers (64·2^55) and the max-register floor
      assert(scaledSum > 0L && scaledSum <= 64L * (1L << 55))
      assert(math.abs(est - exact) / exact < 4.0 * 1.04 / 8.0,
        s"exact=$exact est=$est")
    }
  }

  test("kmv set operations: certificates hold and the algebra is consistent") {
    val r = graft.SparkEntry.queries("q_kmv_setops")(spark, dir).head()
    def l(n: String) = r.getLong(r.fieldIndex(n))
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    // sketch well-formedness
    assert(l("n_sketch_a") <= 1024L && l("n_sketch_b") <= 1024L)
    assert(l("n_union") <= 1024L && l("n_both") <= l("n_union"))
    // inclusion–exclusion identity the query derives its exact
    // intersection from
    assert(l("exact_inter") ===
      l("exact_a") + l("exact_b") - l("exact_union"))
    assert(l("exact_inter") >= 0L && l("exact_union") >= l("exact_a"))
    // the hash-gated certificates must actually certify on the fixture
    assert(l("union_ok") === 1L, s"union bound failed: $r")
    assert(l("jacc_ok") === 1L, s"jaccard bound failed: $r")
    // estimator sanity: union estimate positive and the intersection
    // estimate is exactly n_both/n_union of it (the published KMV
    // estimator shape)
    assert(d("est_union") > 0.0)
    val expInter = l("n_both").toDouble * d("est_union") / l("n_union")
    assert(d("est_inter") === expInter)
  }
}
