package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** ANALYZE-style equi-depth (equi-height) histogram — the column
  * statistic every cost-based optimizer consults for range-predicate
  * selectivity (Spark's own `ANALYZE TABLE ... FOR COLUMNS` builds
  * one when `spark.sql.statistics.histogram.enabled` is set; this is
  * the engine-native twin with EXACT boundaries).
  *
  * Boundaries are exact global order statistics: bucket `b`'s upper
  * boundary is the element at 1-based rank `(n·b) div B` under the
  * caller's total order — selected in ONE distributed pass by
  * [[ExactRank.selectRanks]] (range repartition + local ranks +
  * prefix-sum offsets; no single-task sort, no interpolation). Exact
  * elements rather than sampled estimates buy two things:
  *   - the selectivity estimate below carries a PROVABLE bracket
  *     (lower/upper bounds the true count can never escape), which a
  *     sampled histogram cannot promise;
  *   - the whole statistic is engine-replayable (hash-checkable) —
  *     the same property that makes `q_exact_quantiles` oracle-exact.
  *
  * Estimation contract (see `q_histogram_selectivity`): for a
  * predicate `value <= x`,
  *   - `est_lo` = max boundary rank whose value ≤ x (0 if none):
  *     every row at rank ≤ that boundary sorts ≤ its value ≤ x, so
  *     the true count is ≥ est_lo;
  *   - `est_hi` = (min boundary rank whose value > x) − 1 (n if
  *     none): any row with value ≤ x < boundary value sorts strictly
  *     before that boundary row, so the true count is ≤ est_hi.
  * Consecutive boundary ranks differ by ≤ ⌈n/B⌉, so the bracket
  * width — the estimator's worst-case absolute error — is bounded by
  * ONE bucket depth by construction (`HistogramSpec` asserts both
  * properties directly).
  *
  * Scale shape: build is one range-shuffled sort pass (ANALYZE —
  * run once, persist beside the data via [[write]]/[[read]], the
  * [[TableStats]] posture); the histogram itself is B rows, so every
  * consult is driver-cheap and every estimate join is a broadcast of
  * a bounded frame. Nothing here ever collects data rows.
  */
object Histogram {

  /** Equi-depth boundaries of `df` under `sortCols` (must totalize
    * the order — include a unique tiebreak): one row per DISTINCT
    * boundary rank `(n·b) div B`, b = 1..`buckets`, carrying the
    * boundary row's columns plus its 1-based global `rank` and the
    * total row count `n_total`. The last boundary is the maximum
    * element (rank n). Duplicate ranks (n < buckets) emit once.
    */
  def equiDepth(df: DataFrame, sortCols: Seq[Column],
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets $buckets")
    ExactRank.selectRanks(df, sortCols,
      n => (1 to buckets).map(b => (n * b / buckets).cast("long")))
  }

  /** Persist a histogram frame beside the data (B rows → one file). */
  def write(hist: DataFrame, dir: String): Unit =
    hist.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Bracketed cardinality estimates for `value <= threshold`
    * predicates, one row per probe: (threshold, est_lo, est_hi,
    * est_mid, n_rows). `bounds` is an [[equiDepth]] frame whose
    * boundary value column is `valueCol`; `probes` any frame with a
    * `threshold` column (comparable to the value column). Both
    * inputs are bounded (B rows × P probes) — the cross join is the
    * documented broadcast-of-a-bounded-dim shape; the data is never
    * touched.
    */
  def estimateLe(bounds: DataFrame, valueCol: String,
      probes: DataFrame): DataFrame = {
    val v = col(s"`$valueCol`")
    probes.crossJoin(broadcast(bounds))
      .groupBy("threshold")
      .agg(
        coalesce(max(when(v <= col("threshold"), col("rank"))), lit(0L))
          .as("est_lo"),
        coalesce(min(when(v > col("threshold"), col("rank"))) - 1,
          max(col("n_total"))).as("est_hi"),
        max(col("n_total")).as("n_rows"))
      .withColumn("est_mid", expr("(est_lo + est_hi) div 2"))
  }

  /** Equi-depth boundaries served from a mergeable
    * [[QuantileSketch]] frame instead of a full rescan — the
    * incremental-maintenance answer to [[equiDepth]]'s one
    * range-shuffled sort pass over ALL data: the streamed store
    * ([[graft.streaming.QuantileMaintenance]]) keeps the ≤k-row
    * sketch fresh per micro-batch, and THIS turns that bounded frame
    * into bucket boundaries without ever touching history again.
    * Boundaries are the sketch's own order statistics at positions
    * `max(1, b·m div B)` in (v, h) order (h breaks value ties — the
    * [[QuantileSketch.QSketch.quantile]] rule), so each carries the
    * sketch's 5σ rank certificate rather than [[equiDepth]]'s exact
    * one-bucket bracket — the classic exactness-for-maintainability
    * trade, both sides of which the engine now offers.
    *
    * Input: a [[QuantileSketch.sketchRows]] frame (v, h, lstar, n).
    * Output: `buckets` rows (bucket, lo, ub, lstar, n, m) where
    * bucket b covers `lo < v ≤ ub` (lo null = −∞ on bucket 1; the
    * LAST bucket is upper-unbounded by the caller's contract — its
    * ub is the sketch max, not the data max). All windows here run
    * on ≤k rows — bounded single-partition by construction (the
    * sketch-capacity class, never data-sized).
    */
  def sketchBoundaries(sk: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets $buckets")
    import org.apache.spark.sql.expressions.Window
    val mDf = sk.groupBy("lstar", "n").agg(count(lit(1)).as("m"))
    val skOrd = sk.select(col("v"), col("h"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("v"), col("h"))).cast("long"))
    val spark = sk.sparkSession
    import spark.implicits._
    (1 to buckets).map(_.toLong).toDF("bucket")
      .crossJoin(broadcast(mDf))
      .withColumn("pos",
        greatest(lit(1L), expr(s"bucket * m div $buckets")))
      .join(broadcast(skOrd.select(col("pos"), col("v").as("ub"))), "pos")
      .withColumn("lo", lag("ub", 1).over(Window.orderBy("bucket")))
      .select("bucket", "lo", "ub", "lstar", "n", "m")
  }

  /** The certain UPPER bound on rows satisfying `value <= threshold`,
    * read from a boundary frame — B rows, so the `.head()` is the
    * documented sketch-row driver class (the [[TableStats.rowCount]]
    * posture). */
  def estHiLe(bounds: DataFrame, valueCol: String,
      threshold: Column): Long = {
    val v = col(s"`$valueCol`")
    bounds.agg(coalesce(min(when(v > threshold, col("rank"))) - 1,
      max(col("n_total")))).head().getLong(0)
  }

  /** Broadcast-hint `df` (a frame filtered to `value <= threshold`)
    * iff the histogram PROVES it small: the decision reads
    * [[estHiLe]], a certain upper bound on the filtered cardinality,
    * so a histogram-licensed broadcast can never OOM the driver —
    * the guarantee [[TableStats.statsJoin]]'s whole-table counts
    * cannot give once a selective filter intervenes (the filtered
    * side may be 1000× smaller than the table the stats describe).
    * When the bound doesn't clear `maxBroadcastRows`, no hint is
    * planted and the cost model keeps its shuffle join — the same
    * graceful-degradation posture as statsJoin.
    */
  def broadcastIfRangeSmall(df: DataFrame, bounds: DataFrame,
      valueCol: String, threshold: Column,
      maxBroadcastRows: Long = 1000000L): DataFrame =
    if (estHiLe(bounds, valueCol, threshold) <= maxBroadcastRows)
      broadcast(df)
    else df
}
