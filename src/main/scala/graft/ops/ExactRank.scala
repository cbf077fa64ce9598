package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact k-th order statistic — global rank selection
  * WITHOUT a single-partition window.
  *
  * The naive formulation (`row_number().over(Window.orderBy(...))`)
  * funnels the whole frame through ONE task: Exchange(SinglePartition)
  * + serial sort + window buffer. Correct, but serial in the frame
  * size — the one shape that does NOT survive a 100× scale-up. This
  * operator computes the same element in parallel:
  *
  *  1. `repartitionByRange(parts, sortCols)` + `sortWithinPartitions`
  *     — the distributed total sort (equal keys land in one
  *     partition, so ranks are well-defined);
  *  2. `monotonically_increasing_id()` over the sorted partitions:
  *     id = pid·2^33 + rowOffset, so LOCAL rank = low 33 bits + 1 and
  *     the partition id = high bits — no window, no second exchange,
  *     fully parallel;
  *  3. per-partition row counts → prefix-sum offsets (a ≤`parts`-row
  *     frame; its windows are bounded by the partition count, never
  *     the data);
  *  4. global rank = offset + local rank; broadcast the offsets back
  *     and filter to `kOf(n)` — a codegen'd filter on the sorted
  *     stream.
  *
  * Consistency: steps 3 and 4 branch from the SAME range exchange;
  * Catalyst's exchange reuse (`spark.sql.exchange.reuse`, on by
  * default — AQE's stage cache likewise) materializes the shuffle
  * once, so both branches observe identical partition boundaries.
  * `ExactRankSpec` asserts the reuse in the physical plan AND pins
  * bit-equality against the single-partition window formulation.
  * The sort-elimination optimizer rule cannot drop the sort under the
  * counting aggregate because the projection above it carries the
  * nondeterministic `monotonically_increasing_id` (EliminateSorts
  * guards on deterministic projections).
  *
  * The selected row is an ELEMENT of the data under the total order —
  * never an interpolation — which is what makes rank-selected
  * statistics (median, quartiles, Theil–Sen slopes) hash-checkable
  * across engines: both sides pick the same stored value.
  */
object ExactRank {

  /** Rows of `df` at 1-based global rank `kOf(n)` under `sortCols`
    * (ascending, ties resolved by including a unique tiebreak column
    * in `sortCols`), with the total row count exposed as `nCol`.
    * Emits one row per rank the predicate matches (normally one).
    */
  def selectRank(
      df: DataFrame,
      sortCols: Seq[Column],
      kOf: Column => Column,
      nCol: String = "n_total"): DataFrame =
    selectRanks(df, sortCols, n => Seq(kOf(n)), rankCol = "__rank",
      nCol = nCol).drop("__rank")

  /** The lower median rank: (n−1) div 2 + 1, 1-based. */
  def lowerMedian(n: Column): Column = shiftright(n - 1, 1) + 1

  /** Rows at EVERY 1-based global rank in `ksOf(n)` under `sortCols`,
    * in ONE distributed pass (m quantiles never cost m sorts). Each
    * emitted row carries its global rank as `rankCol` plus the total
    * as `nCol`, so callers can label which order statistic matched.
    */
  def selectRanks(
      df: DataFrame,
      sortCols: Seq[Column],
      ksOf: Column => Seq[Column],
      rankCol: String = "rank",
      nCol: String = "n_total"): DataFrame =
    rankAll(df, sortCols, rankCol, nCol)
      .filter(array_contains(
        array(ksOf(col(nCol)): _*), col(rankCol)))

  /** EVERY row of `df` annotated with its exact 1-based global rank
    * under `sortCols` plus the total count — the same parallel
    * pipeline as [[selectRanks]] without the membership filter. This
    * is the TRANSFORM use of distributed ranking (ECDF/percentile
    * normalization, rank-weighted statistics like Gini) where the
    * single-partition window formulation is at its worst: the whole
    * frame, not just m selected rows, flows through the rank step,
    * so it MUST stay parallel end-to-end.
    */
  def rankAll(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String = "rank",
      nCol: String = "n_total"): DataFrame = {
    // the offs branch and the join branch MUST observe one shared range
    // exchange (identical sampled partition boundaries) — that is what
    // Catalyst exchange reuse provides. ExactRankSpec asserts it in the
    // physical plan; this require catches a session that disabled it
    // (results would be silently wrong, not slow).
    require(df.sparkSession.sessionState.conf.exchangeReuseEnabled,
      "ExactRank requires spark.sql.exchange.reuse=true: local ranks and " +
        "prefix-sum offsets must branch from one shared range exchange")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__id", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__id"), 33))
      .withColumn("__lrn", col("__id").bitwiseAND(lit((1L << 33) - 1)) + 1)
    val offs = sorted
      .groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy("__pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(nCol,
        sum(col("__cnt")).over(Window.partitionBy()))
      .select(col("__pid"), col("__off"), col(nCol))
    sorted
      .join(broadcast(offs), "__pid")
      .withColumn(rankCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__id", "__off")
  }

  /** Every row of `df` annotated with the INCLUSIVE running total of
    * each `values` expression under the global `sortCols` order — the
    * distributed prefix sum (ECDF numerators, cumulative mass, KS
    * statistics), generalizing [[rankAll]] from counting rows to
    * summing arbitrary columns.
    *
    * Same parallel shape, same exchange-reuse contract: ONE range
    * exchange; per-partition subtotals prefix-summed on a ≤`parts`-row
    * frame (its global window is bounded by the partition count,
    * never the data); the within-partition running sum is a window
    * PARTITIONED BY the range-partition id and ordered by the local
    * row id — every partition folds in parallel, no single task ever
    * sees the whole frame.
    *
    * Determinism note: for integral `values` the result is exact and
    * partition-count-invariant. For doubles the grouping of additions
    * follows the partitioning (offset-then-local), so only integral
    * sums should feed a hash-checked result.
    */
  def prefixSum(
      df: DataFrame,
      sortCols: Seq[Column],
      values: Seq[(String, Column)]): DataFrame = {
    require(df.sparkSession.sessionState.conf.exchangeReuseEnabled,
      "ExactRank requires spark.sql.exchange.reuse=true: local folds and " +
        "prefix-sum offsets must branch from one shared range exchange")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__id", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__id"), 33))
    val subtotals = values.map { case (n, c) => sum(c).as(s"__t_$n") }
    val offs = sorted
      .groupBy("__pid")
      .agg(subtotals.head, subtotals.tail: _*)
    val offsW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = offs.select(
      col("__pid") +: values.map { case (n, _) =>
        coalesce(sum(col(s"__t_$n")).over(offsW), lit(0L))
          .as(s"__off_$n")
      }: _*)
    val localW = Window.partitionBy("__pid").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, 0)
    values
      .foldLeft(sorted.join(broadcast(offsets), "__pid")) {
        case (acc, (n, c)) =>
          acc.withColumn(n, col(s"__off_$n") + sum(c).over(localW))
      }
      .drop("__pid" +: "__id" +: values.map { case (n, _) => s"__off_$n" }: _*)
  }
}
