package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact k-th order statistic — global rank selection
  * WITHOUT a single-partition window.
  *
  * The naive formulation (`row_number().over(Window.orderBy(...))`)
  * funnels the whole frame through ONE task: Exchange(SinglePartition)
  * + serial sort + window buffer. Correct, but serial in the frame
  * size — the one shape that does NOT survive a 100× scale-up. This
  * operator computes the same element in parallel, on ONE construction
  * shared by the whole order-statistics family (rank, selection,
  * prefix sums):
  *
  *  1. `repartitionByRange(parts, sortCols)` + `sortWithinPartitions`
  *     — the distributed total sort (equal keys land in one
  *     partition, so ranks are well-defined);
  *  2. `sorted.rdd` PINS the physical plan: one shuffle, one fixed
  *     partitioning. Job 1 (`sparkContext.runJob`) collects the
  *     per-partition row counts / value totals to the driver —
  *     ≤ `parts`×k scalars, bounded sketch-class state;
  *  3. the driver folds those totals to exclusive per-partition
  *     offsets (a loop over ≤ `parts` entries);
  *  4. job 2 (`mapPartitionsWithIndex` over the SAME RDD object)
  *     seeds each partition with its offset from the closure and
  *     folds rows in the partition-local sorted order — global rank
  *     (or running sum) is offset + local fold, fully parallel.
  *
  * Consistency is BY CONSTRUCTION: both jobs run on one RDD object,
  * so partition indexes and boundaries agree no matter what the
  * session's `spark.sql.exchange.reuse` or AQE settings are (the
  * superseded formulation — two Catalyst branches over one range
  * exchange — was only correct while Catalyst chose to materialize
  * the exchange once; `ExactRankSpec` now pins bit-equality with
  * exchange reuse DISABLED). The shuffle map stage is shared: job 2
  * skips the map side and reads the shuffle files job 1 wrote.
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
    * under `sortCols` plus the total count — [[prefixSum]] of the
    * constant 1 (the running row count IS the rank in sorted order),
    * with the grand total — known on the driver after the totals job —
    * appended as a literal. This is the TRANSFORM use of distributed
    * ranking (ECDF/percentile normalization, rank-weighted statistics
    * like Gini) where the single-partition window formulation is at
    * its worst: the whole frame, not just m selected rows, flows
    * through the rank step, so it MUST stay parallel end-to-end.
    */
  def rankAll(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String = "rank",
      nCol: String = "n_total"): DataFrame = {
    val (out, totL, _) =
      prefixSumCore(df, sortCols, Seq(rankCol -> lit(1L)))
    out.withColumn(nCol, lit(totL(0)))
  }

  /** Every row of `df` annotated with the INCLUSIVE running total of
    * each `values` expression under the global `sortCols` order — the
    * distributed prefix sum (ECDF numerators, cumulative mass, KS
    * statistics), generalizing [[rankAll]] from counting rows to
    * summing arbitrary columns. Shape: the pinned-RDD two-job fold
    * documented on the object.
    *
    * Value expressions must be integral (summed as LONG — exact and
    * partition-count-invariant, the hash-checkable path) or
    * float/double (summed as DOUBLE — additions fold in partition
    * order, deterministic for a fixed partitioning only). Exact
    * DECIMAL prefixes should ride long-scaled integers instead.
    * Nulls contribute nothing, matching SUM. Within a tie group of
    * `sortCols` the per-row running values follow the sort's
    * arbitrary tie order — callers needing row-stable prefixes must
    * include a unique tiebreak column (the [[rankAll]] contract); the
    * running value on a tie group's LAST row is tie-order-invariant.
    */
  def prefixSum(
      df: DataFrame,
      sortCols: Seq[Column],
      values: Seq[(String, Column)]): DataFrame =
    prefixSumCore(df, sortCols, values)._1

  /** The shared construction: the prefix-summed frame PLUS the grand
    * totals (per value column, long and double lanes), which the
    * driver holds for free after the totals job — [[rankAll]] turns
    * them into its total-count column without a third pass.
    */
  private def prefixSumCore(
      df: DataFrame,
      sortCols: Seq[Column],
      values: Seq[(String, Column)])
      : (DataFrame, Array[Long], Array[Double]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // normalize each value expression to its sum type (long / double)
    val vTypes = df.select(values.map { case (n, c) => c.as(n) }: _*)
      .schema.map(_.dataType)
    val isLong: Seq[Boolean] = values.zip(vTypes).map {
      case (_, ByteType | ShortType | IntegerType | LongType) => true
      case (_, DoubleType | FloatType) => false
      case ((n, _), t) => throw new IllegalArgumentException(
        s"prefixSum value '$n': unsupported type $t — use integral " +
          "(exact) or double; exact decimals should ride scaled longs")
    }
    val normVals = values.zip(isLong).map { case ((n, c), l) =>
      (n, if (l) c.cast(LongType) else c.cast(DoubleType))
    }
    val k = values.size
    val sorted = df
      .select(col("*") +:
        normVals.map { case (n, c) => c.as(s"__v_$n") }: _*)
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val inSchema = sorted.schema
    val nIn = inSchema.length
    val nOut = nIn - k
    val longMask = isLong.toArray
    val rdd = sorted.rdd // pins the physical plan: one partitioning
    // job 1: per-partition totals → driver (≤ parts×k scalars)
    val partTotals: Array[(Array[Long], Array[Double])] =
      spark.sparkContext.runJob(rdd, (rows: Iterator[Row]) => {
        val tL = new Array[Long](k)
        val tD = new Array[Double](k)
        rows.foreach { r =>
          var i = 0
          while (i < k) {
            val ord = nOut + i
            if (!r.isNullAt(ord)) {
              if (longMask(i)) tL(i) += r.getLong(ord)
              else tD(i) += r.getDouble(ord)
            }
            i += 1
          }
        }
        (tL, tD)
      })
    // exclusive prefix of the totals, in partition order (driver-side
    // loop over ≤ parts entries)
    val offL = Array.ofDim[Long](partTotals.length, k)
    val offD = Array.ofDim[Double](partTotals.length, k)
    var p = 1
    while (p < partTotals.length) {
      var i = 0
      while (i < k) {
        offL(p)(i) = offL(p - 1)(i) + partTotals(p - 1)._1(i)
        offD(p)(i) = offD(p - 1)(i) + partTotals(p - 1)._2(i)
        i += 1
      }
      p += 1
    }
    // grand totals: last offset + last partition's contribution
    val totL = new Array[Long](k)
    val totD = new Array[Double](k)
    if (partTotals.nonEmpty) {
      val last = partTotals.length - 1
      var i = 0
      while (i < k) {
        totL(i) = offL(last)(i) + partTotals(last)._1(i)
        totD(i) = offD(last)(i) + partTotals(last)._2(i)
        i += 1
      }
    }
    // job 2: fold each partition seeded with its offset — the shuffle
    // map stage is shared with job 1 (same RDD), so this reads the
    // already-written shuffle files
    val out = rdd.mapPartitionsWithIndex { (pid, rows) =>
      val accL = offL(pid).clone()
      val accD = offD(pid).clone()
      rows.map { r =>
        val runs = new Array[Any](k)
        var i = 0
        while (i < k) {
          val ord = nOut + i
          if (!r.isNullAt(ord)) {
            if (longMask(i)) accL(i) += r.getLong(ord)
            else accD(i) += r.getDouble(ord)
          }
          runs(i) = if (longMask(i)) accL(i) else accD(i)
          i += 1
        }
        Row.fromSeq(r.toSeq.take(nOut) ++ runs.toSeq)
      }
    }
    val outSchema = StructType(inSchema.fields.take(nOut) ++
      values.zip(isLong).map { case ((n, _), l) =>
        StructField(n, if (l) LongType else DoubleType, nullable = false)
      })
    (spark.createDataFrame(out, outSchema), totL, totD)
  }
}
