package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed storage for shuffle-free co-located joins — the third leg
  * of the scale-join toolkit next to [[ScaleJoins.saltedJoin]] and AQE
  * broadcast: when two big fact tables are repeatedly joined on the
  * same key (orders ⨝ lineitem at 100 TB), pre-hash-partitioning BOTH
  * into the same number of buckets on that key makes every subsequent
  * join exchange-free — each task sort-merges bucket i of A with
  * bucket i of B, no shuffle of either side, ever again.
  *
  * The write itself costs one shuffle per table (that is where the
  * co-location is bought); it amortizes over every downstream join and
  * aggregation on the bucket key. Aggregations on the key are also
  * exchange-free (partial = final grouping).
  *
  * Spark requires bucketed data to live in the session catalog
  * (bucket metadata travels with the table, not the files), hence
  * `saveAsTable` rather than a bare path write.
  */
object Bucketing {

  /** Write `df` bucketed (and per-bucket sorted) by `key` as catalog
    * table `table`. Buckets per table must MATCH on both sides of an
    * intended join.
    *
    * The frame is repartitioned onto the bucket hash FIRST: without
    * it, every input task writes one file per bucket it touches — up
    * to tasks x buckets small files on a wide frame, and a bucket
    * split across many files carries only per-file sort guarantees,
    * so downstream sort-merge joins re-sort anyway. One shuffle at
    * write time buys one file per bucket and a sort-free read. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * the assertion that bucketing actually bought co-location. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString().contains("Exchange")

  /** Join two same-bucketed catalog tables on the bucket key. With
    * matching bucket counts this plans as an exchange-free sort-merge
    * join (each task reads bucket i of both sides). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
