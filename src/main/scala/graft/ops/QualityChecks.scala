package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract checking at scale — the admission gate a 100 TB
  * training-data or warehouse ingest runs before publishing a batch
  * (the reference pipeline loads whatever the API returned,
  * dags/etl.py:96-123; this is the missing guard).
  *
  * Design: every column-level check is a boolean VIOLATION predicate
  * folded into ONE aggregation pass over the table (conditional
  * sums — no per-check scans), melted to (check_name, n_bad) rows
  * via an inline map+explode. Referential checks are left-anti joins
  * counting orphans — one shuffle each on the FK. All counts, no row
  * materialization: the report is a handful of rows regardless of
  * table size.
  */
object QualityChecks {

  /** One-pass column checks: `checks` maps check name -> violation
    * predicate. Returns (check_name, n_bad). */
  def columnChecks(df: DataFrame, checks: (String, Column)*): DataFrame = {
    val aggs = checks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(name)
    }
    val entries = checks.flatMap { case (name, _) => Seq(lit(name), col(name)) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(entries: _*)).as(Seq("check_name", "n_bad")))
  }

  /** Duplicate-key count: rows beyond the first per key. */
  def duplicateKeys(df: DataFrame, name: String, keys: String*): DataFrame =
    df.agg((count(lit(1)) - count_distinct(struct(keys.map(col): _*))).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_bad"))

  /** Referential check: `fact` rows whose `fk` has no match in
    * `dim.pk` (anti-join, one shuffle on the key). */
  def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
      name: String): DataFrame =
    fact.join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_bad"))

  /** Union of report fragments, ordered for stable output. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _).orderBy("check_name")
}
