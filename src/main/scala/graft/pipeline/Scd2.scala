package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance for the star
  * warehouse's dimensions — the upkeep operation the reference's
  * station dimension implies but never implements: its `W_STATION`
  * rows are overwritten in place (SQL/insert_stations.sql), so a
  * station rename silently rewrites history under every old fact row.
  * SCD2 keeps history instead: each change CLOSES the current version
  * (valid_to = effective time) and INSERTS a new open version.
  *
  * Contract: `dim` carries (key, attrs..., valid_from, valid_to,
  * is_current) with exactly one open version per key; `updates`
  * carries (key, attrs..., effective_ts) — at most one row per key
  * per batch (dedupe upstream; [[CurationIngest]] shows the keeper
  * pattern).
  *
  * Scale shape: ONE full-outer equi-join of the open slice against
  * the batch on the natural key, then a union with the (untouched)
  * closed slice — no windows over the whole dimension, no driver-side
  * data. The closed slice is read-through; at 100 TB partition the
  * dim store by is_current so maintenance touches only the open
  * partition.
  */
object Scd2 {

  /** Apply one update batch; returns the new full dimension frame.
    *
    * Row fates: unchanged-attr rows and absent keys pass through;
    * changed keys yield (closed old version, open new version); brand
    * new keys insert as open versions.
    *
    * Batches must be applied in effective-time ORDER (each batch's
    * `effective_ts` at or after every previously applied one) — the
    * close step stamps the open version's `valid_to` unconditionally,
    * so an out-of-order batch would write a version interval that ends
    * before it starts. Backfilling history out of order is [[rebuild]]
    * from the full change log.
    */
  def apply(dim: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], effectiveCol: String = "effective_ts"): DataFrame = {
    val open = dim.filter(col("is_current"))
    val closed = dim.filter(!col("is_current"))

    val u = updates.select(
      (col(key).as(s"u_$key") +: col(effectiveCol).as("u_effective") +:
        attrs.map(a => col(a).as(s"u_$a"))): _*)

    val changed = attrs.map(a => !(col(a) <=> col(s"u_$a"))).reduce(_ || _)

    val joined = open.join(u, col(key) === col(s"u_$key"), "full_outer")

    // 1. keys with no update this batch (or update equal to current)
    val untouched = joined
      .filter(col(s"u_$key").isNull || (col(key).isNotNull && !changed))
      .select(dim.columns.map(col): _*)
    // 2. changed keys: the closed-out old version...
    val closedOut = joined
      .filter(col(key).isNotNull && col(s"u_$key").isNotNull && changed)
      .select(dim.columns.map {
        case "valid_to" => col("u_effective").as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c => col(c)
      }: _*)
    // 3. ...plus its new open version, and 4. brand-new keys
    val opened = joined
      .filter(col(s"u_$key").isNotNull && (col(key).isNull || changed))
      .select(dim.columns.map {
        case `key` => col(s"u_$key").as(key)
        case "valid_from" => col("u_effective").as("valid_from")
        case "valid_to" => lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case a => col(s"u_$a").as(a)
      }: _*)

    closed.unionByName(untouched).unionByName(closedOut).unionByName(opened)
  }

  /** Point-in-time lookup: the dimension as it stood at `ts` (the
    * version whose [valid_from, valid_to) interval covers it). */
  def asOf(dim: DataFrame, ts: org.apache.spark.sql.Column): DataFrame =
    dim.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))

  /** Rebuild the full SCD2 dimension from a CHANGE LOG in one windowed
    * pass — the backfill twin of the incremental [[apply]] (which
    * folds one batch at a time). No-op log entries (attrs equal to the
    * key's previous state) are skipped, exactly as [[apply]] skips
    * them; `valid_to` chains to the next version's `valid_from`.
    * Contract: at most one log row per (key, effective_ts) — dedupe
    * upstream.
    *
    * Scale shape: two window functions over ONE shuffle on the key
    * (lag to drop no-ops, lead to chain validity) — a linear pass at
    * any history size. [[Scd2Spec]] proves apply-per-batch and rebuild
    * produce identical dimensions on the same log. */
  def rebuild(log: DataFrame, key: String, attrs: Seq[String],
      effectiveCol: String = "effective_ts"): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(effectiveCol)
    val state = struct(attrs.map(col): _*)
    val changes = log
      .withColumn("__prev", lag(state, 1).over(byKey))
      .filter(col("__prev").isNull || !(col("__prev") <=> state))
    changes
      .withColumn("valid_from", col(effectiveCol))
      .withColumn("valid_to", lead(col(effectiveCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", effectiveCol)
  }

  /** Initialize a dimension frame from a plain attribute table. */
  def init(seed: DataFrame, effectiveCol: String = "effective_ts"): DataFrame =
    seed.select(
      (seed.columns.filter(_ != effectiveCol).map(col) :+
        col(effectiveCol).as("valid_from") :+
        lit(null).cast(seed.schema(effectiveCol).dataType).as("valid_to") :+
        lit(true).as("is_current")): _*)
}
