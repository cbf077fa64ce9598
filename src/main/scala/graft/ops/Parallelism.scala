package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism floor for CPU-heavy work downstream of an under-split
  * scan — the optimization guide's input-skew rule ("one huge
  * unsplittable file … repartition immediately after the read").
  *
  * Parquet splits at row-group boundaries, so a single-row-group file
  * scans as ONE task regardless of core count or split configuration
  * (`maxPartitionBytes` / `minPartitionNum` cannot cut inside a row
  * group). Any per-row CPU planned into that scan stage (md5
  * priorities, join probes, tokenization) then runs serial, and a
  * frame CACHED at that layout inherits the serial width for every
  * later pass. The fixtures here are exactly that shape (one row
  * group per table), and a production table's tail partition or a
  * gzip landing file hits the same wall.
  *
  * [[widen]] is the measured gate: it reads the PLANNED scan width
  * and only repartitions when the plan is narrower than the session's
  * parallelism — at production scale a big table yields hundreds of
  * splits and the helper is an identity, so no extra shuffle ever
  * reaches a healthy scan. Callers put the widen BETWEEN the narrow
  * projection and the expensive derivation, so the exchange moves
  * only the pruned input columns (guide: project before the
  * exchange). Keys must be real data columns — deterministic hash
  * placement, no sort, retry-safe (SPARK-38388 forbids rand-derived
  * keys); with no keys the round-robin path is used (which pays the
  * sort-before-repartition insurance, so prefer keys).
  */
object Parallelism {

  /** `df` repartitioned to the session shuffle parallelism by `keys`
    * iff its planned width is narrower; identity otherwise. */
  def widen(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.isEmpty) df.repartition(target)
    else df.repartition(target, keys: _*)
  }
}
