package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-log application — the batch MERGE INTO / Delta-style upsert
  * compaction: a base snapshot plus a sequenced changelog of upserts
  * ('U') and deletes ('D') collapse to the latest state per key.
  *
  * Semantics (standard CDC-log replay):
  *  - latest-wins by the change sequence; the base snapshot ranks
  *    below every log entry;
  *  - a 'D' whose sequence is the key's maximum drops the key;
  *  - a 'U' after a 'D' RESURRECTS the key (upsert = insert-or-
  *    replace, keys never seen before simply insert).
  *
  * Scale shape: ONE shuffle on the key; latest-wins is a `max_by`
  * aggregation, so each map task pre-collapses its slice of the log
  * and ≤ one row per key per partition reaches the exchange — the log
  * itself never shuffles raw. This is the same compaction a streaming
  * CDC sink runs per micro-batch (the incremental twin is
  * [[graft.ops.JoinView]]'s stamped delta fold).
  *
  * `base` must carry `keys` plus the payload columns; `log` the same
  * plus `opCol` ('U'/'D') and a BIGINT `seqCol` strictly ordering each
  * key's changes (ties within a key are a contract violation — the
  * log's own ordering is the source of truth).
  */
object CdcMerge {

  def apply(base: DataFrame, log: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = log.columns.toSeq
      .filterNot(c => keys.contains(c) || c == opCol || c == seqCol)
    val seeded = base
      .select((keys ++ payload).map(col): _*)
      .withColumn(opCol, lit("U"))
      .withColumn(seqCol, lit(Long.MinValue))
    replay(seeded
      .unionByName(log.select(
        (keys ++ payload ++ Seq(opCol, seqCol)).map(col): _*)),
      keys, opCol, seqCol)
  }

  /** Point-in-time state: the snapshot as it stood AFTER applying every
    * log entry with sequence ≤ `asOfSeq` — the CDC analog of
    * [[Scd2.asOf]], except the axis is the log's own ordering instead
    * of wall-clock validity. Same one-shuffle shape as [[apply]]; the
    * sequence filter sits UNDER the aggregation, so a log stored
    * partitioned on a seq bucket prunes at the scan. */
  def asOf(base: DataFrame, log: DataFrame, keys: Seq[String],
      asOfSeq: Long, opCol: String = "op",
      seqCol: String = "seq"): DataFrame =
    apply(base, log.filter(col(seqCol) <= asOfSeq), keys, opCol, seqCol)

  /** Latest-wins collapse of a PURE changelog (rows: keys ++ payload ++
    * op/seq): one max_by aggregation per key — map-side partial, so
    * ≤ one row per key per partition reaches the exchange — then
    * tombstones drop. Shared by [[apply]] (which seeds the base
    * snapshot below every log entry) and
    * [[graft.streaming.CdcMaintenance.asOfSeq]] (which unions the
    * compacted store with the retained log tail). */
  def replay(log: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = log.columns.toSeq
      .filterNot(c => keys.contains(c) || c == opCol || c == seqCol)
    log
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct((opCol +: payload).map(col): _*), col(seqCol))
        .as("__last"))
      .filter(col(s"__last.$opCol") =!= "D")
      .select(keys.map(col) ++
        payload.map(p => col(s"__last.$p").as(p)): _*)
  }
}
