package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared reader for batch-keyed ledger/index stores — the
  * `dir/batch_id=N` partition layout [[CurationIngest]] and
  * [[IncrementalNearDup]] both use for replay-idempotent state: each
  * epoch overwrites its own partition, and readers EXCLUDE the
  * current epoch's partition so a retry's half-committed data never
  * masks its recomputation. */
object BatchLedger {

  /** All rows from prior batches, or None before the first committed
    * batch (partition discovery needs >=1 `batch_id=` dir). */
  def readOtherBatches(spark: SparkSession, dir: String,
      excludeBatch: Long): Option[DataFrame] = {
    val root = new java.io.File(dir)
    if (root.exists() && root.listFiles().exists(_.getName.startsWith("batch_id=")))
      // mergeSchema: a ledger whose row schema grew across eras (e.g.
      // VectorIngest adding n_index_rows) must not infer from one
      // footer and drop the new column — late columns read as null in
      // pre-change partitions, which is the audit-friendly semantics
      Some(spark.read.option("basePath", dir)
        .option("mergeSchema", "true").parquet(dir)
        .filter(col("batch_id") =!= excludeBatch)
        .drop("batch_id"))
    else None
  }
}
