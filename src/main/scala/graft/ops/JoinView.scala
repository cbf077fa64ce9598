package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view (IVM for the bilinear case):
  * keep V = A join B on a key up to date under batched APPENDS to
  * either side without ever re-running the full join.
  *
  * Delta algebra for appends:
  *     dV = dA join (B_old UNION dB)  UNION  A_old join dB
  * — the first term covers dA x B_old and the cross term dA x dB,
  * the second covers A_old x dB; nothing is counted twice because
  * A_old excludes dA. The view grows by appending dV.
  *
  * Scale design — the state is NEVER shuffled:
  *   - both state dirs are hive-partitioned by a join-key hash bucket
  *     (`kb = pmod(hash(key), buckets)`) and by `batch_id`;
  *   - a batch's state reads are PARTITION-PRUNED to the delta's
  *     bucket set (bounded by `buckets`, collected driver-side like
  *     the index probe lists in [[VectorIndex]]/[[InvertedIndex]]);
  *   - the deltas broadcast into both joins (a delta is batch-sized,
  *     state is corpus-sized), so each increment costs two pruned
  *     state scans + two broadcast joins — no state shuffle, no
  *     state rewrite, O(|delta| x selectivity) output.
  *
  * Crash/retry correctness WITHOUT a ledger: every write of batch b
  * is a dynamic-partition overwrite of partitions stamped
  * `batch_id=b`, and every state read EXCLUDES `batch_id=b` — so a
  * retry of b recomputes exactly the same dV against exactly the same
  * pre-b state, whatever subset of b's three writes (view, stateA,
  * stateB) the crashed attempt completed, and overwrites rather than
  * duplicates. Replaying an already-applied batch is a no-op rewrite
  * of identical partitions (spec-proven, including the
  * crash-between-writes schedules).
  */
object JoinView {

  /** Join-key hash buckets for state partition pruning. At 100 TB
    * this is the knob balancing pruning granularity against partition
    * count; 32 keeps spec-scale file counts sane. */
  val Buckets = 32

  private def stamp(df: DataFrame, key: String, batchId: String): DataFrame =
    df.withColumn("kb", pmod(hash(col(key)), lit(Buckets)))
      .withColumn("batch_id", lit(batchId))

  private def writePartitioned(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb", "batch_id")
      .parquet(dir)

  /** State read for batch `batchId`: only the delta's buckets, never
    * the in-flight batch's own (possibly half-written) partitions.
    * private[graft] so the spec can assert the scan partition-prunes. */
  private[graft] def readState(spark: SparkSession, dir: String,
      buckets: Seq[Int], batchId: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("kb").isin(buckets: _*) && col("batch_id") =!= batchId)

  /** Fold one append batch (either side may be empty) into the view
    * and the state. The FIRST batch bootstraps the dirs (a
    * partitioned write of an empty frame commits no data files, so
    * "state exists" is [[Fs.hasCommittedParquet]], never a bare
    * directory probe — see that method's doc for the two traps).
    * See object doc for the algebra + retry argument. */
  /** Delta sides up to this many rows broadcast into the increment
    * joins; beyond it the joins degrade to shuffles. A "delta is
    * batch-sized" assumption frozen into an unconditional hint is
    * exactly the broadcast-OOM class [[TableStats.statsJoin]] exists
    * to prevent — found the hard way when a 7.5M-row demo delta at
    * the 100× replica blew `spark.driver.maxResultSize`. */
  val BroadcastDeltaRows: Long = 4L * 1024 * 1024

  def applyDelta(spark: SparkSession, baseDir: String, key: String,
      dA: DataFrame, dB: DataFrame, batchId: String,
      maxBroadcast: Long = BroadcastDeltaRows): Unit = {
    require(batchId.nonEmpty, "empty batchId")
    val dAs = stamp(dA, key, batchId).localCheckpoint(true)
    val dBs = stamp(dB, key, batchId).localCheckpoint(true)
    // the delta's bucket list: bounded by Buckets, the same
    // sketch-class driver state as an index probe list
    val touched = (dAs.select("kb").distinct().collect() ++
      dBs.select("kb").distinct().collect()).map(_.getInt(0)).distinct.toSeq
    if (touched.nonEmpty) {
      val dAp = dAs.drop("kb", "batch_id")
      val dBp = dBs.drop("kb", "batch_id")
      val aOld =
        if (Fs.hasCommittedParquet(new java.io.File(s"$baseDir/stateA")))
          readState(spark, s"$baseDir/stateA", touched, batchId)
            .drop("kb", "batch_id")
        else dAp.limit(0)
      val bOld =
        if (Fs.hasCommittedParquet(new java.io.File(s"$baseDir/stateB")))
          readState(spark, s"$baseDir/stateB", touched, batchId)
            .drop("kb", "batch_id")
        else dBp.limit(0)
      // measured broadcast gate (counts are cheap — the deltas are
      // localCheckpointed): same rows either way, only the exchange
      // strategy changes
      def gate(df: DataFrame): DataFrame =
        if (df.count() <= maxBroadcast) broadcast(df) else df
      val dV = gate(dAp).join(bOld.unionByName(dBp), key)
        .unionByName(aOld.join(gate(dBp), key))
      // view partitions stamp with the batch that produced them: the
      // retry overwrite granularity
      writePartitioned(stamp(dV, key, batchId), s"$baseDir/view")
      writePartitioned(dAs, s"$baseDir/stateA")
      writePartitioned(dBs, s"$baseDir/stateB")
    }
    Seq(dAs, dBs).foreach {
      _.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }
    }
  }

  /** The maintained view, shaped like the plain join (maintenance
    * columns dropped). */
  def read(spark: SparkSession, baseDir: String): DataFrame = {
    require(Fs.hasCommittedParquet(new java.io.File(s"$baseDir/view")),
      s"no view at $baseDir/view — apply a non-empty batch first")
    spark.read.parquet(s"$baseDir/view").drop("kb", "batch_id")
  }
}
