package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The composed streaming curation DAG — the four spec-tested stages
  * wired into ONE per-micro-batch pipeline:
  *
  *   ingest ([[CurationIngest]]: score + language agreement + exact
  *   dedup vs the hash ledger)
  *     → near-dup admission ([[IncrementalNearDup]]: MinHash-LSH vs
  *       the accumulated signature index)
  *       → rollup maintenance ([[RollupMaintenance.mergeDelta]]:
  *         per-(hour, lang) curation metrics, batch-stamped)
  *         → atomic publish ([[graft.sources.AtomicSink]]: staged
  *           task writes, driver commit, `_SUCCESS` manifest last).
  *
  * EXACTLY-ONCE under at-least-once foreachBatch: every stage's
  * durable effect is keyed so a replay of the same epoch CONVERGES
  * instead of duplicating —
  *
  *   - curated store + hash ledger: batch-keyed partitions,
  *     overwritten; the dedup join excludes the replaying batch's own
  *     half-written partition (CurationIngest's contract);
  *   - signature index: same batch-keyed overwrite (IncrementalNearDup);
  *   - rollup: the `last_batch` stamp guard — a partition already
  *     carrying this batch's stamp passes through unmerged
  *     (RollupMaintenance.mergeDelta), and the FIRST batch creates the
  *     store stamped with its own id for the same reason;
  *   - publish: per-batch target dir, PRE-CLEANED then re-published
  *     through the staged-commit sink — readers gate on the `_SUCCESS`
  *     manifest, which is written last, so a reader never sees a
  *     half-replaced batch.
  *
  * A crash BETWEEN stages leaves a prefix of the stages durable; the
  * retried epoch re-runs all four, the completed prefix converges
  * in-place, and the missing suffix is produced — CurationPipelineSpec
  * kills the epoch at each inter-stage boundary and proves the final
  * state is bit-identical to a crash-free run.
  *
  * Scale: the stages share the micro-batch scan; cross-batch state
  * (ledger hashes, 64-long signatures, aggregate-class rollup rows) is
  * compact and partition-pruned — nothing rereads or retains the
  * historical corpus text.
  */
object CurationPipeline {

  final case class Dirs(base: String) {
    val curated = s"$base/curated"
    val ledger = s"$base/ledger"
    val nearDupIndex = s"$base/nd_index"
    val rollup = s"$base/rollup"
    val publish = s"$base/publish"
    val checkpoint = s"$base/__checkpoint"
  }

  /** Deterministic per-doc event time for the metrics rollup (a
    * production ingest stamps arrival time; the harness needs replays
    * to produce identical rollup rows). */
  private def docTs: org.apache.spark.sql.Column =
    to_timestamp(from_unixtime(lit(1700000000L) + col("doc_id") * 60))

  /** One micro-batch through the four composed stages. Idempotent per
    * `batchId` — see class doc. */
  def processBatch(spark: SparkSession, batch: DataFrame, dirs: Dirs,
      batchId: Long, tau: Double = 0.5): Unit = {
    // stage 1 — exact: score, filter, dedup vs ledger; batch-keyed write
    CurationIngest.processBatch(spark, batch, dirs.curated, dirs.ledger, batchId)
    val survivors = spark.read
      .parquet(s"${dirs.curated}/batch_id=$batchId") // (doc_id, lang, quality)
    val withText = survivors.join(batch.select("doc_id", "text"), "doc_id")

    // stage 2 — near-dup: LSH admission vs the signature index
    val admittedIds = IncrementalNearDup.processBatch(spark,
      withText.select("doc_id", "text"), dirs.nearDupIndex, batchId, tau)
    val admitted = withText.join(admittedIds, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "quality").persist()
    try {
      // stage 3 — rollup: per-(hour, lang) admitted-doc metrics,
      // stamp-guarded so a replayed epoch can't double-merge
      val events = admitted.select(docTs.as("ts"),
        col("lang").as("event_type"), col("quality").cast("double").as("value"))
      if (!new java.io.File(dirs.rollup).exists())
        RollupMaintenance.buildStore(events, dirs.rollup, stamp = s"b$batchId")
      else
        RollupMaintenance.mergeDelta(spark, dirs.rollup, events, s"b$batchId")

      // stage 4 — atomic publish: batch-keyed dir, pre-cleaned so a
      // replay REPLACES a previously-committed copy instead of adding
      // files beside it; the sink stages per-task and manifests last
      val target = s"${dirs.publish}/batch_id=$batchId"
      deleteRecursively(new java.io.File(target))
      admitted.write.format("graft.sources.AtomicSink")
        .option("path", target).mode("append").save()
    } finally admitted.unpersist()
  }

  /** File-stream form: one micro-batch per arriving file
    * (AvailableNow for replay harnesses). Restart-safe: a new start()
    * on the same checkpoint resumes at the first uncommitted epoch and
    * replays it through the idempotent [[processBatch]]. */
  def start(spark: SparkSession, sourceDir: String, dirs: Dirs,
      tau: Double = 0.5): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, dirs, batchId, tau)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dirs.checkpoint)
      .start()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
