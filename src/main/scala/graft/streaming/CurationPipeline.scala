package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Fs

/** The composed streaming curation DAG — the five spec-tested stages
  * wired into ONE per-micro-batch pipeline:
  *
  *   ingest ([[CurationIngest]]: score + language agreement + exact
  *   dedup vs the hash ledger)
  *     → near-dup admission ([[IncrementalNearDup]]: MinHash-LSH vs
  *       the accumulated signature index)
  *       → rollup maintenance ([[RollupMaintenance.mergeDelta]]:
  *         per-(hour, lang) curation metrics, batch-stamped)
  *         → frequency-sketch maintenance ([[SketchMaintenance]]:
  *           the per-source CMS the admission throttle probes,
  *           batch-stamped)
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
  *   - frequency sketch: the identical stamp guard on the dense CMS
  *     store (SketchMaintenance.mergeDelta) — a replayed fold is a
  *     rewrite-unchanged, so streamed-through-crashes cells stay
  *     bit-identical to a batch-built sketch over the admitted set;
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
    val sketch = s"$base/cms"
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
    // read the batch's survivors back (the durable form IS the stage
    // boundary — a retry sees exactly what the first attempt
    // committed). An all-filtered batch commits a partition with no
    // data files, which parquet schema inference can't read — feed the
    // downstream stages an explicitly-typed empty frame instead so an
    // empty micro-batch flows through the DAG rather than wedging it.
    val batchDir = s"${dirs.curated}/batch_id=$batchId"
    val survivors = // (doc_id, lang, quality)
      if (Fs.hasCommittedParquet(new java.io.File(batchDir)))
        spark.read.parquet(batchDir)
      else
        // derive the empty frame from the SAME lineage CurationIngest
        // writes (score → project), so the two schemas cannot drift —
        // a hand-built StructType here would silently diverge the
        // empty-batch path when the ingest stage adds/renames a column
        graft.ext.PipelineOps.curationScore(batch)
          .select("doc_id", "lang", "quality").filter(lit(false))
    val withText = survivors.join(batch.select("doc_id", "text"), "doc_id")

    // stage 2 — near-dup: LSH admission vs the signature index
    val admittedIds = IncrementalNearDup.processBatch(spark,
      withText.select("doc_id", "text"), dirs.nearDupIndex, batchId, tau)
    val admitted = withText.join(admittedIds, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "quality").persist()
    try {
      // stage 3 — rollup: per-(hour, lang) admitted-doc metrics,
      // stamp-guarded so a replayed epoch can't double-merge. The
      // bootstrap-vs-merge dispatch checks for COMMITTED parquet data,
      // not bare directory existence: an all-filtered first batch (an
      // empty partitioned write commits no data files) or a crash
      // inside buildStore would otherwise leave a dataless directory
      // that sends every retry down mergeDelta's store read — failing
      // schema inference deterministically, wedging the stream.
      val events = admitted.select(docTs.as("ts"),
        col("lang").as("event_type"), col("quality").cast("double").as("value"))
      if (!Fs.hasCommittedParquet(new java.io.File(dirs.rollup)))
        RollupMaintenance.buildStore(events, dirs.rollup, stamp = s"b$batchId")
      else
        RollupMaintenance.mergeDelta(spark, dirs.rollup, events, s"b$batchId")

      // stage 4 — frequency sketch: fold the admitted docs' source
      // keys into the CMS store ([[SketchMaintenance]] — the
      // per-domain admission-throttle/cap service a curation loop
      // probes). CMS linearity makes maintenance per-batch-local (no
      // history rescan); the same `last_batch` stamp guard as the
      // rollup makes a replayed epoch rewrite the store UNCHANGED
      // instead of double-folding. The dense store always commits
      // data files (1024 rows even from an all-filtered batch), so
      // the bootstrap-vs-merge dispatch has no dataless-dir hazard —
      // but the first build must still stamp the REAL batch id, or a
      // crash-after-build retry would merge the same cells again.
      val admittedSrc = admitted.join(batch.select("doc_id", "source"), "doc_id")
      if (!Fs.hasCommittedParquet(new java.io.File(dirs.sketch)))
        SketchMaintenance.build(admittedSrc, col("source"), dirs.sketch,
          stamp = s"b$batchId")
      else
        SketchMaintenance.mergeDelta(spark, dirs.sketch, admittedSrc,
          col("source"), s"b$batchId")

      // stage 5 — atomic publish: batch-keyed dir, pre-cleaned so a
      // replay REPLACES a previously-committed copy instead of adding
      // files beside it; the sink stages per-task and manifests last
      val target = s"${dirs.publish}/batch_id=$batchId"
      Fs.deleteRecursively(new java.io.File(target))
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
}
