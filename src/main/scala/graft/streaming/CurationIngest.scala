package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.PipelineOps

/** Streaming training-data curation ingest: the micro-batch form of
  * `q_training_pipeline` — documents arrive as files, each batch is
  * scored (quality + language agreement), deduplicated within the
  * batch AND against everything already ingested, and survivors are
  * appended to the curated store.
  *
  * Cross-batch dedup is a `left_anti` join of the batch against the
  * accumulated content-hash ledger (itself appended per batch inside
  * the same foreachBatch, so the pair commits together per epoch).
  * First-seen wins — the streaming-native keeper rule (a global
  * min-doc_id keeper is unknowable while later batches are still
  * arriving). At scale the ledger is a compact (hash)-only table,
  * hash-partitioned; the anti-join is one shuffle on uniform 128-bit
  * keys, and the batch side is micro-batch-sized. State never lives in
  * executor memory — this is why foreachBatch + a ledger table beats
  * `dropDuplicates` streaming state for an unbounded corpus.
  */
object CurationIngest {

  /** One micro-batch: score, filter, dedup (in-batch then vs ledger),
    * append survivors to `outDir` and their hashes to `ledgerDir`.
    * Exposed for direct testing; [[start]] wires it into foreachBatch. */
  def processBatch(spark: SparkSession, batch: DataFrame,
      outDir: String, ledgerDir: String): Unit = {
    val scored = PipelineOps.curationScore(batch)
      .filter(col("quality") >= 0.5 && col("lang_pred") === col("lang"))
    // in-batch keeper: min doc_id per hash (deterministic)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy("doc_id")
    val inBatch = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val fresh = ledger(spark, ledgerDir) match {
      case Some(seen) => inBatch.join(seen, Seq("content_hash"), "left_anti")
      case None => inBatch
    }
    val out = fresh.select("doc_id", "lang", "quality", "content_hash").persist()
    try {
      out.drop("content_hash")
        .write.mode(SaveMode.Append).parquet(outDir)
      out.select("content_hash")
        .write.mode(SaveMode.Append).parquet(ledgerDir)
    } finally out.unpersist()
  }

  private def ledger(spark: SparkSession, dir: String): Option[DataFrame] =
    if (new java.io.File(dir).exists()) Some(spark.read.parquet(dir)) else None

  /** File-stream ingest over a parquet directory (AvailableNow for
    * replay harnesses; a production run would use a continuous
    * trigger). */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
      ledgerDir: String, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, outDir, ledgerDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir-__checkpoint")
      .start()
  }
}
