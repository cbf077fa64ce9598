package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextFunctions.{bm25TermScore, wsTokens}

/** Materialized inverted index: the physical-layout half of text
  * retrieval, the analog of [[VectorIndex]] for the BM25 operator
  * (`q_bm25` demonstrates the full-scan query shape; this writes
  * posting lists PARTITIONED BY term-hash bucket so a query reads only
  * its terms' buckets).
  *
  * At 100 TB the full-scan form reads every document per query; the
  * index inverts that cost once at build time — one explode + one
  * aggregation — and each query then touches `|terms|` of `nBuckets`
  * hive partitions (statically pruned: the probe set is a literal
  * IN-list resolved before the scan), with `term` min/max + dictionary
  * footer stats pruning row groups inside a bucket (postings are
  * written term-sorted). Doc lengths and the single-row corpus stats
  * are materialized beside the postings so probes never touch the
  * original corpus.
  */
object InvertedIndex {

  /** Build the index at `dir`: `postings/` (term, doc_id, tf) hive-
    * partitioned by term-hash bucket and sorted by term within files,
    * `docstats/` (doc_id, dl), `stats/` one row (n_docs, total_dl,
    * n_buckets). One explode + one combine-side-reduced aggregation —
    * the same cost class as any corpus-wide token aggregation. */
  def build(docs: DataFrame, dir: String, nBuckets: Int = 64): Unit = {
    val base = docs
      .select(col("doc_id"),
        filter(wsTokens(col("text")), t => t =!= "").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .persist()
    try {
      base.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
        // one shuffle task per bucket dir, term-sorted files => tight
        // per-row-group term ranges for footer pruning inside a bucket
        .repartition(col("bucket"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$dir/postings")
      base.select("doc_id", "dl")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/docstats")
      base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"),
          lit(nBuckets.toLong).as("n_buckets"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/stats")
    } finally base.unpersist()
  }

  /** Append NEW documents to an existing index — the maintenance path
    * of "build once, probe many", mirroring [[VectorIndex.mergeDelta]]:
    * a corpus growing by deltas must not re-tokenize what's already
    * indexed. Admission is a `doc_id` anti-join against `docstats`
    * (the narrowest stored table — one row per doc), so replaying the
    * same delta after a SUCCESSFUL merge appends nothing twice. The
    * corpus stats row is folded forward with exact integer adds
    * (old + delta), so probe-after-merge is bit-identical to a full
    * rebuild over the union corpus ([[graft.InvertedIndexSpec]]
    * proves it).
    *
    * Write order: postings → docstats → stats. A crash BETWEEN the
    * three writes leaves a window where replay double-appends
    * postings — per-batch atomicity across tables is the batch-ledger
    * pattern ([[graft.streaming.BatchLedger]] / `AtomicSink`), which
    * a production deployment wraps around this call; the function
    * itself stays a pure layout operation.
    *
    * Returns the number of documents appended. */
  def mergeDelta(spark: SparkSession, dir: String, delta: DataFrame): Long = {
    val existing = spark.read.parquet(s"$dir/docstats").select("doc_id")
    // localCheckpoint, NOT persist: the admission plan READS
    // $dir/docstats, which this function also APPENDS to — a cached
    // plan over that path is invalidated by the write (recacheByPath)
    // and would recompute admission against the post-append table
    // (empty delta, NULL stats fold). Eager checkpoint severs the
    // lineage, freezing admission at call time (same hazard + fix as
    // RollupMaintenance.mergeDelta).
    val base = delta.join(existing, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        filter(wsTokens(col("text")), t => t =!= "").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .localCheckpoint(true)
    try {
      val n = base.count()
      if (n > 0) {
        val stats = spark.read.parquet(s"$dir/stats").head()
        val (nDocs, totalDl, nBuckets) =
          (stats.getLong(0), stats.getLong(1), stats.getLong(2))
        base.select(col("doc_id"), explode(col("toks")).as("term"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
          .repartition(col("bucket"))
          .sortWithinPartitions("term", "doc_id")
          .write.mode(SaveMode.Append)
          .partitionBy("bucket").parquet(s"$dir/postings")
        base.select("doc_id", "dl")
          .write.mode(SaveMode.Append).parquet(s"$dir/docstats")
        val d = base.agg(count(lit(1)).as("nd"), sum(col("dl")).as("td")).head()
        import spark.implicits._
        Seq((nDocs + d.getLong(0), totalDl + d.getLong(1), nBuckets))
          .toDF("n_docs", "total_dl", "n_buckets")
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/stats")
      }
      n
    } finally release(base)
  }

  /** Deterministic release of a localCheckpoint'ed frame —
    * Dataset.unpersist alone does not drop checkpoint RDD blocks
    * (same reach-through as RollupMaintenance/PipelineOps). */
  private def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** An OPENED index: the 1-row corpus stats read once, plus the two
    * layout DataFrames resolved once — so every later probe reuses the
    * cached FileIndex (directory listing + schema of the nBuckets-way
    * hive tree) instead of re-enumerating it. Probe latency at serving
    * time is dominated by exactly that per-run metadata work; a real
    * retrieval process holds one of these per index for its lifetime. */
  case class Opened(nDocs: Long, totalDl: Long, nBuckets: Long,
      postings: DataFrame, docstats: DataFrame)

  def open(spark: SparkSession, dir: String): Opened = {
    val stats = spark.read.parquet(s"$dir/stats").head()
    Opened(stats.getLong(0), stats.getLong(1), stats.getLong(2),
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/docstats"))
  }

  /** One-shot convenience probe: open + probe (specs, ad-hoc). Serving
    * paths should hold the [[Opened]] handle and probe that. */
  def probe(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int): DataFrame =
    probe(open(spark, dir), terms, k)

  /** BM25 top-k over the index for a fixed term list — BIT-IDENTICAL
    * to the full-scan `q_bm25` on the same corpus (spec-proven): the
    * probed postings pivot to fixed per-term tf columns, so the score
    * is the same fixed-order column sum over the same
    * [[bm25TermScore]] expression, not an order-dependent SUM over
    * grouped rows (double addition does not commute across orderings).
    *
    * Reads: the probed postings partitions only, and `docstats` joined
    * on doc_id for candidate lengths (corpus stats ride in on the
    * handle). The corpus itself is never touched. */
  def probe(ix: Opened, terms: Seq[String], k: Int): DataFrame = {
    val spark = ix.postings.sparkSession
    val (nDocs, totalDl, nBuckets) = (ix.nDocs, ix.totalDl, ix.nBuckets)

    // bucket ids via the same engine expression the build used (a
    // driver-side reimplementation of xxhash64 could drift)
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).as("bucket"))
      .distinct().as[Long].collect()

    val post = ix.postings
      .filter(col("bucket").isin(buckets.toIndexedSeq: _*)) // static partition pruning
      .filter(col("term").isin(terms: _*)) // footer-pruned within buckets

    // per-term df for the probed terms: count over the term's own
    // postings — identical to the full-scan SUM(tf>0) by construction
    val dfRow = post.groupBy().agg(
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df$i")
      }.head,
      terms.zipWithIndex.drop(1).map { case (t, i) =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df$i")
      }: _*)

    // pivot candidates to fixed tf columns (one posting per
    // (doc, term), so max() just selects it; absent term -> 0)
    val cand = post.groupBy("doc_id").agg(
      terms.zipWithIndex.map { case (t, i) =>
        coalesce(max(when(col("term") === t, col("tf"))), lit(0L)).as(s"tf$i")
      }.head,
      terms.zipWithIndex.drop(1).map { case (t, i) =>
        coalesce(max(when(col("term") === t, col("tf"))), lit(0L)).as(s"tf$i")
      }: _*)

    val scored = cand
      .join(ix.docstats, "doc_id")
      .crossJoin(broadcast(dfRow))
      .withColumn("score", terms.indices.map { i =>
        bm25TermScore(col(s"tf$i"), col(s"df$i"), col("dl"),
          lit(nDocs), lit(totalDl))
      }.reduceLeft(_ + _))
      .filter(col("score") > 0)
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .select("doc_id", "dl", "score")
  }
}
