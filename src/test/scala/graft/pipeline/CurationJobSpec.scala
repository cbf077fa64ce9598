package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Histogram, MaintenanceJob, TableStats}

/** The two spark-submit entry points `airflow/graft_curation_dag.py`
  * schedules, driven end-to-end in sequence exactly as the DAG
  * sequences them: CurationJob drains the landing dir through the
  * composed pipeline, then MaintenanceJob compacts the curated store
  * and refreshes its stats in the post-writer idle window.
  */
class CurationJobSpec extends SparkSpec {
  import spark.implicits._

  private def fam(sentence: String) = (sentence + " ") * 3
  private val famA = fam("the quick brown fox jumps over the lazy dog and then the fox rests in the shade of a tall tree because it is tired")
  private val famB = fam("a gentle river flows through the wide green valley while the clear water shines under the warm morning sun and small birds sing")

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src").as("source"), length(col("text")).as("n_chars"))

  test("CurationJob then MaintenanceJob — the scheduled slot end-to-end") {
    val base = Files.createTempDirectory("curation_job").toString
    val (src, pipeBase) = (s"$base/landing", s"$base/pipe")
    // two files -> two micro-batches; doc 3 is an exact dup of doc 1
    docs((1L, famA)).coalesce(1).write.parquet(src)
    docs((2L, famB), (3L, famA)).coalesce(1).write.mode("append").parquet(src)

    val stats = CurationJob.run(spark, src, pipeBase)
    assert(stats("published_batches") === 2L, stats)
    assert(stats("admitted_docs") === 2L, stats) // 1 and 2; 3 deduped

    // a rerun of the same slot (Airflow retry) drains nothing new and
    // leaves the durable counts unchanged
    val retry = CurationJob.run(spark, src, pipeBase)
    assert(retry === stats, s"$retry vs $stats")

    // maintenance: compact the per-batch small files, refresh stats +
    // the doc_id equi-depth histogram
    val curated = s"$pipeBase/curated"
    val m = MaintenanceJob.run(spark, curated, histColumns = Seq("doc_id"))
    assert(m("rows") === 2L, m)
    assert(m("data_files") >= 1L && m("data_files") <= 2L, m)
    // batch_id partitioning survived the rewrite; rows intact
    val back = spark.read.option("basePath", curated).parquet(curated)
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(back.columns.contains("batch_id"))
    // stats landed in the layout statsJoin consumers read
    val ts = TableStats.read(spark, s"$curated-__stats")
    assert(TableStats.rowCount(ts) === 2L)
    // the histogram landed in the layout the broadcast gate consults:
    // with 2 rows the boundaries are the median and max doc_ids, and
    // the estimate bracket is immediately usable
    val hist = Histogram.read(spark, s"$curated-__hist/doc_id")
    assert(hist.count() === 2L, "expected 2 distinct boundary ranks")
    assert(Histogram.estHiLe(hist, "v",
      org.apache.spark.sql.functions.lit(999L)) === 2L)
  }
}
