package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.ext.TextQueries

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("probe over the materialized index is bit-identical to full-scan q_bm25") {
    val dir = Files.createTempDirectory("invidx").toString
    InvertedIndex.build(Tables(spark, sf, "documents"), dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "dl", "score")
        .as[(Long, Long, Double)].collect().toSeq
    val got = rows(InvertedIndex.probe(spark, dir, TextQueries.bm25Terms, 10))
    val want = rows(SparkEntry.queries("q_bm25")(spark, sf))
    // bit-identical, not approximately equal: same fixed-order double
    // expression tree on both paths (the shared bm25TermScore)
    assert(got === want)
  }

  test("probe scans only the probed term buckets, not the posting corpus") {
    val dir = Files.createTempDirectory("invidx_prune").toString
    InvertedIndex.build(Tables(spark, sf, "documents"), dir, nBuckets = 64)
    val all = spark.read.parquet(s"$dir/postings")
    val total = all.count()

    // the probe-shaped postings read: literal bucket IN-list (static
    // partition pruning) + term filter (footer-pruned inside buckets)
    val terms = TextQueries.bm25Terms
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(64L)).as("b"))
      .distinct().as[Long].collect()
    val probed = all.filter(col("bucket").isin(buckets.toIndexedSeq: _*))
    assert(probed.collect().length.toLong < total)
    val scanned = Layout.scannedRows(probed)
    // 4 terms over 64 buckets: the probed partitions hold a small
    // fraction of the posting rows (bucket dirs are whole-term units,
    // so the bound is loose but must stay well under the corpus)
    assert(scanned <= total / 4,
      s"scanned $scanned of $total posting rows")
    // and the plan prunes at the partition level, not with a runtime filter
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [bucket"), plan)
  }

  test("mergeDelta: probe after incremental append == probe of full rebuild") {
    val docs = Tables(spark, sf, "documents")
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)

    val merged = Files.createTempDirectory("invidx_merge").toString
    InvertedIndex.build(half, merged)
    val appended = InvertedIndex.mergeDelta(spark, merged, rest)
    assert(appended === rest.count())

    val rebuilt = Files.createTempDirectory("invidx_rebuild").toString
    InvertedIndex.build(docs, rebuilt)

    def rows(dir: String) =
      InvertedIndex.probe(spark, dir, TextQueries.bm25Terms, 10)
        .as[(Long, Long, Double)].collect().toSeq
    // bit-identical, not approximate: tf/dl/df are integers, the
    // folded stats row is exact integer adds, and the score is the
    // same fixed-order double expression on both layouts
    assert(rows(merged) === rows(rebuilt))

    // replaying the same delta admits nothing (doc_id anti-join)
    assert(InvertedIndex.mergeDelta(spark, merged, rest) === 0L)
    assert(rows(merged) === rows(rebuilt))
  }
}
