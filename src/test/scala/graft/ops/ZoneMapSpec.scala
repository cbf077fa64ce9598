package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("build: one catalog row per data file, counts add up") {
    val base = tempDir("zm_build")
    val df = (0L until 1000L).map(i => (i, i % 10, s"p$i")).toDF("k", "g", "payload")
    Layout.writeRangeLayout(df, s"$base/data", 4, "k")

    val stats = ZoneMap.build(spark, s"$base/data", Seq("k", "g"))
    val rows = stats.collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("n_rows")).sum === 1000L)
    // global min/max reassemble from the per-file stats
    assert(rows.map(_.getAs[Long]("min_k")).min === 0L)
    assert(rows.map(_.getAs[Long]("max_k")).max === 999L)
  }

  test("pruneRange == plain filter, and it actually prunes files") {
    val base = tempDir("zm_prune")
    val df = (0L until 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
    Layout.writeRangeLayout(df, s"$base/data", 8, "k")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    val stats = ZoneMap.read(spark, s"$base/zm")

    val pruned = ZoneMap.pruneRange(spark, s"$base/data", stats,
      "k", lit(100L), lit(199L))
    val full = spark.read.parquet(s"$base/data")
      .filter(col("k") >= 100L && col("k") <= 199L)
    assert(pruned.collect().toSet === full.collect().toSet)

    // a 10% band over 8 range-disjoint files touches at most 2
    val surviving = ZoneMap.survivingFiles(stats, "k", lit(100L), lit(199L))
    assert(surviving.nonEmpty && surviving.length <= 2,
      s"expected <=2 surviving files, got ${surviving.length}")
  }

  test("boundaries are inclusive on both ends") {
    val base = tempDir("zm_bounds")
    val df = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    Layout.writeRangeLayout(df, s"$base/data", 4, "k")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    val stats = ZoneMap.read(spark, s"$base/zm")

    val one = ZoneMap.pruneRange(spark, s"$base/data", stats,
      "k", lit(42L), lit(42L)).collect()
    assert(one.map(_.getLong(0)).toSeq === Seq(42L))
  }

  test("all-null files are skipped; files with some nulls survive on their non-null range") {
    val base = tempDir("zm_nulls")
    // file 1: k in [0,9]; file 2: k all null; file 3: k null-or-[20,29]
    (0L until 10L).map(i => (Some(i), "a")).toDF("k", "tag")
      .coalesce(1).write.parquet(s"$base/data")
    Seq.fill(10)((None: Option[Long], "b")).toDF("k", "tag")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    (20L until 30L).map(i => (if (i % 2 == 0) Some(i) else None, "c")).toDF("k", "tag")
      .coalesce(1).write.mode("append").parquet(s"$base/data")

    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    val stats = ZoneMap.read(spark, s"$base/zm")
    assert(stats.count() === 3)

    // range over the third file only: the all-null file must drop out
    val surviving = ZoneMap.survivingFiles(stats, "k", lit(20L), lit(29L))
    assert(surviving.length === 1)
    val pruned = ZoneMap.pruneRange(spark, s"$base/data", stats,
      "k", lit(20L), lit(29L))
    val full = spark.read.parquet(s"$base/data")
      .filter(col("k") >= 20L && col("k") <= 29L)
    assert(pruned.collect().toSet === full.collect().toSet)
  }

  test("incremental update stats only the new files and matches a full rebuild") {
    val base = tempDir("zm_update")
    (0L until 100L).map(i => (i, s"a$i")).toDF("k", "payload")
      .coalesce(1).write.parquet(s"$base/data")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))

    // ingest batch: two more files land
    (100L until 200L).map(i => (i, s"b$i")).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    (200L until 300L).map(i => (i, s"c$i")).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/data")

    assert(ZoneMap.update(spark, s"$base/data", s"$base/zm", Seq("k")) === 2)
    // idempotent: nothing new on the second call
    assert(ZoneMap.update(spark, s"$base/data", s"$base/zm", Seq("k")) === 0)

    val incremental = ZoneMap.read(spark, s"$base/zm")
      .collect().map(r => (r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))).toSet
    val rebuilt = ZoneMap.build(spark, s"$base/data", Seq("k"))
      .collect().map(r => (r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))).toSet
    assert(incremental === rebuilt)

    // and the maintained catalog prunes correctly over the grown table
    val stats = ZoneMap.read(spark, s"$base/zm")
    val pruned = ZoneMap.pruneRange(spark, s"$base/data", stats,
      "k", lit(250L), lit(260L))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === (250L to 260L))
    assert(ZoneMap.survivingFiles(stats, "k", lit(250L), lit(260L)).length === 1)
  }

  test("2-D box over a Z-order layout: prunes harder than either dimension alone, rows exact") {
    val base = tempDir("zm_box")
    // a 64x64 grid: both dimensions uniform, so a Z-order layout
    // gives each of the 16 files a tight 2-D tile
    val df = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "a", "b")
    Layout.writeZOrderLayout(df, s"$base/data", 16, "a", "b", bits = 8)
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("a", "b"))
    val stats = ZoneMap.read(spark, s"$base/zm")

    val preds = Seq(("a", lit(10L), lit(20L)), ("b", lit(10L), lit(20L)))
    val pruned = ZoneMap.pruneBox(spark, s"$base/data", stats, preds)
    val full = spark.read.parquet(s"$base/data")
      .filter(col("a").between(10L, 20L) && col("b").between(10L, 20L))
    assert(pruned.collect().toSet === full.collect().toSet)

    val boxFiles = ZoneMap.survivingBoxFiles(stats, preds)
    val aOnly = ZoneMap.survivingBoxFiles(stats, preds.take(1))
    val bOnly = ZoneMap.survivingBoxFiles(stats, preds.drop(1))
    assert(boxFiles < 16, s"box did not prune: $boxFiles")
    assert(boxFiles < aOnly && boxFiles < bOnly,
      s"box ($boxFiles) must beat single dims (a=$aOnly, b=$bOnly)")
  }

  test("a file appended after the catalog build is scanned, never silently pruned") {
    val base = tempDir("zm_stale")
    (0L until 100L).map(i => (i, s"a$i")).toDF("k", "payload")
      .coalesce(1).write.parquet(s"$base/data")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    // post-build append INSIDE the probed range: a catalog-only prune
    // would silently lose these rows — the completeness gate must
    // scan the uncataloged file unpruned
    (100L until 110L).map(i => (i, s"b$i")).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    val stats = ZoneMap.read(spark, s"$base/zm")

    val pruned = ZoneMap.pruneRange(spark, s"$base/data", stats,
      "k", lit(90L), lit(200L))
    val full = spark.read.parquet(s"$base/data")
      .filter(col("k") >= 90L && col("k") <= 200L)
    assert(pruned.collect().toSet === full.collect().toSet)
    assert(pruned.count() === 20L) // 90..99 cataloged + 100..109 fresh

    // an update re-catalogs the rider; pruning resumes losslessly
    assert(ZoneMap.update(spark, s"$base/data", s"$base/zm", Seq("k")) === 1)
    val pruned2 = ZoneMap.pruneRange(spark, s"$base/data",
      ZoneMap.read(spark, s"$base/zm"), "k", lit(90L), lit(200L))
    assert(pruned2.collect().toSet === full.collect().toSet)
  }

  test("empty survivor set returns an empty frame with the table schema") {
    val base = tempDir("zm_empty")
    val df = (0L until 100L).map(i => (i, s"p$i")).toDF("k", "payload")
    Layout.writeRangeLayout(df, s"$base/data", 2, "k")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    val stats = ZoneMap.read(spark, s"$base/zm")

    val none = ZoneMap.pruneRange(spark, s"$base/data", stats,
      "k", lit(5000L), lit(6000L))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("k", "payload"))
  }
}
