package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range layout lets a filtered scan skip row groups via footer stats") {
    val base = Files.createTempDirectory("layout").toString
    // 100k rows, values 0..99999 in hash-scrambled (random-ish) order
    val rows = spark.range(100000)
      .select((col("id") * 48271 % 100000).as("v"), col("id").as("payload"))

    rows.write.parquet(s"$base/scrambled")
    Layout.writeRangeLayout(rows, s"$base/ranged", numFiles = 10, "v")

    // both layouts return identical results... (collect, not count:
    // metrics must land on THIS plan, and count() builds its own)
    val scrambled = spark.read.parquet(s"$base/scrambled")
      .filter(col("v") between (1000, 2999))
    assert(scrambled.collect().length === 2000)
    val ranged = spark.read.parquet(s"$base/ranged")
      .filter(col("v") between (1000, 2999))
    assert(ranged.collect().length === 2000)

    // ...but the ranged layout materializes a fraction of the rows:
    // every scrambled file's [min,max] spans the whole domain (nothing
    // prunes), while only the one range-disjoint file covering
    // [1000,2999] survives footer pruning
    val scannedScrambled = Layout.scannedRows(scrambled)
    val scannedRanged = Layout.scannedRows(ranged)
    assert(scannedScrambled === 100000L, s"scrambled scanned $scannedScrambled")
    assert(scannedRanged <= 20000L, s"ranged scanned $scannedRanged")
  }

  test("scannedRows sees through AQE query stages (shuffled plans)") {
    val base = Files.createTempDirectory("layout_aqe").toString
    spark.range(10000).select((col("id") % 100).as("g"), col("id").as("v"))
      .write.parquet(s"$base/t")
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      // aggregation => Exchange => AQE wraps the scan in a query stage
      val df = spark.read.parquet(s"$base/t").groupBy("g").count()
      assert(df.collect().length === 100)
      assert(Layout.scannedRows(df) === 10000L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("bloom layout prunes row groups for point lookups on scattered values") {
    val base = Files.createTempDirectory("layout_bloom").toString
    val rows = spark.range(100000)
      .select((col("id") * 48271 % 100000).as("v"), col("id").as("payload"))

    rows.repartition(10).write.parquet(s"$base/plain")
    Layout.writeBloomLayout(rows, s"$base/bloomed", "v",
      numFiles = 10, expectedNdv = 100000L)

    def probe(dir: String) = {
      val df = spark.read.parquet(dir).filter(col("v") === 12345)
      assert(df.collect().length === 1)
      Layout.scannedRows(df)
    }
    val plain = probe(s"$base/plain")
    val bloomed = probe(s"$base/bloomed")
    // no layout sorts v, so min/max can't prune the plain files; the
    // bloom filter rules out row groups that can't contain the value
    assert(plain === 100000L, s"plain scanned $plain")
    assert(bloomed <= 30000L, s"bloomed scanned $bloomed")
  }

  test("files are range-disjoint and internally sorted") {
    val base = Files.createTempDirectory("layout_sorted").toString
    val rows = spark.range(10000)
      .select((col("id") * 7919 % 10000).as("v"))
    Layout.writeRangeLayout(rows, s"$base/ranged", numFiles = 4, "v")

    val perFile = spark.read.parquet(s"$base/ranged")
      .select(col("v"), input_file_name().as("f"))
      .groupBy("f").agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
      .collect()
    assert(perFile.length === 4)
    // no two files overlap in their [lo, hi] ranges
    val ranges = perFile.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.toSeq)
      case _ => ()
    }
  }
}
