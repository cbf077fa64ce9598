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

  test("zOrder interleaves bits (Morton index)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.zOrder(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i + 1)) |
        (((b >> i) & 1L) << (2 * i))).reduce(_ | _)
    assert(rows === Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(3, 5), morton(65535, 65535)))
    assert(rows.last === (1L << 32) - 1) // all 32 bits set
  }

  test("Z-order layout prunes on BOTH dimensions; 1-D range layout only on its own") {
    val base = Files.createTempDirectory("layout_z").toString
    // two INDEPENDENT uniform columns (hash-scrambled so insertion
    // order correlates with neither)
    val rows = spark.range(100000).select(
      (col("id") * 48271 % 1000).as("x"),
      (col("id") * 25214903917L % 1000).as("y"),
      col("id").as("payload"))
    Layout.writeRangeLayout(rows, s"$base/by_x", numFiles = 16, "x")
    Layout.writeZOrderLayout(rows, s"$base/zorder", numFiles = 16, "x", "y",
      bits = 10)

    def scanned(dir: String, filter: org.apache.spark.sql.Column,
        expectRows: Long): Long = {
      val df = spark.read.parquet(dir).filter(filter)
      assert(df.collect().length === expectRows)
      Layout.scannedRows(df)
    }
    // y-only filter: the by-x layout has no y locality at all — every
    // file spans the y domain; Z-order gives y partial locality
    val xFilter = col("x") between (100, 199)
    val yFilter = col("y") between (100, 199)
    val xByX = scanned(s"$base/by_x", xFilter, rows.filter(xFilter).count())
    val yByX = scanned(s"$base/by_x", yFilter, rows.filter(yFilter).count())
    val xZ = scanned(s"$base/zorder", xFilter, rows.filter(xFilter).count())
    val yZ = scanned(s"$base/zorder", yFilter, rows.filter(yFilter).count())
    assert(yByX === 100000L, s"by-x pruned a y filter?! $yByX")
    // THE Z-order value proposition: the 1-D layout serves one
    // dimension perfectly and the other not at all (worst case =
    // full scan); Z-order bounds the WORST dimension — both filters
    // scan a fraction (with 16 files each covers ~1/16 of z-space =
    // a ~quarter-by-quarter block of the (x, y) domain)
    assert(math.max(xZ, yZ) <= 60000L,
      s"z-order worst-dimension scan: x=$xZ y=$yZ")
    assert(math.max(xZ, yZ) < math.max(xByX, yByX),
      s"z-order (x=$xZ y=$yZ) vs by-x (x=$xByX y=$yByX)")

    // 2-D box: both box dimensions prune at once
    val box = xFilter && yFilter
    val boxZ = scanned(s"$base/zorder", box, rows.filter(box).count())
    assert(boxZ <= 30000L, s"z-order scanned $boxZ for a 1% box")
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

  test("layout specs round-trip their serialized property form; corruption is loud") {
    val specs = Seq(
      Layout.RangeSpec(8, Seq("k")),
      Layout.RangeSpec(16, Seq("a", "b")),
      Layout.RangeAutoSpec(1000000L, Seq("k")),
      Layout.ZOrderSpec(16, "x", "y", 30))
    specs.foreach { s =>
      assert(Layout.parseSpec(s.serialized) === s, s.serialized)
    }
    // a corrupt property must fail loudly, never silently demote the
    // table to unclustered rewrites
    intercept[IllegalArgumentException](Layout.parseSpec("garbage"))
    intercept[IllegalArgumentException](Layout.parseSpec("range:8:"))
    intercept[IllegalArgumentException](Layout.parseSpec("zorder:8:a:b"))
    // and column names that would break the wire format are rejected
    // at construction, not at some later parse
    intercept[IllegalArgumentException](Layout.RangeSpec(8, Seq("a:b")))
  }
}
