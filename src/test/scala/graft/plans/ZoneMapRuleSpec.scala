package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Layout, ZoneMap}

/** ZoneMapRule: a plain read.filter over a registered table scans only
  * the catalog's surviving files (plan-asserted via the executed
  * scan), returns exactly the unpruned rows, declines when the data
  * dir outruns the catalog, and re-arms after ZoneMap.update.
  */
class ZoneMapRuleSpec extends SparkSpec {

  /** Files the optimized plan's scan would touch — read off the file
    * INDEX (the thing the rule rewrites), not runtime metrics, which
    * under-report on a re-collected frame. */
  private def scannedFiles(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length.toLong
    }.max

  private def mkTable(): String = {
    import spark.implicits._
    val base = Files.createTempDirectory("zmr").toString
    val df = (0L until 1000L).map(i => (i, i % 7, s"p$i")).toDF("k", "g", "payload")
    Layout.writeRangeLayout(df, s"$base/data", 8, "k")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    base
  }

  private def query(base: String): DataFrame =
    spark.read.parquet(s"$base/data")
      .filter(col("k") >= 100L && col("k") <= 199L)

  test("plain read.filter scans only surviving files, rows identical") {
    val base = mkTable()
    val before = query(base).collect().toSet // rule not yet armed for this dir
    ZoneMapRule.install(spark)
    ZoneMapRule.register(spark, s"$base/data", s"$base/zm", Seq("k"))
    try {
      val pruned = query(base)
      assert(pruned.collect().toSet === before)
      val n = scannedFiles(pruned)
      assert(n >= 1 && n <= 2, s"expected <=2 files scanned, got $n")
    } finally ZoneMapRule.deregister(s"$base/data")
  }

  test("equality predicate prunes to one file; untracked/unbounded filters decline") {
    import spark.implicits._
    val base = mkTable()
    ZoneMapRule.install(spark)
    ZoneMapRule.register(spark, s"$base/data", s"$base/zm", Seq("k"))
    try {
      val eq = spark.read.parquet(s"$base/data").filter(col("k") === 500L)
      assert(eq.collect().map(_.getLong(0)).toSeq === Seq(500L))
      assert(scannedFiles(eq) === 1L)

      // IN-list: widened to [min, max] of the values — close values
      // prune to their covering files, rows exact
      val in = spark.read.parquet(s"$base/data")
        .filter(col("k").isin(210L, 215L, 230L))
      assert(in.collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(210L, 215L, 230L))
      assert(scannedFiles(in) <= 2L)

      // DISJOINT disjuncts prune exactly (union of the two ends —
      // an interval hull would widen to no constraint and scan all 8)
      val tails = spark.read.parquet(s"$base/data")
        .filter(col("k") < 60L || col("k") > 940L)
      assert(tails.count() === 119L)
      assert(scannedFiles(tails) === 2L)

      // OR mixing a readable and an unreadable side declines (the
      // unreadable disjunct could match anywhere)
      val mixedOr = spark.read.parquet(s"$base/data")
        .filter(col("k") < 60L || col("g") === 3L)
      assert(scannedFiles(mixedOr) === 8L)
      assert(mixedOr.count() ===
        (0L until 1000L).count(i => i < 60 || i % 7 == 3).toLong)

      // a filter on an untracked column must keep the full scan
      val untracked = spark.read.parquet(s"$base/data")
        .filter(col("g") === 3L)
      assert(scannedFiles(untracked) === 8L)
      assert(untracked.count() ===
        (0L until 1000L).count(_ % 7 == 3).toLong)
    } finally ZoneMapRule.deregister(s"$base/data")
  }

  test("freshness: un-cataloged append disarms; ZoneMap.update re-arms") {
    import spark.implicits._
    val base = mkTable()
    ZoneMapRule.install(spark)
    ZoneMapRule.register(spark, s"$base/data", s"$base/zm", Seq("k"))
    try {
      assert(scannedFiles(query(base)) <= 2L)

      // new rows in [100,199] land as an UN-CATALOGED file: pruning
      // from the stale catalog would silently drop them — the rule
      // must fall back to the full scan and still return them
      Thread.sleep(20) // file-mtime granularity
      Seq((150L, 0L, "late")).toDF("k", "g", "payload")
        .coalesce(1).write.mode("append").parquet(s"$base/data")
      val stale = query(base)
      assert(stale.count() === 101L, "appended row lost")
      assert(scannedFiles(stale) === 9L, "stale catalog still pruning")

      // one incremental catalog update re-arms the pruning
      Thread.sleep(20)
      assert(ZoneMap.update(spark, s"$base/data", s"$base/zm", Seq("k")) === 1)
      val rearmed = query(base)
      assert(rearmed.count() === 101L)
      assert(scannedFiles(rearmed) <= 3L, "update did not re-arm pruning")
    } finally ZoneMapRule.deregister(s"$base/data")
  }

  test("IS NULL / IS NOT NULL prune from the non-null counts; rows exact") {
    import spark.implicits._
    val base = Files.createTempDirectory("zmr_null").toString
    // file A: k fully populated; file B: k all null; file C: mixed
    (0L until 100L).map(i => (Some(i), s"a$i")).toDF("k", "payload")
      .coalesce(1).write.parquet(s"$base/data")
    Seq.fill(50)((None: Option[Long], "b")).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    (200L until 300L).map(i => (if (i % 2 == 0) Some(i) else None, s"c$i"))
      .toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
    ZoneMapRule.install(spark)
    ZoneMapRule.register(spark, s"$base/data", s"$base/zm", Seq("k"))
    try {
      // IS NULL: the fully-populated file drops; rows exact
      val nulls = spark.read.parquet(s"$base/data").filter(col("k").isNull)
      assert(nulls.count() === 100L)
      assert(scannedFiles(nulls) === 2L, "IS NULL kept the no-null file")

      // IS NOT NULL: the all-null file drops
      val notNulls = spark.read.parquet(s"$base/data")
        .filter(col("k").isNotNull)
      assert(notNulls.count() === 150L)
      assert(scannedFiles(notNulls) === 2L,
        "IS NOT NULL kept the all-null file")

      // and the isnotnull conjunct Catalyst plants above a range scan
      // composes: range [0,99] + isnotnull = only file A survives
      val band = spark.read.parquet(s"$base/data")
        .filter(col("k").isNotNull && col("k") <= 99L && col("k") >= 0L)
      assert(band.count() === 100L)
      assert(scannedFiles(band) === 1L)
    } finally ZoneMapRule.deregister(s"$base/data")
  }

  test("the rule prunes the data-side scan UNDER a DeleteLedger reconcile anti-join") {
    import spark.implicits._
    val base = Files.createTempDirectory("zmr_live").toString
    val df = (0L until 1000L).map(i => (i, i % 7, s"p$i")).toDF("k", "g", "payload")
    graft.ops.DeleteLedger.create(spark, base, df,
      Some(graft.ops.Layout.RangeSpec(8, Seq("k"))))
    graft.ops.DeleteLedger.delete(spark, base,
      (0L until 1000L by 9).toDF("k"), "b1")
    val dataDir = graft.ops.DeleteLedger.dataDir(base)
    ZoneMap.write(spark, dataDir, s"$base/zm", Seq("k"))
    ZoneMapRule.install(spark)
    ZoneMapRule.register(spark, dataDir, s"$base/zm", Seq("k"))
    try {
      // a PLAIN filtered read of the live view: Catalyst pushes the
      // range filter below the anti-join onto the data-side scan,
      // where the rule swaps in the pruned file index — compliance-
      // deleted tables keep file skipping with no special API
      val live = graft.ops.DeleteLedger.read(spark, base, "k")
        .filter(col("k") >= 100L && col("k") <= 199L)
      val expected = (100L to 199L).filterNot(_ % 9 == 0).toSet
      assert(live.collect().map(_.getLong(0)).toSet === expected)

      val plan = live.queryExecution.optimizedPlan
      // the reconcile anti-join is still in the plan …
      assert(plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty, "anti-join folded away")
      // … and the data-side relation beneath it reads a PRUNED index
      val dataScanFiles = plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.relation
              .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.inputFiles.exists(_.contains("data_v0")) =>
          lr.relation
            .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.length
      }
      assert(dataScanFiles.nonEmpty && dataScanFiles.head <= 2,
        s"data-side scan not pruned under the anti-join: $dataScanFiles")
    } finally ZoneMapRule.deregister(dataDir)
  }

  test("freshness: a DELETED data file disarms the rule; a catalog rebuild re-arms it") {
    val base = mkTable()
    ZoneMapRule.install(spark)
    ZoneMapRule.register(spark, s"$base/data", s"$base/zm", Seq("k"))
    try {
      assert(scannedFiles(query(base)) <= 2L)

      // remove a data file OUTSIDE the probed range: no file is newer
      // than the catalog afterwards, so a file-only mtime walk would
      // never notice — the parent dir's own mtime must trip the gate,
      // else the cached pruned index may point at missing files
      Thread.sleep(20)
      val victim = new java.io.File(s"$base/data").listFiles()
        .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
      assert(victim.delete())
      val afterDelete = query(base)
      assert(scannedFiles(afterDelete) === 7L,
        "deletion did not disarm the rule")
      afterDelete.collect() // and the full scan executes fine

      // full catalog rebuild over the shrunken table re-arms pruning
      Thread.sleep(20)
      ZoneMap.write(spark, s"$base/data", s"$base/zm", Seq("k"))
      val rearmed = query(base)
      assert(scannedFiles(rearmed) <= 2L, "rebuild did not re-arm")
      rearmed.collect()
    } finally ZoneMapRule.deregister(s"$base/data")
  }
}
