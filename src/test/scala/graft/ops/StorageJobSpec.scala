package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StorageJob: the managed-table maintenance slot drains the delete
  * feed, compacts past the measured threshold (vacuum bounds
  * history), keeps the PER-VERSION zone-map catalog fresh, and every
  * step is replay-idempotent — a retried slot changes nothing.
  */
class StorageJobSpec extends SparkSpec {
  import spark.implicits._

  test("slots: drain feed -> threshold compaction -> versioned catalog; retried slot is a no-op") {
    val base = Files.createTempDirectory("sj_base").toString
    val feed = Files.createTempDirectory("sj_feed").toString
    val df = (0L until 1000L).map(i => (i, s"row$i")).toDF("pk", "payload")
    DeleteLedger.create(spark, base, df)

    // slot 1: a small delete feed — ledger stays (below threshold),
    // catalog v0 built
    (0L until 100L).toDF("user_pk").coalesce(1).write.mode("append").parquet(feed)
    val s1 = StorageJob.run(spark, base, feed, "pk",
      compactAtRows = 500L, zonemapCols = Seq("pk"),
      feedKeyExpr = "user_pk")
    assert(s1("version") === 0L)
    assert(s1("ledger_rows") === 100L)
    assert(s1("new_files_cataloged") >= 1L)
    assert(DeleteLedger.read(spark, base, "pk").count() === 900L)

    // retried slot: checkpoint re-drains nothing, catalog stats 0 new
    val s1r = StorageJob.run(spark, base, feed, "pk",
      compactAtRows = 500L, zonemapCols = Seq("pk"),
      feedKeyExpr = "user_pk")
    assert(s1r === s1.updated("new_files_cataloged", 0L))

    // slot 2: the feed grows past the threshold — compaction folds
    // the ledger, vacuum keeps 2 versions, a fresh v1 catalog builds
    (100L until 701L).toDF("user_pk").coalesce(1).write.mode("append").parquet(feed)
    val s2 = StorageJob.run(spark, base, feed, "pk",
      compactAtRows = 500L, zonemapCols = Seq("pk"),
      feedKeyExpr = "user_pk")
    assert(s2("version") === 1L)
    assert(s2("ledger_rows") === 0L)
    assert(DeleteLedger.versions(base) === Seq(0, 1))
    assert(DeleteLedger.read(spark, base, "pk").count() === 299L)
    assert(Fs.hasCommittedParquet(
      new java.io.File(StorageJob.zonemapDir(base))))
    // the v1 catalog covers exactly the v1 files
    val stats = ZoneMap.read(spark, StorageJob.zonemapDir(base))
    assert(stats.collect().forall(_.getAs[String]("file").contains("data_v1")))
    assert(stats.agg(sum("n_rows")).head().getLong(0) === 299L)
  }

  test("maintenance slot preserves a declared layout: the v1 catalog still prunes") {
    val base = Files.createTempDirectory("sj_layout").toString
    val feed = Files.createTempDirectory("sj_layout_feed").toString
    val df = (0L until 1000L).map(i => (i, s"row$i")).toDF("pk", "payload")
    // the layout is declared ON THE TABLE — the maintenance job has
    // no layout argument to remember, which is the point
    DeleteLedger.create(spark, base, df, Some(Layout.RangeSpec(8, Seq("pk"))))

    def surviving(): (Long, Long) = {
      val stats = ZoneMap.read(spark, StorageJob.zonemapDir(base))
      (ZoneMap.survivingFiles(stats, "pk", lit(100L), lit(199L)).length.toLong,
        stats.count())
    }

    // slot 1 below threshold: catalogs v0; a 10% band prunes hard
    StorageJob.run(spark, base, feed, "pk",
      compactAtRows = 500L, zonemapCols = Seq("pk"))
    val (s0, t0) = surviving()
    assert(t0 === 8L && s0 <= 2L, s"v0 catalog not pruning: $s0/$t0")

    // slot 2 past threshold: compaction rewrites v1 THROUGH the
    // declared layout; the refreshed per-version catalog must prune
    // the same band just as hard — before the declared-layout
    // property, this is where file skipping silently died. The
    // deletes are SPARSE (every even key) so the probed band is
    // still populated and the pruning assert stays meaningful.
    (0L until 1002L by 2).toDF("user_pk").coalesce(1)
      .write.mode("append").parquet(feed)
    val s2 = StorageJob.run(spark, base, feed, "pk",
      compactAtRows = 500L, zonemapCols = Seq("pk"), feedKeyExpr = "user_pk")
    assert(s2("version") === 1L)
    val (s1, t1) = surviving()
    assert(t1 === 8L && s1 >= 1L && s1 <= s0,
      s"compaction slot destroyed pruning: $s1/$t1 (v0: $s0/$t0)")
    assert(DeleteLedger.read(spark, base, "pk").count() === 500L)
  }

  test("ZoneMapRule stays armed across maintenance slots (end-to-end)") {
    val base = Files.createTempDirectory("sj_rule").toString
    val feed = Files.createTempDirectory("sj_rule_feed").toString
    DeleteLedger.create(spark, base,
      (0L until 1000L).map(i => (i, s"r$i")).toDF("pk", "payload"))
    // slot: builds the v0 catalog
    StorageJob.run(spark, base, feed, "pk",
      compactAtRows = 1000000L, zonemapCols = Seq("pk"))
    graft.plans.ZoneMapRule.install(spark)
    graft.plans.ZoneMapRule.register(spark, DeleteLedger.dataDir(base),
      StorageJob.zonemapDir(base), Seq("pk"))
    try {
      def pruned = spark.read.parquet(DeleteLedger.dataDir(base))
        .filter(col("pk") >= 10L && col("pk") <= 20L)
      def scanFiles(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation
              .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.inputFiles.length.toLong
        }.max
      val full = spark.read.parquet(DeleteLedger.dataDir(base))
        .where(col("pk").between(10L, 20L)).count()
      assert(pruned.count() === full)

      // a plain append lands un-cataloged: the rule must disarm …
      Thread.sleep(20)
      Seq((15L, "late")).toDF("pk", "payload")
        .coalesce(1).write.mode("append")
        .parquet(DeleteLedger.dataDir(base))
      val totalFiles = scanFiles(
        spark.read.parquet(DeleteLedger.dataDir(base)).where(lit(true)))
      assert(scanFiles(pruned) === totalFiles, "stale catalog still pruning")
      assert(pruned.count() === full + 1)

      // … and the NEXT maintenance slot re-arms it via ZoneMap.update
      Thread.sleep(20)
      StorageJob.run(spark, base, feed, "pk",
        compactAtRows = 1000000L, zonemapCols = Seq("pk"))
      assert(scanFiles(pruned) < totalFiles, "slot did not re-arm pruning")
      assert(pruned.count() === full + 1)
    } finally graft.plans.ZoneMapRule.deregister(DeleteLedger.dataDir(base))
  }
}
