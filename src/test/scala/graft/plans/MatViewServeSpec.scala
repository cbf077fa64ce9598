package graft.plans

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.{SparkSpec, Tables}
import graft.streaming.{EventsStream, RollupMaintenance}

/** MatViewRewriteRule: the registered from-scratch hourly rollup is
  * served from the RollupMaintenance store (plan-asserted), falls back
  * when the source outruns the store (staleness gate), resumes after
  * the maintenance cycle, and declines on store/type misalignment —
  * results identical in every regime.
  */
class MatViewServeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def optimizedRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => a
    }.nonEmpty

  private def rollup(dir: String): DataFrame =
    EventsStream.hourlyRollup(Tables(spark, dir, "events"))
      .orderBy("hour_start", "event_type")

  test("registered rollup is served from the store, losslessly") {
    val store = Files.createTempDirectory("graft_mv_store").toString
    val expected = rollup(sfDir).collect().toSeq // before any registration
    RollupMaintenance.buildStore(Tables(spark, sfDir, "events"), store)
    MatViewRewriteRule.install(spark)
    MatViewRewriteRule.register(
      EventsStream.hourlyRollup(Tables(spark, sfDir, "events")), store,
      RollupMaintenance.read(_, store))
    try {
      val served = rollup(sfDir)
      val roots = optimizedRoots(served)
      assert(roots.exists(_.contains(store)), s"store not probed: $roots")
      assert(!roots.exists(_.contains("events.parquet")),
        s"raw events still scanned: $roots")
      assert(!hasAggregate(served), "aggregate survived the rewrite")
      assert(served.collect().toSeq === expected)
    } finally MatViewRewriteRule.deregister(store)
  }

  test("staleness gate: source append falls back, maintenance resumes serving") {
    // file-copied source dir so the test can append to it
    val srcRoot = Files.createTempDirectory("graft_mv_src").toString
    Files.createDirectories(Paths.get(s"$srcRoot/events.parquet"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(s"$srcRoot/events.parquet/part-00000.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val store = Files.createTempDirectory("graft_mv_store2").toString
    RollupMaintenance.buildStore(Tables(spark, srcRoot, "events"), store)
    MatViewRewriteRule.install(spark)
    MatViewRewriteRule.register(
      EventsStream.hourlyRollup(Tables(spark, srcRoot, "events")), store,
      RollupMaintenance.read(_, store))
    try {
      assert(optimizedRoots(rollup(srcRoot)).exists(_.contains(store)))

      // append: a second copy of the event log lands in the source —
      // the store is now stale; the rule must fall back to the scan
      Thread.sleep(20) // file-mtime granularity guard
      Files.copy(Paths.get(s"$sfDir/events.parquet"),
        Paths.get(s"$srcRoot/events.parquet/part-00001.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val stale = rollup(srcRoot)
      assert(!optimizedRoots(stale).exists(_.contains(store)),
        "stale store still served")
      assert(hasAggregate(stale))
      val freshTruth = stale.collect().toSeq // doubled counts, from scratch

      // maintenance cycle: rebuild the store from the grown source —
      // serving resumes and matches the from-scratch recompute
      Thread.sleep(20)
      RollupMaintenance.buildStore(Tables(spark, srcRoot, "events"), store)
      val resumed = rollup(srcRoot)
      assert(optimizedRoots(resumed).exists(_.contains(store)),
        "rebuilt store not served")
      assert(resumed.collect().toSeq === freshTruth)
    } finally MatViewRewriteRule.deregister(store)
  }

  private def coarse(dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("ts").isNotNull)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .orderBy("event_type")

  test("coarser aggregate is ROLLED UP from the store, losslessly") {
    val store = Files.createTempDirectory("graft_mv_store4").toString
    val expected = coarse(sfDir).collect().toSeq // before registration
    RollupMaintenance.buildStore(Tables(spark, sfDir, "events"), store)
    MatViewRewriteRule.install(spark)
    MatViewRewriteRule.register(
      EventsStream.hourlyRollup(Tables(spark, sfDir, "events")), store,
      RollupMaintenance.read(_, store))
    try {
      val served = coarse(sfDir)
      val roots = optimizedRoots(served)
      assert(roots.exists(_.contains(store)), s"store not probed: $roots")
      assert(!roots.exists(_.contains("events.parquet")),
        s"raw events still scanned: $roots")
      // the roll-up KEEPS an aggregate — over B store rows, not the log
      assert(hasAggregate(served))
      assert(served.collect().toSeq === expected)
    } finally MatViewRewriteRule.deregister(store)
  }

  test("coarse query WITHOUT the view's null filter is never served") {
    // the hourly view's window expansion drops null-ts rows before
    // aggregating; a per-type count over ALL raw rows is a different
    // query and must keep its scan even though keys/aggs match
    val store = Files.createTempDirectory("graft_mv_store5").toString
    RollupMaintenance.buildStore(Tables(spark, sfDir, "events"), store)
    MatViewRewriteRule.install(spark)
    MatViewRewriteRule.register(
      EventsStream.hourlyRollup(Tables(spark, sfDir, "events")), store,
      RollupMaintenance.read(_, store))
    try {
      val unfiltered = Tables(spark, sfDir, "events")
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"))
      assert(!optimizedRoots(unfiltered).exists(_.contains(store)),
        "served a coarse query whose filter residue differs from the view's")
      // and a SUM the store cannot re-aggregate exactly (total_value
      // is cast-wrapped in the view) declines too
      val sumValue = Tables(spark, sfDir, "events")
        .filter(org.apache.spark.sql.functions.col("ts").isNotNull)
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.sum("value").as("v"))
      assert(!optimizedRoots(sumValue).exists(_.contains(store)))
    } finally MatViewRewriteRule.deregister(store)
  }

  test("coarse roll-up respects the staleness gate") {
    val srcRoot = Files.createTempDirectory("graft_mv_src2").toString
    Files.createDirectories(Paths.get(s"$srcRoot/events.parquet"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(s"$srcRoot/events.parquet/part-00000.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val store = Files.createTempDirectory("graft_mv_store6").toString
    RollupMaintenance.buildStore(Tables(spark, srcRoot, "events"), store)
    MatViewRewriteRule.install(spark)
    MatViewRewriteRule.register(
      EventsStream.hourlyRollup(Tables(spark, srcRoot, "events")), store,
      RollupMaintenance.read(_, store))
    try {
      assert(optimizedRoots(coarse(srcRoot)).exists(_.contains(store)))
      Thread.sleep(20)
      Files.copy(Paths.get(s"$sfDir/events.parquet"),
        Paths.get(s"$srcRoot/events.parquet/part-00001.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val stale = coarse(srcRoot)
      assert(!optimizedRoots(stale).exists(_.contains(store)),
        "stale store still rolled up")
      val truth = stale.collect().toSeq
      Thread.sleep(20)
      RollupMaintenance.buildStore(Tables(spark, srcRoot, "events"), store)
      val resumed = coarse(srcRoot)
      assert(optimizedRoots(resumed).exists(_.contains(store)))
      assert(resumed.collect().toSeq === truth)
    } finally MatViewRewriteRule.deregister(store)
  }

  test("misaligned store columns decline the rewrite instead of casting") {
    val store = Files.createTempDirectory("graft_mv_store3").toString
    RollupMaintenance.buildStore(Tables(spark, sfDir, "events"), store)
    MatViewRewriteRule.install(spark)
    // readStore with n_events narrowed to int: name matches, type does
    // not — the rule must leave the query on the from-scratch plan
    MatViewRewriteRule.register(
      EventsStream.hourlyRollup(Tables(spark, sfDir, "events")), store,
      s => RollupMaintenance.read(s, store)
        .withColumn("n_events",
          org.apache.spark.sql.functions.col("n_events").cast("int")))
    try {
      val df = rollup(sfDir)
      assert(!optimizedRoots(df).exists(_.contains(store)))
      assert(hasAggregate(df))
      assert(df.count() > 0)
    } finally MatViewRewriteRule.deregister(store)
  }

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  test("registered JOIN view is served from the JoinView store, losslessly") {
    val base = graft.ext.PipelineQueries.joinViewFor(spark, sfDir)
    def fromScratch = graft.ext.PipelineQueries.ordersLineitemJoin(spark, sfDir)
    val expected = fromScratch.collect().toSet // before registration
    MatViewRewriteRule.install(spark)
    MatViewRewriteRule.register(fromScratch, s"$base/view",
      graft.ops.JoinView.read(_, base))
    try {
      val served = fromScratch
      val roots = optimizedRoots(served)
      assert(roots.exists(_.contains(s"$base/view")), s"store not probed: $roots")
      assert(!roots.exists(r => r.contains("orders.parquet") ||
        r.contains("lineitem.parquet")), s"raw tables still scanned: $roots")
      assert(!hasJoin(served), "join survived the rewrite")
      assert(served.collect().toSet === expected)

      // a candidate with an extra filter is NOT the registered shape:
      // the main optimizer pushes the filter into the scans, so the
      // join subtree differs and must keep its from-scratch plan
      val filtered = fromScratch.filter(
        org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      assert(!optimizedRoots(filtered).exists(_.contains(s"$base/view")))
      assert(hasJoin(filtered))
      assert(filtered.count() > 0)
    } finally MatViewRewriteRule.deregister(s"$base/view")
  }
}
