package graft

/** The blanket cache-hygiene net: EXECUTE every registered query, then
  * prove that every byte of executor memory it pinned is owned by a
  * releasable slot — [[graft.ops.BuildOnce.swapRef]] one-slot refs
  * (released by `releaseSwapped()`) or a registered clear hook
  * (released by `clearAll()`). After both releases, no persisted RDD
  * created by the sweep may remain.
  *
  * This is the class of defect the round-5 review found in
  * q_neardup_simhash (a bare `.persist()` with no owning slot): the
  * query stays correct, the leak only shows as executor memory that
  * climbs across a long-lived session until eviction thrash. Individual
  * queries can't be trusted to each carry a targeted assertion — this
  * sweep fails on the NEXT bare persist no matter which query grows it.
  *
  * Baseline-diff, not absolute emptiness: suites share one JVM session,
  * so RDDs pinned by OTHER suites before this one runs are out of
  * scope — only persists created by this sweep are charged to it.
  */
class CacheHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every query's cached frames release via owned slots — no pinned leaks") {
    val sc = spark.sparkContext
    // start from this suite's own clean slate
    graft.ops.BuildOnce.releaseSwapped()
    graft.ops.BuildOnce.clearAll()
    spark.catalog.clearCache()
    val baseline = sc.getPersistentRDDs.keySet

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, dir).count()
      catch {
        case e: Throwable =>
          fail(s"$name failed during the hygiene sweep: $e")
      }
    }

    // steady state while live: bounded by the owned slots, never a
    // per-invocation pile-up (each swap slot holds at most one frame)
    val liveNow = sc.getPersistentRDDs.keySet.diff(baseline)

    graft.ops.BuildOnce.releaseSwapped()
    graft.ops.BuildOnce.clearAll()
    val leaked = sc.getPersistentRDDs.filter { case (id, _) =>
      !baseline.contains(id)
    }
    assert(leaked.isEmpty,
      s"sweep pinned ${liveNow.size} RDDs; ${leaked.size} survive release " +
        s"— unowned persists: ${
          leaked.map { case (id, r) => s"#$id ${r.name}" }.mkString("; ")
        }")
  }
}
