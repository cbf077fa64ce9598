package graft.ops

import scala.collection.concurrent.TrieMap

/** Build-once memo registry for deterministic derived artifacts —
  * trained centroids/codebooks, materialized index layouts, the
  * written star warehouse. One query session builds each artifact the
  * first time it's needed and probes it thereafter (the served-index
  * semantics every "build once on disk, probe many" path models).
  *
  * Every memo is created through [[memo]] so that:
  *   - it is BOUNDED: on reaching [[MemoMaxEntries]] the whole map is
  *     dropped — entries are deterministic and cheap to rebuild, so
  *     clear-on-overflow is as correct as LRU and simpler. A
  *     long-lived session iterating over many dataset dirs cannot
  *     grow the driver.
  *   - it is CLEARABLE: [[clearAll]] resets every registered memo in
  *     one call. Invariance tests MUST clear between runs — otherwise
  *     the second run reuses the first run's artifact and the test
  *     silently compares one build against itself
  *     (PartitionInvarianceSpec does; new memos get the hook for free
  *     by being created here instead of hand-rolling a TrieMap).
  */
object BuildOnce {

  /** Hard cap on entries per memo. Each entry is a bounded
    * sketch-class value (nlist×d doubles, an index dir path, ...). */
  val MemoMaxEntries = 32

  private val registry = new java.util.concurrent.CopyOnWriteArrayList[TrieMap[_, _]]

  /** Create a bounded, registered memo. */
  def memo[K, V](): TrieMap[K, V] = {
    val m = TrieMap.empty[K, V]
    registry.add(m)
    m
  }

  /** First call builds, repeat calls reuse; clear-on-overflow bound. */
  def cached[K, V](memo: TrieMap[K, V], k: K)(build: => V): V =
    memo.get(k) match {
      case Some(v) => v
      case None =>
        if (memo.size >= MemoMaxEntries) memo.clear()
        memo.getOrElseUpdate(k, build)
    }

  private val clearHooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]

  /** Register extra cleanup to run on [[clearAll]] — for caches that
    * need RELEASE logic a bare map clear can't express (e.g. the BPE
    * trained-stream cache, which must unpersist its frames). */
  def registerClearHook(f: () => Unit): Unit = clearHooks.add(f)

  /** Reset every registered memo (test hook — forces the next query
    * to rebuild its artifact under the current session config). */
  def clearAll(): Unit = {
    val it = registry.iterator()
    while (it.hasNext) it.next().clear()
    val hooks = clearHooks.iterator()
    while (hooks.hasNext) hooks.next().apply()
  }

  private val swapRefs = new java.util.concurrent.CopyOnWriteArrayList[
    java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.DataFrame]]

  /** Create a REGISTERED one-slot swap ref (see [[swapPersist]]).
    * Every query-held persisted frame must live in one of these — the
    * registry is what lets [[releaseSwapped]] (and the cache-hygiene
    * sweep spec built on it) prove that nothing in the codebase pins
    * executor memory outside an owned, releasable slot. */
  def swapRef(): java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.DataFrame] = {
    val r = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.DataFrame]()
    swapRefs.add(r)
    r
  }

  /** Live (currently-persisted) swap slots. */
  def liveSwapCount: Int = {
    var n = 0
    val it = swapRefs.iterator()
    while (it.hasNext) if (it.next().get() != null) n += 1
    n
  }

  /** Deterministic frame release: unpersist, PLUS the LogicalRDD
    * reach-through for localCheckpoint'ed frames — those hold their
    * data as RDD-level persistence that `Dataset.unpersist()` does NOT
    * touch; without the reach-through the copy sits in storage until
    * the weak-ref ContextCleaner happens to collect it. */
  def releaseFrame(df: org.apache.spark.sql.DataFrame,
      blocking: Boolean = false): Unit = {
    df.unpersist(blocking)
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking)
      case _ => ()
    }
  }

  /** Release EVERY swap slot (blocking unpersist) — the test hook that
    * makes cache hygiene checkable: after queries run, releaseSwapped()
    * + clearAll() must leave zero persisted RDDs, or some code path
    * persisted outside an owned slot (the leak class this registry
    * exists to kill). */
  def releaseSwapped(): Unit = {
    val it = swapRefs.iterator()
    while (it.hasNext) {
      Option(it.next().getAndSet(null)).foreach(releaseFrame(_, blocking = true))
    }
  }

  /** One-slot persisted-frame cache: release the PREVIOUS invocation's
    * copy FIRST, then persist the new one. The reverse order
    * (persist-then-release) self-defeats whenever consecutive
    * invocations build the same canonical plan: CacheManager dedups
    * entries by canonicalized plan, so the new persist is a no-op
    * against the old entry and the follow-up unpersist drops that
    * shared entry — leaving the new invocation uncached and every
    * downstream read recomputing. Returns the (persisted) frame. */
  def swapPersist(
      ref: java.util.concurrent.atomic.AtomicReference[
        org.apache.spark.sql.DataFrame],
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    Option(ref.getAndSet(df)).foreach(_.unpersist())
    df.persist()
  }
}
