package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.PlanBridge

/** Materialized-view auto-rewrite (the IVM serving loop closed
  * end-to-end): a query that recomputes a registered aggregate from
  * scratch is rewritten by the optimizer to probe the incrementally
  * maintained store instead — the 100 TB answer to repeated dashboard
  * aggregates over an append-heavy fact log. The engine already KEEPS
  * such stores fresh ([[graft.streaming.RollupMaintenance]] overwrites
  * only changed (hour, type) partitions per micro-batch / delta
  * merge); this rule is what makes a plain user query benefit without
  * targeting the store explicitly.
  *
  * Matching is plan-shape equality, not SQL-text equality: a view is
  * registered with its FROM-SCRATCH DataFrame, whose optimized plan is
  * captured with every file-source leaf replaced by a schema-only
  * placeholder, then canonicalized (exprIds/aliases normalized). A
  * candidate subtree matches when its leaf-normalized canonical form
  * AND its file-source roots both equal the registered view's — so the
  * same aggregate over a DIFFERENT dataset dir never false-serves, and
  * any semantically different aggregate (extra filter, other grouping)
  * differs structurally and is left alone.
  *
  * Staleness gating: the rewrite fires only while the store is FRESH —
  * every source root's latest file mtime must be ≤ the store's. An
  * append to the source flips the gate off (queries silently fall back
  * to the from-scratch scan — correctness never depends on the store);
  * the next maintenance cycle ([[graft.streaming.RollupMaintenance.mergeDelta]]
  * or the streaming maintainer) flips it back on. File mtimes are the
  * local-FS stand-in for a catalog high-watermark stamp; the check is
  * a driver-side directory listing, bounded by file count, done once
  * per optimization.
  *
  * Substitution keeps the matched node's output attribute ids (each
  * store column is aliased to the old exprId), so nothing above the
  * rewritten subtree re-resolves; if the store's columns cannot be
  * aligned by name and exact type, the rule declines rather than
  * casts — a wrong store layout must never silently serve.
  *
  * The rewrite's losslessness is hash-gated: `q_rollup_served` runs
  * the UNREWRITTEN from-scratch query code with this rule installed,
  * and its DuckDB oracle recomputes the aggregate from the raw events
  * — a store/rewrite mismatch fails the round gate.
  */
object MatViewRewriteRule extends Rule[LogicalPlan] {

  /** A registered serveable view: the leaf-normalized canonical shape
    * of its from-scratch plan, the file roots that plan reads, the
    * store directory, and how to read the store back in the
    * from-scratch output shape. */
  final case class ServedView(
      storeDir: String,
      sourceRoots: Set[String],
      shape: LogicalPlan,
      readStore: SparkSession => DataFrame)

  // Bounded + clearable through the shared registry so invariance
  // tests that BuildOnce.clearAll() between runs also drop served
  // views (a stale registration must not leak across test sessions).
  private val views = graft.ops.BuildOnce.memo[String, ServedView]()

  // register() optimizes the from-scratch frame to capture its shape;
  // this rule must not fire on that very optimization (it would
  // capture the store-read shape and then serve store reads to
  // themselves forever after).
  private val capturing = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Register (or refresh) a serveable view. `fromScratch` is the
    * canonical dashboard query over the raw source; `readStore` must
    * return the SAME columns (names and types) as `fromScratch`. */
  def register(fromScratch: DataFrame, storeDir: String,
      readStore: SparkSession => DataFrame): Unit = {
    capturing.set(true)
    try {
      val opt = fromScratch.queryExecution.optimizedPlan
      val roots = sourceRoots(opt)
      require(roots.nonEmpty,
        "from-scratch view query reads no file source — nothing to gate freshness on")
      if (views.size >= graft.ops.BuildOnce.MemoMaxEntries &&
        !views.contains(storeDir)) views.clear()
      views.update(storeDir,
        ServedView(storeDir, roots, leafNormalized(opt), readStore))
    } finally capturing.set(false)
  }

  /** Test hook: drop one registration. */
  def deregister(storeDir: String): Unit = views.remove(storeDir)

  /** Every file-source root path read by a plan. */
  private def sourceRoots(p: LogicalPlan): Set[String] = p.collect {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
      case _ => Seq.empty[String]
    }
  }.flatten.toSet

  /** Structural fingerprint: file leaves → schema-only placeholders,
    * then Catalyst canonicalization (normalizes exprIds/aliases). Two
    * independently built reads of the same parquet dir produce
    * different relation instances; the placeholder makes the shapes
    * comparable while [[sourceRoots]] separately pins WHICH files. */
  private def leafNormalized(p: LogicalPlan): LogicalPlan =
    p.transformUp {
      case lr: LogicalRelation => LocalRelation(lr.output)
    }.canonicalized

  private def toLocalFile(root: String): java.io.File =
    if (root.startsWith("file:"))
      new java.io.File(java.net.URI.create(root.replace(" ", "%20")))
    else new java.io.File(root)

  private def latestMtime(f: java.io.File): Long =
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids == null || kids.isEmpty) f.lastModified()
      else kids.map(latestMtime).max
    } else f.lastModified()

  /** Fresh ⇔ the store exists (committed parquet) and no source root
    * has a file newer than the store's newest file. */
  private[plans] def isFresh(v: ServedView): Boolean = {
    val storeRoot = new java.io.File(v.storeDir)
    graft.ops.Fs.hasCommittedParquet(storeRoot) && {
      val storeM = latestMtime(storeRoot)
      v.sourceRoots.forall(r => latestMtime(toLocalFile(r)) <= storeM)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (capturing.get() || views.isEmpty) plan
    else plan.transformUp {
      case p: Aggregate => tryServe(p)
      case p @ Project(_, _: Aggregate) => tryServe(p)
    }

  private def tryServe(p: LogicalPlan): LogicalPlan = {
    val roots = sourceRoots(p)
    views.values.find(v => v.sourceRoots == roots &&
        v.shape == leafNormalized(p) && isFresh(v))
      .flatMap(substitute(p, _)).getOrElse(p)
  }

  /** Store read projected onto the matched node's exact output
    * attributes (same exprIds — nothing above re-resolves). Declines
    * (None) on any name/type misalignment. */
  private def substitute(p: LogicalPlan, v: ServedView): Option[LogicalPlan] = {
    val store = PlanBridge.analyzed(v.readStore(SparkSession.active))
    val byName = store.output.map(a => a.name -> a).toMap
    p.output.foldLeft(Option(Vector.empty[NamedExpression])) { (acc, old) =>
      acc.flatMap { cols =>
        byName.get(old.name)
          .filter(_.dataType == old.dataType)
          .map(na => cols :+ Alias(na, old.name)(exprId = old.exprId))
      }
    }.map(Project(_, store))
  }

  /** Install on a session built without extensions (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MatViewRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MatViewRewriteRule
}
