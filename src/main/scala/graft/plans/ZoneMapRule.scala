package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, NumericType, StringType, StructType, TimestampNTZType, TimestampType}

/** Automatic zone-map file pruning — the optimizer-rule face of
  * [[graft.ops.ZoneMap]]: a table registered with its min/max catalog
  * gets its range-filtered scans pruned to the files that can match,
  * with the user writing a PLAIN `read.filter` — no pruned-read API
  * call, the same serve-transparently contract as
  * [[MatViewRewriteRule]].
  *
  * Safety is one-sided by construction (same argument as the explicit
  * read path): the rule only REMOVES files whose [min,max] cannot
  * intersect the predicate's bounds, derives bounds CONSERVATIVELY
  * (strict comparisons widen to inclusive; any conjunct it can't read
  * contributes no bound), and always leaves the original Filter on
  * top — so the rewritten plan returns exactly the plain scan's rows
  * for ANY catalog content. What the catalog can break is
  * COMPLETENESS: a data file the catalog has never seen would be
  * silently pruned; the freshness gate prevents that — the rule
  * declines whenever the data dir holds a file newer than the cached
  * catalog, and a [[graft.ops.ZoneMap.update]] (one scan of the new
  * files) re-arms it.
  *
  * Driver economics: the catalog is collected ONCE per registration
  * (file-count-sized — the manifest class) and refreshed only when
  * the stats dir's mtime moves; `apply` itself runs no Spark job —
  * matching is a pure in-memory intersect over the cached rows, the
  * same cost class as listing partitions. At 100 TB this turns every
  * dashboard range query over a range-laid-out log into a
  * selectivity-sized scan without anyone calling an index API.
  */
object ZoneMapRule extends Rule[LogicalPlan] {

  /** Cached per-file, per-column stats: non-null count plus the
    * min/max range as CATALYST-internal values (`range` None = the
    * column is genuinely ALL NULL in the file). */
  private final case class ColStats(nn: Long, range: Option[(Any, Any)])

  /** One cached catalog row. `cols` key ABSENT = the stats predate
    * tracking of that column (the schema-evolution tri-state: an
    * era-absent column can never prune its file). */
  private final case class FileStats(file: String, nRows: Long,
      cols: Map[String, ColStats])

  /** One registered catalog: tracked columns, the cached stats rows,
    * and the mtimes the freshness gate pins. */
  private final case class Registered(
      statsDir: String,
      cols: Seq[String],
      rows: Seq[FileStats],
      statsMtime: Long,
      dataMtime: Long)

  // dataDir root (URI-normalized) -> Registered; bounded + clearable
  // through the shared registry (invariance tests clearAll()).
  private val tables = graft.ops.BuildOnce.memo[String, Registered]()

  private def norm(p: String): String =
    if (p.contains(":")) java.net.URI.create(p.replace(" ", "%20")).getPath
    else p

  /** Newest modification time under `dir`, resolved through the
    * Hadoop FileSystem for the path's scheme — java.io.File returns 0
    * for any non-local path (hdfs://, s3a://), which would make both
    * sides of the freshness gate read 0 and an un-cataloged append
    * silently pruned away. Every DIRECTORY's own mtime rides the max
    * too: a deleted data file bumps its parent dir but leaves no file
    * newer than the catalog, so without the dir term the gate would
    * never disarm and the cached pruned index could point at missing
    * files. A vanished path reads Long.MaxValue — "always stale"
    * declines the rewrite rather than pruning against ghosts. */
  private def latestMtime(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(st: org.apache.hadoop.fs.FileStatus): Long =
      if (!st.isDirectory) st.getModificationTime
      else {
        val kids = fs.listStatus(st.getPath)
        (st.getModificationTime +: kids.map(walk).toSeq).max
      }
    if (!fs.exists(p)) Long.MaxValue else walk(fs.getFileStatus(p))
  }

  /** Load + cache the catalog for `dataDir`. Values are converted to
    * Catalyst-internal form ONCE here, so `apply` compares against
    * literal values directly with the column type's ordering. */
  private def load(spark: SparkSession, dataDir: String, statsDir: String,
      cols: Seq[String]): Registered = {
    val stats = graft.ops.ZoneMap.read(spark, statsDir)
    val schema = stats.schema
    val conv = cols.map { c =>
      c -> CatalystTypeConverters.createToCatalystConverter(
        schema(s"min_$c").dataType)
    }.toMap
    val rows = stats.collect().map { r =>
      val mm: Map[String, ColStats] = cols.flatMap { c =>
        r.getAs[Any](s"nn_$c") match {
          case null => None // era-absent: no entry
          case nn: java.lang.Long =>
            val (lo, hi) = (r.getAs[Any](s"min_$c"), r.getAs[Any](s"max_$c"))
            val range =
              if (lo == null || hi == null) None // all-null file
              else Some((conv(c)(lo), conv(c)(hi)))
            Some(c -> ColStats(nn, range))
        }
      }.toMap
      FileStats(r.getAs[String]("file"), r.getAs[Long]("n_rows"), mm)
    }.toSeq
    Registered(statsDir, cols, rows,
      latestMtime(spark, statsDir),
      latestMtime(spark, dataDir))
  }

  /** Register `dataDir`'s zone map for automatic pruning. */
  def register(spark: SparkSession, dataDir: String, statsDir: String,
      cols: Seq[String]): Unit = {
    if (tables.size >= graft.ops.BuildOnce.MemoMaxEntries &&
      !tables.contains(norm(dataDir))) tables.clear()
    tables.update(norm(dataDir), load(spark, dataDir, statsDir, cols))
  }

  def deregister(dataDir: String): Unit = tables.remove(norm(dataDir))

  /** Atomic types the rule compares (all it ever needs — the catalog
    * stores the column's own type). */
  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | TimestampType | TimestampNTZType |
        DateType | BooleanType => true
    case _ => false
  }

  /** Surviving file INDICES by structural recursion over the whole
    * boolean predicate — AND intersects, OR unions, a readable
    * comparison keeps the files whose [min, max] may satisfy it, and
    * anything unreadable returns None ("all files", the conservative
    * identity for ∩ and the absorbing element for ∪). This subsumes
    * conjunct-hull extraction and handles DISJOINT disjuncts exactly:
    * `k < 60 OR k > 940` keeps the first and last range files instead
    * of everything (an interval hull would widen to no constraint).
    * Strict comparisons still widen to inclusive at the FILE test —
    * one-sided as ever, the residual Filter does the exact work. */
  private def survivorIdx(reg: Registered, cond: Expression)
      : Option[Set[Int]] = {
    val tracked = reg.cols.toSet
    val all = reg.rows.indices.toSet

    // files whose [mn, mx] may intersect the test — the Registered
    // tri-state: era-absent stats always survive, an all-null column
    // never matches a range, a real range runs the comparison
    def files(c: String)(keep: (Any, Any, Ordering[Any]) => Boolean,
        ord: Ordering[Any]): Set[Int] =
      reg.rows.indices.filter { i =>
        reg.rows(i).cols.get(c) match {
          case None => true
          case Some(ColStats(_, None)) => false
          case Some(ColStats(_, Some((mn, mx)))) => keep(mn, mx, ord)
        }
      }.toSet

    // null-predicate pruning off the non-null counts (era-absent
    // stats always survive): IS NULL needs at least one null in the
    // file (nn < n_rows); IS NOT NULL needs at least one non-null.
    // Catalyst plants isnotnull conjuncts above every filtered scan,
    // so the IsNotNull case also lets a range query skip all-null
    // files one test earlier.
    def nullFiles(c: String)(survives: (Long, Long) => Boolean)
        : Option[Set[Int]] =
      if (!tracked(c)) None
      else Some(reg.rows.indices.filter { i =>
        reg.rows(i).cols.get(c) match {
          case None => true
          case Some(cs) => survives(cs.nn, reg.rows(i).nRows)
        }
      }.toSet)

    def cmpSet(c: String, dt: DataType, v: Any,
        op: Expression): Option[Set[Int]] =
      if (!tracked(c) || v == null || !orderable(dt)) None
      else {
        val ord = PlanBridge.interpretedOrdering(dt)
        Some(op match {
          case _: GreaterThanOrEqual | _: GreaterThan =>
            files(c)((_, mx, o) => o.gteq(mx, v), ord)
          case _: LessThanOrEqual | _: LessThan =>
            files(c)((mn, _, o) => o.lteq(mn, v), ord)
          case _: EqualTo =>
            files(c)((mn, mx, o) => o.lteq(mn, v) && o.gteq(mx, v), ord)
        })
      }

    def walk(e: Expression): Option[Set[Int]] = e match {
      case And(l, r) => (walk(l), walk(r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b) // None = all files: ∩ identity
      }
      case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
        for (a <- walk(l); b <- walk(r)) yield a union b
      case cmp @ (_: GreaterThanOrEqual | _: GreaterThan |
          _: LessThanOrEqual | _: LessThan | _: EqualTo) =>
        cmp.children match {
          case Seq(a: AttributeReference, Literal(v, dt)) =>
            cmpSet(a.name, dt, v, cmp)
          case Seq(Literal(v, dt), a: AttributeReference) =>
            // mirrored operand order flips the comparison side
            val flipped = cmp match {
              case GreaterThanOrEqual(l, r) => LessThanOrEqual(r, l)
              case GreaterThan(l, r) => LessThan(r, l)
              case LessThanOrEqual(l, r) => GreaterThanOrEqual(r, l)
              case LessThan(l, r) => GreaterThan(r, l)
              case eq: EqualTo => eq
            }
            cmpSet(a.name, dt, v, flipped)
          case _ => None
        }
      // null predicates read the non-null counts directly
      case org.apache.spark.sql.catalyst.expressions.IsNull(
          a: AttributeReference) =>
        nullFiles(a.name)((nn, n) => nn < n)
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(
          a: AttributeReference) =>
        nullFiles(a.name)((nn, _) => nn > 0L)
      // IN-list: exact union of the per-value point tests
      case In(a: AttributeReference, vs)
          if tracked(a.name) && vs.nonEmpty &&
            vs.forall(v => v.isInstanceOf[Literal] &&
              v.asInstanceOf[Literal].value != null) &&
            orderable(a.dataType) =>
        val ord = PlanBridge.interpretedOrdering(a.dataType)
        Some(vs.map(_.asInstanceOf[Literal].value).map { v =>
          files(a.name)((mn, mx, o) => o.lteq(mn, v) && o.gteq(mx, v), ord)
        }.reduce(_ union _))
      case _ => None
    }
    walk(cond).filter(_ != all)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (tables.isEmpty) plan
    else plan.transformUp {
      case f @ Filter(cond, lr: LogicalRelation)
          if lr.relation.isInstanceOf[HadoopFsRelation] && {
            val h = lr.relation.asInstanceOf[HadoopFsRelation]
            h.location.rootPaths.length == 1 &&
              h.partitionSchema.isEmpty &&
              tables.contains(norm(h.location.rootPaths.head.toString))
          } =>
        val h = lr.relation.asInstanceOf[HadoopFsRelation]
        val rawRoot = h.location.rootPaths.head.toString
        val root = norm(rawRoot)
        val spark = SparkSession.active
        var reg = tables(root)
        val dataM = latestMtime(spark, rawRoot)
        var usable = true
        if (dataM > reg.dataMtime ||
          latestMtime(spark, reg.statsDir) > reg.statsMtime) {
          // something moved: reload the catalog once, then re-gate —
          // and if the catalog itself is gone, deregister rather than
          // throw from inside the optimizer
          try {
            reg = load(spark, rawRoot, reg.statsDir, reg.cols)
            tables.update(root, reg)
          } catch {
            case _: org.apache.spark.sql.AnalysisException =>
              tables.remove(root)
              usable = false
          }
        }
        if (!usable || latestMtime(spark, rawRoot) > reg.statsMtime) f
        else {
          survivorIdx(reg, cond) match {
            case Some(idxs) if idxs.size < reg.rows.length =>
              val files = idxs.toSeq.sorted.map(i => reg.rows(i).file)
              val idx = new InMemoryFileIndex(spark,
                files.map(new Path(_)), Map.empty, Some(h.dataSchema))
              val pruned = h.copy(location = idx,
                partitionSchema = StructType(Nil))(spark)
              Filter(cond, lr.copy(relation = pruned))
            case _ => f // no usable bound, or nothing pruned
          }
        }
    }

  /** Install on a session built without extensions (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ZoneMapRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ZoneMapRule
}
