package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, shiftleft, shiftright, when}

/** Range-clustered data layout — the scan-pruning counterpart of
  * [[Bucketing]] (which co-locates JOINS). Writing a table
  * `repartitionByRange` + `sortWithinPartitions` on its dominant
  * filter column gives every parquet file (and every row group inside
  * it) a tight min/max range on that column. A later range-filtered
  * scan then skips whole row groups from footer statistics alone —
  * at 100 TB this is the difference between reading ~selectivity of
  * the table and reading all of it, with zero extra infrastructure
  * (no index, just write order).
  *
  * This is the one-dimension case of the Z-order/space-filling-curve
  * layouts lakehouse formats offer; for the single-column time-series
  * access pattern (events by `ts`) one dimension is exactly right.
  *
  * Scale posture: the layout write is one range-shuffle (sampling the
  * range bounds + redistributing once) amortized over every
  * subsequent scan. `repartitionByRange` handles skew by sampling;
  * a monotonically-appended table (time-series) needs NO re-layout at
  * all for the append dimension — new files are naturally
  * range-disjoint.
  */
object Layout {

  /** A DECLARED clustering — the persistable description of how a
    * managed table's data files should be written, so that every
    * rewrite (initial load, compaction, re-layout) reproduces the
    * same file-level locality. Without a declared spec, the first
    * maintenance rewrite silently destroys the clustering a zone map
    * depends on: a compacted version written as a plain parquet dump
    * has every file spanning the whole key domain, and file pruning
    * drops to zero with no failure anywhere. The spec is the fix —
    * a table property, not a call-site argument, so no maintenance
    * path can forget it. */
  sealed trait Spec {
    /** One-line serialized form for the table-property file. */
    def serialized: String
  }

  /** Range-cluster on `sortCols` into `numFiles` files —
    * [[writeRangeLayout]] as a property. */
  final case class RangeSpec(numFiles: Int, sortCols: Seq[String])
      extends Spec {
    require(numFiles > 0 && sortCols.nonEmpty, s"bad range spec")
    require(sortCols.forall(c => !c.contains(",") && !c.contains(":")),
      "sort column names must not contain ',' or ':'")
    def serialized: String = s"range:$numFiles:${sortCols.mkString(",")}"
  }

  /** Z-order-cluster on (colA, colB) — [[writeZOrderLayout]] as a
    * property. */
  final case class ZOrderSpec(numFiles: Int, colA: String, colB: String,
      bits: Int = 16) extends Spec {
    require(numFiles > 0 && bits > 0 && bits <= 31, s"bad zorder spec")
    require(!colA.contains(":") && !colB.contains(":"),
      "z-order column names must not contain ':'")
    def serialized: String = s"zorder:$numFiles:$colA:$colB:$bits"
  }

  /** Range-cluster with the file count DERIVED at rewrite time from
    * the measured row count (ceil(rows / targetFileRows), min 1) —
    * the 100 TB form of [[RangeSpec]]: a frozen numFiles declared at
    * creation is wrong after the table grows 100× (files balloon
    * past executor-friendly sizes and pruning granularity decays),
    * while a per-rewrite measured count keeps every file near the
    * declared target forever. The count is one aggregate over rows
    * being fully rewritten anyway — noise next to the rewrite. */
  final case class RangeAutoSpec(targetFileRows: Long,
      sortCols: Seq[String]) extends Spec {
    require(targetFileRows > 0 && sortCols.nonEmpty, "bad rangeauto spec")
    require(sortCols.forall(c => !c.contains(",") && !c.contains(":")),
      "sort column names must not contain ',' or ':'")
    def serialized: String =
      s"rangeauto:$targetFileRows:${sortCols.mkString(",")}"
  }

  /** Parse [[Spec.serialized]]; loud on anything unrecognized (a
    * corrupt property file must never silently fall back to an
    * unclustered rewrite — that is the exact failure the property
    * exists to prevent). */
  def parseSpec(s: String): Spec = s.trim.split(":", -1) match {
    case Array("range", n, cols) if cols.nonEmpty =>
      RangeSpec(n.toInt, cols.split(",").toSeq)
    case Array("rangeauto", t, cols) if cols.nonEmpty =>
      RangeAutoSpec(t.toLong, cols.split(",").toSeq)
    case Array("zorder", n, a, b, bits) =>
      ZOrderSpec(n.toInt, a, b, bits.toInt)
    case _ => throw new IllegalArgumentException(s"unparseable layout spec: $s")
  }

  /** Write `df` at `path` under the declared clustering. */
  def write(df: DataFrame, path: String, spec: Spec): Unit = spec match {
    case RangeSpec(n, cols) => writeRangeLayout(df, path, n, cols: _*)
    case RangeAutoSpec(target, cols) =>
      // measured file count: one extra count pass over the frame
      // being rewritten (column-pruned, so far cheaper than the
      // rewrite it precedes; persist upstream if the frame is an
      // expensive derivation)
      val rows = df.count()
      val n = math.max(1L, (rows + target - 1) / target)
      require(n <= Int.MaxValue, s"rangeauto: $n files from $rows rows")
      writeRangeLayout(df, path, n.toInt, cols: _*)
    case ZOrderSpec(n, a, b, bits) => writeZOrderLayout(df, path, n, a, b, bits)
  }

  /** Rewrite `df` into `numFiles` range-disjoint, internally-sorted
    * parquet files at `path`. */
  def writeRangeLayout(df: DataFrame, path: String, numFiles: Int,
      sortCols: String*): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Point-lookup layout: a parquet BLOOM FILTER on `bloomCol` for the
    * access pattern range layout can't serve — equality probes on a
    * high-cardinality column whose values are scattered across every
    * file (doc ids, content hashes, user ids). Footer min/max can't
    * prune scattered values; the bloom filter excludes a row group
    * unless it (probably) contains the probed value, so a point query
    * reads ~1 row group instead of the table. Orthogonal to
    * [[writeRangeLayout]] — sort for ranges, bloom for point probes;
    * both compose with the same write. */
  def writeBloomLayout(df: DataFrame, path: String, bloomCol: String,
      numFiles: Int, expectedNdv: Long): Unit =
    df.repartition(numFiles)
      .write
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol", expectedNdv.toString)
      .mode(SaveMode.Overwrite).parquet(path)

  /** Bit-interleave two non-negative integer columns into their
    * Z-order (Morton) index — a pure codegen'd Column expression, no
    * UDF: bit i of `a` lands at position 2i+1 and bit i of `b` at 2i.
    * Values MUST fit in `bits` bits — enforced with a per-row
    * raise_error rather than silent truncation (out-of-range values
    * would interleave only their low bits, quietly randomizing the
    * layout so scans stop pruning with no failure anywhere — the same
    * silent-collapse class planePairs guards against). Scale wide
    * domains down first (epoch seconds → minutes/hours). */
  def zOrder(a: Column, b: Column, bits: Int): Column = {
    val cap = lit(1L << bits)
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    when(a < 0 || a >= cap || b < 0 || b >= cap,
      raise_error(concat(lit(s"zOrder: value out of [0, 2^$bits): ("),
        a.cast("string"), lit(", "), b.cast("string"), lit(")"))))
      .otherwise(z)
  }

  /** Two-dimension clustering: files range-partitioned and sorted by
    * the Z-order index of (colA, colB), so BOTH columns get partial
    * min/max locality — the layout for 2-D box queries that
    * [[writeRangeLayout]]'s single sort dimension can't serve (a
    * range-by-A layout scans 100% on a B-only filter; Z-order scans
    * ~sqrt fractions on either dimension). The two-dimension case of
    * the space-filling-curve layouts lakehouse formats offer, built
    * from nothing but write order + footer stats. */
  def writeZOrderLayout(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String, bits: Int = 16): Unit =
    df.withColumn("__z", zOrder(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Rows the parquet reader actually MATERIALIZED for `df`'s last
    * execution (the leaf scan's numOutputRows metric, i.e. rows
    * surviving row-group/page pruning — run an action first). */
  def scannedRows(df: DataFrame): Long = {
    def leafScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => leafScans(a.executedPlan)
        // AQE stages are LEAF nodes wrapping the real subtree in
        // .plan — without this case any plan with a shuffle/broadcast
        // stage would silently report 0
        case q: QueryStageExec => leafScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(leafScans)
      }
    leafScans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }
}
