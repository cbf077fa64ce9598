package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Mergeable rank/quantile sketch — the missing sketch class beside
  * CMS/HLL/KMV/AMS/bloom: a bounded summary from which any rank or
  * quantile of a numeric column can be estimated, that MERGES across
  * shards/batches (union of sketches = sketch of union) so 1000
  * executors — or 1000 micro-batches — each contribute ≤k rows to an
  * always-fresh quantile store ([[graft.streaming.QuantileMaintenance]]).
  *
  * Construction (deterministic level sampling; the threshold-sampling
  * member of the KLL/q-digest family, chosen because its state is a
  * PURE FUNCTION of the input multiset — no compaction schedule, no
  * randomness, no order dependence):
  *
  *   - every row gets the shared cross-engine 60-bit md5 priority
  *     `h` of its UNIQUE key (the q_kmv_distinct hash);
  *   - `lmax(h) = 60 - bitlen(h)` (h=0 → 60): the deepest sampling
  *     level the row survives, geometric with ratio 1/2 because h is
  *     uniform on [0, 2^60);
  *   - the sketch level `ℓ* = min{ℓ ≥ 0 : |{x : lmax(x) ≥ ℓ}| ≤ k}`,
  *     content = exactly those surviving rows, plus the exact total
  *     count n.
  *
  * Since the survivor sets are nested (S_0 ⊇ S_1 ⊇ …) and only grow
  * with more data, ℓ* is monotone under union and the merged sketch
  * equals the from-scratch sketch of the union BIT-EXACTLY — proved
  * in QuantileSketchSpec by merging arbitrary splits in arbitrary
  * orders. That exactness is also what makes the sketch HASH-CHECKABLE
  * end-to-end (q_quantile_sketch): DuckDB replays the same md5
  * priorities, the same level rule, the same integer position
  * arithmetic.
  *
  * Estimation: the sketch is a uniform Bernoulli sample at rate
  * 2^-ℓ*, so the φ-quantile estimate is the sample's own φ-quantile
  * (position `max(1, φ·m div 10⁴)` in (value, h) order — h breaks
  * value ties deterministically), and the rank error certificate is
  * the standard 5σ sampling bound with σ = n·sqrt(φ(1−φ)/m),
  * checked in EXACT integer cross-multiplied form:
  * `err² · m ≤ 25 · φ_bp · (10⁴−φ_bp) · n²` with
  * `err = |exact_rank·10⁴ − φ_bp·n|` (DECIMAL(38,0) / HUGEINT).
  *
  * Scale shape: one scan computes (v, h, lmax); the level choice is a
  * ≤61-row aggregate (count per lmax + one tiny window — the
  * registry-frame class, single-partition by construction); the
  * sketch filter broadcasts that 1-row meta. Nothing but the ≤k-row
  * sketch crosses stages afterwards.
  */
object QuantileSketch {

  /** Default capacity: 1024 survivors ⇒ ~1.6% rank σ at φ=0.5. */
  val DefaultK = 1024

  /** Hash domain: 60-bit md5 prefix (15 hex digits), the engine's
    * shared cross-engine priority. */
  val HashBits = 60

  /** The 60-bit md5 priority of a (string) key column — the first 15
    * hex digits, the engine's shared cross-engine construction. */
  def hash60(key: Column): Column =
    conv(md5(key).substr(1, 15), 16, 10).cast("long")

  /** Deepest level a priority survives: 60 - bitlen(h), h=0 → 60. */
  def lmaxCol(h: Column): Column =
    when(h === 0L, lit(60L))
      .otherwise(lit(60L) - length(bin(h)).cast("long"))

  /** 1-row meta frame (lstar, n) for `rows` = (v: long, h: long).
    * The window runs on the ≤61-row per-level count frame — bounded
    * single-partition by construction (the waterfill registry-frame
    * contract). */
  def levelMeta(rows: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("lmax").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.select(lmaxCol(col("h")).as("lmax"))
      .groupBy("lmax").agg(count(lit(1)).as("c"))
      .withColumn("s", sum(col("c")).over(w))
      .agg(
        coalesce(max(when(col("s") > k, col("lmax"))) + lit(1L), lit(0L))
          .as("lstar"),
        sum(col("c")).as("n"))
  }

  /** The ≤k surviving rows (v, h) + broadcast meta columns (lstar, n). */
  def sketchRows(rows: DataFrame, k: Int): DataFrame =
    rows.crossJoin(broadcast(levelMeta(rows, k)))
      .filter(lmaxCol(col("h")) >= col("lstar"))
      .select(col("v"), col("h"), col("lstar"), col("n"))

  // ---------------------------------------------------------------
  // Driver-side model: the same sketch as a plain value — the
  // Aggregator's buffer, the streaming store's merge kernel, and the
  // spec's independent reference. Bounded at ≤k items by definition.
  // ---------------------------------------------------------------

  /** Pure sketch value: sampling level, exact total, surviving
    * (h, v) pairs (unordered; canonical form sorts by (h, v)). */
  final case class QSketch(k: Int, level: Int, total: Long,
      items: Vector[(Long, Long)]) {

    def add(h: Long, v: Long): QSketch = {
      val s = copy(total = total + 1,
        items = if (lmaxOf(h) >= level) items :+ ((h, v)) else items)
      s.raised
    }

    def merge(o: QSketch): QSketch = {
      require(k == o.k, s"capacity mismatch: $k vs ${o.k}")
      val lvl = math.max(level, o.level)
      QSketch(k, lvl, total + o.total,
        (items ++ o.items).filter(p => lmaxOf(p._1) >= lvl)).raised
    }

    /** Restore the level invariant: minimal ℓ with ≤k survivors. */
    private def raised: QSketch =
      if (items.size <= k) this
      else {
        var lvl = level
        var it = items
        while (it.size > k) {
          lvl += 1
          it = it.filter(p => lmaxOf(p._1) >= lvl)
        }
        copy(level = lvl, items = it)
      }

    /** Canonical (deterministic) item order for comparison. */
    def canonical: Vector[(Long, Long)] = items.sorted

    /** φ-quantile estimate (φ in basis points) — position
      * max(1, φ·m div 10⁴) in (v, h) order; None on the empty
      * sketch. */
    def quantile(phiBp: Long): Option[Long] = {
      if (items.isEmpty) None
      else {
        val byV = items.map(p => (p._2, p._1)).sorted
        val pos = math.max(1L, phiBp * byV.size / 10000L)
        Some(byV((pos - 1).toInt)._1)
      }
    }
  }

  object QSketch {
    def empty(k: Int = DefaultK): QSketch = QSketch(k, 0, 0L, Vector.empty)

    def fromRows(rows: Iterable[(Long, Long)], k: Int = DefaultK): QSketch =
      rows.foldLeft(empty(k)) { case (s, (h, v)) => s.add(h, v) }
  }

  /** Scala-side lmax — the Column rule's exact integer twin. */
  def lmaxOf(h: Long): Int =
    if (h == 0L) 60 else 60 - (64 - java.lang.Long.numberOfLeadingZeros(h))

  /** The sketch as a typed [[Aggregator]] over (h, v) input rows —
    * usable as a Dataset aggregate column and in
    * `KeyValueGroupedDataset.agg` for per-group quantile summaries.
    * The buffer is ≤k pairs; partial aggregation keeps the exchange
    * at sketch size. */
  final class QuantileSketchAgg(k: Int = DefaultK)
      extends Aggregator[(Long, Long), QSketch, QSketch] {
    override def zero: QSketch = QSketch.empty(k)
    override def reduce(b: QSketch, a: (Long, Long)): QSketch =
      b.add(a._1, a._2)
    override def merge(b1: QSketch, b2: QSketch): QSketch = b1.merge(b2)
    override def finish(r: QSketch): QSketch = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[QSketch] =
      org.apache.spark.sql.Encoders.product[QSketch]
    override def outputEncoder: org.apache.spark.sql.Encoder[QSketch] =
      org.apache.spark.sql.Encoders.product[QSketch]
  }
}
