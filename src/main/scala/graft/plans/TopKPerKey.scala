package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanBridge

/** Per-key top-k as a whole custom operator (SURVEY.md §7.3 tier (c):
  * LogicalPlan node + SparkStrategy + physical exec, attached through
  * public extension points).
  *
  * WHY an operator instead of the `row_number().over(...) <= k`
  * formulation: the window plan shuffles EVERY row of every key, then
  * fully sorts each partition (O(n log n) + full-width shuffle). This
  * exec keeps a bounded heap of k rows per key — O(n log k) with NO
  * sort — and, critically, runs a PARTIAL pass before the shuffle, so
  * at most `k * distinctKeys` rows per input partition ever reach the
  * exchange (the same partial/final contract as hash aggregation).
  * At 100 TB, "top 3 orders per customer" shuffles ~3 rows per
  * customer per partition instead of the whole orders table.
  *
  * (Spark 3.5+ narrows the gap with InferWindowGroupLimit, which
  * pre-limits partitions below the Window — but the surviving rows
  * still pay the full shuffle + sort + rank pass. This operator
  * replaces that entire pipeline; [[TopKRewriteRule]] applies it
  * automatically to rewritable window queries.)
  *
  * Row order within a key's top-k output is unspecified (like any
  * physical operator's); callers order the final result.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrders = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // total order on rows per the requested SortOrders ("best" first)
      val ordering = GenerateOrdering.generate(sortOrders, childOutput)
      // per key: a REVERSE-ordered heap so the worst retained row is on
      // top and evicted first once size exceeds k
      val heaps = mutable.HashMap.empty[UnsafeRow, PriorityQueue[InternalRow]]
      val reverse: Comparator[InternalRow] =
        (a: InternalRow, b: InternalRow) => ordering.compare(b, a)
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        // probe with the projection's reused row; copy the key ONLY on
        // first sight of it (getOrElseUpdate's key param is strict, so
        // passing key.copy() would allocate per input row in this hot
        // loop — one copy per DISTINCT key is all that's needed)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new PriorityQueue[InternalRow](kLocal + 1, reverse)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.valuesIterator.flatMap { h =>
        val buf = mutable.ArrayBuffer.empty[InternalRow]
        while (!h.isEmpty) buf += h.poll()
        buf
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** Plans the logical node as partial -> (exchange inserted by
  * EnsureRequirements) -> final, mirroring hash aggregation's shape. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Install the strategy on the session (idempotent — works on ANY
    * session, including one the caller built without extensions). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per distinct value of `keyCols`, "best first" per
    * `orderCols` — (columnName, ascending) pairs, e.g.
    * `Seq("price" -> false, "id" -> true)`. Ties must be broken by the
    * order columns for a deterministic result. (Names, not the Column
    * DSL: Spark 4's `Column.desc` carries a non-catalyst sort node that
    * cannot cross into a custom physical operator.) */
  def perKey(df: DataFrame, k: Int, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val spark = df.sparkSession
    install(spark)
    val keys = keyCols.map(n => UnresolvedAttribute.quoted(n): Expression)
    val orders = orderCols.map { case (n, asc) =>
      SortOrder(UnresolvedAttribute.quoted(n), if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(spark, TopKPerKey(k, keys, orders, PlanBridge.analyzed(df)))
  }
}
