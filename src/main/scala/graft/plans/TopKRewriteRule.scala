package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite (SURVEY.md §7.3, `Rule[LogicalPlan]` surface):
  *
  * {{{
  *   Filter(rn <= k, Window([rn := row_number() OVER (PARTITION BY p ORDER BY o)], p, o, child))
  * }}}
  *
  * becomes [[TopKPerKey]](k, p, o, child) whenever the rank attribute
  * is used ONLY by the filter (nothing above reads it) — i.e. the query
  * wanted "top k rows per key", not the rank number itself. The window
  * plan shuffles + fully sorts every row; the rewritten plan keeps a
  * k-row bounded heap per key with map-side partial reduction (see
  * [[TopKPerKeyExec]]).
  *
  * The rank-unused requirement is checked by matching the
  * Project(cols, Filter(...)) that Catalyst's ColumnPruning leaves
  * above the filter: the rewrite fires only if the projected columns
  * don't include the rank attribute.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partitionSpec, orderSpec, _)), _)), _, _, child, _)))
        if w.windowOutputSet.size == 1 =>
      val rank = w.windowOutputSet.head
      val projRefs = AttributeSet(projectList.flatMap(_.references))
      rankLimit(cond, rank) match {
        // partitionSpec must be NON-empty: a global top-k (empty
        // PARTITION BY) would build TopKPerKey(keys = Nil), whose
        // final exec demands ClusteredDistribution(Nil) — rejected by
        // Spark at planning. Global top-k is TakeOrdered's job anyway.
        case Some(k) if k >= 1 && !projRefs.contains(rank) &&
            orderSpec.nonEmpty && partitionSpec.nonEmpty &&
            partitionSpec.forall(_.deterministic) =>
          // Spark's own InferWindowGroupLimit may already have inserted
          // a per-partition rank limit below the Window; TopKPerKey's
          // partial pass subsumes it, so strip it.
          val cleanChild = child match {
            case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
            case c => c
          }
          val topk = TopKPerKey(k, partitionSpec,
            orderSpec.map(_.asInstanceOf[SortOrder]), cleanChild)
          Project(projectList, topk)
        case _ => p
      }
  }

  /** Install rule + strategy on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    TopK.install(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }
}
