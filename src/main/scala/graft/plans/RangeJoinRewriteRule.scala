package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Alias, And, AttributeReference, Cast, CreateArray, Divide, EqualNullSafe, EqualTo, Explode, Expression, Floor, If, IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper, Remainder, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, Decimal, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType}

/** Optimizer rewrite for proximity (band) joins — the quadratic-join
  * trap a naive user query falls into:
  *
  * {{{
  *   a.join(b, abs(a("x") - b("y")) <= d)        // planned as BNLJ: O(|a|x|b|)
  * }}}
  *
  * becomes a banded EQUI-join: each left row is exploded to its own
  * `floor(x/d)` bucket ±1, the right side gets `floor(y/d)`, and the
  * join key is bucket equality with the original band predicate kept
  * as a post-join filter. Any pair within `d` differs by at most one
  * bucket, so exactly ONE of the three exploded buckets matches —
  * identical result set, no duplicates, and the physical plan is a
  * shuffle/broadcast HASH join on a dense integer key instead of a
  * nested-loop scan per row (the same construction `q_range_join_pairs`
  * and `DedupFunctions.bandedPairs` apply by hand).
  *
  * Fires only on INNER joins whose condition has NO equi predicate
  * (i.e. the join would otherwise be a cartesian/nested-loop plan) and
  * contains `abs(x - y) <= d` (or `<`) with `x`/`y` from opposite
  * sides and `d` a positive numeric literal.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private case class Band(leftExpr: Expression, rightExpr: Expression, delta: Literal)

  private def numericLit(e: Expression): Option[Literal] = e match {
    case l @ Literal(_: Number, _: NumericType) => Some(l)
    case l @ Literal(_: Decimal, _: NumericType) => Some(l)
    case _ => None
  }

  private def litDouble(l: Literal): Double = l.value match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  /** The literal rounded UP to a Long bucket width, when that is exact
    * and positive. `ceil` is safe: widening the bucket can only move a
    * true pair from "one bucket apart" to "same bucket" — never out of
    * the ±1 neighborhood the explode covers. */
  private def litCeilLong(l: Literal): Option[Long] = l.value match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case j: Long => Some(j)
    case d: Decimal =>
      val bd = d.toBigDecimal.setScale(0, scala.math.BigDecimal.RoundingMode.CEILING)
      if (bd.isValidLong) Some(bd.toLong) else None
    case f: Float => litCeilLong(Literal(f.toDouble, DoubleType))
    case d: Double =>
      val c = math.ceil(d)
      if (c >= 1 && c <= 9.2e18) Some(c.toLong) else None
    case _ => None
  }

  /** abs(x - y) <= d with x/y from opposite join sides. */
  private def band(p: Expression, left: LogicalPlan, right: LogicalPlan): Option[Band] = {
    def oriented(x: Expression, y: Expression, d: Literal): Option[Band] =
      if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) Some(Band(x, y, d))
      else if (x.references.subsetOf(right.outputSet) &&
          y.references.subsetOf(left.outputSet)) Some(Band(y, x, d))
      else None
    p match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lit) =>
        numericLit(lit).filter(litDouble(_) > 0).flatMap(oriented(x, y, _))
      case LessThan(Abs(Subtract(x, y, _), _), lit) =>
        numericLit(lit).filter(litDouble(_) > 0).flatMap(oriented(x, y, _))
      case _ => None
    }
  }

  private def isEqui(p: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def split(l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
        (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
    p match {
      case EqualTo(l, r) => split(l, r)
      case EqualNullSafe(l, r) => split(l, r)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val preds = splitConjunctivePredicates(cond)
      if (preds.exists(isEqui(_, left, right))) j
      else preds.flatMap(band(_, left, right)).headOption match {
        case Some(Band(le, re, d)) if le.dataType.isInstanceOf[NumericType] &&
            le.deterministic && re.deterministic =>
          rewrite(j, le, re, d)
        case _ => j
      }
  }

  private def rewrite(j: Join, le: Expression, re: Expression, d: Literal): LogicalPlan = {
    // Integral band columns must NOT take the double-division path: the
    // Double cast rounds above 2^53, so two values truly within d could
    // land more than one bucket apart and the equi-join would silently
    // drop the pair (unix_micros at ~1.7e15 is only a few bits below
    // the 9e15 limit). Exact integer floor-division instead:
    //   floorDiv(x, w) = x div w - (1 if x % w < 0 else 0)
    // (overflow-free for w >= 1; w = ceil(d) keeps pairs within +-1
    // bucket). Fractional columns keep the double path — their values
    // already live in double precision.
    def isIntegral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def isFractional(t: DataType) = t == DoubleType || t == FloatType
    val integral = isIntegral(le.dataType) && isIntegral(re.dataType)
    // DecimalType (and mixed/other numeric) inputs get NO rewrite: a
    // decimal is an exact type whose values can exceed 2^53, so the
    // double-division bucket has the same silent-row-loss hazard the
    // integral path was fixed for — and no exact shortcut exists for
    // arbitrary scales. The unrewritten join stays correct (BNLJ).
    val fractional = isFractional(le.dataType) && isFractional(re.dataType)
    val widthOpt = if (integral) litCeilLong(d) else None
    def bucket(e: Expression): Expression = widthOpt match {
      case Some(w) =>
        val wLit = Literal(w, LongType)
        val x = if (e.dataType == LongType) e else Cast(e, LongType)
        val zero = Literal(0L, LongType)
        Subtract(
          IntegralDivide(x, wLit),
          If(LessThan(Remainder(x, wLit), zero), Literal(1L, LongType), zero))
      case None =>
        Floor(Divide(Cast(e, DoubleType), Cast(d, DoubleType)))
    }
    if (integral && widthOpt.isEmpty) return j // d not representable: keep BNLJ
    if (!integral && !fractional) return j // decimal/mixed: keep exact BNLJ

    // left: materialize the base bucket and explode its probe
    // neighborhood. Integral buckets are EXACT, so +-1 suffices (a
    // pair within d differs by at most one bucket). Fractional
    // buckets carry quotient rounding: fl(x/d) errs by <= 0.5 ulp,
    // which for quotients below 2^53 is <= 1.0 absolute, so computed
    // buckets of a true pair can differ by up to 2 — probe +-2.
    // (Quotients >= 2^53 imply ulp(x) > d, where distinct values
    // within d cannot exist and equal values share a bucket.)
    val radius = if (integral) 1 else 2
    val baseAlias = Alias(bucket(le), "__range_bucket_base")()
    val leftProj = Project(j.left.output :+ baseAlias, j.left)
    val base = baseAlias.toAttribute
    val gen = Explode(CreateArray(
      (-radius to radius).map(i => Add(base, Literal(i.toLong, LongType)))))
    val genOut = gen.elementSchema.fields.toSeq.map(f =>
      AttributeReference("__range_bucket_l", f.dataType, f.nullable)())
    val leftGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = genOut, child = leftProj)

    // right: one bucket
    val rAlias = Alias(bucket(re), "__range_bucket_r")()
    val rightProj = Project(j.right.output :+ rAlias, j.right)

    // bucket equality becomes the join KEY; the original condition
    // (including the band predicate) stays for exactness
    val newCond = And(EqualTo(genOut.head, rAlias.toAttribute), j.condition.get)
    val newJoin = Join(leftGen, rightProj, Inner, Some(newCond), j.hint)
    Project(j.left.output ++ j.right.output, newJoin)
  }

  /** Install on a session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewriteRule
}
