package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._
import graft.plans.{MatViewRewriteRule, RangeJoinRewriteRule, TopKRewriteRule, TopKStrategy, ZoneMapRule}

/** One-stop Catalyst integration (the `SparkSessionExtensions` packaging):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the native expressions as SQL functions (usable from
  * `spark.sql` and `call_function` without any registry calls), the
  * [[graft.plans.TopKPerKey]] planner strategy, and the window-top-k
  * rewrite rule. The per-call `register`/`install` helpers on each
  * object remain for sessions built without extensions (e.g. the
  * driver's).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), builder)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case _ => throw new IllegalArgumentException(s"$what must be a literal int")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("simhash64",
      "simhash64(tokens) - 64-bit SimHash of array<string>",
      exprs => SimHash(exprs.head)))
    ext.injectFunction(fn("minhash_sig",
      "minhash_sig(shingles, k) - k-slot MinHash signature",
      exprs => MinHashSig(exprs(0), intLit(exprs(1), "k"))))
    ext.injectFunction(fn("shingle_set",
      "shingle_set(text, n) - distinct whitespace-token n-gram shingles",
      exprs => ShingleSet(exprs(0), intLit(exprs(1), "n"))))
    ext.injectFunction(fn("dot_product",
      "dot_product(a, b) - sequential-fold dot product of array<double>",
      exprs => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(fn("sig_agreement",
      "sig_agreement(a, b) - fraction of agreeing MinHash slots",
      exprs => SigAgreement(exprs(0), exprs(1))))
    ext.injectFunction(fn("rollinghash_min",
      "rollinghash_min(text) - min 16-byte-window polynomial rolling hash",
      exprs => RollingHashMin(exprs.head)))

    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectOptimizerRule(_ => RangeJoinRewriteRule)
    ext.injectOptimizerRule(_ => MatViewRewriteRule)
    ext.injectOptimizerRule(_ => ZoneMapRule)
  }
}
