package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fraction of agreeing slots between two MinHash signatures — the
  * unbiased Jaccard estimator (Broder). Used as the cheap candidate
  * pre-filter between LSH banding and exact set verification: fixed-
  * width long-array compare, no string sets touched until a candidate
  * survives.
  */
case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def ok(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_agreement requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreement.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigAgreement.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agreement"
}

object SigAgreement {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "sig_agreement")(exprs => SigAgreement(exprs(0), exprs(1)))

  def sigAgreement(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("sig_agreement", a, b)
  }
}
