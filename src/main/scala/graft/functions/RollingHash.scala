package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum polynomial
  * rolling hash over all K-byte windows of the UTF-8 text (Rabin-Karp
  * rolling update, one pass, O(n)). Documents sharing any K-byte run
  * (K=16) are likely to share the minimizing window and thus collide —
  * the cheap first-stage signal for containment/near-dup detection
  * (complementing [[SimHash]], which measures bag-of-tokens distance).
  *
  * A native Catalyst expression with codegen (kernel is one static
  * call, so it stays inside whole-stage codegen).
  */
case class RollingHashMin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rollinghash_min requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashMin.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)

  override def prettyName: String = "rollinghash_min"
}

object RollingHashMin {
  final val K = 16
  private final val Base = 1000003L
  // Base^(K-1) for the rolling subtraction, in wrapping Long arithmetic.
  private final val BasePowK1: Long = {
    var p = 1L; var i = 0
    while (i < K - 1) { p *= Base; i += 1 }
    p
  }

  /** Min rolling hash over K-byte windows; whole-text hash if shorter.
    * Wrapping 64-bit arithmetic (mod 2^64) — deterministic everywhere. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val k = if (n < K) n else K
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    if (n > K) {
      var start = 1
      while (start <= n - K) {
        h = (h - (bytes(start - 1) & 0xff) * BasePowK1) * Base + (bytes(start + K - 1) & 0xff)
        if (h < min) min = h
        start += 1
      }
    }
    min
  }

  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "rollinghash_min")(exprs => RollingHashMin(exprs.head))

  def rollinghashMin(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("rollinghash_min", text)
  }
}
