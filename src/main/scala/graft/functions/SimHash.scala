package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — a native Catalyst expression
  * (SURVEY.md §7.3 tier (b): built-ins can't express the per-bit
  * majority vote without 64 nested aggregates, so this is a genuine
  * custom-Expression case).
  *
  * Each token is hashed with xxHash64 (Spark's own `XXH64`, the same
  * algorithm behind `xxhash64()` — deterministic across JVMs and
  * executors); bit b of the result is 1 iff the sum of ±1 votes from
  * all tokens at bit b is positive. Near-duplicate documents land
  * within a small Hamming distance (`bit_count(a ^ b)` via built-ins).
  *
  * Codegen: delegates to [[SimHash.compute]] — a single static call,
  * so the expression stays inside whole-stage codegen.
  */
case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash {
  private final val Seed = 42L

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Register `simhash64` in the session's function registry
    * (idempotent) — Spark 4 exposes no public Expression->Column
    * constructor, so custom expressions route through the registry. */
  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "simhash64")(exprs => SimHash(exprs.head))

  /** Column-level entry point (requires [[register]] on the session). */
  def simhash64(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("simhash64", tokens)
  }
}
