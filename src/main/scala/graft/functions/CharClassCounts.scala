package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-class histogram in ONE pass over the UTF-8 bytes: 28
  * counts — the 26 ASCII letters (case-folded), the space, and
  * "everything else" (each non-ASCII CODE POINT counts once, by
  * counting only non-continuation bytes, so the semantics match a
  * character-oriented engine, not a byte-oriented one).
  *
  * This is the narrow kernel under `q_char_diversity`: the
  * expression-only alternative is 27 full `replace` passes per
  * document (how the DuckDB oracle recomputes it — exact integers, so
  * the two roads agree bit-for-bit); at 100 TB one fused pass vs 27
  * is the difference between scan-bound and CPU-bound. Stays inside
  * whole-stage codegen (single static call, no boxing of the hot
  * loop).
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_counts requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CharClassCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)

  override def prettyName: String = "char_class_counts"
}

object CharClassCounts {
  final val Size = 28 // 26 letters + space + other
  final val SpaceIdx = 26
  final val OtherIdx = 27

  /** One pass over the bytes; letters fold case. A UTF-8 code point
    * has exactly one non-continuation byte, so skipping bytes with
    * the 10xxxxxx prefix counts non-ASCII code points (not bytes) in
    * the "other" bucket — character semantics without a decode. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](Size)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0xc0) != 0x80) { // not a UTF-8 continuation byte
        if (b >= 'a' && b <= 'z') counts(b - 'a') += 1L
        else if (b >= 'A' && b <= 'Z') counts(b - 'A') += 1L
        else if (b == ' ') counts(SpaceIdx) += 1L
        else counts(OtherIdx) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "char_class_counts")(exprs => CharClassCounts(exprs.head))

  def charClassCounts(text: Column): Column = {
    register(SparkSession.active)
    call_function("char_class_counts", text)
  }
}
