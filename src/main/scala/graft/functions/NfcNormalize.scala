package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the first text
  * op of any web-crawl cleaning pipeline (the same logical string
  * arrives as composed or decomposed code points depending on the
  * producing OS/editor; every downstream exact-hash dedup, shingle,
  * and tokenizer disagrees about them until the corpus is normalized
  * to one form). Spark ships no normalization builtin; the expression
  * wraps `java.text.Normalizer` (the JDK's ICU-derived NFC, the same
  * Unicode standard DuckDB's utf8proc `nfc_normalize` implements —
  * the oracle-parity seam) behind an ASCII fast path, and stays
  * inside whole-stage codegen (single static call).
  *
  * Scale shape: narrow per-row compute, no shuffle — scan-bound at
  * 100 TB, and the ASCII fast path (one branchy byte scan, no UTF-16
  * round-trip, returns the INPUT object) makes the common case
  * allocation-free: real crawls are mostly ASCII bytes even in
  * non-English documents.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** NFC is the identity on ASCII, so the fast path is one byte scan
    * that never leaves the UTF8String; only rows carrying a high bit
    * pay the UTF-16 round-trip, and of those, already-composed text
    * returns the input object (Normalizer.isNormalized-style
    * equality check on the result). */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val str = s.toString
        val n = java.text.Normalizer.normalize(
          str, java.text.Normalizer.Form.NFC)
        return if (n == str) s else UTF8String.fromString(n)
      }
      i += 1
    }
    s
  }

  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "nfc_normalize")(exprs => NfcNormalize(exprs.head))

  def nfcNormalize(text: Column): Column = {
    register(SparkSession.active)
    call_function("nfc_normalize", text)
  }
}
