package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct whitespace-token n-gram shingles of a text, as one native
  * pass (SURVEY.md §2.1 dedup pipeline).
  *
  * Semantics match the DataFrame formulation used by the DuckDB oracles:
  * tokens = split on `\s+`, shingles = space-joined n-grams at every
  * token position `0..max(len-n, 0)` (so a doc shorter than n tokens
  * yields its whole token run as the single shingle), de-duplicated,
  * FIRST-OCCURRENCE order preserved (matches `array_distinct`).
  *
  * The HOF formulation (`transform(sequence(...), slice+concat_ws)` +
  * `array_distinct`) is interpreted per element with boxing; this
  * kernel is one JIT'd loop over the tokens, inside whole-stage codegen.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_set requires string, got ${child.dataType.catalogString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSet.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}

object ShingleSet {

  /** Exactly RE2 regex `\s`: [ \t\n\f\r] — the class
    * TextFunctions.wsTokens and the DuckDB string_split_regex oracles
    * use. NOT Character.isWhitespace (extra 0x1C-0x1F, U+2028/9) and
    * NOT Java regex `\s` (extra 0x0B): either divergence silently
    * breaks hash parity on texts containing those code points. */
  private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Split on runs of whitespace (Java regex `\s+` semantics), n-gram
    * join, distinct. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // toString allocation is unavoidable for building joined shingles;
    // the split itself avoids the regex engine.
    val s = text.toString
    val tokens = mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    // split("\\s+") parity: leading whitespace yields a leading "" token
    if (len > 0 && isRegexSpace(s.charAt(0))) tokens += ""
    while (i < len) {
      while (i < len && isRegexSpace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isRegexSpace(s.charAt(i))) i += 1
        tokens += s.substring(start, i)
      }
    }
    // Spark's split() uses limit = -1: trailing whitespace yields a
    // trailing "" token (unlike Java's String.split default).
    if (len > 0 && isRegexSpace(s.charAt(len - 1))) tokens += ""
    if (tokens.isEmpty) tokens += "" // split of "" is [""]
    val m = tokens.length
    val last = math.max(m - n, 0)
    val seen = new java.util.LinkedHashSet[String]((last + 1) * 2)
    var p = 0
    while (p <= last) {
      val end = math.min(p + n, m)
      val sb = new java.lang.StringBuilder
      var q = p
      while (q < end) {
        if (q > p) sb.append(' ')
        sb.append(tokens(q))
        q += 1
      }
      seen.add(sb.toString)
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "shingle_set") {
      case Seq(input, Literal(n: Int, IntegerType)) => ShingleSet(input, n)
      case other => throw new IllegalArgumentException(
        s"shingle_set(text, n literal int), got ${other.length} args")
    }

  def shingleSet(text: Column, n: Int): Column = {
    register(SparkSession.active)
    call_function("shingle_set", text, lit(n))
  }
}
