package graft.functions

import java.util.SplittableRandom

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression.
  *
  * The pure-DataFrame formulation
  * (`transform(0..k-1, s -> array_min(transform(shingles, xxhash64(s, _))))`)
  * is k nested higher-order functions — interpreted per element with
  * boxing, and it re-hashes every shingle string k times. At sf0.1 that
  * made LSH dedup 60+ s. This kernel hashes each shingle ONCE (Spark's
  * own XXH64) and derives the k permutations with a multiply-xor over
  * the 64-bit hash (the standard `g_i(h) = (h ^ b_i) * a_i` family) —
  * O(n·k) wrapping-long ops in one JIT'd loop, inside whole-stage
  * codegen (single static call).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && k <= MinHashSig.MaxK =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"k must be in [1, ${MinHashSig.MaxK}], got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  final val MaxK = 256
  private final val HashSeed = 7L

  // Fixed permutation coefficients (SplittableRandom is an algorithm
  // specified by the JDK docs — deterministic across JVMs).
  private val (coeffA, coeffB): (Array[Long], Array[Long]) = {
    val rnd = new SplittableRandom(0x5EED5EED5EEDL)
    val a = Array.fill(MaxK)(rnd.nextLong() | 1L) // odd => bijective mod 2^64
    val b = Array.fill(MaxK)(rnd.nextLong())
    (a, b)
  }

  /** One pass: hash each shingle once, fold k permuted mins. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s: UTF8String = shingles.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), HashSeed)
        var j = 0
        while (j < k) {
          val g = (h ^ coeffB(j)) * coeffA(j)
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def register(spark: SparkSession): Unit =
    FunctionInstall.once(spark, "minhash_sig") {
      case Seq(input, Literal(k: Int, IntegerType)) => MinHashSig(input, k)
      case other => throw new IllegalArgumentException(
        s"minhash_sig(array<string>, k literal int), got ${other.length} args")
    }

  /** Column entry point (uses the active session's registry). */
  def minhashSig(tokens: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function("minhash_sig", tokens, lit(k))
  }
}
