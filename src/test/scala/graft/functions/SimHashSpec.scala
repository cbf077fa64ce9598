package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SimHash.simhash64

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def fp(text: String): Long =
    Seq(text).toDF("text")
      .select(simhash64(spark, split(col("text"), "\\s+")).as("fp"))
      .as[Long].head()

  test("deterministic: same tokens -> same fingerprint") {
    assert(fp("the quick brown fox") === fp("the quick brown fox"))
  }

  test("near-identical docs land within small Hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base + " extra"
    val far = "totally unrelated words about spark catalyst expressions and codegen"
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(base), fp(near)) <= 12)
    assert(hamming(fp(base), fp(far)) > 12)
  }

  test("empty token array -> all-zero-vote fingerprint (0L)") {
    val out = Seq(Seq.empty[String]).toDF("toks")
      .select(simhash64(spark, col("toks")).as("fp")).as[Long].head()
    assert(out === 0L)
  }

  test("null tokens inside the array are ignored") {
    val withNull = Seq(1).toDF("x")
      .select(simhash64(spark, array(lit("a"), lit(null).cast("string"), lit("b"))).as("fp"))
      .as[Long].head()
    val without = Seq(1).toDF("x")
      .select(simhash64(spark, array(lit("a"), lit("b"))).as("fp"))
      .as[Long].head()
    assert(withNull === without)
  }

  test("rejects non-array<string> input at analysis time") {
    SimHash.register(spark)
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(call_function("simhash64", col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<string>"))
  }

  test("survives whole-stage codegen over a real column") {
    // multi-row path exercises the generated code (not just eval)
    val n = Seq.tabulate(100)(i => s"token$i doc body number $i")
      .toDF("text")
      .select(simhash64(spark, split(col("text"), "\\s+")).as("fp"))
      .distinct().count()
    assert(n > 90) // distinct docs -> distinct fingerprints (no collisions expected here)
  }
}
