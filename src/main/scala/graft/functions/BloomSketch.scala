package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bloom-sketch build/probe over xxhash64 keys — Spark's OWN bloom
  * expressions (the machinery AQE's InjectRuntimeFilter plants under
  * shuffle joins, `BloomFilterAggregate` / `BloomFilterMightContain`),
  * surfaced as callable functions so a pipeline can use the same
  * pre-shuffle pruning deliberately: sketch the small side once, then
  * kill definitely-absent rows with a narrow codegen'd filter BEFORE
  * any shuffle join.
  *
  * Both expressions take the xxhash64 of the key (exactly what the
  * runtime filter injects); the sketch itself is one binary blob whose
  * size is fixed by `nBits` — it travels as a plan literal, like a
  * broadcast var, never as data. No false negatives, so
  * bloom-prefilter + exact-confirm is RESULT-IDENTICAL to the plain
  * join (spec-proven in `BloomDeltaSpec`).
  */
object BloomSketch {

  def register(spark: SparkSession): Unit = {
    FunctionInstall.once(spark, "graft_bloom_agg") {
      case Seq(child, n @ Literal(_, LongType), bits @ Literal(_, LongType)) =>
        new BloomFilterAggregate(child, n, bits)
      case other => throw new IllegalArgumentException(
        "graft_bloom_agg(xxhash64 col, nItems literal long, " +
          s"nBits literal long), got ${other.length} args")
    }
    FunctionInstall.once(spark, "graft_bloom_might_contain") {
      case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_might_contain(bloom, xxhash64 col), got ${other.length} args")
    }
  }

  /** Aggregate an xxhash64 (LongType) column into a bloom sketch
    * (BinaryType, `nBits/8` bytes). */
  def bloomAgg(hashed: Column, nItems: Long, nBits: Long): Column = {
    register(SparkSession.active)
    call_function("graft_bloom_agg", hashed, lit(nItems), lit(nBits))
  }

  /** Membership probe: false only if the key was NEVER sketched (no
    * false negatives). `bloom` must be foldable — pass the sketch bytes
    * as a `lit(...)`. */
  def mightContain(bloom: Column, hashed: Column): Column = {
    register(SparkSession.active)
    call_function("graft_bloom_might_contain", bloom, hashed)
  }
}
