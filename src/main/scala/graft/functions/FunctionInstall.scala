package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration.
  *
  * `createOrReplaceTempFunction` emits a `SimpleFunctionRegistry`
  * replace-warning every time a name is re-registered; the per-call
  * `register` helpers on each function object run once per query, so a
  * bench sweep produces hundreds of warning lines that drown
  * machine-read output (the driver failed to parse BENCH_r01 because of
  * it). Registering only when the name is absent keeps the helpers
  * call-anywhere cheap and the logs silent.
  */
private[functions] object FunctionInstall {
  def once(spark: SparkSession, name: String)(builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
