package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark query plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * @param fn     (spark, sfDir) => result DataFrame. Must be totally
  *               ordered by a unique key so row order is deterministic.
  * @param oracle ANSI SQL for DuckDB over the same tables (bare table
  *               names, e.g. `lineitem`). None for ops that SQL can't
  *               express — the driver then records a rows-only check.
  * @param bench  include in the headline benchmark set run by [[Bench]].
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** A group of related query definitions (one per SURVEY.md §2 operator). */
trait QueryModule {
  def defs: Seq[(String, QueryDef)]
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Plain `spark.read.parquet` — Catalyst pushes filters/projections
  * into the scan, so no extra plumbing is needed here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // the driver's events.ts is TIMESTAMP(NANOS) parquet, which
      // Spark 4 refuses to read natively; read nanos as long and
      // truncate to microseconds (exact integer division — same
      // truncation DuckDB applies). Schema-gated: a dir whose events
      // already carry a plain TIMESTAMP (e.g. a tools.ScaleUp output)
      // reads through unchanged.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // scaled dirs store ntz (so DuckDB sees naive timestamps, not
        // machine-tz-shifted TIMESTAMPTZ); queries expect ltz — the
        // cast is wall-preserving under the pinned UTC session tz
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
