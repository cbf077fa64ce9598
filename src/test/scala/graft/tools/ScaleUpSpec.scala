package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The scale-bump generator must produce data that is structurally
  * indistinguishable from "reps× more organic rows": joins keep their
  * fan-outs, replicas never near-dup each other, and the special
  * events timestamp encoding survives the round-trip.
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"
  private lazy val out: String = {
    val d = Files.createTempDirectory("scaleup").toString
    ScaleUp.scale(spark, src, d, reps = 2)
    d
  }

  private def cnt(dir: String, t: String) =
    spark.read.parquet(s"$dir/$t.parquet").count()

  test("fact tables replicate, bounded dims stay fixed") {
    assert(cnt(out, "lineitem") === 2 * cnt(src, "lineitem"))
    assert(cnt(out, "orders") === 2 * cnt(src, "orders"))
    assert(cnt(out, "customer") === 2 * cnt(src, "customer"))
    assert(cnt(out, "documents") === 2 * cnt(src, "documents"))
    assert(cnt(out, "region") === 5L)
    assert(cnt(out, "nation") === 25L)
  }

  test("referential integrity holds across replicas (no orphans, same fan-out)") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    // every lineitem joins its order, every order its customer —
    // replicas join within themselves only (inner join loses no rows)
    assert(li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      === li.count())
    assert(ord.join(cust, col("o_custkey") === col("c_custkey")).count()
      === ord.count())
    // keys are globally unique after offsetting
    assert(ord.select("o_orderkey").distinct().count() === ord.count())
  }

  test("document replicas share ZERO tokens with their source (no planted near-dups)") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val a = docs.filter(col("doc_id") < 10000000L)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val b = docs.filter(col("doc_id") >= 10000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
    assert(a.join(b, Seq("doc_id", "tok")).count() === 0L)
    // and n_chars still describes the text
    val bad = docs.filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad === 0L)
  }

  test("scaled events read back through graft.Tables (timestamp contract)") {
    // on DISK: ntz, not ltz — an isAdjustedToUTC parquet column would
    // read as TIMESTAMPTZ in DuckDB and shift with the machine tz
    assert(spark.read.parquet(s"$out/events.parquet")
      .schema("ts").dataType.typeName === "timestamp_ntz")
    // through Tables: normalized to ltz like the driver dirs, so every
    // query (unix_micros etc.) sees the usual type
    val ev = Tables(spark, out, "events")
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    assert(ev.count() === 2 * cnt(src, "events"))
    // replicas preserve the source's wall-clock time range (density
    // doubles); compare as strings — the source dir yields ltz
    // Timestamp, the scaled dir ntz LocalDateTime (same UTC walls)
    def range(df: org.apache.spark.sql.DataFrame) = df
      .agg(min("ts").cast("string"), max("ts").cast("string")).collect()(0)
    assert(range(Tables(spark, src, "events")) === range(ev))
  }
}
