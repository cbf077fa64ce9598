package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-bump data generator: replicates a driver testdata directory
  * K× with key offsets, preserving referential integrity, so plans can
  * be exercised one decade above the gated scale (TESTDATA.md tops out
  * at sf0.1) BEFORE a real scale-up would find the regressions.
  *
  * Per replica k: every join key (custkey, orderkey, partkey, suppkey,
  * event_id, user_id, doc_id, vec_id) shifts by k*10^7 — far above any
  * real key — so each replica joins only within itself, exactly like
  * 10× more organic data with the same per-key fan-outs and the same
  * value distributions. region/nation stay fixed (they are bounded
  * dims at every scale, as in TPC-H). Document texts get a per-replica
  * prefix token and embeddings a per-replica component shift so the
  * dedup/ANN operators don't see 10 exact copies of everything.
  * Embeddings replicate at ~4/10 of the factor, mirroring the driver's
  * own sf0.01 -> sf0.1 ratio (500 -> 2000 vs 10x elsewhere).
  *
  * Usage: ScaleUp <srcSfDir> <outDir> <replicas>
  */
object ScaleUp {

  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <outDir> <replicas>")
    val Array(src, out, repStr) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, out, repStr.toInt)
    spark.stop()
  }

  /** Replicate every table of `src` into `out` (see class doc). */
  def scale(spark: SparkSession, src: String, out: String, reps: Int): Unit = {
    require(reps >= 1, s"replicas must be >= 1, got $reps")
    // events.ts is TIMESTAMP(NANOS) parquet (runtime conf, so callers
    // on a shared session get it too)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def replicate(df: DataFrame, n: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(k => f(df, k)).reduce(_ unionByName _)
    def shift(df: DataFrame, k: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * Off)))

    // bounded dims: fixed at every scale (TPC-H semantics)
    write(read("region"), "region")
    write(read("nation"), "nation")

    write(replicate(read("customer"), reps)(shift(_, _, "c_custkey")), "customer")
    write(replicate(read("supplier"), reps)(shift(_, _, "s_suppkey")), "supplier")
    write(replicate(read("part"), reps)(shift(_, _, "p_partkey")), "part")
    write(replicate(read("orders"), reps)(
      shift(_, _, "o_orderkey", "o_custkey")), "orders")
    write(replicate(read("lineitem"), reps)(
      shift(_, _, "l_orderkey", "l_partkey", "l_suppkey")), "lineitem")

    // events: the source's TIMESTAMP(NANOS) reads as nanos-long
    // (session conf above); write back as a plain TIMESTAMP at the
    // same micros truncation graft.Tables applies, so BOTH engines
    // read the scaled dir directly (DuckDB would see a bare BIGINT if
    // the long were kept — the whole events oracle family would
    // break). Tables is schema-gated and passes it through unchanged.
    // Same time range at reps× density — how real event volume grows.
    val events0 = {
      val e = read("events")
      // timestamp_ntz, not ltz: an isAdjustedToUTC=true parquet column
      // reads back as TIMESTAMPTZ in DuckDB and every hour/window
      // boundary would shift with the machine timezone — ntz matches
      // the naive timestamps the driver's dirs yield (session tz is
      // UTC here, so the cast is a wall-clock no-op)
      if (e.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        e.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      else e
    }
    write(replicate(events0, reps)(shift(_, _, "event_id", "user_id")), "events")

    // documents: each replica lives in its own token NAMESPACE (every
    // word prefixed r<k>_) — cross-replica shingle overlap is exactly
    // zero while within-replica structure (including the source data's
    // organic near-dup pairs) is preserved verbatim, so near-dup pair
    // counts scale LINEARLY like a real 10x corpus. Two rejected
    // constructions, both measured as pair-count bombs: a doc-level
    // prefix keeps replicas near-identical in shingle space (every doc
    // gains reps-1 planted near-dups => C(reps,2) x corpus pairs, 44x
    // bench blowup), and a replica-seeded word SORT canonicalizes
    // order corpus-wide so same-vocabulary docs collide WITHIN a
    // replica (186x blowup).
    write(replicate(read("documents"), reps) { (d, k) =>
      val d2 = shift(d, k, "doc_id")
      if (k == 0) d2
      else d2
        .withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(lit(s"r${k}_"), w)),
          " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    // embeddings: per-replica component shift breaks exact-duplicate
    // vectors; ~4/10 ratio mirrors the driver's own embedding scaling
    val embReps = math.max(1, (reps * 4) / 10)
    write(replicate(read("embeddings"), embReps) { (d, k) =>
      val d2 = shift(d, k, "vec_id")
      if (k == 0) d2
      else d2.withColumn("embedding",
        transform(col("embedding"), x => x + lit(k * 5.0e-4f)))
    }, "embeddings")
  }
}
