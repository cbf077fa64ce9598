package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      s"usage: graft.Verify <sfDir> <outDir> [query ...] (got ${args.length} args)")
    val Array(sfDir, outDir) = args.take(2)
    // optional query-name filter for fast local iteration; the driver
    // passes exactly two args and always dumps the full surface
    val only = args.drop(2).toSet
    // kernel-frame exports (minhash sigs, simhash fps) feed the DuckDB
    // oracle; only the correctness harness needs them written. The
    // export dir is a SIBLING of this run's outDir (set before any
    // query module initializes, so the oracle SQL embeds the same
    // path): still keyed to the run — concurrent scales can't clobber
    // each other — but NOT inside outDir, where the driver's checker
    // would enumerate it as a phantom oracle-less query.
    sys.props("graft.oracle.export") = "true"
    sys.props("graft.oracle.exportDir") =
      s"${outDir.stripSuffix("/")}_graft_oracle_frames"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_SLICE="name=<sql predicate>;name2=<pred>": filter
    // the named queries' OUTPUT before writing — the sampled-gate
    // affordance for wide-output queries at big scale factors (sf10
    // q_target_encoding is 150M rows; a deterministic key slice makes
    // its gate cheap while still hashing real engine output).
    // tools/sampled_gate.py applies the same predicate over the DuckDB
    // oracle and compares order-insensitively. The predicate must be
    // portable SQL over the query's OWN output columns (e.g.
    // "o_orderkey % 128 = 7"). Slices never apply to the driver's
    // plain two-arg invocation unless the driver sets the env.
    // Predicates must not contain ';' (the entry separator — a literal
    // ';' would split the predicate mid-expression). A slice key that
    // names no query is a HARD error: a typo'd name used to silently
    // write FULL output, which then failed the sampled gate with a
    // confusing row-count mismatch instead of failing here.
    val slices: Map[String, String] =
      sys.env.getOrElse("GRAFT_VERIFY_SLICE", "").split(';')
        .filter(_.contains("=")).map { kv =>
          val i = kv.indexOf('=')
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap
    val unknownSlices = slices.keySet -- SparkEntry.queries.keySet
    require(unknownSlices.isEmpty,
      s"GRAFT_VERIFY_SLICE names unknown queries: ${unknownSlices.mkString(", ")} " +
        "(note: predicates cannot contain ';' — it is the entry separator)")
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df0 = fn(spark, sfDir)
        val df = slices.get(name)
          .map(p => df0.filter(org.apache.spark.sql.functions.expr(p)))
          .getOrElse(df0)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
