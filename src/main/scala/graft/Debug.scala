package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run one named query and print result/plan/exception.
  *
  * `--time` switches to the Bench session shape (local[N], AQE on)
  * and prints per-run wall times instead of rows — for profiling a
  * single query without a full bench pass.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    // first non-flag argument after the query name (absolute OR
    // relative — silently ignoring a relative path would measure the
    // wrong dataset)
    val sfDir = args.drop(1).find(!_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.001")
    val timing = args.contains("--time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", if (timing) "32" else "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", timing.toString)
      // mirror Bench's AQE partition sizing exactly — a --time probe
      // that plans differently from Bench measures a different query
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (timing) {
        SparkEntry.queries(name)(spark, sfDir).count() // warm (JIT + data)
        spark.catalog.clearCache()
        // SPARK_GRAFT_DEBUG_RUNS widens the sample when the question
        // is the RUN-TO-RUN DISTRIBUTION in one JVM (bimodality
        // triage: variance inside a JVM points at cache/eviction,
        // stable-inside-but-differs-across-JVMs points at page cache
        // or JIT), default 3 for quick profiling
        val n = sys.env.getOrElse("SPARK_GRAFT_DEBUG_RUNS", "3").toInt
        for (i <- 1 to n) {
          val t0 = System.nanoTime()
          val rows = SparkEntry.queries(name)(spark, sfDir).count()
          println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
          spark.catalog.clearCache()
        }
      } else {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (args.contains("--explain")) df.explain("formatted")
        df.show(10, truncate = false)
        println(s"rows: ${df.count()}")
      }
    } catch {
      case e: Throwable =>
        e.printStackTrace()
    }
    spark.stop()
  }
}
