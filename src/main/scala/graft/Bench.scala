package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs the `bench = true` subset of
  * [[SparkEntry.queries]] against `SPARK_GRAFT_SF_DIR`, prints ONE JSON
  * line consumed by the driver (BENCH_r{N}.json).
  */
object Bench {

  /** Spec-pinned contention rule: a multicore probe reading more than
    * this ratio over the same-moment single-thread quarter probe means
    * co-tenant load is binding on the full-width regime (r7 evidence:
    * contended driver runs read 1.7–2.2× while clean windows sit at
    * ~1.0–1.2×). Using the IN-RUN single-thread quarter as the
    * denominator makes the rule machine-independent — no hardcoded
    * "0.125 s idle" constant that only holds on one host. */
  val ContendedRatio = 1.5

  /** True iff the slowest-thread multicore spin time exceeds
    * [[ContendedRatio]] × the single-thread quarter spin measured in
    * the same window. */
  def isContended(mtSec: Double, stQuarterSec: Double): Boolean =
    mtSec > ContendedRatio * math.max(stQuarterSec, 1e-9)

  /** Merge two measurement passes per query: min of the successful
    * times; a failure (-1) in one pass defers to the other; both
    * failing stays -1. Keys must align (same benchQueries order). */
  def mergePasses(a: Seq[(String, Double)],
      b: Seq[(String, Double)]): Seq[(String, Double)] = {
    require(a.map(_._1) == b.map(_._1), "pass key mismatch")
    a.zip(b).map { case ((k, x), (_, y)) =>
      k -> (if (x < 0) y else if (y < 0) x else math.min(x, y))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE size post-shuffle partitions by bytes (advisory 64MB)
      // instead of padding to full parallelism — the Spark docs'
      // recommended production setting; locally it also stops tiny
      // shuffles from paying 32 tasks of scheduling overhead per stage
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup: run every bench query once at the smallest
    // available SF so the timed pass measures the plan, not
    // classloading/JIT. A warmup failure is loud on stderr (it means
    // the timed pass will be skewed), never fatal.
    val queries = SparkEntry.queries
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").exists())
        "/root/testdata/sf0.001"
      else sfDir
    SparkEntry.benchQueries.foreach { name =>
      try queries(name)(spark, warmDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name: $e")
      }
    }
    spark.catalog.clearCache() // drop warmup persists

    // shuffle-volume diagnostics per query (ops/MetricsListener — the
    // production observability hook): listener events arrive async,
    // so drain until the count stops moving before reading a query's
    // slice. Diagnostics land in a SIDE file + stderr only — the
    // driver's stdout contract stays exactly one JSON line.
    // ambient-load calibration: a fixed single-thread spin kernel (pure
    // register arithmetic — no allocation, no I/O) timed before and
    // after the query loop. Its wall time depends ONLY on how much CPU
    // the shared host is giving this process, so a driver run that
    // lands in the inflated class (observed: same-commit totals
    // swinging 22.7 → 30.1 s under ambient load) is machine-
    // identifiable from the JSON tail instead of burning a round on a
    // phantom regression. Reference: ~0.5 s unloaded on this host.
    def spinN(iters: Long): Double = {
      val t0 = System.nanoTime()
      var x = 88172645463325252L
      var i = 0L
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      if (x == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    def spinSec(): Double = spinN(250000000L)
    // quarter-length probe interleaved per query (~0.125 s unloaded on
    // this host): each measurement below is stamped with the probe
    // taken right before its timed runs, so a single wobbled entry is
    // machine-attributable to ambient load at THAT moment instead of
    // smearing suspicion over the whole run
    val QuarterIters = 62500000L
    // MULTI-threaded probe: the single-thread spin is blind to
    // co-tenant load that only binds when all cores are in use — the
    // regime that inflated 16 unchanged queries 1.3–1.75× between the
    // r6 and r7 bench runs while pre/post stayed at ~0.47 s (round-8
    // same-VM A/B of the two code snapshots showed identical
    // per-query times, so the drift was the machine, not the code).
    // Thread count is min(physical cores, SPARK_GRAFT_CPUS): on hosts
    // with fewer cores than the configured parallelism, `cpus` threads
    // would inflate the max-thread time even when idle — the probe
    // must measure co-tenancy, not self-oversubscription. The count is
    // recorded in the calib JSON so the reading is interpretable on
    // any machine. All threads spin the same kernel at quarter
    // length; the reported figure is the SLOWEST thread — on an idle
    // host it matches the single-thread quarter (~0.125 s), under
    // multicore contention it inflates roughly like the Spark stages.
    val mtThreads =
      math.min(Runtime.getRuntime.availableProcessors(), cpus.toInt)
    def spinMtSec(): Double = {
      val times = new Array[Double](mtThreads)
      val threads = (0 until mtThreads).map { i =>
        new Thread(() => times(i) = spinN(QuarterIters))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      times.max
    }

    // prime the OS page cache over the whole dataset ONCE before any
    // timed work: the sf0.001 warmup covers JIT but not the target
    // files, and the per-query untimed pass reads only each query's
    // PRUNED columns — the first heavy scans after the tiny weather
    // entries (q_pricing_summary, q_top_unshipped_orders) were the two
    // r6 wobbles, cold page cache the prime suspect. A straight
    // sequential read of every parquet byte is cheap (~1 s for the
    // ~200 MB sf0.1 dir) and makes the timed runs measure the plan,
    // not the disk.
    def primeFiles(dir: String): Unit = {
      val buf = new Array[Byte](1 << 20)
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) {
          val kids = f.listFiles(); if (kids != null) kids.foreach(walk)
        } else if (f.getName.endsWith(".parquet")) {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      walk(new java.io.File(dir))
    }
    val tPrime = System.nanoTime()
    primeFiles(sfDir)
    System.err.println(
      f"[bench] page-cache prime: ${(System.nanoTime() - tPrime) / 1e9}%.2f s")

    spinSec() // JIT warm
    // I/O-side ambient probe: the CPU spin probes are blind to disk /
    // page-cache / memory-bus contention, yet scan-bound queries (the
    // md5 hash pass over lineitem) swing with exactly that — the r9
    // "quantile-sketch sf10 bimodality" (14.8 vs 10.4 s across two
    // clean-CPU-probe bench executions, while a 12-run same-JVM r10
    // probe showed a unimodal ±13% band at a third level entirely)
    // was unattributable for want of this number. Reads a fixed
    // ≤256 MB slice of the bench's own biggest lineitem file; after
    // the priming pass this measures page-cache/memory bandwidth —
    // a co-tenant saturating disk or the memory bus shows HERE while
    // the spins stay clean.
    def ioProbeMbps(): Double = {
      def pick(f: java.io.File): java.io.File =
        if (f.isFile) f
        else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(x => x.isFile && x.getName.endsWith(".parquet"))
          .sortBy(-_.length()).headOption.getOrElse(f)
      val src = pick(new java.io.File(sfDir, "lineitem.parquet"))
      if (!src.isFile || src.length() == 0) return -1.0
      val cap = math.min(src.length(), 256L * 1024 * 1024)
      val buf = new Array[Byte](8 * 1024 * 1024)
      val in = new java.io.FileInputStream(src)
      val t0 = System.nanoTime()
      var read = 0L
      try {
        var n = in.read(buf)
        while (n > 0 && read < cap) { read += n; n = in.read(buf) }
      } finally in.close()
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec <= 0 || read == 0) -1.0 else read / 1e6 / sec
    }
    val ioPrime = ioProbeMbps() // first read may pay the disk: prime
    val ioPre = ioProbeMbps()
    val calibPre = spinSec()
    val stPre = spinN(QuarterIters)
    val calibMtPre = spinMtSec()

    val ml = graft.ops.MetricsListener.attach(spark)
    def drainedSnapshot(): Seq[ml.QueryMetrics] = {
      var prev = -1
      var cur = ml.snapshot.size
      val deadline = System.currentTimeMillis() + 5000
      while (cur != prev && System.currentTimeMillis() < deadline) {
        prev = cur; Thread.sleep(100); cur = ml.snapshot.size
      }
      ml.snapshot
    }
    val shuffleBytes = scala.collection.mutable.LinkedHashMap[String, Long]()
    val calibPerQuery = scala.collection.mutable.LinkedHashMap[String, Double]()

    def runPass(): Seq[(String, Double)] = SparkEntry.benchQueries.map { name =>
      // one untimed pass at the TARGET dir first: the sf0.001 warmup
      // covers JIT/codegen but not the target-scale page cache, AQE
      // stats, or build-once index materialization — without this the
      // first timed run absorbs all of them and run-to-run agreement
      // degrades past the ±20% the driver gates on
      try { queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        // loud but not fatal — Throwable, like the timed runs: a
        // target-scale OOM here must degrade THIS query to -1 below,
        // not abort main before any JSON is emitted (the driver would
        // lose the whole round's measurement to one bad query)
        System.err.println(s"[bench] target warm $name: $e")
      }
      spark.catalog.clearCache()
      drainedSnapshot(); ml.clear() // timed runs only in the slice
      // ambient probe for THIS entry, taken right before its timed runs
      calibPerQuery(name) = spinN(QuarterIters)
      // min of 5 runs: on shared hardware single runs vary +-25%
      // from scheduler noise (observed run-to-run on the heavier
      // joins), and even min-of-3 left sub-second queries swinging
      // past the ±20% run-to-run agreement the driver gates on; the
      // min measures the plan. A FAILING query reports -1, never a
      // near-zero "fast success". SPARK_GRAFT_BENCH_RUNS overrides
      // for scale sweeps (sf10 ratio runs don't need min-of-5
      // precision; they need the decade covered in bounded wall).
      val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name: $e"); false
          }
        val t = (System.nanoTime() - t0) / 1e9
        // queries persist internal frames (LSH signatures, star
        // fan-out); clear between measurements so runs are independent
        spark.catalog.clearCache()
        (ok, t)
      }
      val dt = if (runs.forall(_._1)) runs.map(_._2).min else -1.0
      // avg shuffle bytes per timed run (a query may fire several
      // actions internally — persists, exports — all of them ARE the
      // query's cost, so sum the slice and divide by runs)
      shuffleBytes(name) =
        drainedSnapshot().map(_.shuffleBytesWritten).sum / runs.size
      name -> dt
    }

    // contention-aware measurement: if the multicore probes bracketing
    // a pass read over ContendedRatio× the in-window single-thread
    // quarter, co-tenant load was binding during that pass — rerun the
    // whole timed loop once (per-query MIN across passes: a query's
    // number is credible if EITHER window was clean) and stamp the
    // final line with "contended" so a number measured entirely under
    // ambient load can never silently become the round artifact (this
    // exact failure cost adjudication effort in r7 AND r8).
    var results = runPass()
    var stPost = spinN(QuarterIters)
    var calibMtPost = spinMtSec()
    var mtPreUsed = calibMtPre; var stPreUsed = stPre
    var contended = isContended(calibMtPre, stPre) ||
      isContended(calibMtPost, stPost)
    var reruns = 0
    val maxReruns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUNS", "1").toInt
    while (contended && reruns < maxReruns) {
      System.err.println(
        f"[bench] CONTENDED window (mt_pre ${mtPreUsed}%.3f st ${stPreUsed}%.3f " +
          f"mt_post ${calibMtPost}%.3f st ${stPost}%.3f, ratio gate " +
          f"$ContendedRatio) — rerunning timed loop")
      reruns += 1
      stPreUsed = spinN(QuarterIters)
      mtPreUsed = spinMtSec()
      results = mergePasses(results, runPass())
      stPost = spinN(QuarterIters)
      calibMtPost = spinMtSec()
      contended = isContended(mtPreUsed, stPreUsed) ||
        isContended(calibMtPost, stPost)
    }

    val sj = shuffleBytes.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    System.err.println(s"[bench] shuffle bytes/run: $sj")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_METRICS", "bench_metrics.json")),
      (s"""{"shuffle_bytes_per_run":$sj}""" + "\n").getBytes("UTF-8"))
    val calibPost = spinSec()
    // COMPACT final line: the driver captures only the last ~2000
    // chars of combined output and parses the metric JSON out of that
    // window. Round 7 learned this the hard way — inlining 35
    // per-query calib probes grew the line past the window and the
    // driver recorded "parsed": null. So: per-query seconds at 4
    // decimals (0.1 ms granularity — an order below this VM's
    // run-to-run noise), calib pre/post at 3, and ALL diagnostics
    // (per-query quarter probes, shuffle bytes) on a PRECEDING detail
    // line + the bench_metrics.json sidecar, never on the final line.
    def d4(v: Double): String = f"$v%.4f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + d4(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // per-query quarter-length probes (~0.125 s unloaded reference;
    // full-length pre/post stay at ~0.5 s): a dirty entry shows as its
    // probe spiking while the others sit at baseline
    val cq = calibPerQuery.map { case (k, v) => "\"" + k + f"""\":$v%.4f""" }
      .mkString("{", ",", "}")
    val detail = s"""{"metric":"bench_detail","per_query_quarter_calib_sec":$cq,"shuffle_bytes_per_run":$sj}"""
    println(detail)
    // mt_pre/mt_post bracket the FINAL measurement window (the rerun's
    // probes when one happened); st_pre/st_post are the same-moment
    // single-thread quarters the contention rule divides by; mt_threads
    // makes the reading interpretable on any core count
    val ioPost = ioProbeMbps()
    val calib = f"""{"pre":$calibPre%.3f,"post":$calibPost%.3f,""" +
      f""""mt_pre":$mtPreUsed%.3f,"mt_post":$calibMtPost%.3f,""" +
      f""""st_pre":$stPreUsed%.3f,"st_post":$stPost%.3f,""" +
      f""""io_prime_mbps":$ioPrime%.0f,"io_pre_mbps":$ioPre%.0f,""" +
      f""""io_post_mbps":$ioPost%.0f,""" +
      s""""mt_threads":$mtThreads}"""
    val json = s"""{"metric":"total","value":${d4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","contended":$contended,"reruns":$reruns,"calib_sec":$calib}"""
    if (json.length > 1800) System.err.println(
      s"[bench] WARNING final metric line is ${json.length} chars — " +
        "approaching the driver's 2000-char tail window")
    // stdout for the driver (LAST line, nothing after it), plus a file
    // copy so a log-drowned stdout can't lose the measurement
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"))
    java.nio.file.Files.write(
      out, (detail + "\n" + json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
