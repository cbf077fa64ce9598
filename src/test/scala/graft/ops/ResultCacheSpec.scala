package graft.ops

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ResultCache: content-addressed serve/recompute behavior — hit on
  * unchanged inputs, miss (and only then recompute) on a content
  * change, content-not-mtime addressing, crash-safe republish.
  */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) =
    (Files.createTempDirectory("rc_in").toString,
      Files.createTempDirectory("rc_cache").toString)

  private var computeRuns = 0

  private def inputsOf(inDir: String) = {
    val df = spark.read.parquet(inDir)
    Seq(("events", df, Seq(col("id"), col("v"))))
  }

  private def serveSum(inDir: String, cacheDir: String) = {
    val df = spark.read.parquet(inDir)
    ResultCache.serve(spark, cacheDir, inputsOf(inDir)) {
      computeRuns += 1
      df.agg(sum("v").as("total"), count(lit(1)).as("n"))
    }
  }

  test("hit on unchanged inputs, miss + fresh result on content change") {
    val (in, cache) = freshDirs()
    (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
      .write.mode("overwrite").parquet(in)
    computeRuns = 0

    val (r1, hit1) = serveSum(in, cache)
    assert(!hit1 && computeRuns === 1)
    assert(r1.head().getLong(0) === 10100L)

    // unchanged input: served from cache, compute NOT re-run
    val (r2, hit2) = serveSum(in, cache)
    assert(hit2 && computeRuns === 1)
    assert(r2.head().getLong(0) === 10100L)

    // append a row: fingerprint moves, cache must miss and recompute
    Seq((101L, 1000L)).toDF("id", "v")
      .write.mode("append").parquet(in)
    val (r3, hit3) = serveSum(in, cache)
    assert(!hit3 && computeRuns === 2)
    assert(r3.head().getLong(0) === 11100L)

    // superseded token pruned: exactly one data=* dir remains
    val dirs = new File(cache).listFiles().filter(_.getName.startsWith("data="))
    assert(dirs.length === 1)
  }

  test("content-addressed: a byte-identical rewrite keeps the cache") {
    val (in, cache) = freshDirs()
    val rows = (1L to 50L).map(i => (i, i))
    rows.toDF("id", "v").write.mode("overwrite").parquet(in)
    computeRuns = 0
    assert(!serveSum(in, cache)._2 && computeRuns === 1)

    // rewrite the SAME content (new files, new mtimes, maybe new
    // layout) — an mtime-based cache would invalidate; ours must not
    rows.toDF("id", "v").repartition(3).write.mode("overwrite").parquet(in)
    assert(serveSum(in, cache)._2 && computeRuns === 1)
  }

  test("token binds content to input NAME: swapping two inputs' contents " +
    "changes the token") {
    // regression: a commutative XOR combine is invariant under
    // exchanging the contents of two inputs — the fold must not be
    val dfA = (1L to 10L).map(i => (i, i)).toDF("id", "v")
    val dfB = (1L to 10L).map(i => (i, i * 7)).toDF("id", "v")
    val cols = Seq(col("id"), col("v"))
    val t1 = ResultCache.token(Seq(("a", dfA, cols), ("b", dfB, cols)))
    val t2 = ResultCache.token(Seq(("a", dfB, cols), ("b", dfA, cols)))
    assert(t1 !== t2, "content swap must move the token")
    // and renaming an input changes it too
    val t3 = ResultCache.token(Seq(("a2", dfA, cols), ("b", dfB, cols)))
    assert(t1 !== t3)
    // while a pure re-layout of the same content does not
    val t4 = ResultCache.token(
      Seq(("a", dfA.repartition(3), cols), ("b", dfB, cols)))
    assert(t1 === t4)
  }

  test("a crashed publish (no _SUCCESS) is overwritten by the retry") {
    val (in, cache) = freshDirs()
    (1L to 10L).map(i => (i, i)).toDF("id", "v")
      .write.mode("overwrite").parquet(in)
    // simulate the crash: a token dir with debris but no committed data
    val t = ResultCache.token(inputsOf(in))
    val dead = new File(cache, s"data=$t")
    dead.mkdirs()
    Files.writeString(new File(dead, "part-crashed.tmp").toPath, "junk")

    computeRuns = 0
    val (r, hit) = serveSum(in, cache)
    assert(!hit && computeRuns === 1, "debris dir must not serve")
    assert(r.head().getLong(0) === 55L)
    // and the retry's publish is now committed: next serve hits
    assert(serveSum(in, cache)._2 && computeRuns === 1)
  }
}
