package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AtomicSinkSpec extends SparkSpec {
  import spark.implicits._

  test("tasks stage, driver commits: files + manifest land atomically") {
    val dir = Files.createTempDirectory("atomic_sink").toString + "/out"
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    df.repartition(4).write.format("graft.sources.AtomicSink")
      .option("path", dir).mode("append").save()

    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("part-")) === 4, files.toSeq)
    assert(files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith("_staging")), files.toSeq)

    val manifest = new String(Files.readAllBytes(Paths.get(s"$dir/_SUCCESS")))
    assert(manifest.contains("\"rows\":100"), manifest)

    // round-trip through the text format
    val back = spark.read.option("sep", "\t")
      .schema("id LONG, name STRING, score DOUBLE")
      .csv(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getPath): _*)
    assert(back.count() === 100)
    assert(back.agg(sum("id")).first().getLong(0) === 5050L)
  }

  test("stale staging dirs are swept; fresh (possibly in-flight) ones are kept") {
    val dir = Files.createTempDirectory("atomic_sweep").toString + "/out"
    // a late speculative attempt recreated its staging dir hours ago
    // (stale) vs a staging dir of a write that may still be in flight
    val stale = Paths.get(s"$dir/_staging_deadbeef")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-00001-9"), "leftover".getBytes("UTF-8"))
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3L * 60 * 60 * 1000))
    val fresh = Paths.get(s"$dir/_staging_cafe")
    Files.createDirectories(fresh)
    Files.write(fresh.resolve("part-00000-1"), "inflight".getBytes("UTF-8"))

    Seq((1L, "a", 1.0)).toDF("id", "name", "score")
      .write.format("graft.sources.AtomicSink")
      .option("path", dir).mode("append").save()

    val names = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(!names.contains("_staging_deadbeef"), names.toSeq) // stale swept
    assert(names.contains("_staging_cafe"), names.toSeq)      // in-flight kept
    assert(names.contains("_SUCCESS"))
  }

  test("failed job aborts: no partial output, no staging residue") {
    val dir = Files.createTempDirectory("atomic_abort").toString + "/out"
    val poison = udf((i: Long) => {
      if (i == 50L) throw new RuntimeException("poisoned row")
      i
    })
    val df = (1 to 100).map(_.toLong).toDF("id")
      .withColumn("id", poison(col("id")))
    intercept[Exception] {
      df.repartition(4).write.format("graft.sources.AtomicSink")
        .option("path", dir).mode("append").save()
    }
    val residue = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.getName).toSeq).getOrElse(Nil)
    assert(!residue.contains("_SUCCESS"), residue)
    assert(residue.count(_.startsWith("part-")) === 0, residue)
  }
}
