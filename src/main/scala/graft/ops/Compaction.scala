package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the operational counterpart of the
  * micro-batch sinks (O-24/O-25): a 5-minute batch cadence writes
  * hundreds of small files per day per table, and at 100 TB the
  * resulting file-listing and per-file open costs dominate scan time.
  * Compaction rewrites a directory into ~`targetBytes` files.
  *
  * Scale posture: the rewrite is one job with NO shuffle — `coalesce`
  * only merges input splits (it narrows the partitioning; it never
  * redistributes rows), so compaction cost is a single read+write pass.
  * The swap is atomic at the directory level: write to a temp sibling,
  * then rename over the target (rename is atomic per direntry on
  * HDFS-like filesystems; object stores would gate on a manifest the
  * way [[graft.pipeline.StarSink]] does).
  */
object Compaction {

  /** Number of bytes in `dir` (sum of data file sizes, recursive). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Data files (non-underscore) under `dir`, recursive. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0
    while (it.hasNext) {
      if (!it.next().getPath.getName.startsWith("_")) n += 1
    }
    n
  }

  /** Rewrite the parquet directory `dir` into ceil(bytes/targetBytes)
    * files (>=1). Returns the resulting file count. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = dataBytes(spark, dir)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = s"$dir-__compacting"
    spark.read.parquet(dir)
      .coalesce(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp)

    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new Path(s"$dir-__precompact")
    fs.delete(backup, true)
    if (!fs.rename(target, backup))
      throw new java.io.IOException(s"compaction: cannot move $dir aside")
    if (!fs.rename(new Path(tmp), target)) {
      fs.rename(backup, target) // roll back; original data untouched
      throw new java.io.IOException(s"compaction: cannot swap $tmp into place")
    }
    fs.delete(backup, true)
    dataFileCount(spark, dir)
  }
}
