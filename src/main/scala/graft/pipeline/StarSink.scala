package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Warehouse sink for the star fan-out (SURVEY.md §2 O-24, §3.3).
  *
  * The reference commits the 5 rows of one observation in one MySQL
  * transaction (dags/utils/database.py:25-34). A distributed file sink
  * can't get cross-table atomicity, so this preserves the useful
  * invariant instead (SURVEY.md §3.3 choice (a)+(c)):
  *   - each table write is atomic (Spark's parquet commit protocol);
  *   - dimensions commit BEFORE the fact table, so a fact row can never
  *     reference a dimension row that doesn't exist (the dangling-FK
  *     window is benign: dim rows without a fact row yet);
  *   - a batch manifest is written last, marking the batch complete —
  *     readers that require full consistency gate on it.
  *
  * Scale posture: the keyed frame is scanned five times as narrow
  * projections — no shuffle anywhere (the fact's partition column is
  * projected straight off the keyed frame, never joined back). With
  * deterministic keys the frame is memory/disk-cached; with uuid keys
  * it is STAGED TO DURABLE STORAGE first — a cached partition lost
  * with its executor would be recomputed with fresh uuids, silently
  * breaking key agreement between tables written moments apart, so a
  * cache is not a sufficient barrier for nondeterministic keys.
  */
object StarSink {

  /** Write all five tables under `baseDir`; returns per-table row
    * counts (from the materialized frame — no extra scan of the
    * source). */
  def write(enriched: DataFrame, baseDir: String,
      deterministicKeys: Boolean = true): Map[String, Long] = {
    val spark = enriched.sparkSession
    val keyed = StarSchema.withKeys(enriched, deterministicKeys)
    val staging = s"$baseDir/_keyed_staging"
    val (cached, cleanup) =
      if (deterministicKeys) {
        val c = keyed.persist(StorageLevel.MEMORY_AND_DISK)
        (c, () => { c.unpersist(); () })
      } else {
        // durable barrier for nondeterministic keys (see class doc)
        keyed.write.mode(SaveMode.Overwrite).parquet(staging)
        (spark.read.parquet(staging), () => deleteRecursively(staging))
      }
    try {
      val star = StarSchema.splitKeyed(cached)
      val n = cached.count() // materializes the cache before the 5 scans

      // dims first (any order), fact LAST — see class doc
      star.timeDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/time_dim")
      star.paramDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/param_dim")
      star.tempDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/temp_dim")
      star.heatIndexDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/heat_index_dim")
      // the fact's partition column comes straight off the keyed frame
      // (recorded_date_local IS timeDim's record_date by construction)
      // — joining timeDim back would shuffle the full dataset twice
      // just to recover a column its own input already had
      cached.select(
          (star.fact.columns.map(col) :+
            col("recorded_date_local").as("record_date")): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("record_date")
        .parquet(s"$baseDir/fact")

      // manifest last: the batch is complete iff this file exists
      Files.write(Paths.get(s"$baseDir/_BATCH_COMPLETE"),
        s"""{"rows":$n,"tables":5}""".getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Map("fact" -> n, "time_dim" -> n, "param_dim" -> n,
        "temp_dim" -> n, "heat_index_dim" -> n)
    } finally cleanup()
  }

  private def deleteRecursively(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(dir))
  }
}
