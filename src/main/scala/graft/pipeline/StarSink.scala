package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
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
  * Scale posture: the enriched frame is persisted once and scanned five
  * times (five narrow projections — no shuffle); the fact table is
  * partitioned by record_date for partition pruning of time-range
  * queries.
  */
object StarSink {

  /** Write all five tables under `baseDir`; returns per-table row
    * counts (from the persisted frame — no extra scan of the source).
    */
  def write(enriched: DataFrame, baseDir: String,
      deterministicKeys: Boolean = true): Map[String, Long] = {
    // persist WITH the keys: the five table scans then read cached
    // columns instead of recomputing sha2 keys per branch (and in
    // uuid mode a materialized cache is what makes fact/dim keys agree)
    val cached = StarSchema.withKeys(enriched, deterministicKeys)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val star = StarSchema.splitKeyed(cached)
      val n = cached.count() // materializes the cache before the 5 scans

      // dims first (any order), fact LAST — see class doc
      star.timeDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/time_dim")
      star.paramDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/param_dim")
      star.tempDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/temp_dim")
      star.heatIndexDim.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/heat_index_dim")
      star.fact
        .join(star.timeDim.select("time_id", "record_date"), "time_id")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("record_date")
        .parquet(s"$baseDir/fact")

      // manifest last: the batch is complete iff this file exists
      Files.write(Paths.get(s"$baseDir/_BATCH_COMPLETE"),
        s"""{"rows":$n,"tables":5}""".getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Map("fact" -> n, "time_dim" -> n, "param_dim" -> n,
        "temp_dim" -> n, "heat_index_dim" -> n)
    } finally cached.unpersist()
  }
}
