package graft.ops

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared local-FS helpers for the sinks and pipelines that manage
  * their own directories (staged commits, batch-keyed publishes,
  * store bootstraps). One implementation — the sinks previously each
  * carried a private copy of the recursive delete. */
object Fs {

  /** THE store-read convention (schema evolution contract for every
    * self-managed parquet store — CDC, quantile/histogram/CMS/HLL
    * sketch stores, roll-ups, delete ledgers, zone-map catalogs,
    * ingest ledgers):
    *
    *   - stores are append-only directories of immutable parquet
    *     partitions; SCHEMA EVOLUTION means adding nullable columns
    *     in new partitions, never renaming/retyping existing ones;
    *   - every reader goes through this helper, which merges the
    *     schemas of ALL partitions — a plain read samples one footer
    *     and would silently DROP a column present only in the other
    *     era's partitions (the VectorIngest mixed-era ledger bug,
    *     round 8: the replay guard read zero admitted docs and
    *     re-admitted duplicates);
    *   - a column missing in an old partition reads as NULL there;
    *     each store declares its null semantics at the call site
    *     (typically coalesce(col, bootstrap-default)).
    *
    * The merge is a footer-only operation (one small read per file —
    * store file counts are bounded by construction), not a data scan. */
  def readStore(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Does `dir` hold at least one COMMITTED parquet data file?
    * Skips hidden/metadata entries (`_temporary` staging, `_SUCCESS`,
    * dotfiles), recursing through partition directories.
    *
    * This is the "does the store exist" probe for bootstrap-vs-merge
    * dispatch: bare `dir.exists()` is wrong twice over — a partitioned
    * write of an EMPTY frame commits a directory with no data files,
    * and a crash mid-write leaves `_temporary` debris — and either
    * would wedge a reader (schema inference fails) on every retry if
    * treated as an existing store. */
  def hasCommittedParquet(dir: File): Boolean = {
    val children = Option(dir.listFiles()).getOrElse(Array.empty[File])
    children.exists { f =>
      val n = f.getName
      !n.startsWith("_") && !n.startsWith(".") &&
        (if (f.isDirectory) hasCommittedParquet(f) else n.endsWith(".parquet"))
    }
  }
}
