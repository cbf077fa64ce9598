package graft.ops

import java.io.File

/** Shared local-FS helpers for the sinks and pipelines that manage
  * their own directories (staged commits, batch-keyed publishes,
  * store bootstraps). One implementation — the sinks previously each
  * carried a private copy of the recursive delete. */
object Fs {

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
