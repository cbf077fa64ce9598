package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (the sink half of the custom-source story;
  * [[ObservationSource]] is the read half): a text sink with the full
  * executor-write / driver-commit contract that makes a distributed
  * sink atomic —
  *
  *   1. every task writes its partition to a STAGING file and returns
  *      the file name + row count as its `WriterCommitMessage`;
  *   2. only the driver's `commit(messages)` publishes: staged files
  *      are atomically renamed into the target directory and a
  *      `_SUCCESS` manifest (total rows, file count) is written LAST —
  *      the same readers-gate-on-manifest invariant as
  *      [[graft.pipeline.StarSink]];
  *   3. `abort()` deletes the staging directory — a failed or
  *      speculatively-duplicated task can never leave partial output
  *      in the target.
  *
  * FILESYSTEM ASSUMPTION: writers stage and the driver commits through
  * `java.nio` paths, so `path` must resolve to the SAME filesystem on
  * driver and executors — local mode (this project's deployment) or a
  * shared POSIX mount (NFS). On HDFS/S3 the commit protocol stands but
  * the file ops must go through Hadoop `FileSystem` (and S3 renames
  * are copies, so publish via manifest-listed staging paths instead of
  * moves — the [[graft.pipeline.StarSink]] manifest pattern).
  *
  * Staging residue: a speculative task attempt that is still running
  * when the driver commits can lazily recreate `_staging_<queryId>`
  * after commit() deleted it (its own abort removes the file but
  * leaves the directory). Staging dirs are therefore query-tagged,
  * readers never match `_staging_*`, and the next write to the same
  * target cleans any stale staging dirs before launching tasks.
  *
  * Usage: `df.write.format("graft.sources.AtomicSink")
  *   .option("path", dir).mode("append").save()`
  */
class AtomicSink extends TableProvider {
  // the write schema is the DataFrame's own — tell Spark to pass it
  // through to getTable instead of asking the source to infer one
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema comes from the DataFrame

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AtomicSinkTable(schema, properties.get("path"))
}

class AtomicSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "AtomicSink requires a path option")
  override def name(): String = s"atomic-sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AtomicBatchWrite(path, info.queryId(), info.schema())
      }
    }
}

/** Driver-side coordinator: factory for task writers + the commit. */
class AtomicBatchWrite(path: String, queryId: String, schema: StructType)
    extends BatchWrite {
  private val staging = s"$path/_staging_$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task launches: sweep staging dirs left by
    // PREVIOUS queries (a late speculative attempt can recreate its
    // staging dir after that query's commit deleted it — see class
    // doc). Age-gated: a fresh staging dir may belong to a CONCURRENT
    // in-flight write to the same path, whose staged data must not be
    // destroyed; only dirs idle past the threshold are stale.
    val staleMs = 60L * 60 * 1000
    val now = System.currentTimeMillis()
    Option(new File(path).listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("_staging_") &&
          f.getName != s"_staging_$queryId" &&
          now - f.lastModified() > staleMs)
        deleteRecursively(f)
    })
    new AtomicWriterFactory(staging, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.map(_.asInstanceOf[AtomicCommit])
    Files.createDirectories(Paths.get(path))
    // atomic per-file publish: rename out of staging
    parts.foreach { p =>
      Files.move(Paths.get(s"$staging/${p.file}"), Paths.get(s"$path/${p.file}"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val total = parts.map(_.rows).sum
    Files.write(Paths.get(s"$path/_SUCCESS"),
      s"""{"rows":$total,"files":${parts.length}}""".getBytes("UTF-8"))
    deleteRecursively(new File(staging))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteRecursively(new File(staging))

  private def deleteRecursively(f: File): Unit =
    graft.ops.Fs.deleteRecursively(f)
}

case class AtomicCommit(file: String, rows: Long) extends WriterCommitMessage

class AtomicWriterFactory(staging: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AtomicDataWriter(staging, schema, partitionId, taskId)
}

/** Task-side writer: one staged tab-separated file per (partition,
  * task attempt) — attempt-unique names mean a speculative duplicate
  * can stage safely; only the attempt whose message reaches commit()
  * gets published. */
class AtomicDataWriter(staging: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val fileName = f"part-$partitionId%05d-$taskId"
  private var rows = 0L
  private lazy val out = {
    Files.createDirectories(Paths.get(staging))
    Files.newBufferedWriter(Paths.get(s"$staging/$fileName"))
  }

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "" else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => row.getUTF8String(i).toString
        case other => throw new IllegalArgumentException(
          s"AtomicSink: unsupported type ${other.catalogString}")
      }
    }
    out.write(cells.mkString("\t"))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    AtomicCommit(fileName, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(Paths.get(s"$staging/$fileName"))
  }

  override def close(): Unit = ()
}
