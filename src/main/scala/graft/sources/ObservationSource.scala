package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's observation source
  * (SURVEY.md §2 O-4: per-station REST fan-out,
  * dags/utils/api.py:10-35).
  *
  * The reference fetches stations SERIALLY on one machine — its
  * scalability ceiling. Here each station is an `InputPartition`, so
  * the fetch fans out across executors. Two fetch modes:
  *
  *   - default: deterministic fixture observations (seeded per
  *     station/tick) with the OWM response shape — egress-free testing;
  *   - `endpoint` option set: a real HTTP GET per (station, tick)
  *     inside the partition reader ([[HttpObservations]]), with
  *     deterministic API-key rotation via the `apiKeys` option
  *     (reference: dags/utils/api.py:11-26).
  *
  * Either way the Spark-side plumbing (provider, table, scan builder
  * with COLUMN PRUNING pushdown, partitioning, reader lifecycle) is
  * identical.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.ObservationSource")
  *     .option("stations", 4).option("ticks", 24)
  *     .option("endpoint", "http://host/data/2.5/weather")  // optional
  *     .option("apiKeys", "k1,k2")                          // optional
  *     .load()
  * }}}
  */
class ObservationSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ObservationSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 hands getTable the ORIGINAL-case map; option keys are
    // case-insensitive by contract (inferSchema already receives a
    // CaseInsensitiveStringMap), so wrap — otherwise a mis-cased
    // .option("Endpoint", ...) silently fell back to fixture mode
    val opts = new CaseInsensitiveStringMap(properties)
    new ObservationTable(
      Option(opts.get("stations")).map(_.toInt).getOrElse(4),
      Option(opts.get("ticks")).map(_.toInt).getOrElse(1),
      Option(opts.get("endpoint")),
      Option(opts.get("apiKeys"))
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil),
      Option(opts.get("maxTicksPerBatch")).map(_.toInt))
  }
}

object ObservationSource {
  /** The 15-field in-flight observation record (dags/utils/api.py:30-34). */
  val schema: StructType = StructType(Seq(
    StructField("station_id", LongType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("temp", DoubleType, nullable = false),
    StructField("feels_like", DoubleType, nullable = false),
    StructField("temp_min", DoubleType, nullable = false),
    StructField("temp_max", DoubleType, nullable = false),
    StructField("pressure", LongType, nullable = false),
    StructField("humidity", LongType, nullable = false),
    StructField("visibility", LongType, nullable = false),
    StructField("wind_speed", DoubleType, nullable = false),
    StructField("wind_direction", DoubleType, nullable = false),
    StructField("cloudiness", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("sunrise_ts", LongType, nullable = false),
    StructField("sunset_ts", LongType, nullable = false)))

  /** Deterministic fixture "fetch" for (station, tick) — the stand-in
    * for the HTTP GET + JSON pluck. */
  def fetch(station: Long, tick: Long): Array[Any] = {
    val seed = station * 100003L + tick * 7919L
    def f(i: Int): Double = (((seed * (i + 3) * 2654435761L) >>> 16) % 4000L) / 100.0 - 20.0
    def n(i: Int, m: Long): Long = ((seed * (i + 11) * 0x9E3779B97F4A7C15L) >>> 17) % m
    val base = 1700000000L + tick * 300L
    Array[Any](
      station, UTF8String.fromString(s"city_$station"),
      f(1), f(2), f(1) - 1.5, f(1) + 2.0,
      980L + n(3, 60), n(4, 101), n(5, 10001),
      math.abs(f(6)) / 2, n(7, 360).toDouble, n(8, 101),
      base, base - 20000L - n(9, 10000), base + 20000L + n(10, 10000))
  }
}

class ObservationTable(stations: Int, ticks: Int,
    endpoint: Option[String], apiKeys: Seq[String],
    maxTicksPerBatch: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String = s"observations(stations=$stations, ticks=$ticks)"
  override def schema(): StructType = ObservationSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ObservationScanBuilder(stations, ticks, endpoint, apiKeys, maxTicksPerBatch)
}

/** Streaming offset = number of ticks already ingested. */
case class TickOffset(tick: Long) extends Offset {
  override def json(): String = tick.toString
}

/** Supports column-pruning pushdown: Catalyst hands us the required
  * schema and the reader materializes only those fields. */
class ObservationScanBuilder(stations: Int, ticks: Int,
    endpoint: Option[String], apiKeys: Seq[String],
    maxTicksPerBatch: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ObservationSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"observation-source(pruned=${required.fieldNames.mkString(",")})"

    // one partition per station — the fan-out the reference lacks
    override def planInputPartitions(): Array[InputPartition] =
      Array.tabulate(stations)(s => StationPartition(s.toLong, 0, ticks))

    override def createReaderFactory(): PartitionReaderFactory =
      new ObservationReaderFactory(required, endpoint, apiKeys)

    /** Streaming form of the same scan: the reference's 5-minute cron
      * poll as a true MicroBatchStream — each micro-batch covers the
      * tick range (start, latest], fanned out one partition per
      * station. Offsets are plain tick counts, so a restart resumes
      * from the checkpoint exactly (the fixture/HTTP fetch is
      * deterministic per (station, tick)). With `maxTicksPerBatch`
      * set, admission control caps each micro-batch — the rate-limit /
      * backpressure half of a production source (a burst of backlog
      * replays as several bounded batches instead of one giant one). */
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new MicroBatchStream with SupportsAdmissionControl {
        override def initialOffset(): Offset = TickOffset(0L)
        // bounded fixture: all ticks are available immediately; a live
        // deployment would return the wall-clock tick here
        override def latestOffset(): Offset = TickOffset(ticks.toLong)
        override def deserializeOffset(json: String): Offset =
          TickOffset(json.toLong)
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()

        // advertised in ROWS (the engine's unit): each admitted tick
        // yields one row per station
        override def getDefaultReadLimit: ReadLimit =
          maxTicksPerBatch.map(m => ReadLimit.maxRows(m.toLong * stations))
            .getOrElse(ReadLimit.allAvailable())

        /** Row limit → tick cap (ceil: a partial tick admits whole —
          * offsets are tick-granular so we can't split one). */
        private def tickCap(limit: ReadLimit): Option[Long] = limit match {
          case r: ReadMaxRows =>
            Some(math.max(1L, (r.maxRows() + stations - 1) / stations))
          case c: CompositeReadLimit =>
            c.getReadLimits.toSeq.flatMap(tickCap(_))
              .reduceOption((a, b) => math.min(a, b))
          case _ => None
        }

        // honor the ReadLimit the ENGINE passes (it may compose or
        // override our default), not just our own option
        override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
          val from = start.asInstanceOf[TickOffset].tick
          val cap = tickCap(limit).map(m => math.min(ticks.toLong, from + m))
            .getOrElse(ticks.toLong)
          TickOffset(cap)
        }

        override def reportLatestOffset(): Offset = TickOffset(ticks.toLong)

        override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
          val from = start.asInstanceOf[TickOffset].tick.toInt
          val until = end.asInstanceOf[TickOffset].tick.toInt
          Array.tabulate(stations)(s => StationPartition(s.toLong, from, until))
        }

        override def createReaderFactory(): PartitionReaderFactory =
          new ObservationReaderFactory(required, endpoint, apiKeys)
      }
  }
}

case class StationPartition(station: Long, fromTick: Int, untilTick: Int)
    extends InputPartition

class ObservationReaderFactory(required: StructType,
    endpoint: Option[String], apiKeys: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StationPartition]
    // map required fields to their position in the full record
    val idx = required.fieldNames.map(ObservationSource.schema.fieldIndex)
    val fetch: (Long, Long) => Array[Any] = endpoint match {
      case Some(url) => HttpObservations.fetch(url, apiKeys, _, _)
      case None => ObservationSource.fetch
    }
    new PartitionReader[InternalRow] {
      private var tick = p.fromTick - 1
      override def next(): Boolean = { tick += 1; tick < p.untilTick }
      override def get(): InternalRow = {
        val full = fetch(p.station, tick.toLong)
        InternalRow.fromSeq(idx.toIndexedSeq.map(full))
      }
      override def close(): Unit = ()
    }
  }
}
