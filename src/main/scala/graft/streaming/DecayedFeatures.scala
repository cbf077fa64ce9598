package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming maintenance of the exponential-decay feature (the batch
  * twin is `q_ema_decay`): per-user EMA state updated per micro-batch
  * via `mapGroupsWithState`.
  *
  * The recurrence s_i = α·x_i + (1−α)·s_{i−1} composes sequentially —
  * folding batch B starting from batch A's result equals folding A++B
  * — so as long as batches arrive in event-time order (the ingest
  * contract; a watermark-buffered reorder stage would enforce it for
  * out-of-order sources), the maintained state is BIT-IDENTICAL to the
  * batch query's ordered fold at every prefix. DecayedFeaturesSpec
  * replays sf-data in ts-ordered batches and asserts exactly that
  * against `q_ema_decay`'s output, including after a kill/restart.
  *
  * Scale shape: state is one (count, ema) pair per user in the keyed
  * state store — partitioned across executors, O(active users) memory,
  * no driver state, no re-reading history (that is the whole point of
  * an incrementally-maintained feature at 100 TB: the alternative
  * recomputes a full-corpus ordered fold every refresh).
  */
object DecayedFeatures {

  /** α = 1/8 — dyadic, mirrored by `q_ema_decay`'s 0.125D literals. */
  final val Alpha = 0.125
  final val Beta = 0.875

  case class Event(event_id: Long, user_id: Long, value: Double,
      ts: Timestamp)

  case class EmaState(n: Long, ema: Double)

  case class EmaOut(user_id: Long, n_events: Long, ema: Double)

  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Fold one batch of events into the carried state. Within the batch
    * events sort by (ts, event_id) — the same total order as the batch
    * query — so the composed fold replays the global ordered fold. */
  def foldBatch(events: Seq[Event], prior: Option[EmaState]): EmaState = {
    val xs = events.sortBy(e => (micros(e.ts), e.event_id)).map(_.value)
    val (seed, rest, n0) = prior match {
      case Some(s) => (s.ema, xs, s.n)
      case None => (xs.head, xs.tail, 1L)
    }
    EmaState(n0 + rest.length,
      rest.foldLeft(seed)((acc, x) => acc * Beta + x * Alpha))
  }

  /** mapGroupsWithState updater: one state read-modify-write per user
    * per batch, emitting the refreshed feature row. */
  def update(userId: Long, events: Iterator[Event],
      state: GroupState[EmaState]): EmaOut = {
    // NoTimeout ⇒ only keys WITH batch data are invoked, so the fold
    // always has at least one event or a prior state to seed from
    val next = foldBatch(events.toSeq, state.getOption)
    state.update(next)
    EmaOut(userId, next.n, next.ema)
  }

  /** Wire the updater onto a (streaming or batch) typed event Dataset. */
  def maintain(events: Dataset[Event]): Dataset[EmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming run over a parquet path/glob (file-stream source picks
    * up each batch file in arrival order), Update mode, foreachBatch
    * appending (user, n, ema, batch_id) rows to `outDir` — the
    * recovery-capable sink shape (the memory sink refuses checkpoint
    * recovery). The CURRENT feature value per user is its highest-n
    * row; a replayed batch re-appends identical rows, which that
    * max-n read collapses — replay-idempotent without a ledger. */
  def run(spark: SparkSession, sourcePath: String, checkpointDir: String,
      outDir: String) = {
    import spark.implicits._
    val schema = spark.read.parquet(sourcePath).schema
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one ingest file = one batch
      .parquet(sourcePath)
      .selectExpr("event_id", "user_id", "value", "ts")
      .as[Event]
    maintain(events)
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[EmaOut], batchId: Long) =>
        batch.toDF()
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
