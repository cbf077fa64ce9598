package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.1
  * streaming): per-user sessionization with an inactivity gap, emitting
  * a session record when the gap closes it. This is the state shape the
  * built-in `session_window` cannot express when the session output
  * needs custom fields (first/last event ids, value sums) or custom
  * close conditions.
  *
  * Scale: state is per-user (keyed), stored in the state store —
  * partitioned by key across executors, O(active users) memory,
  * event-time timeout eviction. No global state, no driver state.
  */
object StatefulSessions {

  case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: Timestamp)

  case class SessionState(start: Long, end: Long, n: Long, total: Double,
      firstId: Long, lastId: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double,
      first_event_id: Long, last_event_id: Long)

  final val GapMs = 30L * 60 * 1000

  /** Fold a sorted batch of events into closed sessions + trailing open
    * state. Shared by the streaming updater and the batch reference
    * implementation (so the spec can check them against each other). */
  def foldEvents(events: Seq[Event], open: Option[SessionState]): (Seq[SessionState], Option[SessionState]) = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    var closed = List.empty[SessionState]
    var cur = open
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.end < GapMs =>
          cur = Some(s.copy(end = t, n = s.n + 1, total = s.total + e.value, lastId = e.event_id))
        case Some(s) =>
          closed ::= s
          cur = Some(SessionState(t, t, 1, e.value, e.event_id, e.event_id))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value, e.event_id, e.event_id))
      }
    }
    (closed.reverse, cur)
  }

  private def toOut(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end),
      s.n, s.total, s.firstId, s.lastId)

  /** The flatMapGroupsWithState updater: emits sessions closed by this
    * batch (or by event-time timeout). */
  def update(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val batch = events.toSeq
    if (batch.isEmpty && state.hasTimedOut) {
      val out = state.getOption.map(toOut(userId, _)).iterator
      state.remove()
      return out
    }
    val (closed, open) = foldEvents(batch, state.getOption)
    // a timeout must be registered for EVERY open session — including
    // during the first micro-batch, when the watermark is still 0: a
    // key whose last event is in batch 1 is otherwise never revisited
    // (no data, no timeout), so its trailing session would never emit
    // and its state would leak forever. The one illegal case is a
    // timeout at or before the current watermark (all-late batch):
    // that session is already expired in event time — close it now.
    val expiredNow = open.filter(s =>
      state.getCurrentWatermarkMs() >= s.end + GapMs)
    open match {
      case Some(s) if expiredNow.isEmpty =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + GapMs)
      case _ => state.remove()
    }
    (closed ++ expiredNow).iterator.map(toOut(userId, _))
  }

  /** Wire the updater onto a (streaming or batch) typed event Dataset. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Streaming run over a parquet directory, AvailableNow, memory sink.
    * The watermark closes every session once the source is exhausted
    * only via timeout at end-of-stream; for a deterministic "all
    * sessions" answer the spec compares against [[foldEvents]]. */
  def run(spark: SparkSession, sourceDir: String, queryName: String) = {
    import spark.implicits._
    val schema = spark.read.parquet(sourceDir).schema
    val events = spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", "0 seconds")
      .selectExpr("event_id", "user_id", "event_type", "value", "ts")
      .as[Event]
    sessionize(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
