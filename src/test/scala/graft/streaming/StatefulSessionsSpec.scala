package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import StatefulSessions._

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, minute: Int, value: Double = 1.0) =
    Event(id, user, "click", value, Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"))

  test("foldEvents: gap >= 30min closes a session; totals accumulate") {
    val events = Seq(ev(1, 7, 0, 2.0), ev(2, 7, 10, 3.0), ev(3, 7, 50, 5.0))
    val (closed, open) = foldEvents(events, None)
    assert(closed.map(s => (s.n, s.total, s.firstId, s.lastId)) === Seq((2L, 5.0, 1L, 2L)))
    assert(open.map(s => (s.n, s.total, s.firstId, s.lastId)) === Some((1L, 5.0, 3L, 3L)))
  }

  test("foldEvents: exactly-at-gap boundary starts a new session") {
    val events = Seq(ev(1, 7, 0), ev(2, 7, 30)) // 30min = GapMs => new session
    val (closed, open) = foldEvents(events, None)
    assert(closed.length === 1 && open.isDefined)
  }

  test("foldEvents: continues an open session from prior state") {
    val (closed0, open0) = foldEvents(Seq(ev(1, 7, 0)), None)
    assert(closed0.isEmpty)
    val (closed1, open1) = foldEvents(Seq(ev(2, 7, 10)), open0)
    assert(closed1.isEmpty)
    assert(open1.map(_.n) === Some(2L))
  }

  test("first micro-batch (watermark 0) still registers an event-time timeout") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // regression: the old `watermark > 0` gate skipped the timeout in
    // batch 1, so a key seen only there never emitted its trailing
    // session and its state leaked
    val state = TestGroupState.create[StatefulSessions.SessionState](
      org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val out = StatefulSessions.update(7L,
      Iterator(ev(1, 7, 0, 2.0)), state).toSeq
    assert(out.isEmpty) // session still open...
    assert(state.getTimeoutTimestampMs.isPresent) // ...but timeout armed
    assert(state.getTimeoutTimestampMs.get ===
      ev(1, 7, 0, 2.0).ts.getTime + StatefulSessions.GapMs)
  }

  test("an all-late batch closes its session immediately (no past timeout)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // watermark far ahead of the session's close time: registering a
    // timeout in the past would throw — the session must emit now
    val wm = ev(1, 7, 0, 2.0).ts.getTime + StatefulSessions.GapMs + 1000
    val state = TestGroupState.create[StatefulSessions.SessionState](
      org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(wm), hasTimedOut = false)
    val out = StatefulSessions.update(7L,
      Iterator(ev(1, 7, 0, 2.0)), state).toSeq
    assert(out.map(_.n_events) === Seq(1L))
    assert(state.isRemoved)
  }

  test("flatMapGroupsWithState streaming run emits the fold's closed sessions") {
    val events = Seq(
      ev(1, 7, 0, 2.0), ev(2, 7, 10, 3.0), ev(3, 7, 50, 5.0),
      ev(4, 8, 0, 1.0), ev(5, 8, 90, 1.0))
    val dir = Files.createTempDirectory("stateful_sessions").toString
    events.toDF().write.mode("overwrite").parquet(dir)

    val q = StatefulSessions.run(spark, dir, "t_sessions")
    q.awaitTermination(120000)
    val streamed = spark.table("t_sessions")
      .as[SessionOut].collect()
      .map(s => (s.user_id, s.n_events, s.total_value, s.first_event_id))
      .toSet

    // reference: same fold applied per user in one batch. Sessions
    // closed by a later event AND trailing sessions whose event-time
    // timeout (end + gap) has passed the final watermark (= max event
    // ts) are emitted; a trailing session still inside its gap at
    // end-of-availability stays open in state.
    val maxTs = events.map(_.ts.getTime).max
    val expected = events.groupBy(_.user_id).flatMap { case (u, es) =>
      val (closed, open) = foldEvents(es, None)
      (closed ++ open.filter(_.end + StatefulSessions.GapMs <= maxTs))
        .map(s => (u, s.n, s.total, s.firstId))
    }.toSet
    assert(streamed === expected)
    assert(streamed.contains((7L, 2L, 5.0, 1L)))
    assert(streamed.contains((7L, 1L, 5.0, 3L))) // trailing, closed by timeout
    assert(streamed.contains((8L, 1L, 1.0, 4L)))
  }
}
