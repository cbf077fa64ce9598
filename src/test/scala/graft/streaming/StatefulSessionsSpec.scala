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

    // reference: same fold applied per user in one batch; only sessions
    // CLOSED by a later event are emitted (trailing open sessions stay
    // in state at end-of-availability — documented streaming semantics)
    val expected = events.groupBy(_.user_id).flatMap { case (u, es) =>
      foldEvents(es, None)._1.map(s => (u, s.n, s.total, s.firstId))
    }.toSet
    assert(streamed === expected)
    assert(streamed.contains((7L, 2L, 5.0, 1L)))
    assert(streamed.contains((8L, 1L, 1.0, 4L)))
  }
}
