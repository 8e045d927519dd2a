package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

/** Specs for relational (window-function) sessionization. */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(3600_000L + min * 60000L)

  test("sessions split on the gap, keep trailing session, tiebreak dup timestamps") {
    val events = Seq(
      (1L, ts(0), 10L, "a", 1.0, "{}"),
      (2L, ts(10), 10L, "a", 2.0, "{}"),
      (3L, ts(100), 10L, "a", 4.0, "{}"), // > 30 min gap -> new session
      (4L, ts(100), 10L, "a", 8.0, "{}"), // duplicate ts, same session
      (5L, ts(0), 20L, "b", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionize(events, gapMs = 30 * 60000)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((10L, 2L, 3.0), (10L, 2L, 12.0), (20L, 1L, 5.0)))
  }

  test("relational sessions agree with the streaming fold on closed sessions") {
    import graft.streaming.Sessionize
    val events = Seq(
      (1L, ts(0), 10L, "a", 1.0, "{}"),
      (2L, ts(10), 10L, "a", 2.0, "{}"),
      (3L, ts(100), 10L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val relational = EventOps.sessionize(events, gapMs = 30 * 60000)
      .orderBy("session_start")
      .select("n_events", "total_value").as[(Long, Double)].collect()
    val typed = events.select($"user_id", $"ts", $"value")
      .as[Sessionize.Event]
    val streaming = Sessionize.sessions(typed, gapMs = 30 * 60000)
      .select("n_events", "total_value").as[(Long, Double)].collect()
    // Batch flatMapGroupsWithState emits only gap-closed sessions; the
    // relational form also returns the trailing open one.
    assert(relational.toSeq == Seq((2L, 3.0), (1L, 4.0)))
    assert(streaming.toSeq == Seq((2L, 3.0)))
  }
}
