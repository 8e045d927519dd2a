package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Sessionize.{Event, OpenSession}

/** Specs for the flatMapGroupsWithState sessionization operator. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("fold splits on gaps and accumulates within sessions") {
    val (closed, open) = Sessionize.fold(
      Seq((0L, 1.0), (10L * 60000, 2.0), (60L * 60000, 5.0)),
      gapMs = 30 * 60000, open = None)
    assert(closed == Seq(OpenSession(0, 10 * 60000, 2, 3.0)))
    assert(open.contains(OpenSession(60 * 60000, 60 * 60000, 1, 5.0)))
  }

  test("fold merges batch head into carried-over open session") {
    val carried = Some(OpenSession(0, 5 * 60000, 2, 4.0))
    val (closed, open) = Sessionize.fold(
      Seq((10L * 60000, 1.0)), gapMs = 30 * 60000, open = carried)
    assert(closed.isEmpty)
    assert(open.contains(OpenSession(0, 10 * 60000, 3, 5.0)))
  }

  test("fold: out-of-order merge never regresses session bounds") {
    // Late-but-within-watermark event (t=2min < open session's last=5min):
    // end stays max(ts), start stays min(ts), matching batch semantics.
    val carried = Some(OpenSession(60000, 5 * 60000, 2, 4.0))
    val (closed, open) = Sessionize.fold(
      Seq((2L * 60000, 1.0)), gapMs = 30 * 60000, open = carried)
    assert(closed.isEmpty)
    assert(open.contains(OpenSession(60000, 5 * 60000, 3, 5.0)),
      "lastMs must not move backwards on a late event")
  }

  test("batch mode emits gap-closed sessions per user") {
    val events = Seq(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 1.0), // session A
      Event(1L, ts(120), 2.0), // session B (open, not emitted in batch)
      Event(2L, ts(0), 3.0), Event(2L, ts(200), 4.0) // session + open
    ).toDS()
    val out = Sessionize.sessions(events, gapMs = 30 * 60000)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(out.map(s => (s.user_id, s.n_events, s.total_value)).toSeq ==
      Seq((1L, 2L, 2.0), (2L, 1L, 3.0)))
    assert(out(0).session_end == ts(5))
  }

  test("streaming: watermark-driven timeout closes and emits the session") {
    // Base offset keeps event times clear of the initial watermark (0):
    // an epoch-0 event is indistinguishable from late data.
    def t(min: Long) = ts(min + 1440)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      mem.toDS().withWatermark("ts", "10 minutes"), gapMs = 30 * 60000)
    val dir = TestSpark.tmpDir("sess")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(Event(1L, t(0), 1.0), Event(1L, t(5), 2.0))
      q.processAllAvailable()
      // Advance event time far past gap + watermark delay: the timeout
      // fires on the NEXT batch after the watermark advances.
      mem.addData(Event(2L, t(120), 9.0))
      q.processAllAvailable()
      mem.addData(Event(2L, t(125), 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, total_value FROM sessions_test")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((1L, 2L, 3.0)),
        s"user 1's session must close by event-time timeout, got $rows")
    } finally q.stop()
  }
}
