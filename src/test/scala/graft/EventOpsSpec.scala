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

  test("sessionTranscripts: ordered tokens, integer values, gap split") {
    val events = Seq(
      (2L, ts(0), 10L, "click", 2.6, "{}"),  // dup ts: event_id orders
      (1L, ts(0), 10L, "view", 1.4, "{}"),
      (3L, ts(10), 10L, "buy", 0.4, "{}"),
      (4L, ts(100), 10L, "view", 9.5, "{}"), // > 30 min gap -> new session
      (5L, ts(0), 20L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionTranscripts(events, gapMs = 30 * 60000)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "transcript")
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq(
      (10L, 3L, "view:1 click:3 buy:0"),
      (10L, 1L, "view:10"),
      (20L, 1L, "view:5")))
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

  private def evDf(rows: (Long, Timestamp, Long)*) =
    rows.toDF("event_id", "ts", "user_id")

  test("asofJoin picks the latest right row at or before, per key, null when none") {
    val left = evDf((100L, ts(10), 1L), (101L, ts(30), 1L), (102L, ts(5), 2L))
    val right = evDf(
      (200L, ts(0), 1L), (201L, ts(10), 1L), // equal ts -> inclusive match
      (202L, ts(20), 1L),
      (203L, ts(7), 2L)) // after left's only event for user 2
    val out = EventOps.asofJoin(left, right, "user_id", "ts")
      .select($"event_id", $"r_event_id".cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      100L -> Some("201"), // ties include the equal-ts right row
      101L -> Some("202"), // latest of the three, not just any earlier
      102L -> None)) // no right row at or before -> left outer null
  }

  test("intervalJoin equals the brute-force inequality join") {
    val rnd = new scala.util.Random(5)
    val left = evDf((0 until 80).map(i =>
      (i.toLong, ts(rnd.nextInt(300).toLong), rnd.nextInt(4).toLong)): _*)
    val right = evDf((0 until 80).map(i =>
      (1000L + i, ts(rnd.nextInt(300).toLong), rnd.nextInt(4).toLong)): _*)
    val w = 17L * 60 * 1000 // deliberately not a divisor-friendly width
    val banded = EventOps.intervalJoin(left, right, "user_id", "ts", w)
      .select($"event_id", $"r_event_id").as[(Long, Long)].collect().toSet
    val brute = left.as("l").join(right.select(
        $"event_id".as("rid"), $"ts".as("rts"), $"user_id".as("ruid")),
        $"user_id" === $"ruid")
      .where(org.apache.spark.sql.functions.unix_millis($"ts") -
        org.apache.spark.sql.functions.unix_millis($"rts") between (0, w))
      .select($"event_id", $"rid").as[(Long, Long)].collect().toSet
    assert(banded == brute, "banding must be lossless and duplicate-free")
    assert(banded.nonEmpty)
  }

  test("intervalJoin plans a hash equi-join, not a cartesian/nested-loop") {
    val left = evDf((1L, ts(0), 1L)); val right = evDf((2L, ts(1), 1L))
    val plan = EventOps.intervalJoin(left, right, "user_id", "ts", 60000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"banded interval join must be an equi-join:\n$plan")
  }

  test("Tables.events normalizes the driver parquet's ts to TIMESTAMP") {
    // The driver's testdata generations have shipped ts as
    // TIMESTAMP(NANOS) and as TIMESTAMP_NTZ(micros); either way the
    // loader must hand downstream operators a plain TIMESTAMP that
    // unix_millis accepts (q28/q36/q41 all call it).
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"got ${ev.schema("ts").dataType}")
    val n = ev.select(org.apache.spark.sql.functions.unix_millis($"ts").as("ms"))
      .filter($"ms".isNotNull).count()
    assert(n > 0)
  }
}
