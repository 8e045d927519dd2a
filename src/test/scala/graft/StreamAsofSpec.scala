package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.EventOps

/** Parity + bounded-state specs for the streaming as-of twin. */
class StreamAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  private val events = Seq(
    StreamAsof.Event(1L, ts(5), 1.0),
    StreamAsof.Event(1L, ts(15), 2.0), // between updates -> matches ts(10)
    StreamAsof.Event(1L, ts(20), 3.0), // equal ts -> inclusive match ts(20)
    StreamAsof.Event(2L, ts(8), 4.0), // no update before -> null ref
    StreamAsof.Event(2L, ts(30), 5.0),
    StreamAsof.Event(3L, ts(12), 6.0)) // key with no updates at all
  private val updates = Seq(
    StreamAsof.Update(1L, ts(10), 10.0),
    StreamAsof.Update(1L, ts(20), 20.0),
    StreamAsof.Update(2L, ts(9), 90.0),
    StreamAsof.Update(2L, ts(25), 95.0))

  private def runStreaming(): Set[(Long, Long, Double, Option[Long], Option[Double])] = {
    implicit val sc = spark.sqlContext
    val emem = MemoryStream[StreamAsof.Event]
    val umem = MemoryStream[StreamAsof.Update]
    val out = StreamAsof.enrich(emem.toDS(), umem.toDS(), delay = "10 minutes")
    val dir = TestSpark.tmpDir("sasof")
    val q = out.writeStream
      .format("memory").queryName("sasof_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      emem.addData(events: _*)
      umem.addData(updates: _*)
      q.processAllAvailable()
      // Advance the watermark far past every event so all mature.
      emem.addData(StreamAsof.Event(99L, ts(10000), 0.0))
      umem.addData(StreamAsof.Update(99L, ts(10000), 0.0))
      q.processAllAvailable()
      spark.sql("SELECT key, ts, value, ref_ts, ref FROM sasof_test WHERE key != 99")
        .as[(Long, Timestamp, Double, Option[Timestamp], Option[Double])]
        .collect()
        .map { case (k, t, v, rt, r) => (k, t.getTime, v, rt.map(_.getTime), r) }
        .toSet
    } finally q.stop()
  }

  test("streaming result equals the batch asofJoin on the same data") {
    val batch = EventOps.asofJoin(
      events.toDF("key", "ts", "value"),
      updates.toDF("key", "ts", "ref").select(
        $"key", $"ts", $"ref"),
      keyCol = "key", tsCol = "ts")
      .select($"key", $"ts", $"value", $"r_ts", $"r_ref")
      .as[(Long, Timestamp, Double, Option[Timestamp], Option[Double])]
      .collect()
      .map { case (k, t, v, rt, r) => (k, t.getTime, v, rt.map(_.getTime), r) }
      .toSet
    val streamed = runStreaming()
    assert(streamed == batch, "streaming as-of must equal the batch twin")
    // Sanity on the fixture itself: inclusive <=, gap match, null ref.
    assert(streamed.contains((1L, ts(20).getTime, 3.0, Some(ts(20).getTime), Some(20.0))),
      "equal timestamps must match inclusively")
    assert(streamed.contains((2L, ts(8).getTime, 4.0, None, None)),
      "event before any update must keep null ref columns")
  }

  test("state prunes matched events and superseded updates") {
    implicit val sc = spark.sqlContext
    val emem = MemoryStream[StreamAsof.Event]
    val umem = MemoryStream[StreamAsof.Update]
    val out = StreamAsof.enrich(emem.toDS(), umem.toDS(), delay = "10 minutes")
    val dir = TestSpark.tmpDir("sasof2")
    val q = out.writeStream
      .format("memory").queryName("sasof_state_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      emem.addData(StreamAsof.Event(1L, ts(5), 1.0))
      umem.addData(
        StreamAsof.Update(1L, ts(1), 1.0),
        StreamAsof.Update(1L, ts(2), 2.0),
        StreamAsof.Update(1L, ts(3), 3.0))
      q.processAllAvailable()
      emem.addData(StreamAsof.Event(1L, ts(1000), 0.0)) // advance watermark
      q.processAllAvailable()
      val p = q.lastProgress
      val rows = Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum
      // Key 1 keeps ONE state row (latest update + the unmatured
      // ts(1000) event) — superseded updates and emitted events gone.
      assert(rows <= 1, s"state not pruned: $rows rows")
      val got = spark.sql(
        "SELECT value, ref FROM sasof_state_test WHERE value = 1.0")
        .as[(Double, Option[Double])].collect().toSeq
      assert(got == Seq((1.0, Some(3.0))), "latest update at/before event must win")
    } finally q.stop()
  }
}
