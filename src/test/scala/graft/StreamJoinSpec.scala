package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Specs for the watermarked stream-stream interval join. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  case class E(key: Long, ts: Timestamp, value: Double)

  test("interval join pairs rows within the window, drops the rest") {
    implicit val sc = spark.sqlContext
    val lmem = MemoryStream[E]
    val rmem = MemoryStream[E]
    val joined = StreamJoin.intervalJoin(
      lmem.toDF().withWatermark("ts", "10 minutes"),
      rmem.toDF().withWatermark("ts", "10 minutes"),
      withinMs = 30 * 60000)
    val dir = TestSpark.tmpDir("sjoin")
    val q = joined.writeStream
      .format("memory").queryName("sjoin_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      lmem.addData(E(1L, ts(0), 1.0), E(2L, ts(0), 2.0))
      rmem.addData(
        E(1L, ts(10), 10.0), // within 30 min -> joins
        E(1L, ts(100), 99.0), // outside window -> dropped
        E(3L, ts(5), 30.0)) // no matching key
      q.processAllAvailable()
      val rows = spark.sql("SELECT l_key, l_value, r_value FROM sjoin_test")
        .as[(Long, Double, Double)].collect().toSet
      assert(rows == Set((1L, 1.0, 10.0)))
    } finally q.stop()
  }

  test("sub-second window is honored exactly (no integer truncation)") {
    // withinMs = 500 used to become INTERVAL 0 SECONDS via ms/1000.
    def tms(ms: Long) = new Timestamp(1440 * 60000L + ms)
    val l = Seq((1L, tms(0), 1.0)).toDF("key", "ts", "value")
    val r = Seq(
      (1L, tms(400), 4.0), // within 500 ms -> joins
      (1L, tms(900), 9.0)) // outside -> dropped
      .toDF("key", "ts", "value")
    val out = StreamJoin.intervalJoin(l, r, withinMs = 500)
      .select("r_value").as[Double].collect()
    assert(out.toSeq == Seq(4.0))
  }

  test("batch mode: same operator joins historical frames") {
    val l = Seq((1L, ts(0), 1.0)).toDF("key", "ts", "value")
    val r = Seq((1L, ts(20), 5.0), (1L, ts(90), 9.0)).toDF("key", "ts", "value")
    val out = StreamJoin.intervalJoin(l, r, withinMs = 30 * 60000)
      .select("r_value").as[Double].collect()
    assert(out.toSeq == Seq(5.0))
  }
}
