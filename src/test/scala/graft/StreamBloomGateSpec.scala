package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextDedup

/** Parity pin for the streaming Bloom novelty gate: the stream emits
  * exactly the batch operator's rows over the same data, across
  * micro-batch boundaries, with bloom-positive (confirm-join) and
  * bloom-negative (bypass) docs in both batches. */
class StreamBloomGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("stream gate emits exactly the batch bloomGatedNew rows") {
    implicit val sc = spark.sqlContext
    val history = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon")).toDF("doc_id", "text")
    val histKeys = StreamBloomGate.historyKeys(history, "text").persist()
    val bloom = StreamBloomGate.bloomOf(histKeys, histKeys.count())

    val mem = MemoryStream[Doc]
    val out = StreamBloomGate.newDocs(mem.toDF(), bloom, histKeys, "doc_id", "text")
    val dir = TestSpark.tmpDir("sbloom")
    val q = out.writeStream
      .format("memory").queryName("sbloom_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        Doc(10L, ts(0), "ALPHA beta  "), // dup of history 1 (bloom-positive, confirmed dup)
        Doc(11L, ts(1), "brand new one")) // bloom-negative bypass
      q.processAllAvailable()
      mem.addData(
        Doc(12L, ts(2), "gamma delta"), // dup of history 2
        Doc(13L, ts(3), "another new"), // new
        Doc(14L, ts(4), "brand new one")) // in-stream repeat of 11: STILL new vs history
      q.processAllAvailable()

      val got = spark.sql("SELECT doc_id, content_hash FROM sbloom_test")
        .as[(Long, String)].collect().toSet
      val batchDocs = Seq(
        (10L, "ALPHA beta  "), (11L, "brand new one"), (12L, "gamma delta"),
        (13L, "another new"), (14L, "brand new one")).toDF("doc_id", "text")
      val expected = TextDedup.bloomGatedNew(history, batchDocs, "doc_id", "text")
        .as[(Long, String)].collect().toSet
      assert(got == expected)
      assert(got.map(_._1) == Set(11L, 13L, 14L))
    } finally {
      q.stop()
      histKeys.unpersist()
    }
  }

  test("per-epoch fixed-capacity blooms OR-merge into the union bloom") {
    import graft.functions.expr.BloomRef
    import org.apache.spark.util.sketch.BloomFilter
    def build(keys: Seq[Long]) = {
      val bf = BloomFilter.create(1000L, 0.01)
      keys.foreach(bf.putLong)
      bf
    }
    val a = build(1L to 400L)
    val b = build(350L to 700L)
    val merged = build(1L to 400L) // fresh copy of a, then OR in b
    merged.mergeInPlace(b)
    val union = build((1L to 400L) ++ (350L to 700L))
    // Insertion is an idempotent bit-OR at fixed capacity: the merged
    // epoch blooms are BIT-IDENTICAL to the from-scratch union bloom —
    // the weekly cadence never re-reads history rows.
    assert(new BloomRef(merged) == new BloomRef(union))
    assert((1L to 700L).forall(merged.mightContainLong))
  }
}
