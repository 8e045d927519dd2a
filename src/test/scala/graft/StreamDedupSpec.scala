package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Specs for watermark-bounded streaming deduplication. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("duplicates within the watermark horizon are dropped, first wins") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val deduped = StreamDedup.byContentHash(
      mem.toDF(), "text", "ts", "10 minutes")
    val dir = TestSpark.tmpDir("sdedup")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        Doc(1L, ts(0), "Hello World"),
        Doc(2L, ts(1), "  hello world "), // same normalized content
        Doc(3L, ts(2), "other text"))
      q.processAllAvailable()
      mem.addData(Doc(4L, ts(3), "HELLO world")) // still within horizon
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM sdedup_test")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 3L),
        "only the first arrival of each content hash survives")
    } finally q.stop()
  }
}
