package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextDedup

/** Parity spec for the streaming MinHash candidate detector: the
  * streaming pair set must equal the batch LSH candidate set on the
  * same corpus (threshold 0 keeps every banded candidate on the batch
  * side). */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  private val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val corpus = Seq(
    (1L, base),
    (2L, base + " extra"), // near-dup of 1
    (3L, base.replace("quick", "slow")), // near-dup of 1 and 2
    (4L, "completely different text about spark catalyst optimizer rules and joins here"),
    (5L, "another unrelated document mentioning parquet files and shuffle partitions only"))

  test("streaming candidates equal the batch LSH candidate set") {
    val batch = {
      val idx = TextDedup.buildIndex(
        corpus.toDF("doc_id", "text"), "doc_id", "text", n = 3, bits = 32)
      TextDedup.minhashLshPairs(idx, threshold = 0.0, numHashes = 32, bands = 16)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    }
    assert(batch.nonEmpty, "fixture must produce batch candidates")

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamNearDup.Doc]
    val out = StreamNearDup.candidatePairs(mem.toDS(), delay = "10 minutes")
    val dir = TestSpark.tmpDir("sneardup")
    val q = out.writeStream
      .format("memory").queryName("sneardup_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Arrive in two micro-batches (state must carry across them).
      mem.addData(
        StreamNearDup.Doc(1L, ts(0), corpus(0)._2),
        StreamNearDup.Doc(2L, ts(1), corpus(1)._2))
      q.processAllAvailable()
      mem.addData(
        StreamNearDup.Doc(3L, ts(2), corpus(2)._2),
        StreamNearDup.Doc(4L, ts(3), corpus(3)._2),
        StreamNearDup.Doc(5L, ts(4), corpus(4)._2))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_a, doc_b FROM sneardup_test")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        "streaming candidate pairs must equal batch banding candidates")
    } finally q.stop()
  }

  test("documents beyond the watermark horizon stop pairing (bounded state)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamNearDup.Doc]
    val out = StreamNearDup.candidatePairs(mem.toDS(), delay = "5 minutes")
    val dir = TestSpark.tmpDir("sneardup2")
    val q = out.writeStream
      .format("memory").queryName("sneardup_horizon_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(StreamNearDup.Doc(1L, ts(0), base))
      q.processAllAvailable()
      // Advance the watermark far past doc 1 + delay: its bucket state
      // must be pruned, so an identical late twin no longer pairs.
      mem.addData(StreamNearDup.Doc(99L, ts(1000), "watermark advancer text"))
      q.processAllAvailable()
      mem.addData(StreamNearDup.Doc(2L, ts(1001), base))
      q.processAllAvailable()
      val pairs = spark.sql(
        "SELECT doc_a, doc_b FROM sneardup_horizon_test WHERE doc_a = 1")
        .collect()
      assert(pairs.isEmpty, "expired bucket entries must not pair")
      val p = q.lastProgress
      val rows = Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum
      assert(rows <= 32, s"state must hold only live buckets: $rows rows")
    } finally q.stop()
  }
}
