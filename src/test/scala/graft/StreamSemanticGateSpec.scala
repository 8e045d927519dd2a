package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.VectorSim

/** Top-level so the Dataset encoder needs no outer-scope instance. */
case class EmbRow(vec_id: Long, embedding: Seq[Float])

/** Parity pin for the stateless streaming semantic-novelty gate: the
  * stream decisions must equal the batch anti-join against the same
  * frozen-quantizer state, across micro-batch boundaries — and the
  * gate judges novelty vs STATE only (same-batch paraphrases both
  * pass, the StreamBloomGate contract). */
class StreamSemanticGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream gate equals the batch state anti-join across micro-batches") {
    implicit val sc = spark.sqlContext
    // State: three tight orthogonal-axis blobs.
    val state = Seq(
      EmbRow(1L, Seq(1f, 0f, 0f, 0f)),
      EmbRow(2L, Seq(0f, 1f, 0f, 0f)),
      EmbRow(3L, Seq(0f, 0f, 1f, 0f))).toDF()
    val cen = VectorSim.kmeansCentroids(state, 3, 2)
    val stateDf = StreamSemanticGate.stateCells(state, cen).persist()
    stateDf.count()
    val arrivals = Seq(
      EmbRow(11L, Seq(0.999f, 0.04f, 0f, 0f)), // paraphrase of state 1 -> dropped
      EmbRow(12L, Seq(0f, 0f, 0f, 1f)),        // novel direction -> passes
      EmbRow(13L, Seq(0.6f, 0.8f, 0f, 0f)),    // near state but below 0.99 -> passes
      EmbRow(14L, Seq(0f, 0f, 0.998f, 0.06f)), // paraphrase of state 3 -> dropped
      EmbRow(15L, Seq(0f, 0f, 0f, 0.97f)))     // paraphrase of 12 (same batch) -> passes
    val mem = MemoryStream[EmbRow]
    val out = StreamSemanticGate.novel(mem.toDF(), stateDf, cen, 0.99)
    val dir = TestSpark.tmpDir("ssg")
    val q = out.writeStream
      .format("memory").queryName("ssg_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(arrivals(0), arrivals(1))
      q.processAllAvailable()
      mem.addData(arrivals(2), arrivals(3), arrivals(4))
      q.processAllAvailable()
      val got = spark.sql("SELECT vec_id FROM ssg_test").as[Long].collect().toSet
      assert(got == Set(12L, 13L, 15L),
        "state paraphrases drop; novel, below-threshold, and SAME-BATCH " +
          "paraphrases pass (novelty is judged against state only)")
      // Batch twin over identical input: same anti-join, same rows.
      val batch = StreamSemanticGate.novel(arrivals.toDF(), stateDf, cen, 0.99)
        .select("vec_id").as[Long].collect().toSet
      assert(got == batch, "stream decisions must equal the batch anti-join")
    } finally {
      q.stop()
      stateDf.unpersist()
    }
  }
}
