package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Top-level so the Dataset encoder needs no outer-scope instance. */
case class C4Doc(doc_id: Long, text: String)

/** Parity pin for the stateless streaming C4 gate: per-row array
  * evaluation must emit exactly the batch explode-and-regroup rows,
  * across micro-batch boundaries. */
class StreamC4GateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream gate equals batch c4LineFilter across micro-batches") {
    implicit val sc = spark.sqlContext
    val five = "one two three four five"
    val docs = Seq(
      C4Doc(1L, s"$five.\n$five!\nshort line.\n$five?"), // kept, 3/4 lines
      C4Doc(2L, s"$five\n$five\n$five"),                 // no terminal punct
      C4Doc(3L, s"$five.\n$five.\n$five {.\n$five."),    // brace page gate
      C4Doc(4L, s"$five.\nLorem Ipsum dolor sit amet.\n$five.\n$five."),
      C4Doc(5L, ""))                                     // empty doc
    val mem = MemoryStream[C4Doc]
    val out = StreamC4Gate.clean(mem.toDF(), "doc_id", "text")
    val dir = TestSpark.tmpDir("sc4")
    val q = out.writeStream
      .format("memory").queryName("sc4_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs(0), docs(1))
      q.processAllAvailable()
      mem.addData(docs(2), docs(3), docs(4))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_lines, n_kept, cleaned_text, keep FROM sc4_test")
        .as[(Long, Long, Long, String, Int)].collect().toSet
      val expected = TextAnalysis.c4LineFilter(
        docs.toDF(), "doc_id", "text")
        .as[(Long, Long, Long, String, Int)].collect().toSet
      assert(got == expected)
      assert(got.collect { case (id, _, _, _, 1) => id } == Set(1L),
        "only the clean multi-line doc survives the gate")
    } finally {
      q.stop()
    }
  }

  test("qualitySignals is stream-safe by construction (pure map tier)") {
    implicit val sc = spark.sqlContext
    val docs = Seq(
      C4Doc(1L, "the cat sat on the mat and that have with more words here"),
      C4Doc(2L, "aaa aaa aaa aaa"),
      C4Doc(3L, "der die und das ist gut"))
    val mem = MemoryStream[C4Doc]
    // The fused quality scan is shuffle-free, so the SAME batch
    // operator applies to a stream unchanged — no twin needed.
    val out = TextAnalysis.qualitySignals(mem.toDF(), "doc_id", "text")
    val dir = TestSpark.tmpDir("sqsig")
    val q = out.writeStream
      .format("memory").queryName("sqsig_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs(0))
      q.processAllAvailable()
      mem.addData(docs(1), docs(2))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sqsig_test")
        .as[(Long, Int, Double, String, Double, Double, Int)].collect().toSet
      val expected = TextAnalysis.qualitySignals(docs.toDF(), "doc_id", "text")
        .as[(Long, Int, Double, String, Double, Double, Int)].collect().toSet
      assert(got == expected)
    } finally {
      q.stop()
    }
  }
}
