package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextDedup

/** Top-level so the Dataset encoder needs no outer-scope instance. */
case class SpanDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Parity pin for the streaming boilerplate-coverage twin: the stream
  * rows must equal the same computation over a batch frame against the
  * same composed span-df state — and the decision is judged against
  * STATE only (a fresh span repeated WITHIN the stream batch scores
  * zero, the weekly batch cadence's job, same contract as
  * StreamSemanticGate / StreamBloomGate). */
class StreamSpanGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream span coverage equals the batch twin against composed state") {
    implicit val sc = spark.sqlContext
    val footer = "subscribe to our newsletter today"
    // Two history batches; the footer reaches df 2 only ACROSS slices
    // (doc ids are disjoint, distinct-doc counts add).
    val hist1 = Seq((101L, s"alpha beta gamma $footer")).toDF("doc_id", "text")
    val hist2 = Seq(
      (201L, s"delta epsilon $footer"),
      (202L, "unrelated history words entirely here")).toDF("doc_id", "text")
    val stateCounts = TextDedup.spanGramCounts(hist1, "doc_id", "text", k = 3)
      .unionAll(TextDedup.spanGramCounts(hist2, "doc_id", "text", k = 3))
    val rep = StreamSpanGate.repeatedStateGrams(stateCounts, minDf = 2).persist()
    rep.count()

    val fresh = "a brand new span repeated twice in this batch"
    val arrivals = Seq(
      SpanDoc(1L, t("2024-01-01 00:00:10"), s"one two three four $footer"),
      SpanDoc(2L, t("2024-01-01 00:00:11"), "totally novel content stream words"),
      SpanDoc(3L, t("2024-01-01 00:00:12"), "too short"), // < k tokens: no window
      SpanDoc(4L, t("2024-01-01 00:00:13"), fresh),
      SpanDoc(5L, t("2024-01-01 00:00:14"), fresh)) // same-batch repeat: df state only
    val mem = MemoryStream[SpanDoc]
    val out = StreamSpanGate.spanCoverage(mem.toDF(), rep,
      "doc_id", "text", "ts", k = 3, delay = "5 seconds", windowDur = "1 minute")
    val q = out.writeStream
      .format("memory").queryName("span_gate_test")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("ssp")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
      mem.addData(SpanDoc(99L, t("2024-01-01 00:30:00"), "late watermark sentinel"))
      q.processAllAvailable()
      mem.addData(SpanDoc(98L, t("2024-01-01 00:31:00"), "second sentinel row here"))
      q.processAllAvailable()
      val streaming = spark.sql(
        """SELECT doc_id, n_grams, n_repeated, repeated_frac
          |FROM span_gate_test WHERE doc_id < 90""".stripMargin)
        .orderBy("doc_id").collect().toSeq
      // Batch twin: the SAME function over a static frame (watermark is
      // a no-op on batch), identical state, identical rows expected.
      val batch = StreamSpanGate.spanCoverage(arrivals.toDF(), rep,
        "doc_id", "text", "ts", k = 3, delay = "5 seconds",
        windowDur = "1 minute")
        .select("doc_id", "n_grams", "n_repeated", "repeated_frac")
        .orderBy("doc_id").collect().toSeq
      assert(streaming == batch,
        "stream coverage rows must equal the batch twin's")
      val byDoc = streaming.map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // doc 1: 9 tokens -> 7 grams; the 3 footer-internal grams hit.
      assert(byDoc(1L) == ((7L, 3L, 0.428571)))
      // doc 2: clean; doc 3 absent (no k-window).
      assert(byDoc(2L)._2 == 0L && !byDoc.contains(3L))
      // docs 4/5: a span repeated only WITHIN the stream batch scores
      // zero — state-only decision, the batch cadence catches it.
      assert(byDoc(4L)._2 == 0L && byDoc(5L)._2 == 0L)
    } finally { q.stop(); rep.unpersist() }
  }
}
