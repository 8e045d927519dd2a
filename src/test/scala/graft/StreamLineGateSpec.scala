package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextDedup

/** Top-level so the Dataset encoder needs no outer-scope instance. */
case class LineDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Parity pin for the streaming line-boilerplate twin: stream rows
  * must equal the batch computation against the same composed line-df
  * state; decisions are vs STATE only; blank lines never count. */
class StreamLineGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream line coverage equals the batch twin against composed state") {
    implicit val sc = spark.sqlContext
    val footer = "subscribe to our newsletter"
    // df 2 only ACROSS the two slices (disjoint ids, counts add).
    val hist1 = Seq((101L, s"history alpha\n$footer")).toDF("doc_id", "text")
    val hist2 = Seq((201L, s"$footer\nhistory beta")).toDF("doc_id", "text")
    val stateCounts = TextDedup.lineCounts(hist1, "doc_id", "text")
      .unionAll(TextDedup.lineCounts(hist2, "doc_id", "text"))
    val rep = StreamLineGate.repeatedStateLines(stateCounts, minDf = 2).persist()
    rep.count()

    val arrivals = Seq(
      LineDoc(1L, t("2024-01-01 00:00:10"), s"fresh opening line\n$footer\n\ntail line"),
      LineDoc(2L, t("2024-01-01 00:00:11"), "wholly novel document"),
      LineDoc(3L, t("2024-01-01 00:00:12"), "same batch line"),
      LineDoc(4L, t("2024-01-01 00:00:13"), "same batch line")) // state-only: 0
    val mem = MemoryStream[LineDoc]
    val out = StreamLineGate.lineCoverage(mem.toDF(), rep,
      "doc_id", "text", "ts", delay = "5 seconds", windowDur = "1 minute")
    val q = out.writeStream
      .format("memory").queryName("line_gate_test")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("slg")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
      mem.addData(LineDoc(99L, t("2024-01-01 00:30:00"), "late watermark sentinel"))
      q.processAllAvailable()
      mem.addData(LineDoc(98L, t("2024-01-01 00:31:00"), "second sentinel row"))
      q.processAllAvailable()
      val streaming = spark.sql(
        """SELECT doc_id, n_lines, n_repeated, repeated_frac
          |FROM line_gate_test WHERE doc_id < 90""".stripMargin)
        .orderBy("doc_id").collect().toSeq
      val batch = StreamLineGate.lineCoverage(arrivals.toDF(), rep,
        "doc_id", "text", "ts", delay = "5 seconds", windowDur = "1 minute")
        .select("doc_id", "n_lines", "n_repeated", "repeated_frac")
        .orderBy("doc_id").collect().toSeq
      assert(streaming == batch, "stream rows must equal the batch twin's")
      val byDoc = streaming.map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // doc 1: 3 NON-BLANK lines (the blank one never counts), 1 hit.
      assert(byDoc(1L) == ((3L, 1L, 0.333333)))
      assert(byDoc(2L) == ((1L, 0L, 0.0)))
      // within-batch repeat scores zero on both copies (state only).
      assert(byDoc(3L)._2 == 0L && byDoc(4L)._2 == 0L)
    } finally { q.stop(); rep.unpersist() }
  }
}
