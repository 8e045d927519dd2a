package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis
import graft.streaming.LmDoc

/** The LM serving session + streaming twin (VERDICT r11 item 3 — the
  * third instantiation of the [[VersionedServeSession]] contract): a
  * long-lived document stream straddling a weekly state boundary
  * scores each micro-batch from the version current AT that batch —
  * pre-swap scores equal [[LmState.serve]] on v1, post-swap on v2,
  * each tagged with its state_version — with zero stateful streaming
  * operators and no stranded persisted frames after close; and the
  * fixed-version [[LmState.serveStream]] twin scores a watermarked doc
  * stream from the COMPOSED state bit-equal to the batch operator. */
class LmServeSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docsAll = Seq(
    (1L, "the cat sat on the mat and the cat slept"),
    (2L, "a dog chased the cat across the yard all day"),
    (3L, "the mat was red and the yard was green"),
    (4L, "cats and dogs live together in the red house"),
    (5L, "the quick brown fox jumps over the lazy dog"),
    (6L, "a house of cards falls when the wind blows"),
    (7L, "the wind in the yard chased a red leaf"))
  private def batch(i: Int) =
    docsAll.filter(_._1 % 3 == i).toDF("doc_id", "text")

  private def want(dir: String, docs: Seq[(Long, String)])
      : Set[(Long, Long, Double, String)] =
    LmState.serve(spark, dir, docs.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"), col("avg_logprob"))
      .as[(Long, Long, Double)].collect().toSet
      .map { t: (Long, Long, Double) => (t._1, t._2, t._3, dir) }

  test("doc batches straddling a state boundary score from their version") {
    implicit val sc = spark.sqlContext
    val base = TestSpark.tmpDir("lm_session")
    // v1 composes batch 0; v2 appends batch 1 — counts AND the
    // smoothing vocabulary move, so every log-prob changes across the
    // boundary: a leaked static side fails the equality, not just the
    // version tag.
    LmState.writeInit(batch(0), "text", s"$base/s1")
    LmState.writeIncrement(batch(1), "text", s"$base/s1", s"$base/s2")

    val probeA = docsAll.take(2)
    val probeB = docsAll.drop(4).take(2)
    val before = spark.sparkContext.getPersistentRDDs.size
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double, String)]
    val mem = MemoryStream[LmDoc]
    val session = LmState.lmServeSession(spark, s"$base/s1")
    val q = session.serve(mem.toDF(),
      s"${TestSpark.tmpDir("lm_session_ck")}/ckpt") { b =>
      b.select(col("doc_id"), col("n_bigrams"), col("avg_logprob"),
          col("state_version"))
        .collect().foreach(r => sunk.add((r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getString(3))))
    }
    try {
      assert(session.version === s"$base/s1")
      mem.addData(probeA.map(d =>
        LmDoc(d._1, new Timestamp(1700000000000L), d._2)): _*)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(sunk.asScala.toSet === want(s"$base/s1", probeA),
        "pre-swap scores must equal batch serve on v1 (and say so)")
      session.swapTo(s"$base/s2")
      assert(session.version === s"$base/s2")
      sunk.clear()
      mem.addData(probeB.map(d =>
        LmDoc(d._1, new Timestamp(1700000001000L), d._2)): _*)
      q.processAllAvailable()
      assert(sunk.asScala.toSet === want(s"$base/s2", probeB),
        "post-swap scores must equal batch serve on v2 (and say so)")
      // Same-dir swap is a no-op (round-12 review finding #2): the
      // reload would resolve to the SAME cache entry the old payload
      // holds, so releasing the old side would evict the "new" one
      // and leave the server permanently un-warmed. The guard keeps
      // the persisted static side exactly as it was.
      val cachedBefore = spark.sparkContext.getPersistentRDDs.size
      session.swapTo(s"$base/s2")
      assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore,
        "swapTo(current version) must not touch the persisted static side")
      sunk.clear()
      mem.addData(probeA.map(d =>
        LmDoc(d._1, new Timestamp(1700000002000L), d._2)): _*)
      q.processAllAvailable()
      assert(sunk.asScala.toSet === want(s"$base/s2", probeA),
        "answers after a same-dir swap must still serve v2")
      // foreachBatch serving: no stateful streaming operator at all.
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "the serving stream must carry zero state operators")
    } finally { q.stop(); session.close() }
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "close() must release every frame the session persisted " +
        "(swap already released v1's)")
  }

  test("serveStream scores a doc stream from the COMPOSED state == batch") {
    implicit val sc = spark.sqlContext
    val base = TestSpark.tmpDir("lm_stream_state")
    LmState.writeInit(batch(0), "text", s"$base/s0")
    LmState.writeIncrement(batch(1), "text", s"$base/s0", s"$base/s1")
    val before = spark.sparkContext.getPersistentRDDs.size
    val mem = MemoryStream[LmDoc]
    val (scored, release) = LmState.serveStream(spark, s"$base/s1",
      mem.toDF(), "doc_id", "text", "ts",
      delay = "5 seconds", windowDur = "1 minute")
    val q = scored.writeStream
      .format("memory").queryName("lm_state_stream")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("lmss")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(docsAll.map(d =>
        LmDoc(d._1, t("2024-01-01 00:00:10"), d._2)): _*)
      q.processAllAvailable()
      mem.addData(LmDoc(99L, t("2024-01-01 00:30:00"), "late sentinel"))
      q.processAllAvailable()
      mem.addData(LmDoc(98L, t("2024-01-01 00:31:00"), "second sentinel"))
      q.processAllAvailable()
      val streaming = spark.sql("SELECT doc_id, n_bigrams, avg_logprob " +
          "FROM lm_state_stream WHERE doc_id < 90")
        .as[(Long, Long, Double)].collect().toSet
      // The stream answered from composed state == the batch operator
      // over the composed corpus (the q150 oracle's form) == pruned
      // batch serve.
      val corpus = batch(0).unionByName(batch(1))
      val fromScratch = TextAnalysis.ngramLmScore(corpus,
          docsAll.toDF("doc_id", "text"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("avg_logprob"))
        .as[(Long, Long, Double)].collect().toSet
      assert(streaming === fromScratch,
        "stream-from-state scores must equal the batch operator's")
      assert(streaming === want(s"$base/s1", docsAll).map(t =>
          (t._1, t._2, t._3)),
        "stream-from-state scores must equal pruned batch serve")
    } finally { q.stop(); release() }
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "release() must unpersist the composed static side")
  }
}
