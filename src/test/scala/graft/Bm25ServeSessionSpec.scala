package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamBm25Serve

/** The BM25 serving session's versioned-swap contract (VERDICT r10
  * item 3, the [[CurationRun.AnnServeSession]] discipline applied to
  * the second serving family): a long-lived query stream straddling a
  * weekly state boundary answers each micro-batch from the version
  * current AT that batch — pre-swap hits equal batch serve on v1,
  * post-swap on v2, each tagged with its state_version — with zero
  * stateful streaming operators and no stranded persisted frames
  * after close. */
class Bm25ServeSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("queries straddling a rebase answer from their declared version") {
    implicit val sc = spark.sqlContext
    val docs = Seq(
      (1L, "vector search with a hash filter over the vector index"),
      (2L, "the quick brown fox jumps over the lazy dog near the river"),
      (3L, "hash join versus sort merge join a filter pushdown story"),
      (4L, "vector vector vector everywhere and not a hash to join"),
      (5L, "plain prose about rivers and bridges with no query words"),
      (6L, "filter early filter often the planner's vector of virtues"),
      (7L, "a late arrival mentioning hash once and nothing else"))
    val base = TestSpark.tmpDir("bm25_session")
    // v1 indexes docs 1-4; v2 appends 5-7 — scores CHANGE across the
    // boundary (df/N/avgdl all move), so a leaked static side fails
    // the equality, not just the version tag.
    Bm25State.writeInit(docs.take(4).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/s1")
    Bm25State.writeIncrement(docs.drop(4).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/s1", s"$base/s2")

    val qTerms = Map(10L -> Seq("vector", "hash"), 11L -> Seq("filter", "hash"))
    def want(dir: String, qid: Long): Set[(Long, Long, Double, Int, String)] =
      Bm25State.serve(spark, dir, qTerms(qid), topK = 3)
        .select(col("rank"), col("doc_id"), col("score"))
        .as[(Int, Long, Double)].collect().toSet
        .map { t: (Int, Long, Double) => (qid, t._2, t._3, t._1, dir) }

    val before = spark.sparkContext.getPersistentRDDs.size
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double, Int, String)]
    val mem = MemoryStream[StreamBm25Serve.Query]
    val session = Bm25State.bm25ServeSession(spark, s"$base/s1", topK = 3)
    val q = session.serve(mem.toDF(),
      s"${TestSpark.tmpDir("bm25_session_ck")}/ckpt") { batch =>
      batch.select(col("q_id"), col("doc_id"), col("score"), col("rank"),
          col("state_version"))
        .collect().foreach(r => sunk.add((r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3), r.getString(4))))
    }
    try {
      assert(session.version === s"$base/s1")
      mem.addData(StreamBm25Serve.Query(10L,
        new Timestamp(1700000000000L), qTerms(10L)))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(sunk.asScala.toSet === want(s"$base/s1", 10L),
        "pre-swap hits must equal batch serve on v1 (and say so)")
      session.swapTo(s"$base/s2")
      assert(session.version === s"$base/s2")
      sunk.clear()
      mem.addData(StreamBm25Serve.Query(11L,
        new Timestamp(1700000001000L), qTerms(11L)))
      q.processAllAvailable()
      assert(sunk.asScala.toSet === want(s"$base/s2", 11L),
        "post-swap hits must equal batch serve on v2 (and say so)")
      // foreachBatch serving: no stateful streaming operator at all.
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "the serving stream must carry zero state operators")
    } finally { q.stop(); session.close() }
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "close() must release every frame the session persisted " +
        "(swap already released v1's)")
  }
}
