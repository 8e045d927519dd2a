package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Bm25State

/** Parity pin for streaming BM25 serving: the stream's per-query
  * ranking over the composed weekly postings state must equal the
  * batch [[Bm25State.serve]] on the SAME state — across micro-batch
  * boundaries, scores included bit-for-bit (the stream path replays
  * the decimal sum + double round tail in the group folds; any
  * rounding drift fails the score equality). A repeated query term
  * must count once, like the batch form's `isin`. The fixture PLANTS
  * a stopword probe — `corpus` appears in every document (df == N),
  * the exact shape whose postings the r10 single-fold form buffered
  * in one task's HashMap — and pins it equal to batch serve through
  * the two-stage bounded fold (VERDICT r10 item 2). */
class StreamBm25ServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream ranking equals batch serve over the same composed state") {
    implicit val sc = spark.sqlContext
    val docs = Seq(
      (1L, "vector search with a hash filter over the vector corpus index"),
      (2L, "the quick brown corpus fox jumps over the lazy dog near the river"),
      (3L, "hash join versus sort merge corpus join a filter pushdown story"),
      (4L, "vector vector vector everywhere corpus and not a hash to join"),
      (5L, "plain prose about rivers and corpus bridges with no query words"),
      (6L, "filter early filter often the corpus planner's vector of virtues"),
      (7L, "a late arrival mentioning hash corpus once and nothing else"))
    val base = TestSpark.tmpDir("stream_bm25")
    def batch(i: Int) = docs.filter(_._1 % 3 == i).toDF("doc_id", "text")
    Bm25State.writeInit(batch(0), "doc_id", "text", s"$base/s0")
    Bm25State.writeIncrement(batch(1), "doc_id", "text", s"$base/s0", s"$base/s1")
    Bm25State.writeIncrement(batch(2), "doc_id", "text", s"$base/s1", s"$base/s2")

    val queryTerms = Seq(
      10L -> Seq("vector", "hash"),
      11L -> Seq("filter"),
      // The dup term must count once (the batch form's isin rule).
      12L -> Seq("hash", "hash", "rivers"),
      13L -> Seq("vector", "filter", "hash"),
      // Planted stopword: df(corpus) == N — the hot-probe shape the
      // two-stage fold must spread, then rank identically to batch.
      14L -> Seq("corpus", "vector"))
    val batchWant = queryTerms.flatMap { case (qid, terms) =>
      Bm25State.serve(spark, s"$base/s2", terms, topK = 4)
        .select("rank", "doc_id", "score")
        .as[(Int, Long, Double)].collect()
        .map { case (r, d, s) => (qid, d, s, r) }
    }.toSet
    assert(batchWant.nonEmpty)

    val mem = MemoryStream[StreamBm25Serve.Query]
    val (out, release) = Bm25State.serveStream(spark, s"$base/s2",
      mem.toDF(), topK = 4)
    val dir = TestSpark.tmpDir("stream_bm25_q")
    val q = out.writeStream
      .format("memory").queryName("sbm_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def mkQ(i: Int) = StreamBm25Serve.Query(queryTerms(i)._1,
        new Timestamp(1700000000000L + i * 1000), queryTerms(i)._2)
      mem.addData(mkQ(0), mkQ(1))
      q.processAllAvailable()
      mem.addData(mkQ(2), mkQ(3), mkQ(4))
      q.processAllAvailable()
      val got = spark.sql("SELECT q_id, doc_id, score, rank FROM sbm_test")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == batchWant,
        "stream hits (ids, exact scores, rank) must equal batch serve")
      // Bounded state: neither group fold ever writes its state slot.
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty ||
        progress.stateOperators.forall(_.numRowsTotal == 0L),
        "serving must keep zero streaming state rows")
      // The memory bound is the two-stage SPLIT: the plan must carry
      // the distributed per-(q, doc) pre-aggregation stage AND the
      // per-query top-k stage (a single per-query fold would buffer a
      // stopword's whole posting volume in one task).
      val fmgCount = out.queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.FlatMapGroupsWithState => f
      }.size
      assert(fmgCount == 2,
        s"expected the two-stage bounded fold in the plan, found $fmgCount " +
          "FlatMapGroupsWithState nodes")
    } finally { q.stop(); release() }
  }

  test("topKBounded equals sort-based selection, ties broken by doc id") {
    def s(d: Long, sc: Double) = StreamBm25Serve.Scored(9L, d, sc)
    val rows = Seq(s(5, 0.5), s(2, 1.25), s(9, 0.5), s(1, 0.125),
      s(7, 2.0), s(3, 0.5), s(8, 1.25))
    for (k <- 1 to rows.size + 1) {
      val want = rows.sortBy(r => (-r.score, r.doc_id)).take(k).zipWithIndex
        .map { case (r, i) => StreamBm25Serve.Hit(9L, r.doc_id, r.score, i + 1) }
      val got = StreamBm25Serve.topKBounded(9L, rows.iterator, k).toSeq
      assert(got == want, s"k=$k")
    }
  }
}
