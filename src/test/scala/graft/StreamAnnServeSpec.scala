package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.VectorSim

/** Parity pin for streaming ANN serving (VERDICT r08 item 5): the
  * stream's top-k over the composed weekly code slices under the
  * read-back frozen model must equal the batch
  * [[graft.pipeline.CurationRun.annServe]] on the SAME state — across
  * micro-batch boundaries, including rank order and the exact ADC
  * distances (the stream path recomputes the LUT arithmetic as map
  * expressions; any rounding drift fails the adist equality). */
class StreamAnnServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream top-k equals batch annServe over the same composed state") {
    implicit val sc = spark.sqlContext
    import graft.pipeline.CurationRun
    // A weekly ANN state: init on even vec_ids, one incremental append
    // of the odd ones — the q141 cadence, so the static side really is
    // a UNION of slices under a model frozen at init.
    val docs = (0L until 24L).map(i =>
      (i, s"document number $i speaks of topic ${i % 5} in its own words"))
      .toDF("doc_id", "text")
    val emb = (0L until 24L).map { i =>
      val v = Array.fill(8)(0f)
      v((i % 4).toInt) = 1f
      v(4 + (i % 3).toInt) = (0.2f * ((i % 5) + 1))
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val benchmark = Seq((1000L, "benchmark text unrelated to all documents here"))
      .toDF("doc_id", "text")
    val base = TestSpark.tmpDir("stream_ann")
    CurationRun.runInit(
      docs.where(pmod(col("doc_id"), lit(2)) === 0), benchmark,
      s"$base/out0", s"$base/state0", minQuality = 0.0,
      embeddings = Some(emb), semClusters = 2,
      annState = true, annSubspaces = 2, annCodewords = 4,
      annClusters = 4, annIters = 2)
    CurationRun.runIncremental(
      docs.where(pmod(col("doc_id"), lit(2)) === 1), benchmark,
      s"$base/out1", s"$base/state0", s"$base/state1", minQuality = 0.0,
      embeddings = Some(emb), semClusters = 2)

    val queries = Seq(3L, 7L, 10L, 21L).map { i =>
      val v = Array.fill(8)(0f)
      v((i % 4).toInt) = 1f
      v(4 + (i % 3).toInt) = (0.2f * ((i % 5) + 1))
      StreamAnnServe.Query(i, new Timestamp(1700000000000L + i * 1000),
        v.toSeq)
    }
    val batchWant = CurationRun.annServe(spark, s"$base/state1",
        queries.map(q => (q.vec_id, q.embedding)).toDF("vec_id", "embedding"),
        nprobe = 2, k = 3)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(batchWant.nonEmpty, "fixture must produce batch hits")

    val mem = MemoryStream[StreamAnnServe.Query]
    val (out, release) = CurationRun.annServeStream(spark, s"$base/state1",
      mem.toDF(), nprobe = 2, k = 3)
    val dir = TestSpark.tmpDir("stream_ann_q")
    val q = out.writeStream
      .format("memory").queryName("sas_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(queries(0), queries(1))
      q.processAllAvailable()
      mem.addData(queries(2), queries(3))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT query_id, neighbor_id, adist, rank FROM sas_test")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == batchWant,
        "stream hits (ids, exact adist, rank) must equal batch annServe")
    } finally { q.stop(); release() }
  }

  test("versioned session: queries straddling a rebase answer from the declared version (VERDICT r09 item 4)") {
    implicit val sc = spark.sqlContext
    import graft.pipeline.CurationRun
    def vec(i: Long): Seq[Float] = {
      val v = Array.fill(8)(0f)
      v((i % 4).toInt) = 1f
      v(4 + (i % 3).toInt) = (0.2f * ((i % 5) + 1))
      v.toSeq
    }
    val docs = (0L until 24L).map(i =>
      (i, s"document number $i speaks of topic ${i % 5} in its own words"))
      .toDF("doc_id", "text")
    val emb = (0L until 24L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val benchmark = Seq((1000L, "benchmark text unrelated to all documents here"))
      .toDF("doc_id", "text")
    val base = TestSpark.tmpDir("stream_ann_swap")
    // Version 1: only the EVEN vectors are indexed. Version 2: the
    // weekly increment appends the odds — the rebase boundary a
    // long-lived server must follow without restarting.
    CurationRun.runInit(
      docs.where(pmod(col("doc_id"), lit(2)) === 0), benchmark,
      s"$base/out0", s"$base/state0", minQuality = 0.0,
      embeddings = Some(emb), semClusters = 2,
      annState = true, annSubspaces = 2, annCodewords = 4,
      annClusters = 4, annIters = 2)
    CurationRun.runIncremental(
      docs.where(pmod(col("doc_id"), lit(2)) === 1), benchmark,
      s"$base/out1", s"$base/state0", s"$base/state1", minQuality = 0.0,
      embeddings = Some(emb), semClusters = 2)

    val qA = StreamAnnServe.Query(3L, new Timestamp(1700000000000L), vec(3))
    val qB = StreamAnnServe.Query(10L, new Timestamp(1700000001000L), vec(10))
    def want(stateDir: String, id: Long): Set[(Long, Long, Double, Int, String)] =
      CurationRun.annServe(spark,
          stateDir, emb.where(col("vec_id") === id), nprobe = 2, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"),
          lit(stateDir).as("state_version"))
        .as[(Long, Long, Double, Int, String)].collect().toSet

    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double, Int, String)]
    val mem = MemoryStream[StreamAnnServe.Query]
    val session = CurationRun.annServeSession(spark, s"$base/state0",
      nprobe = 2, k = 3)
    val q = session.serve(mem.toDF(), s"${TestSpark.tmpDir("swap_ck")}/ckpt") {
      batch =>
        batch.select(col("query_id"), col("neighbor_id"), col("adist"),
            col("rank"), col("state_version"))
          .collect().foreach(r => sunk.add((r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getInt(3), r.getString(4))))
    }
    try {
      assert(session.version === s"$base/state0")
      mem.addData(qA)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val preSwap = sunk.asScala.toSet
      assert(preSwap === want(s"$base/state0", 3L),
        "pre-swap hits must come from version 1 (and say so)")
      assert(preSwap.forall(_._2 % 2 == 0),
        "version 1 indexes only even vectors — an odd neighbor means " +
          "the static side leaked past its version")
      // The rebase boundary: swap mid-stream, no restart.
      session.swapTo(s"$base/state1")
      assert(session.version === s"$base/state1")
      sunk.clear()
      mem.addData(qB)
      q.processAllAvailable()
      assert(sunk.asScala.toSet === want(s"$base/state1", 10L),
        "post-swap hits must come from version 2 (and say so)")
      // Bounded state: foreachBatch serving has NO stateful operator.
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "the serving stream must carry zero state operators")
    } finally { q.stop(); session.close() }
  }
}
