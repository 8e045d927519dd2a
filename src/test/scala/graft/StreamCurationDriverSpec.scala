package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CurationRun, PublishState}
import graft.streaming.CurationStreamDriver

/** Stream-driven curation cadence (VERDICT r12 item 7): a file-arrival
  * stream running one `runIncremental` per micro-batch must produce
  * the SAME lineage as the batch-driven chain — publish artifacts
  * bit-equal at every version — and a redelivered micro-batch
  * (checkpoint recovery) must be a no-op on the done-marker path and
  * a bit-equal converging re-run on the crash path. */
class StreamCurationDriverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val b0 = Seq(
    1L -> ("the amber lantern swung gently above wooden crates stacked " +
      "beside narrow canal boats every misty evening"),
    2L -> ("granite cliffs rise steeply where gulls wheel over cold grey " +
      "water and distant sails fade slowly into the northern haze line"))
  private val b1 = Seq(
    11L -> ("five gardeners planted rows of tulips beside the gravel " +
      "path while morning light spread slowly across the lawn"))
  private val b2 = Seq(
    21L -> ("seven sailors mended canvas sails under the harbor lamps " +
      "as the tide pushed small boats against the wooden pier"))
  private val benchmark = Seq(900L ->
    "zyx wvu tsr qpo nml kji hgf edc ba9 87z y6x w5v u4t s3r q2p o1n")
    .toDF("doc_id", "text")
  private def docs(s: Seq[(Long, String)]) = s.toDF("doc_id", "text")

  private def runOne(batch: org.apache.spark.sql.DataFrame, out: String,
      sIn: String, sOut: String): CurationRun.Stats =
    CurationRun.runIncremental(batch, benchmark, out, sIn, sOut,
      minQuality = 0.0, publishSpan = 4L, packBudget = 64L)

  private def curatedSet(dir: String) =
    spark.read.parquet(s"$dir/curated")
      .select(col("doc_id"), col("text"), col("detected_lang"),
        col("quality_score"))
      .as[(Long, String, String, Double)].collect().toSet

  private def manifestSet(dir: String) =
    spark.read.parquet(s"$dir/manifest").collect().map(_.toString).toSet

  test("stream-driven cadence == batch-driven chain; replays are no-ops") {
    val base = TestSpark.tmpDir("stream_cadence")
    val ref = TestSpark.tmpDir("stream_cadence_ref")
    // Batch-driven reference chain.
    CurationRun.runInit(docs(b0), benchmark, s"$ref/out0", s"$ref/s0",
      minQuality = 0.0, publishSpan = 4L, packBudget = 64L)
    runOne(docs(b1), s"$ref/out1", s"$ref/s0", s"$ref/s1")
    runOne(docs(b2), s"$ref/out2", s"$ref/s1", s"$ref/s2")
    // Stream-driven: same init, then two file arrivals drained by two
    // AvailableNow runs sharing one checkpoint (the weekly shape:
    // drain, stop, continue next week).
    CurationRun.runInit(docs(b0), benchmark, s"$base/out0", s"$base/s0",
      minQuality = 0.0, publishSpan = 4L, packBudget = 64L)
    val inbox = s"$base/inbox"
    val schema = docs(b1).schema
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inbox)
      val q = CurationStreamDriver.curationIngest(stream, base,
        s"$base/s0", s"$base/ckpt", runOne).start()
      q.awaitTermination()
    }
    docs(b1).coalesce(1).write.mode("append").parquet(inbox)
    drain()
    docs(b2).coalesce(1).write.mode("append").parquet(inbox)
    drain()
    // Lineage equality: each stream version bit-equal to its batch twin.
    for ((streamOut, refOut) <- Seq(
        s"$base/out_b0" -> s"$ref/out1", s"$base/out_b1" -> s"$ref/out2")) {
      assert(PublishState.isComplete(streamOut))
      assert(curatedSet(streamOut) == curatedSet(refOut),
        s"$streamOut curated must equal $refOut")
      assert(manifestSet(streamOut) == manifestSet(refOut),
        s"$streamOut manifest must equal $refOut")
    }
    assert(PublishState.readTotals(s"$base/state_b1") ==
      PublishState.readTotals(s"$ref/s2"),
      "stream-driven state totals must equal the batch chain's")
    assert(CurationStreamDriver.currentState(base, s"$base/s0")
      == s"$base/state_b1")
    // Marker-path replay (crash after the done marker / Spark offset
    // redelivery): a no-op — nothing recomputed, artifacts untouched.
    def ino(p: String): Any = java.nio.file.Files.getAttribute(
      java.nio.file.Paths.get(p), "unix:ino")
    def inos(dir: String): Set[Any] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => ino(p.toString)).toSet
      } finally s.close()
    }
    val before = inos(s"$base/out_b0/curated")
    assert(CurationStreamDriver.processBatch(docs(b1), 0L, base,
        s"$base/s0", runOne).isEmpty,
      "a batch with its done marker must be a no-op")
    assert(inos(s"$base/out_b0/curated") == before,
      "the no-op replay must not rewrite any artifact file")
    // Crash-path replay (crash BETWEEN the pointer write and the done
    // marker): the marker is missing and the pointer already names
    // this batch's stateOut — the re-run must reuse the recorded
    // stateIn (not trip the same-dir guard) and converge bit-equal.
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base/done_b1.txt"))
    val st = CurationStreamDriver.processBatch(docs(b2), 1L, base,
      s"$base/s0", runOne)
    assert(st.nonEmpty, "the crash-path replay must re-run the increment")
    assert(curatedSet(s"$base/out_b1") == curatedSet(s"$ref/out2") &&
      manifestSet(s"$base/out_b1") == manifestSet(s"$ref/out2"),
      "the crash-path re-run must converge bit-equal")
    assert(CurationStreamDriver.currentState(base, s"$base/s0")
      == s"$base/state_b1")
  }
}
