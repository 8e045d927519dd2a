package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.pipeline.{CurationRun, PublishCarrier, PublishState}

/** Stream-driven curation cadence (VERDICT r12 item 7): the
  * reference's weekly-file semantics lifted to Structured Streaming
  * at the COMPOSED level — a file-arrival stream where every
  * micro-batch runs one [[CurationRun.runIncremental]] against the
  * current state version, with checkpoint replay-safety (the
  * [[JourneyStream.journeyIngest]] foreachBatch discipline applied to
  * the whole weekly cadence instead of one fact table).
  *
  * Versioning model: micro-batch `b` publishes to `out_b<b>/` and
  * writes state version `state_b<b>/`, chained off a `current_state
  * .txt` pointer (atomic temp+move text write). Replay safety comes
  * from a per-batch `done_b<b>.txt` marker written LAST:
  *
  *  - a micro-batch whose marker exists is a NO-OP on redelivery
  *    (checkpoint recovery after a crash between Spark's offset
  *    commit and ours) — the pointer already advanced;
  *  - a crash BEFORE the marker re-runs the same increment into the
  *    same versioned dirs on redelivery, which converges bit-equal:
  *    state writes are overwrite-idempotent and the publish tail's
  *    own completion marker makes a half-published `out_b<b>` refuse
  *    readers and self-heal (DeltaPublishSpec pins both properties).
  *
  * The cadence parameters stay with the CALLER as a `runOne`
  * function — the driver owns orchestration (ordering, replay,
  * version bookkeeping), not curation policy, so any runIncremental
  * configuration (embeddings, classifier, span/line state, carrier)
  * streams without this module re-exporting every parameter.
  * StreamCurationDriverSpec pins: stream-driven lineage == the
  * batch-driven chain bit-equal (publish artifacts AND state), and a
  * replayed micro-batch is a no-op.
  */
object CurationStreamDriver {

  private def pointerPath(base: String) = s"$base/current_state.txt"
  private def donePath(base: String, id: Long) = s"$base/done_b$id.txt"

  /** The state version the next increment will read — the pointer
    * file's first line once the driver has run, `initStateDir`
    * before. The pointer's second line records the state the LAST
    * increment read (the in→out pair a crash-replay needs — see
    * [[processBatch]]). */
  def currentState(base: String, initStateDir: String,
      carrier: PublishCarrier = PublishCarrier.Posix): String =
    if (carrier.exists(pointerPath(base)))
      carrier.readText(pointerPath(base)).trim.split("\n")(0)
    else initStateDir

  /** Run ONE micro-batch through the cadence; returns the stats, or
    * None when the batch was already processed (replay) or empty.
    * Exposed so the spec can drive redelivery deterministically; the
    * streaming writer below calls exactly this. */
  def processBatch(batch: DataFrame, id: Long, base: String,
      initStateDir: String,
      runOne: (DataFrame, String, String, String) => CurationRun.Stats,
      carrier: PublishCarrier = PublishCarrier.Posix)
      : Option[CurationRun.Stats] = {
    if (carrier.exists(donePath(base, id))) return None
    if (batch.isEmpty) {
      // An empty redelivered batch still marks done so the offset
      // range never re-enters the pipeline.
      carrier.writeText(donePath(base, id), "empty\n")
      return None
    }
    val outDir = s"$base/out_b$id"
    val stateOut = s"$base/state_b$id"
    // The pointer carries the (out, in) PAIR: a crash between the
    // pointer write and the done marker replays this batch with the
    // pointer already advanced to ITS stateOut — naively reading the
    // head would hand runIncremental stateIn == stateOut (the
    // same-dir guard trips, crash loop). A replay whose pointer head
    // already names this batch's stateOut re-uses the recorded
    // stateIn instead, making the re-run byte-identical to the first
    // attempt (overwrite-idempotent state writes + the publish tail's
    // own crash self-heal).
    val ptr =
      if (carrier.exists(pointerPath(base)))
        carrier.readText(pointerPath(base)).trim.split("\n").toSeq
      else Seq(initStateDir)
    val stateIn =
      if (ptr.head == stateOut && ptr.size > 1) ptr(1) else ptr.head
    val stats = runOne(batch, outDir, stateIn, stateOut)
    carrier.writeText(pointerPath(base), s"$stateOut\n$stateIn\n")
    carrier.writeText(donePath(base, id), s"$stateOut\n")
    Some(stats)
  }

  /** File-arrival driver: `docs` is a STREAMING frame of weekly batch
    * files; each micro-batch runs one increment. `Trigger.AvailableNow`
    * — the weekly cadence shape: drain what landed, checkpoint, stop;
    * the next scheduled start continues the lineage. */
  def curationIngest(docs: DataFrame, base: String, initStateDir: String,
      checkpointDir: String,
      runOne: (DataFrame, String, String, String) => CurationRun.Stats,
      carrier: PublishCarrier = PublishCarrier.Posix)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, base, initStateDir, runOne, carrier)
        ()
      }
}
