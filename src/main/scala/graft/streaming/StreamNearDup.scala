package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.tokens

/** Streaming near-duplicate CANDIDATE detection — the unbounded-input
  * twin of the batch MinHash+LSH candidate generator
  * ([[graft.operators.TextDedup.minhashLshPairs]] before its exact
  * verify).
  *
  * Map pass first: each document's 16 LSH band keys are derived in ONE
  * codegen'd call ([[graft.functions.expr.MinhashBandKeys]] — same
  * md5-prefix shingle hash, same Mersenne permutation family, same
  * band-md5 text as the batch relational chain, so streaming and batch
  * candidates are identical; spec-pinned). Then per band bucket a
  * small state (doc ids inside the watermark horizon) emits a
  * candidate pair for every new collision — the streaming shape of the
  * batch bucket self-join.
  *
  * Contract notes, both inherited from the batch algorithm or the
  * streaming model: (1) output pairs are CANDIDATES at the banding's
  * probability curve — run the exact/estimate verify downstream on the
  * landed pair set (verify needs both documents' text, which bounded
  * state cannot hold); (2) a pair may be emitted once per colliding
  * band — dedup downstream if exact-once pairs matter; (3) only
  * documents within the same watermark horizon can pair — dups
  * straddling more than `delay` need the batch operator over the
  * landed table (the [[StreamDedup]] contract).
  *
  * State is bounded: per bucket, (ts, doc_id) pairs inside the
  * horizon; an event-time timeout prunes expired entries and empty
  * buckets.
  */
object StreamNearDup {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  case class Banded(doc_id: Long, ts: Timestamp, bucket: String)

  case class BucketState(docs: Vector[(Long, Long)]) // (tsMs, doc_id)

  case class CandidatePair(doc_a: Long, doc_b: Long, bucket: String, ts: Timestamp)

  /** LSH band keys for a text column — the shared map-pass kernel. */
  def bandKeys(text: org.apache.spark.sql.Column, n: Int,
      numHashes: Int, bands: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.TextFunctions.wordShinglesNative
    ColumnBridge.column(graft.functions.expr.MinhashBandKeys(
      ColumnBridge.expression(wordShinglesNative(tokens(text), n)),
      numHashes, bands))
  }

  def candidatePairs(docs: Dataset[Doc], delay: String, n: Int = 3,
      numHashes: Int = 32, bands: Int = 16): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[CandidatePair]
    val banded = docs.toDF()
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        explode(bandKeys(col("text"), n, numHashes, bands)).as("bucket"))
      .as[Banded]
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: String, it: Iterator[Banded], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.map(_.docs).getOrElse(Vector.empty)
            .filter(_._1 >= wm) // prune expired entries
          // Deterministic intra-batch order: by (ts, doc_id).
          val fresh = it.map(b => (b.ts.getTime, b.doc_id)).toVector
            .sortBy(identity)
          val out = Vector.newBuilder[CandidatePair]
          var seen = prior
          fresh.foreach { case (t, id) =>
            seen.foreach { case (_, pid) =>
              if (pid != id) out += CandidatePair(
                math.min(pid, id), math.max(pid, id), bucket, new Timestamp(t))
            }
            seen = seen :+ ((t, id))
          }
          if (seen.isEmpty) state.remove()
          else {
            state.update(BucketState(seen))
            // Wake when the horizon passes the newest entry to prune.
            state.setTimeoutTimestamp(seen.map(_._1).max + 1)
          }
          out.result().iterator
      }
  }
}
