package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming BM25 serving — the live twin of the weekly retrieval
  * index's query path ([[graft.pipeline.Bm25State.serve]]): keyword
  * queries arrive on a stream and are answered from the composed
  * postings state, never by a corpus tokenize pass. The 18th member of
  * the bounded-state twin family (the ANN artifact's
  * [[StreamAnnServe]] is the shape being mirrored).
  *
  * Stream shape, matching the family contract:
  *
  *  - the candidate join is a stream-static INNER equi-join of the
  *    query's DISTINCT terms (`array_distinct` — the batch form's
  *    `isin` filter counts a repeated query term once, so must the
  *    stream) against the caller-persisted static side: composed
  *    postings pre-joined with their term df (both derivable from
  *    state; [[graft.pipeline.Bm25State.serveStream]] builds and
  *    persists it);
  *  - the per-(query, doc, term) score PART is a pure map expression
  *    over the joined row — `round(idf · tf·(k1+1) / (tf + k1·(1−b +
  *    b·dl/avgdl)), 8)` as DECIMAL(20,8), with N and avgdl injected as
  *    literals read once from the one-row stats slices — term order
  *    and rounding identical to [[graft.operators.TextSearch
  *    .scoreBm25]];
  *  - the per-query doc sum + top-k runs as TWO chained zero-state
  *    `flatMapGroupsWithState` stages (state NEVER populated in
  *    either — a query's candidates all live in its own micro-batch;
  *    bounded state = zero entries), and the two-stage split is the
  *    memory bound (VERDICT r10 item 2): stage 1 keys by
  *    `(q_id, doc_id)` and folds that PAIR's term parts — a group is
  *    at most |distinct query terms| rows, so a hot probe term's
  *    postings spread across the stage-1 SHUFFLE (one (q, doc) pair
  *    per group) instead of concentrating in one per-query task —
  *    then replays the batch tail bit-for-bit: exact decimal sum
  *    (order-invariant), decimal→double cast,
  *    `BigDecimal.valueOf(d).setScale(6, HALF_UP)` (Catalyst
  *    `Round`'s double path). Stage 2 keys by `q_id` and selects
  *    top-k by (score DESC, doc_id ASC) — the `TopKByScore` rule —
  *    through [[topKBounded]], a k-bounded heap that STREAMS the
  *    iterator: the per-query task holds k entries, never the
  *    candidate set. A stopword-like probe term (df ~ corpus) now
  *    costs one streamed pass of bounded memory where the r10 form
  *    buffered every candidate posting in one HashMap
  *    (StreamBm25ServeSpec plants exactly that query and pins stream
  *    == batch, scores included).
  *
  * Queries are answered against the state the static side was built
  * from; a long-lived server that must follow rebase boundaries uses
  * [[graft.pipeline.Bm25State.bm25ServeSession]] (the
  * [[graft.pipeline.CurationRun.AnnServeSession]] contract).
  */
object StreamBm25Serve {

  case class Query(q_id: Long, ts: Timestamp, terms: Seq[String])

  case class Hit(q_id: Long, doc_id: Long, score: Double, rank: Int)

  /** Internal candidate row (public: the Dataset encoder's generated
    * deserializer must construct it). */
  case class Cand(q_id: Long, doc_id: Long, part: scala.math.BigDecimal)

  /** Internal per-(query, doc) summed score row (public for the same
    * encoder reason as [[Cand]]). */
  case class Scored(q_id: Long, doc_id: Long, score: Double)

  /** Top-k of `(doc_id, score)` rows by (score DESC, doc_id ASC) in
    * O(k) memory: a bounded heap ordered worst-first consumes the
    * iterator one row at a time — a candidate beats the current worst
    * or is dropped on the spot, so the task never materializes the
    * candidate set (doc_ids are unique within a query after the
    * stage-1 pre-aggregation, so the (score, doc) order is total and
    * the result deterministic). Returns hits ranked 1..min(k, n). */
  private[streaming] def topKBounded(qid: Long, rows: Iterator[Scored],
      k: Int): Iterator[Hit] = {
    // Max-heap under "worst is largest": lower score first, then
    // higher doc_id — dequeue always evicts the current worst.
    val worstFirst = Ordering.by[Scored, (Double, Long)](s => (-s.score, s.doc_id))
    val heap = scala.collection.mutable.PriorityQueue.empty[Scored](worstFirst)
    rows.foreach { s =>
      if (heap.size < k) heap.enqueue(s)
      else if (worstFirst.lt(s, heap.head)) { heap.dequeue(); heap.enqueue(s) }
    }
    val worstToBest: Seq[Scored] = heap.dequeueAll
    worstToBest.reverseIterator.zipWithIndex
      .map { case (s, i) => Hit(qid, s.doc_id, s.score, i + 1) }
  }

  /** Serve a STREAM of keyword queries: `statics` is the composed
    * postings state pre-joined with term df — (tok, doc_id, tf, dl,
    * df), static, caller persists it for the stream's lifetime; `n` /
    * `avgdl` the composed corpus stats. Emits the same (q_id, doc_id,
    * score, rank) rows as [[graft.pipeline.Bm25State.serve]] per query
    * (spec-pinned bit-equal, scores included). */
  def serve(queries: DataFrame, statics: DataFrame, n: Long, avgdl: Double,
      topK: Int, k1: Double = 1.2, b: Double = 0.75): Dataset[Hit] = {
    val spark = queries.sparkSession
    import spark.implicits._
    implicit val outEnc: org.apache.spark.sql.Encoder[Hit] =
      Encoders.product[Hit]
    implicit val midEnc: org.apache.spark.sql.Encoder[Scored] =
      Encoders.product[Scored]
    val idf = log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val part = round(
      idf * (col("tf") * (k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))),
      8).cast("decimal(20,8)")
    val cand = queries
      .select(col("q_id"), explode(array_distinct(col("terms"))).as("tok"))
      .join(statics, Seq("tok"))
      .select(col("q_id"), col("doc_id"), part.as("part"))
      .as[Cand]
    // Stage 1 — distributed per-(q, doc) exact decimal sum + the batch
    // rounding tail. Group size ≤ |distinct query terms|.
    val scored = cand.groupByKey(c => (c.q_id, c.doc_id))
      .flatMapGroupsWithState[Int, Scored](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), it: Iterator[Cand], _: GroupState[Int]) =>
          var s = java.math.BigDecimal.ZERO
          it.foreach { c => s = s.add(c.part.bigDecimal) }
          Iterator.single(Scored(key._1, key._2,
            java.math.BigDecimal.valueOf(s.doubleValue)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue))
      }
    // Stage 2 — per-query top-k in O(k) task memory.
    scored.groupByKey(_.q_id)
      .flatMapGroupsWithState[Int, Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, it: Iterator[Scored], _: GroupState[Int]) =>
          topKBounded(qid, it, topK)
      }
  }
}
