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
  *  - the per-query doc sum + top-k is a `flatMapGroupsWithState`
  *    whose state is NEVER populated (a query's candidates all live in
  *    its own micro-batch — nothing to remember; bounded state = zero
  *    entries). Doc sums add the exact decimals (order-invariant),
  *    then replay the batch tail bit-for-bit: decimal→double cast,
  *    `BigDecimal.valueOf(d).setScale(6, HALF_UP)` (Catalyst `Round`'s
  *    double path), rank by (score DESC, doc_id ASC) — the
  *    `TopKByScore` rule.
  *
  * Memory contract of the group fold: one query's candidate rows are
  * the probed terms' postings — selective keyword terms by the serving
  * contract (the batch twin distributes this aggregation; a stopword
  * probe would concentrate its postings in one group task here, the
  * same hazard class the batch form spreads via shuffle). Queries are
  * answered against the state the static side was built from; swap on
  * a state version boundary (the [[StreamAnnServe]] contract).
  */
object StreamBm25Serve {

  case class Query(q_id: Long, ts: Timestamp, terms: Seq[String])

  case class Hit(q_id: Long, doc_id: Long, score: Double, rank: Int)

  /** Internal candidate row (public: the Dataset encoder's generated
    * deserializer must construct it). */
  case class Cand(q_id: Long, doc_id: Long, part: scala.math.BigDecimal)

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
    cand.groupByKey(_.q_id)
      .flatMapGroupsWithState[Int, Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, it: Iterator[Cand], _: GroupState[Int]) =>
          val sums = scala.collection.mutable.HashMap
            .empty[Long, java.math.BigDecimal]
          it.foreach { c =>
            sums.update(c.doc_id,
              sums.getOrElse(c.doc_id, java.math.BigDecimal.ZERO)
                .add(c.part.bigDecimal))
          }
          sums.iterator
            .map { case (doc, s) =>
              // The batch tail exactly: exact decimal sum -> double ->
              // Catalyst Round(double, 6) == valueOf + HALF_UP.
              (doc, java.math.BigDecimal.valueOf(s.doubleValue)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
            }
            .toSeq.sortBy { case (doc, sc) => (-sc, doc) }
            .take(topK).zipWithIndex
            .map { case ((doc, sc), i) => Hit(qid, doc, sc, i + 1) }
            .iterator
      }
  }
}
