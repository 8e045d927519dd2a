package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, wordNgramsNative}
import graft.operators.TextAnalysis

/** Streaming LM fluency scoring — the live twin of
  * [[graft.operators.TextAnalysis.ngramLmScore]]: documents arrive on a
  * stream and are scored against supplied n-gram statistics —
  * batch-trained ([[graft.operators.TextAnalysis.lmTrain]]) or the
  * weekly count state's composed frames
  * ([[graft.pipeline.LmState.serveStream]], which persists the static
  * side per state version; a rebase-following server uses
  * [[graft.pipeline.LmState.lmServeSession]] instead). The
  * scoring joins are stream-static (persist the
  * [[graft.operators.TextAnalysis.LmStats]] frames so each micro-batch
  * reads the cached counts instead of re-aggregating the training
  * corpus), and the per-gram log-prob stage is the SAME code the batch
  * operator runs (`TextAnalysis.lmLogProbs`) — one scoring
  * implementation serves both modes, the [[StreamAsof]]/[[Sessionize]]
  * twin discipline.
  *
  * The per-document re-aggregation of exploded n-grams is a
  * watermark-bounded windowed aggregate in append mode: every n-gram
  * row carries its document's event time, so a document's grams land in
  * one window and the finished score emits once the watermark passes
  * the window end. State is bounded by the watermark horizon (open
  * windows only); documents later than `delay` are dropped by the
  * watermark — score them with the batch operator over the landed
  * table (the [[StreamDedup]] contract).
  */
object StreamLmScore {

  /** Score a document stream against batch-trained `stats`.
    * Output: (window_start, doc_id, n_bigrams, avg_logprob), emitted on
    * window close — identical scores to the batch operator for every
    * document that arrives within its watermark. */
  def score(docs: DataFrame, stats: TextAnalysis.LmStats, idCol: String,
      textCol: String, tsCol: String, delay: String,
      windowDur: String): DataFrame =
    TextAnalysis.lmLogProbs(
      docs
        .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
          col(textCol).as("__text"))
        .withWatermark("__ts", delay)
        .select(col("doc_id"), col("__ts"),
          explode(wordNgramsNative(tokens(col("__text")), stats.n)).as("bg")),
      stats)
      .groupBy(window(col("__ts"), windowDur), col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // Exact decimal sum — same order-invariance discipline as the
        // batch operator (NOTES finding #18).
        round(sum(col("lp").cast("decimal(20,8)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_bigrams"), col("avg_logprob"))
}
