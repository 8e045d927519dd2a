package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, wordNgramsNative}
import graft.operators.DataMix

/** Streaming importance scoring — the live twin of
  * [[graft.operators.DataMix.importanceResample]]'s scoring stage:
  * documents arrive on a stream and are scored against BATCH-TRAINED
  * bucket distributions ([[graft.operators.DataMix.ImportanceStats]]).
  * The per-gram ratio join is stream-static (persist the stats frame so
  * each micro-batch reads the cached, at-most-`buckets`-row table), and
  * the feature definition — unigram+bigram grams through the md5 bucket
  * hash — is the SAME code the batch operator runs, the
  * [[StreamLmScore]] twin discipline.
  *
  * Selection (the Gumbel top-k draw) stays a batch decision over the
  * landed scores: a global without-replacement cut is not an
  * append-mode streaming operation. What the stream provides is the
  * expensive part — per-document importance at ingest time, e.g. to
  * gate a raw feed toward a target profile before it ever lands.
  *
  * Grams whose bucket the raw training pool never produced carry no
  * trained ratio and contribute zero (the inner join drops them) —
  * the batch operator never sees this case because it scores the pool
  * the distributions were trained on.
  *
  * State is bounded by the watermark horizon (open windows only);
  * documents later than `delay` are dropped — score them with the
  * batch operator over the landed table (the [[StreamDedup]]
  * contract).
  */
object StreamImportance {

  /** Score a document stream against batch-trained `stats`.
    * Output: (window_start, doc_id, importance), emitted on window
    * close — importance identical to the batch operator's for every
    * document that arrives within its watermark. */
  def score(docs: DataFrame, stats: DataMix.ImportanceStats, idCol: String,
      textCol: String, tsCol: String, delay: String,
      windowDur: String): DataFrame = {
    val toks = tokens(col("__text"))
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        col(textCol).as("__text"))
      .withWatermark("__ts", delay)
      .select(col("doc_id"), col("__ts"),
        explode(concat(toks, wordNgramsNative(toks, 2))).as("g"))
      .withColumn("b", DataMix.gramBucket(col("g"), stats.buckets))
      .join(broadcast(stats.ratio), "b")
      .groupBy(window(col("__ts"), windowDur), col("doc_id"))
      // Exact decimal sum of the 8dp ratio terms, rounded THEN cast —
      // the same order-invariance discipline as the batch operator
      // (NOTES finding #18 + the decimal-scale-cap note in DataMix).
      .agg(round(sum(col("r")), 6).cast("double").as("importance"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("importance"))
  }
}
