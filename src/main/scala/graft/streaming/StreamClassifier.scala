package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, wordNgramsNative}
import graft.operators.DataMix

/** Streaming model-based quality filtering — the live twin of
  * [[graft.operators.QualityClassifier.score]]: documents arrive on a
  * stream and are scored under a BATCH-TRAINED weight table (the q83
  * artifact frame). The per-gram weight join is stream-static against
  * the broadcast, at-most-`buckets`-row table, and the feature
  * definition — unigram+bigram grams through the md5 bucket hash — is
  * the SAME code the batch operator runs (the [[StreamImportance]]
  * twin discipline). This is the ingest-time quality gate: score a
  * raw feed before it lands, batch-retrain the weights on whatever
  * cadence the curation pipeline uses.
  *
  * Grams hashing to a bucket the training pool never produced carry
  * no weight row; their exact contribution to the margin is zero, so
  * the inner join dropping them changes nothing — UNLESS every gram
  * of a document is untrained, in which case the document drops from
  * the output instead of scoring sigmoid(0) = 0.5 (the batch operator
  * scores it via the coalesce-to-zero left join). Route such
  * fully-out-of-vocabulary docs to the batch path if they matter —
  * the [[StreamDedup]] contract for late data, applied to unseen
  * vocabulary. */
object StreamClassifier {

  /** Score a document stream under batch-trained `weights` (b, w).
    * Output: (window_start, doc_id, score, predicted), emitted on
    * window close — identical to the batch operator for every on-time
    * document with at least one trained gram. */
  def score(docs: DataFrame, weights: DataFrame, buckets: Int,
      idCol: String, textCol: String, tsCol: String, delay: String,
      windowDur: String): DataFrame = {
    val toks = tokens(col("__text"))
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        col(textCol).as("__text"))
      .withWatermark("__ts", delay)
      .select(col("doc_id"), col("__ts"),
        explode(concat(toks, wordNgramsNative(toks, 2))).as("g"))
      .withColumn("b", DataMix.gramBucket(col("g"), buckets))
      .join(broadcast(weights), "b")
      .groupBy(window(col("__ts"), windowDur), col("doc_id"))
      // Exact decimal margin (order-invariant), one sigmoid + 8dp
      // round at the boundary — the batch operator's discipline.
      .agg(sum(col("w")).as("z"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 8)
          .as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }
}
