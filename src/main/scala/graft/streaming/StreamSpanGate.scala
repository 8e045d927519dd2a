package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, wordNgramsNative}

/** Streaming boilerplate-coverage monitor — the live twin of the
  * incremental span-removal cadence's OBSERVE half
  * ([[graft.operators.TextDedup.removeRepeatedSpansIncremental]],
  * q142): documents arrive on a stream and each is scored for how much
  * of its token-window mass is already-known repeated boilerplate
  * under the composed span-df state. The downstream use is a gate
  * (drop or route documents whose `repeated_frac` exceeds a policy
  * threshold) or a drift dashboard (rising corpus-level fraction means
  * the crawl is re-ingesting boilerplate faster than the weekly clean
  * cuts it).
  *
  * Cadence contract, deliberately matching [[StreamSemanticGate]] /
  * [[StreamBloomGate]]: the decision is judged against STATE ONLY.
  * Within-batch df (two stream documents sharing a fresh span) is the
  * weekly batch cadence's job — the streaming tier has no cross-doc
  * gram state, and adding it would turn a stream-static join into a
  * stateful self-join the pipeline doesn't need. Grams are hashed by
  * the SAME positional-window kernel as the batch operators (64-bit
  * xxhash64 over the k-token window), so a state slice produced by
  * [[graft.operators.TextDedup.spanGramCounts]] keys identically.
  *
  * Shape: tokenize + window kernel + posexplode (pure map tier) ->
  * stream-static LEFT join against the persisted repeated-gram key set
  * (equi on the hash; Spark's supported stream-static shape, probing
  * the cached static side per micro-batch) -> watermark-bounded per-doc
  * windowed count aggregate (the [[StreamDecontaminate]] append-mode
  * shape). State is the window aggregate only; the static side is
  * gram-vocabulary scale, never corpus-text scale.
  */
object StreamSpanGate {

  /** Repeated-gram key set from the composed span-df state: the union
    * of [[graft.operators.TextDedup.spanGramCounts]] slices along the
    * state lineage (duplicate `h` rows across slices sum here — doc
    * ids are disjoint across batches, so distinct-doc counts ADD),
    * kept where the composed df reaches `minDf`. Build once per
    * stream, persist, reuse (the [[StreamBloomGate.historyKeys]]
    * caller-owned-cache contract). */
  def repeatedStateGrams(stateCounts: DataFrame, minDf: Int): DataFrame =
    stateCounts.groupBy(col("h")).agg(sum(col("n_docs")).as("df"))
      .where(col("df") >= minDf)
      .select(col("h"))

  /** Per-document boilerplate coverage on the stream: (window_start,
    * doc_id, n_grams, n_repeated, repeated_frac), one row per on-time
    * document with at least one k-token window (shorter documents have
    * no k-window and emit nothing — the batch gram-frame contract).
    * `n_repeated` counts gram POSITIONS whose window hash is in the
    * state's repeated set, so a boilerplate footer pasted twice counts
    * twice — coverage, not vocabulary. */
  def spanCoverage(docs: DataFrame, repeatedGrams: DataFrame,
      idCol: String, textCol: String, tsCol: String, k: Int,
      delay: String, windowDur: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= k)
      .withWatermark("__ts", delay)
      // Explode siblings are plain attributes (NOTES finding #14).
      .select(col("doc_id"), col("__ts"),
        posexplode(wordNgramsNative(col("__toks"), k)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("__ts"), xxhash64(col("gram")).as("h"))
      .join(repeatedGrams.withColumn("__hit", lit(1)), Seq("h"), "left")
      .groupBy(window(col("__ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_repeated"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_grams"), col("n_repeated"),
        round(col("n_repeated").cast("double") / col("n_grams"), 6)
          .as("repeated_frac"))
}
