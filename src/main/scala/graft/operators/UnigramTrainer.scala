package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{unigramPieceScoreNative, unigramSegmentNative}
import graft.functions.expr.UnigramModel

/** Unigram-LM tokenizer training (the SentencePiece family, Kudo 2018
  * "Subword Regularization") in its deterministic Viterbi-EM form —
  * the second major subword algorithm next to [[BpeTrainer]]'s BPE,
  * and like it fully SQL-replayable so the DuckDB oracle can replay
  * every iteration (the q65 unroll discipline):
  *
  *  - **Seed** — all single characters plus the top `seedMulti`
  *    substrings of length 2..`maxPieceLen` by occurrence-weighted
  *    count (ties by piece ascending). The top-K IS the prune step of
  *    this simplified trainer (the loss-based prune of full
  *    SentencePiece needs expected losses this deterministic variant
  *    deliberately avoids); the vocabulary is FIXED from here on.
  *  - **Probabilities** — add-one smoothed `(c+1)/(T+|V|)` computed
  *    as ONE IEEE double division. The whole trainer works in
  *    probability space, never log space: +, *, / are correctly-
  *    rounded IEEE ops with bit-identical results on every engine,
  *    while ln/exp/pow vary by libm — the q86 squaring-chain rule,
  *    applied to model training.
  *  - **E-step** — Viterbi-best segmentation of each distinct word
  *    (hard EM: deterministic, unlike full forward-backward EM whose
  *    expected counts would need exp/log), piece uses summed weighted
  *    by word frequency. Runs DISTRIBUTED over the word-frequency
  *    frame via the codegen'd kernel; only the |V|-row count table
  *    reaches the driver (the [[BpeTrainer]] state contract).
  *  - **M-step** — re-estimate probabilities over the fixed
  *    vocabulary; `emIters` fixed iterations.
  *
  * 100 TB shape: corpus-scale work is ONE word-frequency pass
  * ([[BpeTrainer.wordFrequencies]]); everything else is bounded by the
  * distinct-word vocabulary and |V|. Segmentation of the corpus is a
  * pure map stage (referenced-model kernel, plan O(1) in |V|).
  */
object UnigramTrainer {

  /** Occurrence-weighted piece seed counts: every single character,
    * plus the top `seedMulti` multi-char substrings (len 2..
    * `maxPieceLen`) by (count DESC, piece ASC). One explode + one
    * groupBy per length band over the distinct-word frame; the top-K
    * is a TakeOrderedAndProject, never a global sort. */
  def seedCounts(words: DataFrame, maxPieceLen: Int, seedMulti: Int): DataFrame = {
    def substrCountsOf(len: Int): DataFrame =
      words
        .where(length(col("token")) >= len)
        .select(col("freq"),
          explode(transform(
            sequence(lit(1), length(col("token")) - len + 1),
            i => col("token").substr(i, lit(len)))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("c"))
    val chars = substrCountsOf(1)
    val multi = (2 to maxPieceLen).map(substrCountsOf)
      .reduce(_ unionByName _)
      .groupBy(col("piece")).agg(sum(col("c")).as("c"))
      .orderBy(col("c").desc, col("piece").asc)
      .limit(seedMulti)
    chars.unionByName(multi)
  }

  private def modelFrom(counts: Array[(String, Long)],
      maxPieceLen: Int): UnigramModel = {
    val t = counts.map(_._2).sum
    val v = counts.length
    val denom = (t + v).toDouble
    val sorted = counts.sortBy(_._1)
    new UnigramModel(maxPieceLen,
      sorted.map(_._1), sorted.map(c => (c._2 + 1).toDouble / denom),
      1.0 / denom)
  }

  /** Train over a (word, freq) frame; returns the final model plus the
    * final E-step counts (the q95 vocabulary artifact's rows). */
  def train(words: DataFrame, maxPieceLen: Int = 4, seedMulti: Int = 40,
      emIters: Int = 2): (UnigramModel, Array[(String, Long)]) = {
    val wf = words.select(col("token"), col("freq").cast("long").as("freq"))
    // Model-state collects run through toRdd (the
    // TextDedup.connectedComponents rationale, NOTES finding #21): a
    // tracked SQL action per EM iteration re-renders the full plan
    // string per AQE stage — pure driver overhead. Strings are copied
    // out inside the map (shuffle rows are reused buffers).
    val seed = seedCounts(wf, maxPieceLen, seedMulti)
      .select(col("piece"), col("c").cast("long"))
      .queryExecution.toRdd
      .map(r => (r.getUTF8String(0).toString, r.getLong(1))).collect()
    val vocab = seed.map(_._1)
    var counts = seed
    var it = 0
    while (it < emIters) {
      val model = modelFrom(counts, maxPieceLen)
      val used = wf
        .select(col("freq"),
          explode(unigramSegmentNative(col("token"), model)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("c"))
        .queryExecution.toRdd
        .map(r => (r.getUTF8String(0).toString, r.getLong(1)))
        .collect().toMap
      counts = vocab.map(p => (p, used.getOrElse(p, 0L)))
      it += 1
    }
    (modelFrom(counts, maxPieceLen), counts)
  }

  /** Viterbi segmentation of a (word, freq) frame under `model`:
    * (word, freq, segmentation, n_pieces, score) — segmentation
    * space-joined in reading order, score the exact DP product. */
  def segment(words: DataFrame, model: UnigramModel): DataFrame =
    words
      .select(col("token").as("word"), col("freq").cast("long").as("freq"),
        unigramSegmentNative(col("token"), model).as("pieces"))
      .select(col("word"), col("freq"),
        array_join(col("pieces"), " ").as("segmentation"),
        size(col("pieces")).as("n_pieces"),
        unigramPieceScoreNative(col("pieces"), model).as("score"))
}
