package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{bpeApplyMergesNative, tokens, wordNgramsNative}

/** Iterative BPE tokenizer training (VERDICT r04 item 1 — the merge
  * LOOP q62/q63's single scoring pass opened): count adjacent symbol
  * pairs weighted by word frequency, apply the best merge, re-count,
  * iterate to a target merge count. Public algorithm (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"); cf. reference corpus prep `spark/transform_trips.py:1`
  * (the reference has no tokenizer tier — this is extension surface).
  *
  * 100 TB shape: the ONLY corpus-scale work is [[wordFrequencies]]
  * (one map + one shuffle). The merge loop runs over the DISTINCT-WORD
  * frequency table — bounded by vocabulary, not corpus. Like
  * [[TextDedup.connectedComponents]], the loop is hybrid:
  *
  *  - at or below `driverThreshold` distinct words, the table collects
  *    to the driver and the loop is in-memory (the standard shape: even
  *    web-scale corpora have word vocabularies in the low millions);
  *  - above it, each round is one constant-shape distributed pass:
  *    symbols re-derived from the base words by the codegen'd
  *    [[graft.functions.expr.BpeApplyMerges]] kernel (the learned
  *    merges ride as ONE reference object — plan O(1) in merge count,
  *    no per-round lineage growth, nothing to checkpoint), pair counts
  *    partial-aggregate map-side, and exactly one (pair, count) row
  *    reaches the driver per round.
  *
  * Both regimes implement identical semantics (spec-pinned equal):
  * overlapping pair counting (every adjacent position), best pair by
  * (count desc, pair asc), merges applied left-to-right
  * non-overlapping. Counts are integer sums — deterministic on any
  * partitioning.
  */
object BpeTrainer {

  /** One learned merge: `pair` = "a b" (space-joined — symbols never
    * contain whitespace), `merged` = "ab", and the pair's corpus
    * occurrence count at selection time. */
  final case class MergeStep(
    round: Int, pair: String, merged: String, nOccurrences: Long)

  /** Corpus-scale word-frequency aggregate — the only pass whose cost
    * scales with the corpus. */
  def wordFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Train up to `maxMerges` merges; stops early when the best
    * remaining pair occurs fewer than `minCount` times (or no pair is
    * left). `driverThreshold` picks the regime by distinct-word count. */
  def train(wordFreq: DataFrame, maxMerges: Int, minCount: Long = 2L,
      driverThreshold: Long = 4000000L): Seq[MergeStep] = {
    val wf = wordFreq.persist()
    try {
      if (wf.count() <= driverThreshold) trainInMemory(
        wf.select(col("token"), col("freq").cast("long"))
          .collect().map(r => (r.getString(0), r.getLong(1))),
        maxMerges, minCount)
      else trainDistributed(wf, maxMerges, minCount)
    } finally wf.unpersist()
  }

  /** In-memory regime: the classic loop over (word, freq). */
  private[graft] def trainInMemory(words: Array[(String, Long)],
      maxMerges: Int, minCount: Long): Seq[MergeStep] = {
    // Symbol sequences as mutable arrays of strings (code-point split).
    var syms: Array[(Array[String], Long)] = words.map { case (w, f) =>
      val b = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cc)
        i += cc
      }
      (b.toArray, f)
    }
    val out = scala.collection.mutable.ArrayBuffer[MergeStep]()
    var round = 1
    var done = false
    while (round <= maxMerges && !done) {
      val counts = new java.util.HashMap[String, java.lang.Long]()
      syms.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          counts.merge(s(i) + " " + s(i + 1), f,
            (a: java.lang.Long, b: java.lang.Long) => a + b)
          i += 1
        }
      }
      // Best by (count desc, pair asc) — the distributed ORDER BY.
      var bestPair: String = null
      var bestCnt = 0L
      counts.forEach { (p, c) =>
        if (c > bestCnt || (c == bestCnt && (bestPair == null || p < bestPair))) {
          bestPair = p; bestCnt = c
        }
      }
      if (bestPair == null || bestCnt < minCount) done = true
      else {
        val sp = bestPair.indexOf(' ')
        val a = bestPair.substring(0, sp); val b = bestPair.substring(sp + 1)
        syms = syms.map { case (s, f) =>
          if (s.length < 2) (s, f)
          else {
            val o = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                o += a + b; i += 2
              } else { o += s(i); i += 1 }
            }
            (o.toArray, f)
          }
        }
        out += MergeStep(round, bestPair, a + b, bestCnt)
        round += 1
      }
    }
    out.toSeq
  }

  /** Distributed regime: one constant-shape pass per round. */
  private[graft] def trainDistributed(wordFreq: DataFrame,
      maxMerges: Int, minCount: Long): Seq[MergeStep] = {
    val out = scala.collection.mutable.ArrayBuffer[MergeStep]()
    var round = 1
    var done = false
    while (round <= maxMerges && !done) {
      val merges = out.map(_.pair).toSeq
      val best = wordFreq
        .select(bpeApplyMergesNative(col("token"), merges).as("symbols"),
          col("freq"))
        .where(size(col("symbols")) >= 2)
        .select(explode(wordNgramsNative(col("symbols"), 2)).as("pair"),
          col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(1) < minCount) done = true
      else {
        val pair = best(0).getString(0)
        out += MergeStep(round, pair, pair.replace(" ", ""), best(0).getLong(1))
        round += 1
      }
    }
    out.toSeq
  }
}
