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
    * scales with the corpus. Frequencies are occurrence-weighted (one
    * count per token occurrence), not per-document-distinct. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    // NOT spread (measured): the tokenizer trainers' word-frequency
    // pass is one cheap explode+count; adding a repartition exchange
    // regressed the whole BPE/unigram entry family (q95 0.98 -> 2.08,
    // q68 1.14 -> 1.61 at sf0.1) — the extra stage floors exceed the
    // parallelized map.
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Train up to `maxMerges` merges; stops early when the best
    * remaining pair occurs fewer than `minCount` times (or no pair is
    * left). `driverThreshold` picks the regime by distinct-word count.
    * A wordFreq the CALLER already persisted is left cached on return
    * (so e.g. [[vocabFrame]] can reuse it without a second corpus
    * pass); an unpersisted one is cached for the duration of training
    * only. */
  def train(wordFreq: DataFrame, maxMerges: Int, minCount: Long = 2L,
      driverThreshold: Long = 4000000L): Seq[MergeStep] = {
    val callerCached =
      wordFreq.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wf = if (callerCached) wordFreq else wordFreq.persist()
    try {
      // toRdd bookkeeping actions (NOTES finding #21): no per-stage
      // AQE plan-string render; strings copied inside the map.
      if (wf.queryExecution.toRdd.count() <= driverThreshold) trainInMemory(
        wf.select(col("token"), col("freq").cast("long"))
          .queryExecution.toRdd
          .map(r => (r.getUTF8String(0).toString, r.getLong(1))).collect(),
        maxMerges, minCount)
      else trainDistributed(wf, maxMerges, minCount)
    } finally if (!callerCached) wf.unpersist()
  }

  /** In-memory regime: the classic loop over (word, freq), with the
    * standard incremental-statistics optimization (Sennrich's public
    * reference trainer): a pair -> word-set index restricts each merge
    * to the words that actually contain the pair, pair counts update
    * by per-word multiset DIFF (old adjacent pairs out, new in), and
    * the selection is a lazy max-heap (entries validated against
    * current counts on pop). A naive full recount is O(vocab) per
    * merge — ~20 minutes for 8k merges over a 200k-word vocabulary;
    * this runs the same loop in seconds. Selection semantics are
    * unchanged (count desc, pair asc) — the regimes-equal spec pins
    * it against [[trainDistributed]]. */
  private[graft] def trainInMemory(words: Array[(String, Long)],
      maxMerges: Int, minCount: Long): Seq[MergeStep] = {
    val syms: Array[Array[String]] = words.map { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cc)
        i += cc
      }
      b.toArray
    }
    val freqs: Array[Long] = words.map(_._2)

    def pairsOf(s: Array[String]): Array[String] = {
      if (s.length < 2) return Array.empty
      val out = new Array[String](s.length - 1)
      var i = 0
      while (i + 1 < s.length) { out(i) = s(i) + " " + s(i + 1); i += 1 }
      out
    }

    val stats = new java.util.HashMap[String, java.lang.Long]()
    val index = new java.util.HashMap[String, java.util.HashSet[Integer]]()
    // Heap of (pair, count-at-push) — stale entries dropped on pop.
    // Ties compare by CODE POINT (== UTF-8 byte order, which is what
    // Spark's UTF8String and DuckDB's binary collation sort by);
    // String.compareTo is UTF-16 code-unit order, which inverts
    // supplementary-plane vs [U+E000, U+FFFF] symbols and would let
    // the driver regime diverge from the distributed/oracle order on
    // non-BMP tokens.
    def codePointCompare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
    val heap = new java.util.PriorityQueue[(String, Long)](11,
      (x: (String, Long), y: (String, Long)) =>
        if (x._2 != y._2) java.lang.Long.compare(y._2, x._2)
        else codePointCompare(x._1, y._1))

    var w = 0
    while (w < syms.length) {
      pairsOf(syms(w)).foreach { p =>
        stats.merge(p, freqs(w), (a: java.lang.Long, b: java.lang.Long) => a + b)
        index.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(w)
      }
      w += 1
    }
    stats.forEach((p, c) => heap.add((p, c.longValue())))

    val out = scala.collection.mutable.ArrayBuffer[MergeStep]()
    var done = false
    while (out.size < maxMerges && !done) {
      // Pop until an entry matches the live count — that's the max.
      var bestPair: String = null
      var bestCnt = 0L
      while (bestPair == null && !heap.isEmpty) {
        val (p, c) = heap.poll()
        val live = stats.get(p)
        if (live != null && live.longValue() == c) { bestPair = p; bestCnt = c }
        else if (live != null && heap.isEmpty) heap.add((p, live.longValue()))
        // stale & heap nonempty: drop; the live count was re-pushed
        // when it changed, so a fresh entry for p is still queued.
      }
      if (bestPair == null || bestCnt < minCount) done = true
      else {
        val sp = bestPair.indexOf(' ')
        val a = bestPair.substring(0, sp); val b = bestPair.substring(sp + 1)
        val merged = a + b
        val affected = index.get(bestPair)
        val touched = new java.util.HashSet[String]()
        if (affected != null) {
          val it = affected.toArray(new Array[Integer](affected.size())).iterator
          while (it.hasNext) {
            val wi = it.next().intValue()
            val s = syms(wi); val f = freqs(wi)
            val oldPairs = pairsOf(s)
            val o = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                o += merged; i += 2
              } else { o += s(i); i += 1 }
            }
            val ns = o.toArray
            if (!(ns sameElements s)) {
              syms(wi) = ns
              val newPairs = pairsOf(ns)
              oldPairs.foreach { p =>
                val c = stats.merge(p, -f, (x: java.lang.Long, y: java.lang.Long) => x + y)
                if (c != null && c.longValue() <= 0L) { stats.remove(p); index.remove(p) }
                else {
                  val set = index.get(p)
                  if (set != null) set.remove(Integer.valueOf(wi))
                }
                touched.add(p)
              }
              newPairs.foreach { p =>
                stats.merge(p, f, (x: java.lang.Long, y: java.lang.Long) => x + y)
                index.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
                  .add(wi)
                touched.add(p)
              }
            }
          }
        }
        // Index maintenance above removed per-word entries but a word
        // may still contain p elsewhere; re-add from new pair sets is
        // handled by the newPairs loop. Re-push every touched pair's
        // live count for the lazy heap.
        val ti = touched.iterator()
        while (ti.hasNext) {
          val p = ti.next()
          val live = stats.get(p)
          if (live != null) heap.add((p, live.longValue()))
        }
        out += MergeStep(out.size + 1, bestPair, merged, bestCnt)
      }
    }
    out.toSeq
  }

  /** The tokenizer-as-artifact surface (VERDICT r05 item 7): the
    * trained vocab as ONE writable frame a training pipeline ships —
    * merge rules (kind='merge', rank = apply order, weight = selection
    * count) plus the final symbol inventory (kind='symbol', rank=-1,
    * weight = corpus occurrence count of the symbol after all merges).
    * Round-trips through parquet: [[mergesFromVocab]] reads the rules
    * back in apply order and segmentation with them is spec-pinned
    * equal to segmenting with the in-call merges. The inventory is one
    * map + one shuffle over the (vocabulary-bounded) word-frequency
    * table — no corpus pass. */
  def vocabFrame(wordFreq: DataFrame, merges: Seq[MergeStep]): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val mergeRows = merges
      .map(m => ("merge", m.round, m.pair, m.merged, m.nOccurrences))
      .toDF("kind", "rank", "pair", "symbol", "weight")
      .select(col("kind"), col("rank").cast("int").as("rank"), col("pair"),
        col("symbol"), col("weight").cast("long").as("weight"))
    val symbolRows = wordFreq
      .select(
        explode(bpeApplyMergesNative(col("token"), merges.map(_.pair)))
          .as("symbol"),
        col("freq"))
      .groupBy(col("symbol"))
      .agg(sum(col("freq")).cast("long").as("weight"))
      .select(lit("symbol").as("kind"), lit(-1).as("rank"),
        lit("").as("pair"), col("symbol"), col("weight"))
    mergeRows.unionByName(symbolRows)
  }

  /** Merge rules from a (persisted, read-back) vocab frame, in apply
    * order — model-scale driver state, like the trained merges
    * themselves. */
  def mergesFromVocab(vocab: DataFrame): Seq[String] =
    // toRdd bookkeeping collect (NOTES finding #21); a global-sorted
    // plan's partitions concatenate in order, like Dataset.collect.
    vocab.where(col("kind") === "merge")
      .orderBy(col("rank"))
      .select(col("pair"))
      .queryExecution.toRdd
      .map(_.getUTF8String(0).toString).collect().toSeq

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
        // toRdd: one bookkeeping row per round (NOTES finding #21).
        .queryExecution.toRdd
        .map(r => (r.getUTF8String(0).toString, r.getLong(1)))
        .collect()
      if (best.isEmpty || best(0)._2 < minCount) done = true
      else {
        val pair = best(0)._1
        out += MergeStep(round, pair, pair.replace(" ", ""), best(0)._2)
        round += 1
      }
    }
    out.toSeq
  }
}
