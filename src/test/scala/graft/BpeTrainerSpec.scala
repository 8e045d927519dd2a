package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.bpeApplyMergesNative
import graft.operators.BpeTrainer

/** BPE merge-loop trainer (VERDICT r04 item 1): kernel apply-rule
  * pins, a hand-computed classic fixture, and the hybrid-regime
  * equality (driver in-memory == per-round distributed). */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def applied(token: String, merges: Seq[String]): Seq[String] =
    Seq(token).toDF("t")
      .select(bpeApplyMergesNative($"t", merges).as("s"))
      .as[Seq[String]].collect().head

  test("kernel: left-to-right non-overlapping merge application") {
    assert(applied("aaaa", Seq("a a")) == Seq("aa", "aa"))
    assert(applied("aaa", Seq("a a")) == Seq("aa", "a"))
    assert(applied("abab", Seq("a b")) == Seq("ab", "ab"))
    // Sequential replay: later merges see earlier merges' symbols.
    assert(applied("aaaa", Seq("a a", "aa aa")) == Seq("aaaa"))
    // Merges whose parts are absent are skipped, not errors.
    assert(applied("xyz", Seq("a b", "x y", "xy z")) == Seq("xyz"))
    // Multi-char symbol boundaries never false-match ("xa"+"b" is not "a"+"b").
    assert(applied("xab", Seq("x a", "a b")) == Seq("xa", "b"))
    // Code-point split: surrogate-pair characters stay whole.
    val emoji = new String(Character.toChars(0x1F600))
    assert(applied(s"a${emoji}a", Seq.empty) == Seq("a", emoji, "a"))
  }

  test("classic fixture: merge sequence matches the hand computation") {
    // Corpus: "lo lo lo low low lower" -> word freqs lo:3 low:2 lower:1.
    // Pair counts r1: (l,o)=6, (o,w)=3, (w,e)=1, (e,r)=1 -> merge "l o".
    // r2: (lo,w)=3, (w,e)=1, (e,r)=1 -> merge "lo w".
    // r3: (low,e)=1, (e,r)=1 -> tie at 1, pair asc -> "e r".
    val docs = Seq((1L, "lo lo lo low low lower")).toDF("doc_id", "text")
    val wf = BpeTrainer.wordFrequencies(docs, "text")
    val merges = BpeTrainer.train(wf, maxMerges = 3, minCount = 1L)
    assert(merges.map(m => (m.round, m.pair, m.merged, m.nOccurrences)) == Seq(
      (1, "l o", "lo", 6L), (2, "lo w", "low", 3L), (3, "e r", "er", 1L)))
  }

  test("minCount stops the loop; merged-out words stop contributing pairs") {
    val docs = Seq((1L, "ab ab ab c")).toDF("doc_id", "text")
    val wf = BpeTrainer.wordFrequencies(docs, "text")
    // r1 merges (a,b)=3; then every word is a single symbol -> no pairs.
    val merges = BpeTrainer.train(wf, maxMerges = 10)
    assert(merges.map(_.pair) == Seq("a b"))
  }

  test("driver and distributed regimes produce identical merge sequences") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quicker brown foxes jumped over lazy dogs today"),
      (3L, "pack my box with five dozen liquor jugs again"),
      (4L, "the the the quick quick brown")).toDF("doc_id", "text")
    val wf = BpeTrainer.wordFrequencies(docs, "text").persist()
    try {
      val words = wf.select($"token", $"freq".cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val inMem = BpeTrainer.trainInMemory(words, maxMerges = 12, minCount = 2L)
      val dist = BpeTrainer.trainDistributed(wf, maxMerges = 12, minCount = 2L)
      assert(inMem == dist,
        s"regimes diverged:\n  driver: $inMem\n  distributed: $dist")
      assert(inMem.nonEmpty && inMem.size <= 12)
    } finally wf.unpersist()
  }

  test("count ties with non-BMP symbols break identically in both regimes (UTF-8 order)") {
    // (a, U+E001) vs (a, U+1F600): UTF-16 code-unit order puts the
    // surrogate-pair emoji FIRST (0xD83D < 0xE001) while UTF-8 binary
    // order — what Spark and DuckDB sort by — puts it LAST. A
    // compareTo tie-break would learn the merges in a different order
    // below vs above the driver threshold.
    val emoji = new String(Character.toChars(0x1F600))
    val priv = ""
    val docs = Seq(
      (1L, s"a$emoji a$emoji"),
      (2L, s"a$priv a$priv")).toDF("doc_id", "text")
    val wf = BpeTrainer.wordFrequencies(docs, "text").persist()
    try {
      val words = wf.select($"token", $"freq".cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val inMem = BpeTrainer.trainInMemory(words, maxMerges = 2, minCount = 2L)
      val dist = BpeTrainer.trainDistributed(wf, maxMerges = 2, minCount = 2L)
      assert(inMem == dist, s"tie-break diverged: $inMem vs $dist")
      assert(inMem.head.pair == s"a $priv",
        "UTF-8 order must sort the private-use char before the emoji")
    } finally wf.unpersist()
  }

  test("incremental-stats driver loop equals the distributed recount on a dense vocab") {
    // 300 hash-derived 6-hex-char words with varied freqs: rich shared
    // pair structure, deep merge chains, plenty of count ties — the
    // regime where the driver loop's incremental diffs + lazy heap
    // could drift from the distributed full recount if they were wrong.
    val wf = spark.range(300)
      .selectExpr("substring(md5(cast(id as string)), 1, 6) as token",
        "cast(pmod(hash(id), 97) + 1 as long) as freq")
      .groupBy("token").agg(org.apache.spark.sql.functions.max("freq").as("freq"))
      .persist()
    try {
      val words = wf.select($"token", $"freq")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val inMem = BpeTrainer.trainInMemory(words, maxMerges = 30, minCount = 2L)
      val dist = BpeTrainer.trainDistributed(wf, maxMerges = 30, minCount = 2L)
      assert(inMem == dist, {
        val i = inMem.zip(dist).indexWhere { case (a, b) => a != b }
        s"regimes diverged at merge $i: driver=${inMem.lift(i)} distributed=${dist.lift(i)}"
      })
      assert(inMem.size == 30, s"expected the full 30 merges, got ${inMem.size}")
    } finally wf.unpersist()
  }

  test("vocab artifact round trip: train -> write -> read -> segment equals in-call") {
    val docs = Seq(
      (1L, "lo lo lo low low lower"),
      (2L, "the slow glow of the low yellow meadow")).toDF("doc_id", "text")
    val wf = BpeTrainer.wordFrequencies(docs, "text").persist()
    try {
      val merges = BpeTrainer.train(wf, maxMerges = 5, minCount = 1L)
      assert(merges.nonEmpty)
      val vocab = BpeTrainer.vocabFrame(wf, merges)
      // Shape: one merge row per step in rank order + a symbol
      // inventory whose weights sum to the corpus token-symbol count.
      val mergeRows = vocab.where($"kind" === "merge")
        .select("rank", "pair", "symbol", "weight")
        .as[(Int, String, String, Long)].collect().sortBy(_._1)
      assert(mergeRows.toSeq == merges.map(m =>
        (m.round, m.pair, m.merged, m.nOccurrences)))
      val symWeight = vocab.where($"kind" === "symbol")
        .agg(org.apache.spark.sql.functions.sum("weight")).as[Long].head()
      val totalSymbols = docs
        .selectExpr("explode(split(text, ' ')) AS t")
        .select(bpeApplyMergesNative($"t", merges.map(_.pair)).as("s"))
        .selectExpr("sum(size(s))").as[Long].head()
      assert(symWeight == totalSymbols,
        "inventory weights must sum to the corpus symbol count")
      // Parquet round trip: the read-back rules segment identically to
      // the in-call merges, and survive rank-order shuffling on read.
      val dir = TestSpark.tmpDir("bpe_vocab_rt")
      vocab.write.mode("overwrite").parquet(dir)
      val pairs = BpeTrainer.mergesFromVocab(spark.read.parquet(dir))
      assert(pairs == merges.map(_.pair),
        "read-back merge rules must come out in apply order")
      val inCall = applied("lower", merges.map(_.pair))
      assert(applied("lower", pairs) == inCall)
    } finally wf.unpersist()
  }
}
