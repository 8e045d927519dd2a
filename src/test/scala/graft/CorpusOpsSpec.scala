package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, TextDedup}

/** Specs for the round-6 corpus-composition additions: cross-source
  * overlap matrix, content-defined chunk inventory, length profile. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff classifies ids and sums token deltas per source") {
    val old = Seq((1L, "a b", "A"), (2L, "c d", "A"), (3L, "e f", "B"))
      .toDF("doc_id", "text", "source")
    val nw = Seq((2L, " C D ", "A"), (3L, "e f g", "B"), (4L, "h", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextDedup.snapshotDiff(old, nw, "doc_id", "text", "source")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("A", "removed") -> ((1L, -2L)),    // doc 1 gone
      ("A", "unchanged") -> ((1L, 0L)),   // doc 2: normalization absorbs case/space
      ("B", "changed") -> ((1L, 1L)),     // doc 3: +1 token
      ("B", "added") -> ((1L, 1L))))      // doc 4
  }

  test("collocations: hand-computed PMI, support filter, rank order") {
    val corpus = (
      (0L until 6L).map(i => (i, "new york")) ++
        (6L until 10L).map(i => (i, "alpha beta"))).toDF("doc_id", "text")
    // Only "new york" clears support 5: c12=6, N=10 bigrams, U=20
    // tokens, c(new)=c(york)=6.
    val out = TextAnalysis.collocations(corpus, "doc_id", "text",
      minCount = 5L, k = 10)
      .as[(String, Long, Double, Int)].collect()
    val expected = BigDecimal(
      math.log((6.0 / 10) / ((6.0 / 20) * (6.0 / 20))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(("new york", 6L, expected, 1)))
    // Lower support keeps both; the rarer-word pair is MORE associated
    // (pmi ln(10) vs ln(20/3)) and ranks first.
    val both = TextAnalysis.collocations(corpus, "doc_id", "text",
      minCount = 2L, k = 10).as[(String, Long, Double, Int)].collect()
      .sortBy(_._4)
    assert(both.map(r => (r._1, r._4)).toSeq ==
      Seq(("alpha beta", 1), ("new york", 2)))
  }

  test("winnowFingerprints: shared-run guarantee, density bound, determinism") {
    // k=4, w=4: any shared run of >= w+k-1 = 7 tokens must share a
    // fingerprint (the winnowing guarantee).
    val run = "p q r s t u v"
    val corpus = Seq(
      (1L, s"$run x1 x2 x3"),
      (2L, s"y1 y2 $run y3"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
      .toDF("doc_id", "text")
    val out = TextDedup.winnowFingerprints(corpus, "doc_id", "text", 4, 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._2 >= 1L && out(2L)._2 >= 1L,
      "docs sharing a 7-token run must share a fingerprint")
    assert(out(3L)._2 == 0L, "unrelated doc shares nothing")
    // Density: a 10-token doc has 7 grams -> 4 full windows -> at
    // most 4 (and at least 1) selected fingerprints.
    assert(out.values.forall(v => v._1 >= 1L && v._1 <= 4L))
    assert(out == TextDedup.winnowFingerprints(corpus, "doc_id", "text", 4, 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap,
      "selection is deterministic")
    // Short docs (< w full windows) produce no fingerprint row.
    val short = Seq((9L, "a b c d e f")).toDF("doc_id", "text") // 3 grams < w
    assert(TextDedup.winnowFingerprints(short, "doc_id", "text", 4, 4).count() == 0)
  }

  test("softDedup: singletons always kept, clusters thinned to ~1 expected copy") {
    val docs = (0L until 110L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // Docs 0-99 form one 100-strong duplicate cluster; 100-109 are
    // singletons (absent from the clusters frame).
    val clusters = (0L until 100L).map(i => (i, 0L))
      .toDF("doc_id", "canonical_id")
    val out = TextDedup.softDedup(docs, clusters, "doc_id")
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.size == 110)
    assert((100L until 110L).forall(i => out(i) == ((i, 1L, 1))),
      "singletons keep themselves with probability 1")
    val clusterKept = (0L until 100L).count(i => out(i)._3 == 1)
    assert((0L until 100L).forall(i => out(i)._1 == 0L && out(i)._2 == 100L))
    assert(clusterKept >= 0 && clusterKept <= 6,
      s"~1 expected copy from a 100-cluster, got $clusterKept")
    assert(out == TextDedup.softDedup(docs, clusters, "doc_id")
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap,
      "the draw is deterministic")
  }

  test("vocabGrowth: checkpoint counts on a hand-built corpus") {
    val corpus = Seq((0L, "a b"), (1L, "a c"), (2L, "a b c d"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(corpus, "doc_id", "text", steps = 2)
      .orderBy("pct_step")
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, 1L, 2L, 4L, 3L, 0.75), // docs 0-1: 4 tokens, vocab {a,b,c}
      (2, 3L, 4L, 9L, 4L, BigDecimal(4.0 / 9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("crossSourceOverlap counts shared normalized hashes per source pair") {
    val docs = Seq(
      (0L, "alpha beta", "A"),
      (1L, "gamma delta", "A"),
      (2L, "  GAMMA DELTA ", "B"), // normalizes equal to doc 1
      (3L, "epsilon zeta", "B"),
      (4L, "unrelated words", "C"))
      .toDF("doc_id", "text", "source")
    val out = TextDedup.crossSourceOverlap(docs, "doc_id", "text", "source")
      .select("source_a", "source_b", "n_shared", "n_a", "n_b", "hash_jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("A", "B", 1L, 2L, 2L, 0.333333)),
      "only the A-B pair shares a hash; C pairs are absent entirely")
  }

  test("crossSourceOverlap shingle mode counts shared distinct k-grams") {
    val docs = Seq(
      (0L, "a b c d", "X"), // shingles: "a b c", "b c d"
      (1L, "b c d e", "Y"), // shingles: "b c d", "c d e"
      (2L, "p q r s", "Z")) // disjoint
      .toDF("doc_id", "text", "source")
    val out = TextDedup.crossSourceOverlap(docs, "doc_id", "text", "source",
      shingleK = 3)
      .select("source_a", "source_b", "n_shared", "n_a", "n_b", "hash_jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("X", "Y", 1L, 2L, 2L, 0.333333)),
      "X and Y share exactly 'b c d'; Z pairs are absent")
  }

  test("cdcChunkDups: identical docs share every chunk, disjoint docs none") {
    val words = Seq("spark", "scan", "merge", "join", "shuffle", "batch",
      "row", "key", "sort", "agg", "window", "filter", "value", "table",
      "query", "stream", "column", "part", "hash", "group")
    val text = (0 until 60).map(i => words(i % words.size) + (i % 7)).mkString(" ")
    val other = (0 until 60).map(i => "zz" + i).mkString(" ")
    val docs = Seq(
      (0L, text), (1L, text), // exact twins
      (2L, other))            // disjoint vocabulary
      .toDF("doc_id", "text")
    val out = TextDedup.cdcChunkDups(docs, "doc_id", "text", w = 4, modulus = 4)
      .select("chunk_hash", "n_docs", "n_occurrences")
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty, "twin docs must share at least one chunk")
    assert(out.forall { case (_, nd, no) => nd == 2 && no == 2 },
      "every duplicated chunk comes from exactly the twin pair")
  }

  test("cdcChunkDups boundaries are content-anchored: a prefix shift still shares chunks") {
    val words = Seq("spark", "scan", "merge", "join", "shuffle", "batch",
      "row", "key", "sort", "agg", "window", "filter", "value", "table",
      "query", "stream", "column", "part", "hash", "group")
    val tail = (0 until 80).map(i => words(i % words.size) + (i % 11)).mkString(" ")
    val docs = Seq(
      (0L, tail),
      (1L, "shifted prefix tokens " + tail)) // insertion at the front
      .toDF("doc_id", "text")
    val out = TextDedup.cdcChunkDups(docs, "doc_id", "text", w = 4, modulus = 4)
      .select("n_docs").as[Long].collect()
    assert(out.nonEmpty,
      "content-defined cuts must resynchronize after the insertion " +
        "(fixed-offset blocks would share nothing)")
  }

  test("cdcChunkDups chunk partition is exhaustive: chunk tokens sum to doc tokens") {
    // Internal consistency via the public frame: run with minDf
    // semantics disabled by duplicating the doc, then check the
    // shared-chunk token mass equals the doc's token count. Tokens are
    // all DISTINCT so no two chunks collapse to one hash row.
    val words = (0 until 40).map(i => "tok" + i).mkString(" ")
    val docs = Seq((0L, words), (1L, words)).toDF("doc_id", "text")
    val out = TextDedup.cdcChunkDups(docs, "doc_id", "text", w = 4, modulus = 4)
      .select("chunk_tokens").as[Int].collect()
    assert(out.map(_.toLong).sum == 40L,
      "twin docs' shared chunks must partition the 40-token stream exactly")
  }

  test("lengthProfile picks exact order statistics per group") {
    val docs = (1 to 10).map(n =>
      (n.toLong, (1 to n).map(i => "w" + i).mkString(" "), "g")) ++
      Seq((100L, "a b c", "h"))
    val out = TextAnalysis.lengthProfile(
      docs.toDF("doc_id", "text", "source"), "doc_id", "text", "source")
      .select("source", "n_docs", "total_tokens", "min_tokens", "max_tokens",
        "p50_tokens", "p90_tokens", "p99_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    // g: lengths 1..10 -> p50 = ceil(0.5*10)=5th smallest = 5,
    // p90 = 9th = 9, p99 = ceil(9.9)=10th = 10.
    assert(out.toSeq == Seq(
      ("g", 10L, 55L, 1L, 10L, 5L, 9L, 10L),
      ("h", 1L, 3L, 3L, 3L, 3L, 3L, 3L)))
  }
}
