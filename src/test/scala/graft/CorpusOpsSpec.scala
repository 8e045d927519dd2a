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
