package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Substring-level exact dedup (VERDICT r04 item 2): planted shared
  * substrings must surface as maximal spans with exact offsets; the
  * signals it must NOT fire on (intra-doc repeats, sub-k overlaps)
  * stay silent. */
class RepeatedSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame, k: Int,
      minDf: Int = 2): Set[(Long, Long, Long, Long)] =
    TextDedup.repeatedSpans(docs, "doc_id", "text", k, minDf)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("planted boilerplate surfaces as one maximal span per document") {
    val boiler = "all rights reserved contact the site administrator for details"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa wholly different tail text"),
      (3L, "nothing shared here at all just unique words forever onward"))
      .toDF("doc_id", "text")
    // boiler = 9 tokens -> with k=8, doc 1 has it at pos 3..11 (two
    // windows 3,4 merge to one span), doc 2 at pos 0..8.
    assert(spans(docs, k = 8) == Set(
      (1L, 3L, 4L, 9L), (2L, 0L, 1L, 9L)))
  }

  test("intra-document repetition alone does not fire (df is distinct docs)") {
    val eight = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$eight filler $eight"), // twice in the SAME doc only
      (2L, "totally different words that never repeat anywhere else now"))
      .toDF("doc_id", "text")
    assert(spans(docs, k = 8).isEmpty)
  }

  test("two shared regions in one document yield two disjoint spans") {
    val a = "alpha bravo charlie delta echo foxtrot golf hotel"
    val b = "india juliet kilo lima mike november oscar papa"
    val docs = Seq(
      (1L, s"$a unique middle words here $b"),
      (2L, s"$a completely other interior content"),
      (3L, s"prefix words then $b")).toDF("doc_id", "text")
    val got = spans(docs, k = 8)
    // doc 1: a at pos 0 (1 window), b at pos 12 (1 window) — disjoint.
    assert(got.contains((1L, 0L, 0L, 8L)) && got.contains((1L, 12L, 12L, 8L)))
    assert(got.contains((2L, 0L, 0L, 8L)) && got.contains((3L, 3L, 3L, 8L)))
    assert(got.size == 4)
  }

  test("removeRepeatedSpans cuts exactly the span ranges and keeps the rest") {
    val boiler = "all rights reserved contact the site administrator for details"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa wholly different tail text"),
      (3L, "nothing shared here at all just unique words forever onward"))
      .toDF("doc_id", "text")
    val got = TextDedup.removeRepeatedSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("alpha beta gamma delta epsilon", 9L)))
    assert(got(2L) == (("zeta eta theta iota kappa wholly different tail text", 9L)))
    assert(got(3L) == (("nothing shared here at all just unique words forever onward", 0L)))
  }

  test("a fully-duplicated document empties but stays in the output") {
    val phrase = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, phrase),
      (2L, phrase),
      (3L, s"prefix words before $phrase and suffix words after"))
      .toDF("doc_id", "text")
    val got = TextDedup.removeRepeatedSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("", 10L)) && got(2L) == (("", 10L)),
      "both copies of the fully-shared doc must empty but remain present")
    assert(got(3L) == (("prefix words before and suffix words after", 10L)))
  }

  test("minDf floor: a 3-doc phrase survives minDf=3, a 2-doc one does not") {
    val phrase = "the quick brown fox jumps over the lazy dog again"
    val pair = "peter piper picked a peck of pickled peppers today yes"
    val docs = Seq(
      (1L, phrase), (2L, phrase), (3L, phrase),
      (4L, pair), (5L, pair)).toDF("doc_id", "text")
    val got = spans(docs, k = 8, minDf = 3)
    assert(got.map(_._1) == Set(1L, 2L, 3L),
      "only the 3-doc phrase clears the floor")
  }

  test("removeRepeatedLines cuts cross-doc lines, keeps blanks and df-1 lines") {
    val footer = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"unique opening line\n$footer\nunique closing line"),
      (2L, s"$footer\n\nanother original line here"), // blank line survives
      (3L, "wholly original document on one single line"),
      (4L, footer)) // fully-boilerplate doc empties but stays
      .toDF("doc_id", "text")
    val got = TextDedup.removeRepeatedLines(docs, "doc_id", "text", minDf = 2)
      .as[(Long, String, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got(1L) == (("unique opening line\nunique closing line", 1L)))
    assert(got(2L) == (("\nanother original line here", 1L)))
    assert(got(3L) == (("wholly original document on one single line", 0L)))
    assert(got(4L) == (("", 1L)))
  }

  test("removeRepeatedLines minDf floor and intra-doc repeats count once") {
    val line = "terms and conditions apply"
    val docs = Seq(
      (1L, s"$line\n$line\nkeep this"), // twice in ONE doc: df = 1
      (2L, "nothing shared"),
      (3L, s"shared across three\nx"),
      (4L, s"shared across three\ny"),
      (5L, s"shared across three\nz"))
      .toDF("doc_id", "text")
    val at3 = TextDedup.removeRepeatedLines(docs, "doc_id", "text", minDf = 3)
      .as[(Long, String, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    // df-1 intra-doc repeats survive; the df-3 line is cut everywhere.
    assert(at3(1L) == ((s"$line\n$line\nkeep this", 0L)))
    assert(at3(3L) == (("x", 1L)) && at3(4L) == (("y", 1L)) &&
      at3(5L) == (("z", 1L)))
  }

  test("incremental line dedup == from-scratch over the composed corpus, on the batch") {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum => fsum}
    val footer = "subscribe to our newsletter"
    val hist = Seq(
      (2L, s"history original one\n$footer"),
      (4L, "other history line\nsomething else entirely")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"batch original line\n$footer"), // cross-half repeat: cut
      (3L, "shared within batch\nunique three"),
      (5L, "other history line\nbatch tail words"), // cross-half repeat: cut
      (7L, "shared within batch\nunique seven")) // within-batch df 2: cut
      .toDF("doc_id", "text")
    val counts = TextDedup.lineCounts(hist, "doc_id", "text")
    val (cleaned, slice, rel) = TextDedup.removeRepeatedLinesIncremental(
      batch, "doc_id", "text", minDf = 2, historyCounts = counts)
    val inc = cleaned.as[(Long, String, Long)].collect().toSet
    // From-scratch over history ∪ batch, restricted to the batch half.
    val scratch = TextDedup.removeRepeatedLines(
      hist.unionByName(batch), "doc_id", "text", minDf = 2)
      .where(pmod(col("doc_id"), lit(2)) === 1)
      .as[(Long, String, Long)].collect().toSet
    assert(inc == scratch, "inc must equal scratch on the batch docs")
    assert(inc.contains((1L, "batch original line", 1L)) &&
      inc.contains((5L, "batch tail words", 1L)) &&
      inc.contains((3L, "unique three", 1L)) &&
      inc.contains((7L, "unique seven", 1L)))
    // Slice counts ADD: history slice + batch slice == composed counts.
    val composed = TextDedup.lineCounts(
      hist.unionByName(batch), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val summed = counts.unionAll(slice).groupBy(col("h"))
      .agg(fsum(col("n_docs")).as("n_docs"))
      .as[(Long, Long)].collect().toMap
    assert(summed == composed, "disjoint-id slices must sum to the composed df")
    rel()
  }

  test("benchmark span strip removes exactly the overlapping region, keeps the doc") {
    import org.apache.spark.sql.functions.col
    val leak = "question four what is the capital of freedonia"
    val corpus = Seq(
      (1L, s"intro words here $leak outro words trail"),
      (2L, "totally clean document with no benchmark overlap at all"),
      (3L, leak)) // fully-contaminated doc -> empty but PRESENT
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, s"$leak answer key")).toDF("doc_id", "text")
    val out = TextDedup.removeContaminatedSpans(
      corpus, benchmark, "doc_id", "text", k = 3)
      .orderBy(col("doc_id"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out(0) == ((1L, "intro words here outro words trail", 8L)))
    assert(out(1) == ((2L, "totally clean document with no benchmark overlap at all", 0L)))
    assert(out(2) == ((3L, "", 8L)))
  }
}
