package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Specs for the document-quality gates: the Gopher rule set and the
  * CCNet-style perplexity bucketing. */
class CurationGatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules(docs: Seq[(Long, String)]) =
    TextAnalysis.gopherRules(docs.toDF("doc_id", "text"), "doc_id", "text",
        minWords = 5, maxWords = 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("gopher rules: each rule trips on its designed violation") {
    val good = (1 to 10).map(i => s"the quick brown fox $i jumps over " +
      "that lazy dog with plenty of words and fine prose here").mkString(" ")
    val out = rules(Seq(
      1L -> good,
      2L -> "too short here",                           // < 5 words
      3L -> (good + " ####### ## ### #### ## ## # # # # # # # # # # # #" +
        " # # # # # # # # # # # # # # # # # # # #"),    // symbol ratio
      4L -> Seq("- one bullet", "- two bullet", "- three bullet")
        .mkString("\n"),                                 // 100% bullet lines
      5L -> Seq("trailing dots here...", "more dots again...",
        "and a clean line").mkString("\n"),              // 2/3 ellipsis lines
      6L -> "11 22 33 44 55 66 77 88 99 00",             // no alphabetic words
      7L -> "cat dog bird fish mouse lion tiger bear"))   // no stop words
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("words_ok"))
    assert(!out(3L).getAs[Boolean]("symbol_ok"))
    assert(!out(4L).getAs[Boolean]("bullet_ok"))
    assert(out(4L).getAs[Double]("bullet_ratio") == 1.0)
    assert(!out(5L).getAs[Boolean]("ellipsis_ok"))
    assert(!out(6L).getAs[Boolean]("alpha_ok"))
    assert(out(6L).getAs[Double]("alpha_ratio") == 0.0)
    assert(!out(7L).getAs[Boolean]("stopword_ok"))
    // Violations are independent: the short doc still passes the
    // rules it doesn't violate.
    assert(out(2L).getAs[Boolean]("alpha_ok"))
    assert(out(2L).getAs[Boolean]("symbol_ok"))
  }

  test("gopher mean word length and stopword hits are exact") {
    val out = rules(Seq(1L -> "the cat sat on that mat with milk"))
    // 8 words, 3+3+3+2+4+3+4+4 = 26 chars -> 3.25
    assert(out(1L).getAs[Double]("mean_word_len") == 3.25)
    // distinct stopword hits: the, that, with = 3 (on/cat/... not in list)
    assert(out(1L).getAs[Int]("stopword_hits") == 3)
  }

  test("gopher kernel is row-equal to the declarative HOF reference") {
    // Adversarial shapes: multibyte words, a '•' bullet, tabs, runs
    // of dots (non-overlap counting), trailing newline (Spark split
    // keeps the empty line), leading/trailing spaces around bullets.
    val docs = Seq(
      1L -> "the quick brown fox jumps over that lazy dog with style",
      2L -> "zürich café naïve über señor 東京 mañana crème",
      3L -> ("• bullet one\n  - spaced dash\n* star line\nplain line\n" +
        "ends with dots...\n...."),
      4L -> "#tag ## ...... .... ... and the rest of it",
      5L -> "a\tb\tc d  e",
      6L -> "trailing newline\n",
      7L -> "",
      8L -> "   ",
      9L -> "•",
      10L -> ("the quick... brown#fox... jumps #over... the lazy dogs " +
        "with that very fine style indeed today")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    val kernel = rows(TextAnalysis.gopherRules(docs, "doc_id", "text",
      minWords = 3))
    val decl = rows(TextAnalysis.gopherRulesDeclarative(docs, "doc_id", "text",
      minWords = 3))
    assert(kernel.keySet == decl.keySet)
    kernel.keySet.foreach { id =>
      assert(kernel(id) == decl(id),
        s"doc $id: kernel ${kernel(id)} != declarative ${decl(id)}")
    }
  }

  test("gopher rules on empty/whitespace text: pass is false, never null") {
    // A 100 TB crawl contains empty documents; the gate must emit a
    // usable verdict for them (three-valued logic would leak null
    // through `pass` if words_ok were computed from a null ratio —
    // the count comparison keeps it a real boolean).
    val out = rules(Seq(1L -> "", 2L -> "   ", 3L -> "\n\n"))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Int]("n_words") == 0)
      assert(!out(id).getAs[Boolean]("words_ok"))
      assert(!out(id).isNullAt(out(id).fieldIndex("pass")),
        s"doc $id: pass must be a real boolean, not null")
      assert(!out(id).getAs[Boolean]("pass"),
        s"doc $id: empty text must FAIL the gate")
    }
  }

  test("perplexity buckets: ordered, exhaustive, deterministic") {
    // 60 fluent docs in 6 composition groups (k extra "the cat"
    // repetitions shift the mean bigram log-prob, giving 6 distinct
    // score values of 10 docs each) + 30 gibberish docs of unseen
    // words (one shared score, necessarily the lowest: every fluent
    // bigram is trained with count >= 10, every gibberish bigram is
    // unseen).
    val fluent = (0 until 60).map { i =>
      (i.toLong, "the cat sat on the mat and the dog ran" +
        " the cat" * (i % 6))
    }
    val noise = (60 until 90).map { i =>
      (i.toLong, s"zz$i qq$i jj$i xx$i ww$i vv$i kk$i pp$i")
    }
    val docs = (fluent ++ noise).toDF("doc_id", "text")
    def run() = TextAnalysis
      .perplexityBuckets(docs, docs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("avg_logprob"),
        r.getAs[String]("ppl_bucket")))
    val out = run()
    assert(out.length == 90, "every doc gets a bucket")
    assert(out.toSet == run().toSet, "bucketing is deterministic")
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").min >= byBucket("middle").max,
      "head scores at or above middle")
    assert(byBucket("middle").min >= byBucket("tail").max,
      "middle scores at or above tail")
    // Value-quantile buckets: sizes are N/3 up to tie rounding — with
    // distinct-ish scores each bucket holds at least a fifth.
    assert(byBucket.values.forall(_.length >= 18),
      s"no degenerate bucket: ${byBucket.view.mapValues(_.length).toMap}")
    // All gibberish lands in the tail (trained LM never saw its words).
    val tailIds = out.filter(_._3 == "tail").map(_._1).toSet
    assert((60L until 90L).forall(tailIds.contains))
  }

  test("perplexity buckets put all ties in one bucket") {
    // 9 identical docs + 3 distinct: the 9 share one score, and a
    // rank-based ntile would have to split them across buckets; the
    // value-quantile rule keeps them together.
    val docs = ((0 until 9).map(i => (i.toLong, "the cat sat")) ++
      Seq((9L, "dog dog dog dog"), (10L, "xx yy zz ww"), (11L, "a b a b")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(docs, docs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("ppl_bucket")))
    val dupBuckets = out.filter(_._1 < 9).map(_._2).toSet
    assert(dupBuckets.size == 1, s"tied docs split across $dupBuckets")
  }
}
