package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, TextDedup}

/** FilterExec-inlining audit (NOTES finding #11, VERDICT r03 item 6):
  * predicate pushdown substitutes a derived column's defining
  * expression into FilterExec, which does NO subexpression
  * elimination — a derived column that is a tree referencing an
  * expensive subexpression more than once multiplies that cost per
  * branch under a caller's filter (the q48 17x). The rule: every
  * derived column a caller plausibly filters or joins on must be ONE
  * cheap-to-inline kernel call. These pins count kernel applications
  * in the executed plan under a pushed-down filter — a regression to
  * a multiplied tree fails the bound.
  */
class FilterInlineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the fox jumped over the fence and ran away fast"),
    (2L, "la casa es grande y el perro ladra mucho hoy"),
    (3L, "one two three one two three one two three"))
    .toDF("doc_id", "text")

  /** Count applications `name(` in the executed plan (column refs
    * print as `name#id`, so the paren isolates function application). */
  private def kernelCount(df: DataFrame, name: String): Int =
    s"\\Q$name(\\E".r.findAllIn(df.queryExecution.executedPlan.toString).length

  /** Same count restricted to Filter nodes — what FilterExec will
    * actually evaluate per row (plan strings also display kernels
    * inside cached-relation builds that execution reads from cache,
    * so whole-plan counts overstate). */
  private def filterCount(df: DataFrame, name: String): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Filter"))
      .map(l => s"\\Q$name(\\E".r.findAllIn(l).length)
      .sum

  test("filter on detected_lang inlines one marker_argmax, not a count CASE chain") {
    val filtered = TextAnalysis.languageId(docs, "doc_id", "text")
      .where(col("detected_lang") === "en")
    // One application in the pushed filter + one in the project.
    assert(kernelCount(filtered, "marker_argmax") <= 2,
      "detected_lang filter must stay a single kernel per site")
    assert(filtered.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("filter on quality_score inlines one quality_score kernel") {
    val filtered = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .where(col("quality_score") >= 0.2)
    assert(kernelCount(filtered, "quality_score") <= 2)
    assert(filtered.count() >= 1)
  }

  test("filter on repetition_ratio inlines one kernel (one tokenization per site)") {
    val filtered = TextAnalysis.repetition(docs, "doc_id", "text")
      .where(col("repetition_ratio") > 0.5)
    assert(kernelCount(filtered, "repetition_ratio") <= 2,
      "ratio must be a single kernel, not a distinct/total tree")
    // The filter site must not drag a second tokenization along: the
    // plan carries at most one split per site (filter + project).
    assert(kernelCount(filtered, "split") <= 4)
    assert(filtered.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("filter on est_jaccard does not re-derive the permutation family") {
    val idx = TextDedup.buildIndex(docs, "doc_id", "text", n = 3, bits = 32)
    val sig = TextDedup.minhashSignatures(idx, 32).persist()
    try {
      val pairs = TextDedup.minhashEstimatePairs(sig, minEstimate = 0.5,
        numHashes = 32, bands = 16)
      // With the signature frame persisted (the operator's documented
      // contract — q44 does exactly this), the est_jaccard filter
      // compares materialized m-cols: no FilterExec may contain a
      // minhash_perm application (the whole-plan count only displays
      // the cached build, which execution reads from cache).
      assert(filterCount(pairs, "minhash_perm") == 0,
        "est_jaccard filter must not re-derive minhash_perm trees")
      assert(pairs.columns.contains("est_jaccard"))
    } finally sig.unpersist()
  }

  test("filter on rrf_score stays above the top-k aggregate (no pushdown through)") {
    import graft.operators.TextSearch
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val fused = TextSearch.rrfFuse(a, b, topK = 3).where(col("rrf_score") > 0.02)
    // rrf_score is born from posexplode of the bounded top-k aggregate;
    // the filter cannot (and must not) be substituted below it.
    assert(kernelCount(fused, "top_k_by_score") <= 2)
    assert(fused.count() >= 1)
  }
}
