package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, TextDedup}
import graft.pipeline.DedupSuite

/** The shared-artifact suite must produce EXACTLY the standalone
  * operators' outputs — sharing the index/signature/quality frames is
  * an execution optimization, never a semantic one. */
class DedupSuiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Planted structure: 1~2 exact dups (after trim/case), 3~4 near-dups,
  // 5 unique, 6 a near-subset of 5 (containment), chain 3~4~7.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "  THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK TODAY  "),
    (3L, "pack my box with five dozen liquor jugs before the long winter arrives"),
    (4L, "pack my box with five dozen liquor jugs before the cold winter arrives"),
    (7L, "pack my box with five dozen liquor jugs after the cold winter arrives"),
    (5L, "sphinx of black quartz judge my vow while wizards jump quickly at dusk"),
    (6L, "sphinx of black quartz judge my vow")).toDF("doc_id", "text")

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("every suite output equals its standalone operator's output") {
    val suite = DedupSuite(docs, "doc_id", "text", n = 3)
    try {
      assert(rows(suite.exact) == rows(TextDedup.exact(docs, "doc_id", "text")))
      val idx64 = TextDedup.buildIndex(docs, "doc_id", "text", n = 3, bits = 64)
      assert(rows(suite.jaccardPairs(0.3)) ==
        rows(TextDedup.ngramJaccardPairs(idx64, 0.3)))
      assert(rows(suite.containmentPairs(0.3)) ==
        rows(TextDedup.containmentPairs(idx64, 0.3)))
      val idx32 = TextDedup.buildIndex(docs, "doc_id", "text", n = 3, bits = 32)
      assert(rows(suite.lshPairs(0.3)) ==
        rows(TextDedup.minhashLshPairs(idx32, 0.3, 32, 16)))
      val sig = TextDedup.minhashSignatures(idx32, 32)
      assert(rows(suite.estimatePairs(0.25)) ==
        rows(TextDedup.minhashEstimatePairs(sig, 0.25, 32, 16)))
      val standaloneClusters = TextDedup.connectedComponents(
        TextDedup.minhashLshPairs(idx32, 0.3, 32, 16))
      val suiteClusters = suite.clusters(0.3)
      assert(rows(suiteClusters) == rows(standaloneClusters))
      assert(rows(suiteClusters).nonEmpty, "the 3~4~7 chain must cluster")
      assert(rows(suite.survivors(suiteClusters)) ==
        rows(TextDedup.dedupSurvivors(standaloneClusters,
          TextAnalysis.qualityScore(docs, "doc_id", "text"), "quality_score")))
    } finally suite.close()
  }
}
