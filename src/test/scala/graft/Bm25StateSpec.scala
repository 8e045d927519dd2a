package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextSearch
import graft.pipeline.{Bm25State, StateLayout}

/** Weekly-cadence BM25 index state (q149's machinery): serving from
  * composed per-batch postings slices must equal the from-scratch
  * [[TextSearch.bm25]] over the composed corpus BIT-FOR-BIT — tf and
  * df compose because batch doc ids are disjoint, N/avgdl because the
  * one-row stats slices sum exactly. Also pinned: the rebase is
  * output-neutral, the postings artifact lands bucketed by term, and
  * serving's pruned read actually skips buckets.
  */
class Bm25StateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docsAll = Seq(
    (1L, "vector search with a hash filter over the vector index"),
    (2L, "the quick brown fox jumps over the lazy dog near the river"),
    (3L, "hash join versus sort merge join a filter pushdown story"),
    (4L, "vector vector vector everywhere and not a hash to join"),
    (5L, "plain prose about rivers and bridges with no query words"),
    (6L, "filter early filter often the planner's vector of virtues"),
    (7L, "a late arrival mentioning hash once and nothing else"))

  private val terms = Seq("vector", "hash", "filter")

  private def collectRanked(df: org.apache.spark.sql.DataFrame) =
    df.select(col("rank"), col("doc_id"), col("score"))
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)

  test("init + two increments serve == from-scratch bm25, bit-equal") {
    val base = TestSpark.tmpDir("bm25_state")
    def batch(i: Int) =
      docsAll.filter(_._1 % 3 == i).toDF("doc_id", "text")
    Bm25State.writeInit(batch(0), "doc_id", "text", s"$base/s0")
    Bm25State.writeIncrement(batch(1), "doc_id", "text", s"$base/s0", s"$base/s1")
    Bm25State.writeIncrement(batch(2), "doc_id", "text", s"$base/s1", s"$base/s2")

    val served = collectRanked(
      Bm25State.serve(spark, s"$base/s2", terms, topK = 5))
    val scratch = collectRanked(
      TextSearch.bm25(docsAll.toDF("doc_id", "text"), "doc_id", "text",
        terms, topK = 5))
    assert(served === scratch,
      "served ranking diverged from the from-scratch corpus bm25")
    assert(served.nonEmpty && served.map(_._2).distinct.size === served.size)

    // Postings slices are term-bucketed on disk; the serve read prunes.
    assert(StateLayout.bucketsOf(s"$base/s0/postings_batch").isDefined)
    val prunedPlan = StateLayout.readSlicesPruned(spark, Seq(s"$base/s0"),
        "postings_batch", "tok", terms.toDF("tok"))
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("bucket"),
      "serving read must carry the bucket partition filter")

    // Rebase is output-neutral and re-lands the bucketed layout.
    Bm25State.rebase(spark, s"$base/s2", s"$base/rb")
    val servedRb = collectRanked(
      Bm25State.serve(spark, s"$base/rb", terms, topK = 5))
    assert(servedRb === scratch, "rebased state changed the served ranking")
    assert(StateLayout.bucketsOf(s"$base/rb/postings_batch").isDefined)
  }

  test("validateDisjoint fails fast on a re-ingested doc id") {
    val base = TestSpark.tmpDir("bm25_state_disjoint")
    Bm25State.writeInit(docsAll.take(3).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/s0")
    // A clean batch passes WITH validation on.
    Bm25State.writeIncrement(docsAll.slice(3, 5).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/s0", s"$base/s1", validateDisjoint = true)
    // A batch re-ingesting doc 2 would silently double-count its
    // tf/df/n_docs under additive composition — the opt-in check must
    // refuse BEFORE the slice lands.
    val bad = Seq((2L, "a recrawl of doc two with fresh words"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bm25State.writeIncrement(bad, "doc_id", "text",
        s"$base/s1", s"$base/s2", validateDisjoint = true)
    }
    assert(e.getMessage.contains("disjoint-id"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/s2/lineage.txt")),
      "the refused increment must not land a state version")
  }

  test("rebase consolidates the id artifact for an all-recordIds " +
      "lineage, drops it for a mixed one (fallback stays complete)") {
    def hasIds(d: String) = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$d/doc_ids_batch"))
    // All-recordIds lineage: the O(batch) probe must survive the
    // rebase (ADVICE r12 — it was silently lost before).
    val a = TestSpark.tmpDir("bm25_rebase_ids_all")
    Bm25State.writeInit(docsAll.take(3).toDF("doc_id", "text"),
      "doc_id", "text", s"$a/s0", recordIds = true)
    Bm25State.writeIncrement(docsAll.slice(3, 5).toDF("doc_id", "text"),
      "doc_id", "text", s"$a/s0", s"$a/s1", recordIds = true)
    Bm25State.rebase(spark, s"$a/s1", s"$a/rb")
    assert(hasIds(s"$a/rb"), "all-recordIds rebase must keep the artifact")
    // The consolidated slice still refuses a replay after the rebase.
    val bad = Seq((2L, "a recrawl of doc two")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bm25State.writeIncrement(bad, "doc_id", "text",
        s"$a/rb", s"$a/rb1", validateDisjoint = true)
    }
    assert(e.getMessage.contains("disjoint-id"))
    // Mixed lineage: consolidating the PARTIAL id set would hide the
    // id-less docs from the check — the rebase must drop the artifact
    // so validateDisjoint keeps the complete postings fallback.
    val m = TestSpark.tmpDir("bm25_rebase_ids_mixed")
    Bm25State.writeInit(docsAll.take(3).toDF("doc_id", "text"),
      "doc_id", "text", s"$m/s0")
    Bm25State.writeIncrement(docsAll.slice(3, 5).toDF("doc_id", "text"),
      "doc_id", "text", s"$m/s0", s"$m/s1", recordIds = true)
    Bm25State.rebase(spark, s"$m/s1", s"$m/rb")
    assert(!hasIds(s"$m/rb"), "mixed-lineage rebase must not land a " +
      "partial id artifact")
    // The fallback still catches a replay of a doc from the ID-LESS
    // init batch after the rebase.
    val badOld = Seq((1L, "replay of an id-less doc")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Bm25State.writeIncrement(badOld, "doc_id", "text",
        s"$m/rb", s"$m/rb1", validateDisjoint = true)
    }
    assert(e2.getMessage.contains("disjoint-id"))
  }

  test("a term absent from some batches still scores with composed df") {
    val base = TestSpark.tmpDir("bm25_state_absent")
    // 'hash' appears only in batches 0 and 1; 'filter' only in 0 and 2.
    Bm25State.writeInit(
      docsAll.take(3).toDF("doc_id", "text"), "doc_id", "text", s"$base/s0")
    Bm25State.writeIncrement(
      docsAll.slice(3, 5).toDF("doc_id", "text"), "doc_id", "text",
      s"$base/s0", s"$base/s1")
    Bm25State.writeIncrement(
      docsAll.drop(5).toDF("doc_id", "text"), "doc_id", "text",
      s"$base/s1", s"$base/s2")
    val served = collectRanked(
      Bm25State.serve(spark, s"$base/s2", Seq("hash", "rivers"), topK = 7))
    val scratch = collectRanked(
      TextSearch.bm25(docsAll.toDF("doc_id", "text"), "doc_id", "text",
        Seq("hash", "rivers"), topK = 7))
    assert(served === scratch)
  }
}
