package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Weekly n-gram LM count state (q150's machinery): serving from
  * composed per-batch count slices must equal the from-scratch
  * [[TextAnalysis.ngramLmScore]] over the composed corpus BIT-FOR-BIT
  * — gram/history counts compose because n-grams never span documents,
  * and the running vocabulary (the non-additive statistic) must equal
  * the from-scratch distinct-history count at EVERY version. Also
  * pinned: rebase neutrality, the unseen-gram smoothing path, and
  * bucket pruning on the serving reads. */
class LmStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docsAll = Seq(
    (1L, "the cat sat on the mat and the cat slept"),
    (2L, "a dog chased the cat across the yard all day"),
    (3L, "the mat was red and the yard was green"),
    (4L, "cats and dogs live together in the red house"),
    (5L, "the quick brown fox jumps over the lazy dog"),
    (6L, "a house of cards falls when the wind blows"),
    (7L, "the wind in the yard chased a red leaf"))

  private def batch(i: Int) =
    docsAll.filter(_._1 % 3 == i).toDF("doc_id", "text")

  private def scoreSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("n_bigrams"), col("avg_logprob"))
      .as[(Long, Long, Double)].collect().toSet

  test("init + two increments: serve == from-scratch scoring, every version") {
    val base = TestSpark.tmpDir("lm_state")
    LmState.writeInit(batch(0), "text", s"$base/s0")
    LmState.writeIncrement(batch(1), "text", s"$base/s0", s"$base/s1")
    LmState.writeIncrement(batch(2), "text", s"$base/s1", s"$base/s2")
    val queries = docsAll.take(4).toDF("doc_id", "text")
    // Every version must equal the batch operator over ITS composed
    // corpus — exact scores, not just ranks (the vocabulary literal
    // and the composed counts both participate in every log-prob).
    val corpora = Seq(
      s"$base/s0" -> batch(0),
      s"$base/s1" -> batch(0).unionByName(batch(1)),
      s"$base/s2" -> batch(0).unionByName(batch(1)).unionByName(batch(2)))
    for ((dir, corpus) <- corpora) {
      val got = scoreSet(LmState.serve(spark, dir, queries, "doc_id", "text"))
      val want = scoreSet(
        TextAnalysis.ngramLmScore(corpus, queries, "doc_id", "text"))
      assert(got == want, s"serve($dir) must equal batch scoring")
    }
  }

  test("running vocabulary equals the from-scratch distinct-history count") {
    val base = TestSpark.tmpDir("lm_state_vocab")
    LmState.writeInit(batch(0), "text", s"$base/s0")
    LmState.writeIncrement(batch(1), "text", s"$base/s0", s"$base/s1")
    LmState.writeIncrement(batch(2), "text", s"$base/s1", s"$base/s2")
    import graft.functions.TextFunctions.tokens
    def scratchV(corpus: org.apache.spark.sql.DataFrame): Long =
      corpus.select(explode(tokens(col("text"))).as("w"))
        .agg(countDistinct(col("w"))).as[Long].head()
    def storedV(dir: String): Long =
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/vocab.txt")).trim.toLong
    assert(storedV(s"$base/s0") == scratchV(batch(0)))
    assert(storedV(s"$base/s1") ==
      scratchV(batch(0).unionByName(batch(1))))
    assert(storedV(s"$base/s2") ==
      scratchV(batch(0).unionByName(batch(1)).unionByName(batch(2))))
  }

  test("rebase is output-neutral and consolidates the lineage") {
    val base = TestSpark.tmpDir("lm_state_rebase")
    LmState.writeInit(batch(0), "text", s"$base/s0")
    LmState.writeIncrement(batch(1), "text", s"$base/s0", s"$base/s1")
    LmState.rebase(spark, s"$base/s1", s"$base/r")
    assert(StateLayout.readLineage(s"$base/r") == Seq(s"$base/r"))
    val queries = docsAll.toDF("doc_id", "text")
    assert(
      scoreSet(LmState.serve(spark, s"$base/r", queries, "doc_id", "text")) ==
      scoreSet(LmState.serve(spark, s"$base/s1", queries, "doc_id", "text")),
      "rebased state must serve identical scores")
    // A post-rebase increment composes against the consolidated slice.
    LmState.writeIncrement(batch(2), "text", s"$base/r", s"$base/r1")
    assert(
      scoreSet(LmState.serve(spark, s"$base/r1", queries, "doc_id", "text")) ==
      scoreSet(TextAnalysis.ngramLmScore(docsAll.toDF("doc_id", "text"),
        queries, "doc_id", "text")),
      "increment on a rebased lineage must equal from-scratch scoring")
  }

  test("unseen grams in the query fall to add-one smoothing, like batch") {
    val base = TestSpark.tmpDir("lm_state_unseen")
    LmState.writeInit(batch(0), "text", s"$base/s0")
    LmState.writeIncrement(batch(1), "text", s"$base/s0", s"$base/s1")
    // Grams of this query exist nowhere in the state (novel words):
    // the scoring path must take the left-join + add-one branch.
    val queries = Seq((99L, "zebras gallop beneath violet auroras tonight"))
      .toDF("doc_id", "text")
    val corpus = batch(0).unionByName(batch(1))
    assert(
      scoreSet(LmState.serve(spark, s"$base/s1", queries, "doc_id", "text")) ==
      scoreSet(TextAnalysis.ngramLmScore(corpus, queries, "doc_id", "text")),
      "fully-unseen query must score identically to the batch operator")
  }

  test("validateDisjoint refuses a re-ingested doc id, state unchanged") {
    val base = TestSpark.tmpDir("lm_state_disjoint")
    LmState.writeInit(batch(0), "text", s"$base/s0", recordIds = true)
    LmState.writeIncrement(batch(1), "text", s"$base/s0", s"$base/s1",
      recordIds = true)
    // Re-ingest a doc id already in the composed state: the opt-in
    // probe must fail BEFORE any slice lands (the double-count would
    // otherwise be silent — counts are additive with no key overlap
    // anywhere to conflict).
    val dupId = docsAll.filter(_._1 % 3 == 0).head._1
    val bad = Seq((dupId, "entirely fresh words either way")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      LmState.writeIncrement(bad, "text", s"$base/s1", s"$base/s2",
        validateDisjoint = true)
    }
    assert(e.getMessage.contains("disjoint-id contract"))
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/s2/bg_counts_batch")) &&
      !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/s2/lineage.txt")),
      "refused increment must land nothing")
    // Disjoint ids under the same flag pass, and the id artifact
    // survives a rebase (the consolidated slice stays checkable).
    LmState.writeIncrement(batch(2), "text", s"$base/s1", s"$base/s2",
      validateDisjoint = true, recordIds = true)
    LmState.rebase(spark, s"$base/s2", s"$base/r")
    val e2 = intercept[IllegalArgumentException] {
      LmState.writeIncrement(bad, "text", s"$base/r", s"$base/r1",
        validateDisjoint = true)
    }
    assert(e2.getMessage.contains("disjoint-id contract"))
  }

  test("recordIds default-off: no id artifact lands, the lineage is " +
      "honestly unvalidatable, and a null-casting id fails loudly") {
    val base = TestSpark.tmpDir("lm_state_noids")
    LmState.writeInit(batch(0), "text", s"$base/s0")
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/s0/doc_ids_batch")),
      "default ingest must not pay the id-artifact job (the r12 q150 " +
        "per-version floor)")
    // An id-less lineage is UNVALIDATABLE by contract: the probe skips
    // dirs with nothing recorded, so even a true re-ingest passes —
    // the documented semantics, pinned so a future change that turns
    // this into a silent corpus scan (or a spurious refusal) is caught.
    val dup = docsAll.take(1).toDF("doc_id", "text")
    LmState.writeIncrement(dup, "text", s"$base/s0", s"$base/s1",
      validateDisjoint = true)
    // With recording ON, an id that casts to null (here: a null id)
    // must fail the WRITE loudly instead of landing a null row the
    // probe could never join against (ADVICE r12).
    val nullId = Seq((Option.empty[Long], "null id doc"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      LmState.writeInit(nullId, "text", s"$base/n0", recordIds = true)
    }
    assert(e.getMessage != null)
  }

  test("serving reads prune to the query's buckets") {
    val base = TestSpark.tmpDir("lm_state_prune")
    LmState.writeInit(docsAll.toDF("doc_id", "text"), "text", s"$base/s0")
    val queries = Seq((1L, "the cat")).toDF("doc_id", "text")
    // Pin the underlying pruned reads directly (the AQE-wrapped serve
    // plan hides scan nodes from collect; the StateLayoutSpec string
    // pin is the established form): each count artifact's read under
    // the query's keys must carry a static bucket partition filter.
    import graft.functions.TextFunctions.tokens
    val lineage = StateLayout.readLineage(s"$base/s0")
    val bgKeys = Seq("the cat", "cat sat").toDF("bg")
    val wKeys = queries.select(explode(tokens(col("text"))).as("w"))
    for ((name, key, keys) <- Seq(
        ("bg_counts_batch", "bg", bgKeys),
        ("prefix_counts_batch", "w", wKeys))) {
      val plan = StateLayout.readSlicesPruned(spark, lineage, name, key, keys)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket#"),
        s"$name read must prune partitions, not filter rows:\n$plan")
    }
  }
}
