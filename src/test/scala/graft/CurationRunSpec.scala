package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CurationRun

/** End-to-end curation run over a fixture where every stage has a
  * planted casualty: a low-quality doc (gate), a benchmark copy
  * (decontamination), a near-duplicate (dedup survivor pick) — and the
  * survivors land in both parquet outputs with consistent stats. */
class CurationRunSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodEn =
    "the quick brown fox jumps over the lazy dog while the calm river " +
      "flows past the old stone bridge near the quiet village green today"
  private val benchText =
    "pack my box with five dozen liquor jugs before the long winter " +
      "arrives and the mountain roads close under the heavy snow again"
  private val goodEs =
    "el zorro marron salta sobre el perro perezoso mientras la luna " +
      "brilla sobre el valle y la gente duerme en la aldea tranquila"

  test("each stage drops its planted casualty; outputs and stats agree") {
    val docs = Seq(
      (1L, goodEn),
      (2L, goodEn.replace("today", "tonight")), // near-dup of 1
      (3L, benchText),                          // contaminated
      (4L, "z z z z z z"),                      // scores 0.0 at the gate
      (5L, goodEs)).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = TestSpark.tmpDir("curation_run")

    val stats = CurationRun.run(docs, benchmark, out)
    assert(stats.input == 5)
    assert(stats.gated == 4, "only the low-quality doc falls at the gate")
    assert(stats.decontaminated == 3, "the benchmark copy is stripped")
    assert(stats.kept == 2, "the near-dup pair collapses to one survivor")
    assert(stats.sampled == 2, "default fraction 1.0 keeps every survivor")

    val curated = spark.read.parquet(s"$out/curated")
    assert(curated.select("doc_id").as[Long].collect().toSet == Set(1L, 5L),
      "survivor = min id on a quality tie; the unique es doc survives")
    assert(curated.columns.toSet ==
      Set("doc_id", "text", "detected_lang", "quality_score"))
    val langs = curated.select("doc_id", "detected_lang")
      .as[(Long, String)].collect().toMap
    assert(langs(1L) == "en" && langs(5L) == "es")

    // Every curated doc lands in exactly one pack bin.
    val packedIds = spark.read.parquet(s"$out/packed")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("doc_ids"), ",")))
      .as[String].collect().map(_.toLong).toSeq
    assert(packedIds.sorted == Seq(1L, 5L))
    assert(stats.bins == packedIds.length || stats.bins <= 2)

    // Idempotent: a re-run overwrites to the same state.
    val again = CurationRun.run(docs, benchmark, out)
    assert(again == stats)
  }

  test("keepSet returns a frame already materialized in the cache (no post-close recompute)") {
    // VERDICT r04 item 2: the survivors join reads the suite's quality
    // frame; a frame persisted lazily and first materialized AFTER
    // suite.close() recomputes that frame from lineage — correct but
    // forfeiting the shared-artifact amortization. keepSet's contract
    // is therefore persisted AND materialized. Pin it at runtime: new
    // cached-RDD blocks (getRDDStorageInfo) must exist the moment
    // keepSet returns, before any downstream action and before close.
    import graft.operators.TextAnalysis
    import graft.pipeline.DedupSuite
    val sc = spark.sparkContext
    val docs = Seq(
      (1L, goodEn),
      (2L, goodEn.replace("today", "tonight")),
      (5L, goodEs)).toDF("doc_id", "text")
    val decon = docs
      .join(TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select($"doc_id", $"quality_score"), "doc_id")
      .persist()
    val suite = DedupSuite(decon, "doc_id", "text", n = 3)
    try {
      // Materialize every suite artifact FIRST so the storage snapshot
      // below already contains them: the only cached blocks that can
      // appear after it are keepSet's own frame. (Without this, the
      // artifacts materializing during keepSet's clustering would mask
      // a keepSet that never materializes its result.)
      Seq(suite.index32.df, suite.index64.df,
        suite.signatures, suite.quality).foreach(_.count())
      val before = sc.getRDDStorageInfo.filter(_.numCachedPartitions > 0)
        .map(_.id).toSet
      val (kept, n) = CurationRun.keepSet(suite, decon, dedupThreshold = 0.25)
      val fresh = sc.getRDDStorageInfo
        .filter(i => i.numCachedPartitions > 0 && !before.contains(i.id))
      assert(fresh.nonEmpty,
        "keepSet must materialize its persisted frame before returning " +
          "(so suite.close() cannot force a quality-frame recompute)")
      assert(n == 2, "near-dup pair collapses; unique doc survives")
      suite.close()
      // Safe to consume after close — served from the cache built above.
      assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
      kept.unpersist()
    } finally { suite.close(); decon.unpersist() }
  }
}
