package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup
import graft.pipeline.{CurationRun, StateLayout}

/** Pruned-state incremental LSH (the dedup front's storage-side
  * discipline): [[TextDedup.minhashLshPairsIncrementalPruned]] must
  * produce EXACTLY [[TextDedup.minhashLshPairsIncremental]]'s pairs
  * when its callbacks are backed by key-pruned state reads, and the
  * weekly cadence must keep producing identical state when history
  * predates the bands artifact or the bucketed index layout (legacy
  * doctrine: degrade, never break).
  */
class IncrementalPrunedLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NumHashes = 32
  private val Bands = 16

  private val baseText =
    "the quick brown fox jumps over the lazy dog while the calm river " +
      "flows past the old stone bridge near the quiet village green today"
  private val other =
    "seven silver swans swim slowly southward seeking summer sunshine " +
      "over green meadows where tall grass bends beneath the warm wind"

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("pruned pairs == full-scan incremental pairs (old-new and new-new)") {
    val oldDocs = docs(Seq(
      (1L, baseText),
      (2L, baseText.replace("today", "tonight")),
      (3L, other)))
    val newDocs = docs(Seq(
      (11L, baseText.replace("today", "right now")), // old-new pair
      (12L, other.replace("warm", "cold")),          // old-new pair
      (13L, other.replace("warm", "cool")),          // new-new with 12
      (14L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing else in either weekly batch")))

    val dir = TestSpark.tmpDir("pruned_lsh")
    val oldIdx = TextDedup.buildIndex(oldDocs, "doc_id", "text", n = 3, bits = 32)
    val oldSig = TextDedup.minhashSignatures(oldIdx, NumHashes)
    StateLayout.writeBucketed(oldIdx.df, s"$dir/old/index_batch", "doc_id")
    StateLayout.writeBucketed(
      TextDedup.bandFrame(oldSig, NumHashes, Bands), s"$dir/old/bands_batch", "band")

    val newIdx = TextDedup.buildIndex(newDocs, "doc_id", "text", n = 3, bits = 32)
    val newSig = TextDedup.minhashSignatures(newIdx, NumHashes)
    val newBands = TextDedup.bandFrame(newSig, NumHashes, Bands)

    val full = TextDedup.minhashLshPairsIncremental(
      TextDedup.indexFromFrame(
        StateLayout.readSlice(spark, s"$dir/old/index_batch")
          .unionByName(newIdx.df), bits = 32),
      oldSig.unionByName(newSig),
      newDocs.select(col("doc_id")), 0.25, NumHashes, Bands)
      .as[(Long, Long, Double)].collect().toSet

    val (prunedDf, prunedRel) = TextDedup.minhashLshPairsIncrementalPruned(
      newIdx, newBands,
      probe => StateLayout.readSlicesPruned(spark, Seq(s"$dir/old"),
        "bands_batch", "band", probe),
      probe => StateLayout.readSlicesPruned(spark, Seq(s"$dir/old"),
        "index_batch", "doc_id", probe),
      0.25)
    val pruned =
      try prunedDf.as[(Long, Long, Double)].collect().toSet
      finally prunedRel()

    assert(pruned === full, "pruned-state pairs diverged from full-scan pairs")
    // The fixture exercises all three quadrant kinds the incremental
    // path must cover (never old-old).
    val ids = pruned.flatMap(p => Seq(p._1, p._2))
    assert(pruned.exists(p => p._1 <= 3L && p._2 >= 11L), "no old-new pair found")
    assert(pruned.exists(p => p._1 >= 11L && p._2 >= 11L), "no new-new pair found")
    assert(!pruned.exists(p => p._1 <= 3L && p._2 <= 3L), "old-old pair leaked in")
    assert(ids.nonEmpty)
  }

  test("legacy history (no bands artifact, unbucketed index) degrades, never breaks") {
    val goodEn = baseText
    val batchA = docs(Seq(
      (1L, goodEn),
      (2L, goodEn.replace("today", "tonight")),
      (3L, other)))
    val batchB = docs(Seq(
      (11L, goodEn.replace("today", "right now")),
      (12L, other.replace("warm", "cold")),
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")))
    val benchmark = docs(Seq((100L,
      "pack my box with five dozen liquor jugs before the long winter " +
        "arrives and the mountain roads close under the heavy snow again")))

    val base = TestSpark.tmpDir("pruned_lsh_legacy")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1")
    CurationRun.runIncremental(batchB, benchmark, s"$base/out_b",
      s"$base/state_1", s"$base/state_2")
    def clusters(stateDir: String): Set[(Long, Long)] =
      spark.read.parquet(s"$stateDir/clusters").as[(Long, Long)].collect().toSet
    val modern = clusters(s"$base/state_2")

    // Rewrite state_1 as a PRE-LAYOUT lineage: no bands artifact, the
    // index slice plain unbucketed parquet (what a pre-upgrade week
    // wrote). The increment must re-derive banding from the signature
    // slice and full-scan the legacy index — same clusters.
    def rmRf(p: String): Unit = {
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val legacyIdx = StateLayout.readSlice(spark, s"$base/state_1/index_batch")
      .as[(Long, Long)].collect().toSeq
    rmRf(s"$base/state_1/index_batch")
    rmRf(s"$base/state_1/bands_batch")
    graft.sources.Sinks.overwriteParquet(
      legacyIdx.toDF("doc_id", "sh"), s"$base/state_1/index_batch", numFiles = 1)

    CurationRun.runIncremental(batchB, benchmark, s"$base/out_b2",
      s"$base/state_1", s"$base/state_3")
    assert(clusters(s"$base/state_3") === modern,
      "legacy-layout history changed the increment's cluster state")
    // And the legacy lineage upgrades at rebase: consolidated state
    // carries a bucketed bands artifact derived from the signatures.
    CurationRun.rebaseState(spark, s"$base/state_1", s"$base/state_rb")
    assert(StateLayout.bucketsOf(s"$base/state_rb/bands_batch").isDefined,
      "rebase must consolidate legacy lineages into the bucketed bands layout")
    assert(StateLayout.bucketsOf(s"$base/state_rb/index_batch").isDefined,
      "rebase must land the consolidated index bucketed by doc_id")
  }
}
