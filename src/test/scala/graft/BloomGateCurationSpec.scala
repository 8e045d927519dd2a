package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CurationRun

/** The exact-recrawl Bloom gate in the weekly cadence: with
  * `exactGate = true`, an incremental batch containing verbatim copies
  * of history documents lands the SAME curated corpus as both the
  * ungated incremental and the from-scratch run (the gate drops
  * exactly the docs survivor selection would drop, given monotonic
  * ingest ids) — while the gated docs never reach the state's
  * index/signature slices (the cost the gate exists to avoid). */
class BloomGateCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodEn =
    "the quick brown fox jumps over the lazy dog while the calm river " +
      "flows past the old stone bridge near the quiet village green today"
  private val freshA =
    "seven silver swans swim slowly southward seeking summer sunshine " +
      "over green meadows where tall grass bends beneath the warm wind"
  private val benchText =
    "pack my box with five dozen liquor jugs before the long winter " +
      "arrives and the mountain roads close under the heavy snow again"

  test("gated incremental == ungated incremental == from-scratch; gated docs skip the dedup front") {
    val batchA = Seq(
      (1L, goodEn),
      (2L, goodEs),
      (3L, freshA)).toDF("doc_id", "text")
    val batchB = Seq(
      (11L, goodEn),                              // exact recrawl of 1 -> gated
      (12L, "  " + freshA.toUpperCase + "  "),    // normalization recrawl of 3 -> gated
      (13L, goodEn.replace("today", "tonight")),  // NEAR-dup of 1: must still take the LSH path
      (14L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")

    val base = TestSpark.tmpDir("bloom_curation")
    CurationRun.runInit(batchA.unionByName(batchB), benchmark,
      s"$base/out_scratch", s"$base/state_scratch")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1")
    CurationRun.runIncremental(batchB, benchmark, s"$base/out_ng",
      s"$base/state_1", s"$base/state_ng")
    CurationRun.runIncremental(batchB, benchmark, s"$base/out_g",
      s"$base/state_1", s"$base/state_g", exactGate = true)

    def curated(dir: String): Set[(Long, String)] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id", "text").as[(Long, String)].collect().toSet

    assert(curated(s"$base/out_g") == curated(s"$base/out_ng"),
      "exact gate changed the curated corpus vs the ungated incremental")
    assert(curated(s"$base/out_g") == curated(s"$base/out_scratch"),
      "exact gate changed the curated corpus vs the from-scratch run")

    // The gate actually PRUNED the dedup front: the recrawled docs
    // contribute no index/signature rows in the gated state slice...
    def sliceIds(stateDir: String, artifact: String): Set[Long] =
      spark.read.parquet(s"$stateDir/$artifact")
        .select("doc_id").as[Long].collect().toSet
    assert(sliceIds(s"$base/state_g", "index_batch") == Set(13L, 14L))
    assert(sliceIds(s"$base/state_g", "signatures_batch") == Set(13L, 14L))
    // ...while the ungated slice pays for all four batch docs.
    assert(sliceIds(s"$base/state_ng", "index_batch") == Set(11L, 12L, 13L, 14L))
    // The near-dup still went through LSH and merged with its twin.
    val clusters = spark.read.parquet(s"$base/state_g/clusters")
      .as[(Long, Long)].collect().toMap
    assert(clusters(13L) == clusters(1L))
  }

  private val goodEs =
    "el zorro marron salta sobre el perro perezoso mientras la luna " +
      "brilla sobre el valle y la gente duerme en la aldea tranquila"
}
