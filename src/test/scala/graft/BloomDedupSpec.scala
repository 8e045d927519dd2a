package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchFunctions.bloomMightContain
import graft.functions.expr.BloomRef
import graft.operators.TextDedup

/** Specs for the Bloom-gated incremental dedup (q91): result equality
  * with the plain anti-join it accelerates, the no-false-negative
  * guarantee that makes the bloom-negative bypass sound, actual
  * pruning by the prefilter, and the null/empty edges.
  */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    // history ids 1-6; batch ids 100+. Collisions designed:
    //  - exact dup (100 vs 1), normalization dup (101 vs 2: case+trim),
    //  - in-batch dup pair (103, 104) that is NOT in history (both kept),
    //  - empty string present in both (105 dropped),
    //  - multibyte (106 new; 107 dup of 5).
    val history = Seq(
      (1L, "alpha beta gamma"),
      (2L, "Quick Brown Fox"),
      (3L, "delta"),
      (4L, "epsilon zeta"),
      (5L, "héllo wörld"),
      (6L, "")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "alpha beta gamma"),
      (101L, "  quick brown fox  "),
      (102L, "totally new content"),
      (103L, "batch-only duplicate"),
      (104L, "batch-only duplicate"),
      (105L, ""),
      (106L, "héllo wörld extended"),
      (107L, "héllo wörld")).toDF("doc_id", "text")
    (history, batch)
  }

  test("bloomGatedNew equals the plain anti-join on the adversarial fixture") {
    val (history, batch) = fixture
    val got = TextDedup.bloomGatedNew(history, batch, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val expected = batch
      .select(col("doc_id"), TextDedup.contentHash(col("text")).as("content_hash"))
      .join(history.select(TextDedup.contentHash(col("text")).as("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")
      .orderBy("doc_id").select("doc_id", "content_hash")
      .as[(Long, String)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1) == Seq(102L, 103L, 104L, 106L))
  }

  test("bloom has no false negatives; prefilter prunes fresh keys") {
    val n = 5000
    val history = (0 until n).map(i => (i.toLong, s"history document number $i"))
      .toDF("doc_id", "text")
    val histH64 = history
      .select(xxhash64(TextDedup.contentHash(col("text"))).as("h64"))
    val bloom = new BloomRef(histH64.stat.bloomFilter("h64", n.toLong, 0.01))

    // Every member key MUST probe true (bloom-negative bypass soundness).
    val members = histH64.select(bloomMightContain(bloom, col("h64")).as("m"))
      .where(!col("m")).count()
    assert(members == 0L, "a member key probed false: false negative")

    // Fresh keys probe true at ~fpp — well under 5% at fpp=1%.
    val fresh = (0 until n).map(i => (i.toLong, s"fresh document number $i"))
      .toDF("doc_id", "text")
      .select(xxhash64(TextDedup.contentHash(col("text"))).as("h64"))
    val falsePos = fresh.select(bloomMightContain(bloom, col("h64")).as("m"))
      .where(col("m")).count()
    assert(falsePos < n / 20, s"bloom fpp degenerate: $falsePos/$n fresh keys positive")
  }

  test("empty history keeps the whole batch; empty batch returns empty") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(TextDedup.bloomGatedNew(empty, batch, "doc_id", "text").count() == 2L)
    assert(TextDedup.bloomGatedNew(batch, empty, "doc_id", "text").count() == 0L)
  }

  test("null text is kept (NOT EXISTS semantics) with a null content hash") {
    val history = Seq((1L, Some("x")), (2L, None)).toDF("doc_id", "text")
    val batch = Seq((10L, Some("x")), (11L, None), (12L, Some("y")))
      .toDF("doc_id", "text")
    val got = TextDedup.bloomGatedNew(history, batch, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Option[String])].collect().toSeq
    assert(got.map(_._1) == Seq(11L, 12L))
    assert(got.head._2.isEmpty && got(1)._2.nonEmpty)
  }

  test("BloomRef structural equality tracks filter contents") {
    def build(keys: Seq[Long]) = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      keys.foreach(bf.putLong)
      new BloomRef(bf)
    }
    assert(build(Seq(1L, 2L, 3L)) == build(Seq(1L, 2L, 3L)))
    assert(build(Seq(1L, 2L, 3L)) != build(Seq(1L, 2L, 4L)))
  }
}
