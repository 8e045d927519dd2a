package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{ShingleIndex, TextAnalysis, TextDedup}

/** Shared-artifact dedup suite — what a real corpus pipeline runs
  * instead of invoking each dedup operator standalone.
  *
  * The catalog's dedup entries are independent by design (the driver
  * verifies each against its own oracle, clearing caches in between),
  * so each one rebuilds its inputs: seven entries pay for the shingle
  * scan seven times. A production pass over the same corpus builds each
  * shared artifact ONCE — the 32-bit md5 index (MinHash family), the
  * 64-bit xxhash index (exact Jaccard / containment), the signature
  * frame, and the quality frame — persists them, and derives every
  * output from the cache. [[graft.SuiteBench]] measures the difference;
  * DedupSuiteSpec pins output equality with the standalone operators.
  *
  * Lifecycle follows the [[graft.operators.TextDedup.buildIndex]]
  * contract: construction persists the four artifacts, [[close]]
  * unpersists them — nothing inside any operator caches on its own.
  */
final class DedupSuite private (
    docs: DataFrame, idCol: String, textCol: String,
    val index32: ShingleIndex, val index64: ShingleIndex,
    val signatures: DataFrame, val quality: DataFrame,
    numHashes: Int, bands: Int) extends AutoCloseable {

  /** Exact content-hash dedup groups (q20's operator). */
  def exact: DataFrame = TextDedup.exact(docs, idCol, textCol)

  /** Exact n-gram Jaccard pairs from the shared 64-bit index (q21). */
  def jaccardPairs(threshold: Double): DataFrame =
    TextDedup.ngramJaccardPairs(index64, threshold)

  /** Either-direction containment pairs from the 64-bit index (q56). */
  def containmentPairs(threshold: Double): DataFrame =
    TextDedup.containmentPairs(index64, threshold)

  /** MinHash+LSH pairs from the shared index AND signature frame (q22). */
  def lshPairs(threshold: Double): DataFrame =
    TextDedup.minhashLshPairs(index32, signatures, threshold, numHashes, bands)

  /** Signature-agreement estimate pairs from the shared signatures (q44). */
  def estimatePairs(minEstimate: Double): DataFrame =
    TextDedup.minhashEstimatePairs(signatures, minEstimate, numHashes, bands)

  /** Near-dup clusters over [[lshPairs]] (q53). */
  def clusters(threshold: Double): DataFrame =
    TextDedup.connectedComponents(lshPairs(threshold))

  /** Quality-best survivor per cluster from a clusters frame you
    * already computed — pass [[clusters]]' result so the label
    * propagation runs once, not once per consumer (q58). */
  def survivors(clusters: DataFrame): DataFrame =
    TextDedup.dedupSurvivors(clusters, quality, "quality_score")

  override def close(): Unit = {
    index32.unpersist(); index64.unpersist()
    signatures.unpersist(); quality.unpersist()
  }
}

object DedupSuite {
  /** Build and persist the shared artifacts. The caller owns the
    * lifecycle: use over as many derived outputs as needed, then
    * [[DedupSuite.close]]. */
  def apply(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      numHashes: Int = 32, bands: Int = 16): DedupSuite = {
    val i32 = TextDedup.buildIndex(docs, idCol, textCol, n, bits = 32).persist()
    val i64 = TextDedup.buildIndex(docs, idCol, textCol, n, bits = 64).persist()
    val sig = TextDedup.minhashSignatures(i32, numHashes)
    sig.persist()
    val quality = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
    quality.persist()
    new DedupSuite(docs, idCol, textCol, i32, i64, sig, quality, numHashes, bands)
  }
}
