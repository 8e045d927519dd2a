package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions.bloomMightContain
import graft.functions.expr.BloomRef
import graft.operators.TextDedup

/** Streaming novelty gate — the live twin of
  * [[graft.operators.TextDedup.bloomGatedNew]]: documents arrive on a
  * stream and only those whose normalized content hash is NOT in the
  * historical corpus pass. Fully STATELESS on the stream side:
  *
  *  - the Bloom probe is a pure map-tier predicate (one referenced
  *    object shipped with the tasks), so the bloom-negative mass —
  *    for a healthy crawl, almost everything — flows through with no
  *    join, no state store, no watermark;
  *  - bloom-positives take the stream-static left_anti join against
  *    the (persisted) distinct history hashes, Spark's supported
  *    stream-static join shape — per micro-batch it probes the cached
  *    static side, no streaming state.
  *
  * Same determinism as the batch operator: the Bloom only routes,
  * every positive is exactly confirmed, result == anti-join.
  *
  * History artifacts are built ONCE per stream (batch-side), the
  * weekly-cadence shape: per-epoch fixed-capacity blooms OR-merge into
  * the serving bloom without re-reading history rows (spec-pinned in
  * BloomDedupSpec).
  */
object StreamBloomGate {

  /** Distinct history content hashes — build once, persist, reuse
    * across the stream's lifetime (caller-owned cache, the
    * [[StreamDecontaminate.benchmarkShingles]] contract). */
  def historyKeys(history: DataFrame, textCol: String): DataFrame =
    history.select(TextDedup.contentHash(col(textCol)).as("content_hash"))
      .distinct()

  /** Bloom over (materialized) history keys; capacity is the filter's
    * FIXED size so per-epoch blooms stay merge-compatible. */
  def bloomOf(histKeys: DataFrame, capacity: Long, fpp: Double = 0.01): BloomRef =
    new BloomRef(
      if (capacity <= 0L) org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else histKeys.select(xxhash64(col("content_hash")).as("h64"))
        .stat.bloomFilter("h64", capacity, fpp))

  /** Genuinely-new documents on the stream: (doc_id, content_hash),
    * one row per arriving document not present in history — identical
    * rows to the batch operator over the same data. */
  def newDocs(docs: DataFrame, bloom: BloomRef, histKeys: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("doc_id"),
        TextDedup.contentHash(col(textCol)).as("content_hash"))
      .withColumn("might", bloomMightContain(bloom, xxhash64(col("content_hash"))))
    val negatives = hashed.where(!col("might"))
      .select(col("doc_id"), col("content_hash"))
    val positives = hashed.where(col("might"))
      .join(histKeys, Seq("content_hash"), "left_anti")
      .select(col("doc_id"), col("content_hash"))
    negatives.unionAll(positives)
  }
}
