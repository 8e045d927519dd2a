package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, wordShinglesNative}
import graft.operators.TextDedup

/** Streaming benchmark decontamination — the live twin of
  * [[graft.operators.TextDedup.contaminated]]: documents arrive on a
  * stream and are screened against a STATIC benchmark set's distinct
  * shingle hashes (stream-static inner equi-join; persist the
  * benchmark frame so each micro-batch probes the cache instead of
  * re-hashing the benchmark corpus).
  *
  * Per-doc shingles come out of the same codegen'd `WordShingles`
  * kernel as the batch index build and are DISTINCT per document by
  * construction, so no cross-batch dedup state is needed — the only
  * state is the watermark-bounded per-doc count aggregate, which emits
  * once the watermark passes the window end (same append-mode shape as
  * [[StreamLmScore]]).
  */
object StreamDecontaminate {

  /** Distinct benchmark shingle hashes — build once, persist, reuse
    * across the stream's lifetime (caller-owned cache, the
    * [[graft.operators.TextDedup.buildIndex]] contract). */
  def benchmarkShingles(benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    TextDedup.buildIndex(benchmark, idCol, textCol, n, bits = 64).df
      .select(col("sh")).distinct()

  /** Contaminated documents on the stream: (window_start, doc_id,
    * n_contaminated_shingles), one row per screened document that
    * shares at least one word n-gram with the benchmark set — same
    * counts as the batch operator for every on-time document. */
  def contaminated(docs: DataFrame, benchShingles: DataFrame,
      idCol: String, textCol: String, tsCol: String, n: Int,
      delay: String, windowDur: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        col(textCol).as("__text"))
      .withWatermark("__ts", delay)
      .select(col("doc_id"), col("__ts"),
        explode(wordShinglesNative(tokens(col("__text")), n)).as("shingle"))
      .select(col("doc_id"), col("__ts"), xxhash64(col("shingle")).as("sh"))
      .join(benchShingles, "sh")
      .groupBy(window(col("__ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_contaminated_shingles"))
}
