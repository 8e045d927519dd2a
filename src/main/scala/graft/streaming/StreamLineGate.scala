package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming line-boilerplate monitor — [[StreamSpanGate]]'s shape at
  * LINE granularity, the live twin of the q145 line-dedup cadence's
  * observe half: documents arrive on a stream and each is scored for
  * how many of its non-blank lines are already-known cross-document
  * boilerplate (nav bars, banners, footers) under the composed
  * line-df state.
  *
  * Same contracts as the span twin: the decision is judged against
  * STATE only (within-batch line repeats are the weekly cadence's
  * job); lines hash with the SAME 64-bit key as
  * [[graft.operators.TextDedup.lineCounts]], so `line_df_batch` state
  * slices key identically; blank lines are structure — never counted
  * in the denominator, never flagged.
  *
  * Shape: `split` + posexplode (pure map tier, raw text — line
  * structure only exists before normalization) -> stream-static LEFT
  * join against the persisted repeated-line key set -> watermark-
  * bounded per-doc windowed counts. State is the window aggregate
  * only; the static side is line-vocabulary scale.
  */
object StreamLineGate {

  /** Repeated-line key set from the composed line-df state: the union
    * of [[graft.operators.TextDedup.lineCounts]] slices along the
    * lineage (duplicate `h` rows sum — disjoint-id batches), kept
    * where the composed df reaches `minDf`. Build once per stream,
    * persist, reuse (the [[StreamBloomGate.historyKeys]] contract). */
  def repeatedStateLines(stateCounts: DataFrame, minDf: Int): DataFrame =
    stateCounts.groupBy(col("h")).agg(sum(col("n_docs")).as("df"))
      .where(col("df") >= minDf)
      .select(col("h"))

  /** Per-document boilerplate line coverage on the stream:
    * (window_start, doc_id, n_lines, n_repeated, repeated_frac), one
    * row per on-time document with at least one non-blank line.
    * `n_lines` counts non-blank lines only — blank lines are layout,
    * and counting them would dilute the fraction a gate thresholds. */
  def lineCoverage(docs: DataFrame, repeatedLines: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      delay: String, windowDur: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        col(textCol).as("__text"))
      .withWatermark("__ts", delay)
      // Explode siblings are plain attributes (NOTES finding #14).
      .select(col("doc_id"), col("__ts"),
        explode(split(col("__text"), "\n", -1)).as("line"))
      .where(col("line") =!= "")
      .select(col("doc_id"), col("__ts"), xxhash64(col("line")).as("h"))
      .join(repeatedLines.withColumn("__hit", lit(1)), Seq("h"), "left")
      .groupBy(window(col("__ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(coalesce(col("__hit"), lit(0))).as("n_repeated"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_lines"), col("n_repeated"),
        round(col("n_repeated").cast("double") / col("n_lines"), 6)
          .as("repeated_frac"))
}
