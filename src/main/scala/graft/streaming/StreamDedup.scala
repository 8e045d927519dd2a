package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the unbounded-input twin of
  * [[graft.operators.TextDedup.exact]].
  *
  * `dropDuplicatesWithinWatermark` keeps state only until the watermark
  * passes each key's event time + delay, so dedup state is bounded by
  * the watermark horizon instead of growing with the stream — the only
  * viable exact-dedup contract on an unbounded source. Records whose
  * duplicates can straddle more than the watermark delay need the
  * batch operator over the landed table instead.
  */
object StreamDedup {

  /** Dedup a stream by content hash of `textCol` (normalized), keeping
    * the first arrival. The watermark that bounds the dedup state is
    * applied HERE, on `eventTimeCol` with `delay` (e.g. "10 minutes") —
    * the operator owns its state contract instead of silently relying
    * on a caller-applied watermark. */
  def byContentHash(stream: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .withColumn("content_hash", md5(lower(trim(col(textCol)))))
      .dropDuplicatesWithinWatermark("content_hash")
}
