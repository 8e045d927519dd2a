package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state (Structured Streaming
  * surface beyond the reference's batch cadence).
  *
  * A stream-stream equi-join without time bounds would buffer both
  * streams forever; the interval condition plus watermarks lets Spark
  * evict state once the watermark passes each row's join window — the
  * bounded-state discipline that makes the join viable on unbounded
  * input.
  */
object StreamJoin {

  /** Inner join of two event streams on a key, constrained to rows
    * whose event times lie within `withinMs` of each other. Both inputs
    * must already carry watermarks. Output: one row per qualifying
    * (left, right) pair with both timestamps.
    *
    * Columns expected: `key`, `ts`, `value` on both sides (rename
    * upstream); output aliases left_/right_.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, withinMs: Long): DataFrame = {
    val l = left.select(
      col("key").as("l_key"), col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.select(
      col("key").as("r_key"), col("ts").as("r_ts"), col("value").as("r_value"))
    // Millisecond-unit interval: an integer `withinMs / 1000` SECONDS
    // bound would truncate sub-second widths (500 ms -> INTERVAL 0).
    val width = expr(s"INTERVAL $withinMs MILLISECOND")
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - width &&
        col("r_ts") <= col("l_ts") + width)
  }
}
