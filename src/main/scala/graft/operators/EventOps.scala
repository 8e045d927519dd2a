package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational event-stream analytics over the `events` table — the
  * batch/SQL expressions of the semantics the streaming module handles
  * incrementally ([[graft.streaming.Sessionize]] is the stateful
  * streaming twin of [[sessionize]]).
  */
object EventOps {

  /** Window-function sessionization: a session breaks when the gap to
    * the previous event (per user, event-time order) exceeds `gapMs`.
    * Classic lag -> break flag -> running sum -> group. Two window
    * passes over one hash partitioning on user_id plus the final
    * aggregate — all codegen'd, no state, scales with the shuffle.
    * Tiebreak on event_id makes sessions deterministic under duplicate
    * timestamps. */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val withBreak = events
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ms").isNull, 0)
          .when(unix_millis(col("ts")) - col("prev_ms") > gapMs, 1)
          .otherwise(0))
    val withSession = withBreak
      .withColumn("session_no",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSession
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .drop("session_no")
  }
}
