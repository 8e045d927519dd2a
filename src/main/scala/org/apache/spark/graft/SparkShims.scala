package org.apache.spark.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec

/** Two tiny accessors for `private[spark]` runtime surfaces the
  * engine's health tripwires need (this file's ONLY reason to live in
  * an `org.apache.spark` subpackage — no behavior, no state):
  *
  *   - per-partition shuffle output sizes of a materialized AQE stage
  *     (`MapOutputStatistics.bytesByPartitionId` is `private[spark]`)
  *     — the number that decides whether a partitioned window's
  *     dominant partition holds the corpus
  *     ([[graft.WindowTripwire]] skew scan, VERDICT r08 item 2);
  *   - a blocking listener-bus drain, so `graft.Bench` reads its
  *     tripwire counters only after every `QueryExecutionListener`
  *     event has been delivered (ADVICE r08: a fixed sleep races
  *     async delivery on a loaded driver and under-reports the
  *     counters that exist to catch silent deopts).
  */
object SparkShims {

  /** Per-reduce-partition byte sizes written by the shuffle under `p`,
    * when `p` is a materialized AQE shuffle stage with map stats
    * (None for 0-row shuffles, unmaterialized stages, or any other
    * node). */
  def shuffleBytesByPartition(p: SparkPlan): Option[Array[Long]] = p match {
    case s: ShuffleQueryStageExec => s.mapStats.map(_.bytesByPartitionId)
    case _ => None
  }

  /** Block until the shared listener bus (which carries the
    * `ExecutionListenerBus` that feeds `QueryExecutionListener`s) has
    * delivered every queued event, or the timeout passes. Returns
    * false on timeout/failure — callers treat that as "counters may
    * lag" and proceed. */
  def waitUntilListenerBusEmpty(spark: SparkSession,
      timeoutMillis: Long): Boolean =
    try { spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch {
      case _: InterruptedException =>
        // A shutdown interrupt during the drain must not be swallowed
        // — restore the flag so the caller's next blocking call sees
        // it and the JVM can terminate promptly.
        Thread.currentThread().interrupt(); false
      case _: Throwable => false
    }
}
