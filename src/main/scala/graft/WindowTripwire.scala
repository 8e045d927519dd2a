package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Counts corpus-scale single-partition windows (VERDICT r07 item 2) —
  * the OTHER silent deoptimizer beside codegen fallback.
  *
  * A window with no `partitionBy` plans as a `WindowExec` over a
  * single partition: Spark logs "No Partition Defined for Window
  * operation" at WARN and moves EVERY row to one task. Correct at test
  * SF; at 100 TB it is a single-task sort over the full frame (the r07
  * q108 defect shipped green through 277 tests exactly this way). The
  * log line carries no plan context, so — unlike [[CodegenTripwire]] —
  * this tripwire is a [[QueryExecutionListener]]: after every action it
  * walks the EXECUTED plan (through AQE wrappers and query stages) and
  * counts each `WindowExec` with an empty partitionSpec, unless the
  * site is sanctioned.
  *
  * Sanctioning: an unpartitioned window is legitimate exactly when its
  * input frame is BOUNDED — a distinct-value histogram
  * ([[graft.operators.Ranking.globalRank]],
  * [[graft.operators.TextAnalysis.perplexityBuckets]]), a
  * `limit(k)` survivor rank, a |shards|-row aggregate. Those sites
  * declare the bound by routing the window over a column whose name
  * carries the [[Marker]] prefix (`__bnd`): the declaration lives IN
  * the plan, so it survives optimization and needs no out-of-band
  * registry. Anything else counts — `graft.Bench` emits the counter as
  * `window_global` per round, and the strict test session fails the
  * suite on a nonzero count (WindowTripwireSpec pins both branches:
  * the raw q108 shape trips it; the histogram rewrite does not).
  */
object WindowTripwire {

  /** Column-name prefix that marks a window's input frame as bounded
    * (not corpus-scale). Rename one window-input column to
    * `__bnd_<name>` at the sanctioned site. */
  val Marker = "__bnd"

  private val count = new AtomicInteger(0)
  private val recent = new ConcurrentLinkedQueue[String]()
  private val sessions =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Unsanctioned unpartitioned-window count since install/reset. */
  def globalWindows: Int = count.get

  /** One-line plan fragments of up to 16 recent hits, for assertions
    * and the bench log. */
  def messages: Seq[String] = {
    import scala.jdk.CollectionConverters._
    recent.asScala.toSeq
  }

  def reset(): Unit = { count.set(0); recent.clear() }

  /** Register the listener on `spark` (idempotent per session). */
  def install(spark: SparkSession): Unit = sessions.synchronized {
    if (sessions.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = inspect(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = inspect(qe)
      })
  }

  private def inspect(qe: QueryExecution): Unit =
    try scan(qe.executedPlan).foreach { hit =>
      count.incrementAndGet()
      if (recent.size < 16) recent.add(hit)
    } catch { case _: Throwable => () }

  /** One-line fragments of every UNSANCTIONED unpartitioned WindowExec
    * in `p` (empty = scale-safe) — the listener's check exposed for
    * plan specs. Descends through AQE wrappers/stages and subqueries;
    * `collect` alone stops at AdaptiveSparkPlanExec leaves. */
  def scan(p: SparkPlan): Seq[String] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty && !sanctioned(w) =>
        Seq(w.simpleString(200).linesIterator.take(1).mkString)
      case _ => Seq.empty
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => p.children
    }
    self ++ children.flatMap(scan) ++ p.subqueries.flatMap(scan)
  }

  /** A site is sanctioned when any attribute its window expressions,
    * order spec, or child output reference carries the bounded marker —
    * the histogram/limit frame declares itself via column naming. */
  private def sanctioned(w: WindowExec): Boolean =
    w.expressions.exists(_.references.exists(_.name.startsWith(Marker))) ||
      w.child.output.exists(_.name.startsWith(Marker))
}
