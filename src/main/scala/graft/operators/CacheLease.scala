package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped cache lifecycle for catalog entries that RETURN a lazy plan.
  *
  * A query function that persists a shared intermediate (a shingle
  * index, a signature frame) and returns a plan reading it several
  * times cannot `try/finally`-unpersist: the caller's action runs
  * after the function returns, and cache substitution happens at
  * action planning time — an early unpersist silently degrades the
  * entry to recomputing the intermediate once per consumer. (q58/q60
  * can use `try/finally` only because their clustering step executes
  * eagerly INSIDE the function; the frames they return no longer read
  * the index.)
  *
  * [[releaseAfterAction]] closes that gap uniformly (VERDICT r04 item
  * 4): a one-shot [[QueryExecutionListener]] watches for the first
  * completed driver action whose analyzed plan contains the returned
  * frame's plan and runs the release hook then — the cache lives
  * exactly as long as the action that needs it, and a catalog entry no
  * longer depends on the harness's `clearCache` for cleanup. Each
  * invocation of the query function builds a fresh frame and lease, so
  * repeated runs (bench reps) pair one release per action.
  */
object CacheLease {

  /** Armed-but-unfired leases, so a lease whose identity match never
    * fires (e.g. a future analyzer starts copying already-analyzed
    * subtrees) is observable and reclaimable instead of a silent
    * session-long cache leak. */
  private val pending =
    java.util.concurrent.ConcurrentHashMap.newKeySet[PendingLease]()

  private final case class PendingLease(
      session: org.apache.spark.sql.SparkSession,
      listener: QueryExecutionListener,
      release: () => Unit,
      tag: String)

  /** Number of leases armed but not yet fired — a steadily growing
    * value across a bench run means identity matching has stopped
    * working and [[releaseAll]] should run between reps. */
  def pendingCount: Int = pending.size()

  /** Cumulative count of leases that NEVER fired on their own and had
    * to be reclaimed by [[releaseAll]] (VERDICT r06 item 6). The
    * observable for the silent-leak failure mode: identity matching
    * quietly broken (an analyzer change copying already-analyzed
    * subtrees) shows up here as a number in the bench record, not as
    * an unexplained memory creep 50 queries later. */
  def reclaimedCount: Long = reclaimed.get()
  private val reclaimed = new java.util.concurrent.atomic.AtomicLong(0)

  /** Fallback cleanup hook: fire every still-pending lease's release
    * and unregister its listener. Safe to call at any quiesce point
    * (suite close, bench rep boundary); releases are unpersist calls,
    * idempotent if a racing in-flight action fires the same lease.
    * Returns how many leases were reclaimed. */
  def releaseAll(): Int = {
    var n = 0
    val tags = List.newBuilder[String]
    val it = pending.iterator()
    while (it.hasNext) {
      val p = it.next()
      if (pending.remove(p)) {
        try p.release() catch { case _: Throwable => () }
        p.session.listenerManager.unregister(p.listener)
        tags += p.tag
        n += 1
      }
    }
    if (n > 0) {
      reclaimed.addAndGet(n.toLong)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"CacheLease: reclaimed $n lease(s) whose identity match never " +
          s"fired (cumulative ${reclaimed.get()}; targets: " +
          s"${tags.result().mkString("; ")}) — if this grows across a " +
          "bench run after listener quiesce, lease matching is broken")
    }
    n
  }

  /** Wait (bounded) for in-flight listener deliveries to fire pending
    * leases, then reclaim what genuinely never matched.
    * [[QueryExecutionListener]] events dispatch asynchronously, so a
    * quiesce point that calls [[releaseAll]] IMMEDIATELY after an
    * action races healthy leases and miscounts them as leaks (observed:
    * a bench run reporting every lease reclaimed while the spec's
    * polling variant showed them all firing; with a 1 s grace a loaded
    * full-catalog run still miscounted 4 — the shared listener bus can
    * lag multiple seconds under GC pressure). The grace only costs
    * time when something is actually pending. Returns the number of
    * true leftovers reclaimed. */
  def quiesceThenReleaseAll(graceMs: Long = 5000L): Int = {
    val deadline = System.nanoTime() + graceMs * 1000000L
    while (pending.size() > 0 && System.nanoTime() < deadline)
      Thread.sleep(10)
    releaseAll()
  }

  /** Return `result` with `release` armed to run after the first
    * driver action that executes it (success or failure). If the
    * caller never acts on the frame, the listener stays registered but
    * idle — bounded, observable via [[pendingCount]], and reclaimable
    * via [[releaseAll]].
    *
    * Matching is by node IDENTITY (`eq`), not `sameResult`: listener
    * delivery is asynchronous, and semantic plan equality would let a
    * PREVIOUS run's late-delivered event fire a lease armed on an
    * identical plan built afterwards (bench reps re-invoke the query
    * fn with byte-identical plans) — releasing a cache BEFORE the
    * action that needs it. An action on the armed frame embeds the
    * frame's analyzed tree by reference (re-analysis is idempotent on
    * already-analyzed subtrees), so identity matches exactly the
    * owning run. */
  def releaseAfterAction(result: DataFrame)(release: () => Unit): DataFrame = {
    val session = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private def fire(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.collectFirst {
            case p if p eq target => ()
          }.isDefined
          catch { case _: Throwable => false }
        if (hit && done.compareAndSet(false, true)) {
          release()
          session.listenerManager.unregister(this)
          pending.removeIf(p => p.listener eq this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = fire(qe)
    }
    pending.add(PendingLease(session, listener, release,
      target.schema.fieldNames.take(4).mkString("(", ",", ")")))
    session.listenerManager.register(listener)
    result
  }
}
