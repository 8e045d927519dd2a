package graft.pipeline

import org.apache.spark.sql.DataFrame

/** The versioned-swap serving-session shape shared by every serving
  * family (VERDICT r11 item 3's extraction note: `AnnServeSession` and
  * `Bm25ServeSession` implemented this contract twice; the LM family
  * is the third instantiation, so the shape lives here ONCE and the
  * family classes delegate).
  *
  * Contract: a long-lived `foreachBatch` server answers each
  * micro-batch under the state version current AT THAT BATCH — the
  * micro-batch is a plain DataFrame, so each batch runs the family's
  * BATCH serving path (bit-equal per query by each family's spec)
  * against a `@volatile` version handle, and no stateful streaming
  * operator exists anywhere in the plan. `swapTo` loads and WARMS the
  * next version before redirecting (the first post-swap batch never
  * pays the state scan inline); an in-flight batch finishes under the
  * version it started with via its local reference; the old static
  * side releases after the redirect. Swap/close are synchronized: two
  * concurrent swaps (or a swap racing close) would both read the same
  * old handle and strand one persisted corpus-scale cache for the
  * server's lifetime — the pinned-cache hazard class. Result rows
  * carry the answering `state_version` (tagged by the family's
  * `answerWith`), so consumers can attribute every hit to the exact
  * state that produced it.
  *
  * Composition over inheritance: the family passes `load` / `release`
  * / `answerWith` as plain functions, fully constructed before this
  * class touches them — no virtual-call-from-constructor hazard, and
  * the family keeps its public type and factory untouched.
  *
  * @param load      load + WARM one version's static side (persist +
  *                  a toRdd count — no per-stage plan updates on a
  *                  serving driver)
  * @param release   unpersist a version's static side
  * @param answerWith answer one query batch under (payload, version
  *                  dir), tagging rows with the version
  */
final class VersionedServeSession[P](
    initialStateDir: String,
    load: String => P,
    release: P => Unit,
    answerWith: (DataFrame, P, String) => DataFrame) {

  private final case class V(dir: String, payload: P)
  @volatile private var current: V = V(initialStateDir, load(initialStateDir))

  /** The state version currently answering. */
  def version: String = current.dir

  /** Swap to a new state version (a rebase boundary): load + warm,
    * atomically redirect, release the old static side. Swapping to
    * the CURRENT version is a no-op: Spark's CacheManager keys cached
    * data by logical plan, so a same-dir reload resolves to the very
    * cache entry the old payload holds and releasing the old side
    * would evict the "new" one with it — a double-fired rebase
    * notifier would otherwise leave the server permanently un-warmed
    * (round-12 review finding #2). */
  def swapTo(stateDir: String): Unit = this.synchronized {
    if (stateDir != current.dir) {
      val next = V(stateDir, load(stateDir))
      val old = current
      current = next
      release(old.payload)
    }
  }

  /** One query batch answered under the CURRENT version. */
  def answer(queries: DataFrame): DataFrame = {
    val v = current
    answerWith(queries, v.payload, v.dir)
  }

  /** Serve a STREAM of queries: per micro-batch, [[answer]] under the
    * version current at that batch; result rows hand to `sink`. */
  def serve(queries: DataFrame, checkpoint: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => sink(answer(batch)) }
      .start()

  /** Release the current version's persisted static side. */
  def close(): Unit = this.synchronized(release(current.payload))
}
