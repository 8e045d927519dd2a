package graft.operators

/** Overlap independent state-write branches on driver threads (guide
  * §2.6 — submit independent jobs concurrently so each job's stage
  * tail back-fills the others): a state-writing pass is a sequence of
  * SMALL actions whose per-job scheduling/AQE floors, not CPU,
  * dominate at batch scale. Branches run on FRESH threads
  * (SparkContext's InheritableThreadLocal properties — job group,
  * description — carry over from the calling thread); ALL branches
  * complete before the first failure rethrows, so no branch's
  * in-flight writes race the caller's cleanup.
  *
  * Caller rules (the r14 discipline): branch DAGs must be independent
  * — in particular, two branches must not race to first-materialize
  * the same unpersisted or persisted-but-cold parent, or they
  * duplicate its compute; materialize shared parents before
  * overlapping. Used by the curation cadence's state groups and the
  * retrieval-state writers; same-session A/Bs in OPTIMIZATION_r14.md.
  */
object DriverOverlap {
  /** Launch ONE branch on a fresh driver thread and return its JOIN
    * hook — the deferred form of [[overlapped]] for a write whose only
    * ordering constraint is "complete before X" where X is later than
    * the next statement (e.g. a state-slice write that must land
    * before the shared cache releases, but is independent of the
    * stages in between). Same caller rules: the branch must not race a
    * cold shared parent — materialize it first. The join hook rethrows
    * the branch's failure; call it on every path that needs the write
    * durable (a caller failure path that skips the join only abandons
    * an in-flight write into a dir the failed run already makes
    * unreadable). */
  def launch(branch: () => Unit): () => Unit = {
    val join = launchValue(branch)
    () => { join(); () }
  }

  /** [[launch]] returning the branch's value from the join hook —
    * for eagerly-materialized frames (a checkpoint) a later stage
    * consumes. Same caller rules. */
  def launchValue[A](branch: () => A): () => A = {
    val t = new java.util.concurrent.FutureTask[A](
      new java.util.concurrent.Callable[A] { def call(): A = branch() })
    val th = new Thread(t, "graft-state-branch")
    th.setDaemon(true); th.start()
    () => try t.get() catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  def overlapped[A](branches: Seq[() => Unit])(main: => A): A = {
    val tasks = branches.map { b =>
      val t = new java.util.concurrent.FutureTask[Unit](
        new java.util.concurrent.Callable[Unit] { def call(): Unit = b() })
      val th = new Thread(t, "graft-state-branch")
      th.setDaemon(true); th.start(); t
    }
    val mainRes = scala.util.Try(main)
    val branchErr = tasks.flatMap { t =>
      scala.util.Try(t.get()).failed.toOption.map {
        case e: java.util.concurrent.ExecutionException => e.getCause
        case e => e
      }
    }.headOption
    mainRes match {
      case scala.util.Success(r) => branchErr.foreach(e => throw e); r
      case scala.util.Failure(e) => throw e
    }
  }
}
