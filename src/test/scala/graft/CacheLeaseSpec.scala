package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CacheLease

/** CacheLease contract (VERDICT r04 item 4): a catalog entry that
  * persists an intermediate and returns a lazy plan must release the
  * cache after — and only after — the caller's action on that plan. */
class CacheLeaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def awaitRelease(cached: org.apache.spark.sql.DataFrame): Boolean = {
    val deadline = System.nanoTime() + 30e9.toLong
    while (cached.storageLevel != StorageLevel.NONE &&
      System.nanoTime() < deadline) Thread.sleep(50)
    cached.storageLevel == StorageLevel.NONE
  }

  test("release fires after the action on the leased frame, not before") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k").persist()
    val leased = CacheLease.releaseAfterAction(
      base.groupBy("k").count())(() => base.unpersist())

    // An action on an UNRELATED frame must not release the lease.
    Seq(1, 2, 3).toDF("x").write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    assert(base.storageLevel != StorageLevel.NONE,
      "unrelated action must not trigger the release")

    // The leased frame's own action does (listener delivery is async).
    leased.write.format("noop").mode("overwrite").save()
    assert(awaitRelease(base), "cache must be released after the action")
  }

  test("each lease releases independently (bench-rep shape)") {
    val a = Seq((1L, "x")).toDF("id", "k").persist()
    val b = Seq((2L, "y")).toDF("id", "k").persist()
    val la = CacheLease.releaseAfterAction(a.select("k"))(() => a.unpersist())
    val lb = CacheLease.releaseAfterAction(b.select("k"))(() => b.unpersist())
    la.write.format("noop").mode("overwrite").save()
    assert(awaitRelease(a))
    assert(b.storageLevel != StorageLevel.NONE,
      "sibling lease must stay armed until its own action")
    lb.write.format("noop").mode("overwrite").save()
    assert(awaitRelease(b))
  }

  test("quiesceThenReleaseAll does not count a healthy (async-firing) lease as a leak") {
    CacheLease.releaseAll() // drain leftovers from other suites
    val base = Seq((7L, "w")).toDF("id", "k").persist()
    CacheLease.releaseAfterAction(base.select("k"))(() => base.unpersist())
      .write.format("noop").mode("overwrite").save()
    // Listener delivery is async: an immediate releaseAll here could
    // race the event and miscount the healthy lease as a leak (seen in
    // a bench run: every lease "reclaimed"). The quiesce variant waits
    // for delivery first.
    val reclaimed = CacheLease.quiesceThenReleaseAll(graceMs = 10000L)
    assert(reclaimed == 0, "a lease that fires on its own action is not a leak")
    assert(awaitRelease(base))
  }

  test("leaked lease is observable and drained by releaseAll (VERDICT r06 item 6)") {
    CacheLease.releaseAll() // quiesce: drain leftovers from other suites
    val base = Seq((9L, "z")).toDF("id", "k").persist()
    val pendingBefore = CacheLease.pendingCount
    val reclaimedBefore = CacheLease.reclaimedCount
    CacheLease.releaseAfterAction(base.select("k"))(() => base.unpersist())
    assert(CacheLease.pendingCount == pendingBefore + 1,
      "an armed lease must be visible as pending")
    // Never act on the leased frame: the lease can only be reclaimed.
    val n = CacheLease.releaseAll()
    assert(n >= 1, "cleanup hook must reclaim the leaked lease")
    assert(awaitRelease(base), "reclaim must run the release hook")
    assert(CacheLease.pendingCount == 0, "drain leaves nothing pending")
    assert(CacheLease.reclaimedCount >= reclaimedBefore + 1,
      "the never-fired counter must record the leak")
  }
}
