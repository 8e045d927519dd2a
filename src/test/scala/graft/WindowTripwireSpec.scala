package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[WindowTripwire]] — red on the exact r07 q108 defect shape (an
  * unpartitioned corpus-scale `ntile`), green on the histogram rewrite
  * and on every sanctioned bounded-frame site. The counter path is
  * exercised through the registered listener, not just [[WindowTripwire
  * .scan]], so a regression in listener plumbing (AQE wrapping, async
  * delivery) fails here too.
  */
class WindowTripwireSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = spark.range(1000L).select(
    (pmod(xxhash64(col("id")), lit(37)).cast("double") / 10).as("score"),
    col("id"))

  /** Run an action and poll (listener delivery is async) until the
    * counter moves or the deadline passes; returns the delta. */
  private def countedDelta(df: org.apache.spark.sql.DataFrame,
      expectMove: Boolean): Int = {
    val before = WindowTripwire.globalWindows
    df.write.format("noop").mode("overwrite").save()
    val deadline = System.nanoTime() + 10000000000L
    while (expectMove && WindowTripwire.globalWindows == before &&
        System.nanoTime() < deadline)
      Thread.sleep(20)
    if (!expectMove) Thread.sleep(500) // grace for a late false positive
    WindowTripwire.globalWindows - before
  }

  test("red branch: the r07 q108 shape (unpartitioned ntile) trips the counter") {
    val bad = corpus.withColumn("q",
      ntile(4).over(Window.orderBy(col("score"), col("id"))))
    assert(countedDelta(bad, expectMove = true) >= 1,
      "an unpartitioned corpus-scale window must be counted")
    assert(WindowTripwire.messages.exists(_.contains("Window")),
      s"hit fragment should carry the plan node: ${WindowTripwire.messages}")
  }

  test("green branch: the exactNtile rewrite does not trip it") {
    val good = graft.operators.Ranking.exactNtile(corpus, "score", "id", 4, "q")
    assert(countedDelta(good, expectMove = false) === 0,
      s"sanctioned histogram windows must not count: ${WindowTripwire.messages}")
  }

  test("sanctioned production sites stay green: perplexityBuckets, shardBalance, topK rank") {
    import graft.operators.{DataMix, TextAnalysis}
    import spark.implicits._
    val docs = TestSpark.nonFoldable(
      Seq("the quick brown fox", "lazy dogs sleep here", "the quick red fox",
        "words repeat the words"), "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val ppl = TextAnalysis.perplexityBuckets(docs, docs, "doc_id", "text")
    assert(countedDelta(ppl, expectMove = false) === 0,
      s"histogram-cumulative window is bounded: ${WindowTripwire.messages}")
    val sb = DataMix.shardBalance(
      Seq((0, 10L), (1, 20L), (0, 5L)).toDF("shard", "n_tokens"), "n_tokens")
    assert(countedDelta(sb, expectMove = false) === 0,
      s"|shards|-row max window is bounded: ${WindowTripwire.messages}")
  }

  test("scan finds the defect through AQE wrapping") {
    val bad = corpus
      .groupBy(col("score")).agg(count(lit(1)).as("n")) // force an exchange so AQE engages
      .withColumn("r", row_number().over(Window.orderBy(col("n"), col("score"))))
    bad.write.format("noop").mode("overwrite").save()
    val hits = WindowTripwire.scan(bad.queryExecution.executedPlan)
    assert(hits.nonEmpty, "scan must descend into the adaptive plan")
  }

  /** 90/10-skewed keyed frame, sized past [[WindowTripwire.SkewMinBytes]]
    * even after shuffle compression (md5 payloads resist lz4). */
  private def skewedFrame = spark.range(300000L).select(
    when(pmod(col("id"), lit(10)) =!= 0, lit("hot"))
      .otherwise(concat(lit("c"), pmod(col("id"), lit(1000)))).as("k"),
    md5(col("id").cast("string")).as("payload"),
    col("id"))

  private def skewDelta(df: org.apache.spark.sql.DataFrame,
      expectMove: Boolean): Int = {
    val before = WindowTripwire.skewWindows + WindowTripwire.bndOverflows
    df.write.format("noop").mode("overwrite").save()
    val deadline = System.nanoTime() + 10000000000L
    while (expectMove &&
        WindowTripwire.skewWindows + WindowTripwire.bndOverflows == before &&
        System.nanoTime() < deadline)
      Thread.sleep(20)
    if (!expectMove)
      org.apache.spark.graft.SparkShims
        .waitUntilListenerBusEmpty(spark, 10000L)
    WindowTripwire.skewWindows + WindowTripwire.bndOverflows - before
  }

  test("bnd-overflow red branch: a __bnd claim past the cap trips window_bnd_overflow") {
    // The marker exempts a window from BOTH counters on the claim
    // that its single-task frame is bounded; the cap audits that
    // claim at runtime. Lower the cap to spec scale to drive the red
    // branch (the production 256 MiB is untestable in a unit), then
    // restore: the same sanctioned window under the real cap is
    // green.
    val claimed = skewedFrame
      .withColumnRenamed("payload", "__bnd_payload")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("id"), col("__bnd_payload"))))
    val restore = WindowTripwire.bndCapBytes
    try {
      WindowTripwire.bndCapBytes = 1024L
      val before = WindowTripwire.skewWindows
      assert(skewDelta(claimed, expectMove = true) >= 1,
        "a stale bounded claim must be counted at runtime")
      assert(WindowTripwire.bndMessages.exists(_.contains("bnd-claim overflow")),
        s"hit should name the overflow: ${WindowTripwire.bndMessages}")
      assert(!WindowTripwire.skewMessages.exists(_.contains("bnd-claim")),
        "overflow hits must not be filed under the skew log")
      assert(WindowTripwire.skewWindows == before,
        "an overflowing __bnd claim is a bnd hit, not a skew hit")
    } finally WindowTripwire.bndCapBytes = restore
    assert(skewDelta(claimed, expectMove = false) === 0,
      s"the same claim under the real cap is green: ${WindowTripwire.skewMessages}")
  }

  test("skew red branch: a single-key-dominated partitioned window trips window_skew") {
    // The q103/q106/q133 class: a partition key EXISTS (so the
    // plan-shape counter stays silent) but one key holds 90% of a
    // multi-MiB frame — the dominant task sorts most of the corpus.
    val bad = skewedFrame.withColumn("rn",
      row_number().over(Window.partitionBy(col("k"))
        .orderBy(col("id"))))
    assert(skewDelta(bad, expectMove = true) >= 1,
      "a 90%-skewed partitioned window must be counted at runtime")
    assert(WindowTripwire.skewMessages.exists(_.contains("dominant")),
      s"hit should name the dominant partition: ${WindowTripwire.skewMessages}")
  }

  test("skew green branch: tie-bucket ranking and histogram sites stay silent") {
    // The SAME skewed data through the engine's own rank operator: the
    // md5 tie-bucket split spreads the dominant tie group across 4096
    // sub-buckets, and the __bnd histogram cumulative stays under the
    // bounded-claim cap — neither counter may move.
    val ranked = graft.operators.Ranking.globalRank(
      skewedFrame.select(col("id"), col("payload"),
        (pmod(col("id"), lit(10)) === 0).cast("int").as("flag")),
      "flag", "id", "rank")
    assert(skewDelta(ranked, expectMove = false) === 0,
      s"tie-bucket rank must not read as skew: ${WindowTripwire.skewMessages}")
  }

  test("scale-aware bnd cap: derived from the task memory share, red under a small budget (VERDICT r09 item 7)") {
    // The cap math is a pure function: one task's unified-memory share,
    // floored so tiny boxes don't turn legit histograms into noise.
    assert(WindowTripwire.derivedBndCap(128L << 30, 32, 0.6) ===
      (((128L << 30) * 0.6) / 32).toLong,
      "a 128 GiB / 32-core session gets its real per-task share (~2.4 GiB)")
    assert(WindowTripwire.derivedBndCap(1L << 30, 32, 0.6) ===
      WindowTripwire.MinBndCapBytes,
      "a small box floors at MinBndCapBytes instead of flagging KB frames")
    // Red branch under a small configured budget: a __bnd claim whose
    // single-task frame exceeds the small box's derived cap trips the
    // overflow counter — the same claim is green under this box's cap.
    val smallCap = WindowTripwire.derivedBndCap(16L << 20, 4, 0.6)
    assert(smallCap === WindowTripwire.MinBndCapBytes)
    val claimed = skewedFrame
      .withColumnRenamed("payload", "__bnd_payload")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("id"), col("__bnd_payload"))))
    val restore = WindowTripwire.bndCapBytes
    try {
      // Drive the red branch below the floor too — the derivation
      // clamps, the AUDIT uses whatever the session derived; spec
      // scale frames are < MinBndCapBytes so exercise via a sub-floor
      // override exactly like a 4 GiB box with the floor lowered.
      WindowTripwire.bndCapBytes = 64L << 10
      assert(skewDelta(claimed, expectMove = true) >= 1,
        "a bounded claim past a small box's budget must trip")
    } finally WindowTripwire.bndCapBytes = restore
    assert(skewDelta(claimed, expectMove = false) === 0,
      s"the same claim under this box's derived cap is green: ${WindowTripwire.bndMessages}")
  }

  test("skew green branch: an __ent-marked entity window is sanctioned") {
    val ent = skewedFrame.withColumnRenamed("k", "__ent_k")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("__ent_k")).orderBy(col("id"))))
    assert(skewDelta(ent, expectMove = false) === 0,
      s"entity-sanctioned window must not count: ${WindowTripwire.skewMessages}")
  }
}
