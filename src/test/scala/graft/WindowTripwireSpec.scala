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
}
