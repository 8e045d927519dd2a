package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking

/** [[Ranking.globalRank]] / [[Ranking.exactNtile]] — the scale-safe
  * exact global ranking (VERDICT r07 item 1). The contract is equality
  * with the single-partition window forms (`row_number`/`ntile` over an
  * unpartitioned window) on every tie/size shape that exercises the
  * bucket-boundary arithmetic.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (score, id) fixture with heavy ties and a non-divisible count. */
  private def fixture(n: Int, distinctScores: Int) =
    spark.range(n.toLong).select(
      (pmod(xxhash64(col("id")), lit(distinctScores)).cast("double") / 10)
        .as("score"),
      col("id"))

  test("globalRank equals row_number over a global sort") {
    for ((n, ds) <- Seq((1, 1), (7, 3), (100, 5), (100, 100), (97, 1))) {
      val df = fixture(n, ds)
      val expected = df.withColumn("rank",
        row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
        .select(col("id"), col("rank")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Ranking.globalRank(df, "score", "id")
        .select(col("id"), col("rank")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"n=$n distinct=$ds")
    }
  }

  test("exactNtile equals ntile over a global sort (tie-splitting included)") {
    for {
      (n, ds) <- Seq((1, 1), (4, 2), (7, 3), (100, 5), (100, 100), (97, 1), (3, 3))
      buckets <- Seq(1, 2, 4, 7)
    } {
      val df = fixture(n, ds)
      val expected = df.withColumn("q",
        ntile(buckets).over(Window.orderBy(col("score"), col("id"))))
        .select(col("id"), col("q")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranking.exactNtile(df, "score", "id", buckets, "q")
        .select(col("id"), col("q")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected, s"n=$n distinct=$ds buckets=$buckets")
    }
  }

  test("globalRank can carry the total row count") {
    val df = fixture(42, 7)
    val rows = Ranking.globalRank(df, "score", "id", "rank", Some("n_total"))
      .select(col("n_total")).distinct().collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(42L))
  }

  test("exactQuantiles equals the sorted order statistic (quantile_disc rule)") {
    for ((n, ds) <- Seq((1, 1), (7, 3), (100, 5), (100, 100), (97, 1))) {
      val df = fixture(n, ds)
      val sorted = df.select(col("score")).collect().map(_.getDouble(0)).sorted
      val got = Ranking.exactQuantiles(df, "score", Seq(1, 50, 90, 99, 100))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      for (p <- Seq(1, 50, 90, 99, 100)) {
        val rank = (p * n + 99) / 100 // ceil(p*n/100), 1-based
        assert(got(p) == sorted(rank - 1), s"n=$n distinct=$ds p=$p")
      }
    }
  }

  test("exactQuantilesBy equals per-group sorted order statistics in one pass") {
    val df = fixture(100, 5).withColumn("grp",
      (col("id") % 3).cast("int").cast("string"))
    val byGroup = df.select(col("grp"), col("score")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    val got = Ranking.exactQuantilesBy(df, "grp", "score", Seq(1, 50, 100))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size === byGroup.size * 3)
    for ((g, sorted) <- byGroup; p <- Seq(1, 50, 100)) {
      val rank = (p * sorted.length + 99) / 100
      assert(got((g, p)) == sorted(rank - 1), s"grp=$g p=$p")
    }
    // one scan: the ps join must be a broadcast over the histogram,
    // never a corpus-side nested loop
    val plan = Ranking.exactQuantilesBy(df, "grp", "score", Seq(1, 50))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("groupedRank equals the partitioned row_number window (asc + desc)") {
    val df = fixture(200, 7).withColumn("grp", (col("id") % 4).cast("int"))
    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("score").desc else col("score").asc
      val expect = df.withColumn("want", row_number().over(
        Window.partitionBy(col("grp")).orderBy(ord, col("id"))))
      val got = Ranking.groupedRank(df, Seq("grp"), "score", "id", "got",
        descending = desc)
      val joined = expect.join(got, Seq("grp", "score", "id"))
      assert(joined.count() === 200, s"desc=$desc")
      assert(joined.where(col("want") =!= col("got")).count() === 0,
        s"desc=$desc: every rank must match the window form")
    }
    // Empty group list = the global form.
    val g0 = Ranking.groupedRank(fixture(50, 5), Nil, "score", "id", "r")
    val gr = Ranking.globalRank(fixture(50, 5), "score", "id", "r")
    assert(g0.select("score", "id", "r").collect().toSet ===
      gr.select("score", "id", "r").collect().toSet)
  }

  test("globalRank plan has no unsanctioned unpartitioned WindowExec") {
    val df = Ranking.exactNtile(fixture(100, 5), "score", "id", 4, "q")
    df.write.format("noop").mode("overwrite").save()
    val hits = WindowTripwire.scan(df.queryExecution.executedPlan)
    assert(hits.isEmpty, s"corpus-scale single-partition window:\n${hits.mkString("\n")}")
  }
}
