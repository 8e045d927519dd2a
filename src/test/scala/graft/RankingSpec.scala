package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking

/** [[Ranking.globalRank]] / [[Ranking.exactNtile]] — the scale-safe
  * exact global ranking (VERDICT r07 item 1; r08 item 1 tie-group
  * hardening). The contract is equality with the single-partition
  * window forms (`row_number`/`ntile` over an unpartitioned window
  * ordered by (value, md5 tie order)) on every tie/size shape that
  * exercises the bucket-boundary arithmetic — INCLUDING the
  * 2-distinct-value skewed fixture where the old per-value tie-group
  * partition degenerated to half the corpus on one task.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The operator's tie order: md5 of the string-cast tiebreak, then
    * the tiebreak itself. */
  private def tieOrd(c: String) = md5(col(c).cast("string"))

  /** (score, id) fixture with heavy ties and a non-divisible count. */
  private def fixture(n: Int, distinctScores: Int) =
    spark.range(n.toLong).select(
      (pmod(xxhash64(col("id")), lit(distinctScores)).cast("double") / 10)
        .as("score"),
      col("id"))

  /** The r08 hazard fixture: a LOW-cardinality (2-value) metric with a
    * 90/10 skew — the shape whose tie group IS the corpus. */
  private def skewedBool(n: Int) =
    spark.range(n.toLong).select(
      (col("id") % 10 === 0).cast("int").as("score"), col("id"))

  test("globalRank equals row_number over a global (value, md5-tie) sort") {
    for ((n, ds) <- Seq((1, 1), (7, 3), (100, 5), (100, 100), (97, 1))) {
      val df = fixture(n, ds)
      val expected = df.withColumn("rank",
        row_number().over(
          Window.orderBy(col("score"), tieOrd("id"), col("id"))).cast("long"))
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
        ntile(buckets).over(Window.orderBy(col("score"), tieOrd("id"), col("id"))))
        .select(col("id"), col("q")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranking.exactNtile(df, "score", "id", buckets, "q")
        .select(col("id"), col("q")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected, s"n=$n distinct=$ds buckets=$buckets")
    }
  }

  test("2-distinct-value skewed fixture: all forms equal their window twins (r08 item 1)") {
    // The fixture that bites the old implementation at scale: one tie
    // group holds 90% of rows. Equality must hold for globalRank (asc),
    // groupedRank (asc + desc), and exactNtile — and the plan must
    // split the tie group across md5 sub-buckets (no per-row window
    // partitioned by the order value alone).
    val df = skewedBool(1000).withColumn("grp", (col("id") % 3).cast("int"))
    val wantG = df.withColumn("want", row_number().over(
      Window.orderBy(col("score"), tieOrd("id"), col("id"))).cast("long"))
    val gotG = Ranking.globalRank(df, "score", "id", "rank")
    assert(wantG.join(gotG, Seq("score", "id", "grp"))
      .where(col("want") =!= col("rank")).count() === 0, "globalRank")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("score").desc else col("score").asc
      val want = df.withColumn("want", row_number().over(
        Window.partitionBy(col("grp")).orderBy(ord, tieOrd("id"), col("id"))))
      val got = Ranking.groupedRank(df, Seq("grp"), "score", "id", "got",
        descending = desc)
      val j = want.join(got, Seq("grp", "score", "id"))
      assert(j.count() === 1000, s"desc=$desc")
      assert(j.where(col("want") =!= col("got")).count() === 0,
        s"desc=$desc: groupedRank must match the window form")
    }
    val wantN = df.withColumn("want",
      ntile(4).over(Window.orderBy(col("score"), tieOrd("id"), col("id"))))
    val gotN = Ranking.exactNtile(df, "score", "id", 4, "q")
    assert(wantN.join(gotN, Seq("score", "id", "grp"))
      .where(col("want") =!= col("q")).count() === 0, "exactNtile")
    // Plan shape: every per-row window partition must include the md5
    // tie bucket beside the order value — the two-level split that
    // keeps a dominant tie group off a single task.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] = {
      val self = p match { case w: WindowExec => Seq(w); case _ => Seq.empty }
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case _ => p.children
      }
      self ++ children.flatMap(windows)
    }
    gotG.write.format("noop").mode("overwrite").save()
    val wins = windows(gotG.queryExecution.executedPlan)
      .filter(_.partitionSpec.nonEmpty)
    def bnd(w: WindowExec): Boolean =
      w.expressions.exists(_.references.exists(
        _.name.startsWith(graft.WindowTripwire.Marker))) ||
        w.child.output.exists(_.name.startsWith(graft.WindowTripwire.Marker))
    // Per-row windows (the corpus-scale frames — NOT __bnd histogram
    // cumulatives) must partition by (value, tie-bucket), never the
    // value alone; the bounded histogram windows may carry one key
    // (the level-2 per-value bucket cumulative, <= 4096 rows/task).
    val perRow = wins.filterNot(bnd)
    assert(perRow.nonEmpty && perRow.forall(_.partitionSpec.size >= 2),
      "per-row window must partition by (value, tie-bucket), not the value alone")
  }

  test("null contract: null order/group rows are excluded, declared not accidental") {
    val df = Seq(
      (Some(1.0), Some("g"), 1L), (None, Some("g"), 2L),
      (Some(2.0), None, 3L), (Some(1.0), Some("g"), 4L),
      (Some(3.0), Some("h"), 5L))
      .toDF("score", "grp", "id")
    val global = Ranking.globalRank(df, "score", "id")
      .select("id").as[Long].collect().toSet
    assert(global === Set(1L, 3L, 4L, 5L),
      "globalRank drops only null-ORDER rows")
    val grouped = Ranking.groupedRank(df, Seq("grp"), "score", "id", "r")
      .select("id").as[Long].collect().toSet
    assert(grouped === Set(1L, 4L, 5L),
      "groupedRank drops null-order AND null-group rows")
    val q = Ranking.exactQuantilesBy(df, "grp", "score", Seq(100))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(q === Map("g" -> 1.0, "h" -> 3.0),
      "quantiles exclude null keys/values")
    // A NULL TIE value still ranks, drawing md5('') — and its POSITION
    // matches the documented window twin exactly (ADVICE r09: md5('')
    // = 'd41d8cd9...' sorts mid-range among the hex draws, NOT
    // nulls-first; only within an equal-md5 group does the trailing
    // tieCol order apply). Pin the ORDER, not just the count, against
    // row_number over (orderCol, md5(coalesce(cast(tie), '')), tie).
    val tn = Seq(
      (1.0, Some("a")), (1.0, Option.empty[String]), (1.0, Some("zz")),
      (1.0, Some("b")), (2.0, Option.empty[String]), (2.0, Some("k")))
      .toDF("score", "id")
    val got = Ranking.globalRank(tn, "score", "id")
      .select(col("rank"), col("score"), col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)))).toSet
    val twinW = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"),
        md5(coalesce(col("id").cast("string"), lit(""))), col("id"))
    val want = tn
      .withColumn("rank", row_number().over(twinW).cast("long"))
      .select(col("rank"), col("score"), col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)))).toSet
    assert(got === want,
      "null-tie rows must rank exactly where the documented twin puts them")
  }

  test("balancedShards never loses a null-weight document (ADVICE r08)") {
    val docs = Seq(
      (0L, "g", Some(10L)), (1L, "g", Option.empty[Long]), (2L, "g", Some(8L)))
      .toDF("doc_id", "source", "n_tokens")
    val byDoc = graft.operators.DataMix
      .balancedShards(docs, "doc_id", "source", "n_tokens", shards = 2)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(byDoc.keySet === Set(0L, 1L, 2L),
      "the null-weight doc must still get a shard")
    assert(byDoc(0L) === 0 && byDoc(2L) === 1 && byDoc(1L) === 0,
      "null coalesces to weight 0 and ranks last (10, 8, null)")
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
        Window.partitionBy(col("grp")).orderBy(ord, tieOrd("id"), col("id"))))
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
