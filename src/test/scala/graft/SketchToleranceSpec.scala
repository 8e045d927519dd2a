package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounds on the sketches q67 rides (SURVEY §4 approximate tier): HLL++
  * distinct counts and percentile_approx quantiles vs exact mirrors on
  * a synthetic HIGH-cardinality corpus — the regime where sketches can
  * actually drift (q67's real-corpus vocab is small enough that the
  * sketch is near-exact there). Sketches are deterministic on fixed
  * input, so these bounds cannot flake. */
class SketchToleranceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct at rsd=0.02 lands within 5% on 200k distincts") {
    val df = spark.range(200000).select(
      md5(col("id").cast("string")).as("k"))
    val r = df.agg(
      count_distinct(col("k")).as("exact"),
      approx_count_distinct(col("k"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) <= exact * 0.05,
      s"HLL estimate $approx drifted beyond 5% of $exact")
  }

  test("percentile_approx at accuracy 10000 lands within 1% on a skewed column") {
    val df = spark.range(100000).select(
      (pow(col("id").cast("double") / 100000.0, 3.0) * 1000.0).as("v"))
    val r = df.agg(
      expr("percentile(v, 0.5)").as("p50"),
      percentile_approx(col("v"), lit(0.5), lit(10000)).as("a50"),
      expr("percentile(v, 0.9)").as("p90"),
      percentile_approx(col("v"), lit(0.9), lit(10000)).as("a90")).collect()(0)
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) <=
      math.max(1.0, r.getDouble(0) * 0.01))
    assert(math.abs(r.getDouble(3) - r.getDouble(2)) <=
      math.max(1.0, r.getDouble(2) * 0.01))
  }

  test("q67 flags are all true on both small SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val row = graft.queries.ExtQueries.q67CorpusSketch(spark, dir).collect()(0)
      val flags = Seq("vocab_approx_ok", "shingles_approx_ok",
        "len_p50_approx_ok", "len_p90_approx_ok")
      flags.foreach { f =>
        assert(row.getAs[Int](f) == 1, s"$f is false at $dir")
      }
    }
  }
}
