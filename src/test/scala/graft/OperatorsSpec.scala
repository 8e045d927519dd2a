package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Unit specs for the parity-tier operator clusters (SURVEY.md §2). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P1 renameVariants applies present variants, skips absent") {
    val df = Seq((1L, "x")).toDF("Start Date", "other")
    val out = Projections.renameVariants(df,
      Map("Start Date" -> "start_date", "End Date" -> "end_date"))
    assert(out.columns.toSeq == Seq("start_date", "other"))
  }

  test("P2 dropIfExists drops only existing columns") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Projections.dropIfExists(df, Seq("b", "zzz")).columns.toSeq == Seq("a"))
  }

  test("P5 castCols casts present columns only") {
    val df = Seq(("12", "x")).toDF("id", "s")
    val out = Projections.castCols(df, Map("id" -> LongType, "nope" -> LongType))
    assert(out.schema("id").dataType == LongType)
    assert(out.select("id").as[Long].head() == 12L)
  }

  test("A1 null audit counts nulls and NaNs, only NaNs on float cols") {
    val df = Seq(
      (Some(1L), Some(1.0), Some("a")),
      (None, Some(Double.NaN), None),
      (Some(3L), None, Some("c"))).toDF("id", "v", "s")
    val row = NullAudit.audit(df).head()
    assert(row.getLong(0) == 1) // id: one null
    assert(row.getLong(1) == 2) // v: one null + one NaN
    assert(row.getLong(2) == 1) // s: one null, isnan not applied
  }

  test("A1 null audit honors excluded columns") {
    val df = Seq((1, 2)).toDF("keep", "skip")
    assert(NullAudit.audit(df, exclude = Seq("skip")).columns.toSeq == Seq("keep"))
  }

  test("A3 deterministic dedup keeps the first row per key under order") {
    val df = Seq((1, "b", 10), (1, "a", 20), (2, "c", 30))
      .toDF("k", "ord", "v")
    val out = Dedup.deterministic(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "a", 20), (2, "c", 30)))
  }

  test("A3 dedup is idempotent and key-unique") {
    val df = Seq((1, "x"), (1, "y"), (2, "z"), (2, "z")).toDF("k", "v")
    val once = Dedup.deterministic(df, Seq("k"), Seq(col("v")))
    val twice = Dedup.deterministic(once, Seq("k"), Seq(col("v")))
    assert(once.count() == 2 && twice.count() == 2)
    assert(once.select("k").distinct().count() == once.count())
  }

  test("U1 unionDistinct dedups across branches (SQL UNION semantics)") {
    val a = Seq(1, 2).toDF("x"); val b = Seq(2, 3).toDF("x")
    assert(SetOps.unionDistinct(a, b).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("U2 unionByNameDedup tolerates missing columns") {
    val a = Seq((1, "n1")).toDF("id", "name")
    val b = Seq(2).toDF("id")
    val out = SetOps.unionByNameDedup(a, b, Seq("id")).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(1)) // missing column filled with null
  }

  test("J1 NOT IN null trap: null on dim side empties the result") {
    val probe = Seq(Some(1L), Some(2L), None).toDF("k")
    val dimWithNull = Seq(Some(1L), None).toDF("station_id")
    val dimNoNull = Seq(Some(1L)).toDF("station_id")
    val empty = Augment.newKeys(spark, probe,
      Seq("k" -> "new_key"), dimWithNull, "station_id")
    val found = Augment.newKeys(spark, probe,
      Seq("k" -> "new_key"), dimNoNull, "station_id")
    assert(empty.count() == 0,
      "NOT IN with a null subquery value must yield no rows")
    assert(found.as[Long].collect().toSeq == Seq(2L))
  }

  test("F3 datetime dim: attributes match known timestamp, dedup across sources") {
    val a = Seq("2021-03-07 14:30:05").toDF("ts") // a Sunday
      .select(to_timestamp($"ts").as("t"))
    val out = operators.DatetimeDim.build(Seq(a -> $"t", a -> $"t")).head()
    assert(out.getAs[Int]("year") == 2021)
    assert(out.getAs[Int]("week_day") == 1) // Spark dayofweek: Sunday=1
    assert(out.getAs[Int]("month") == 3)
    assert(out.getAs[Int]("day") == 7)
    assert(out.getAs[Int]("hour") == 14)
    assert(out.getAs[Int]("minute") == 30)
    assert(out.getAs[Int]("second") == 5)
    assert(operators.DatetimeDim.build(Seq(a -> $"t", a -> $"t")).count() == 1)
  }

  test("datetime dim drops null timestamps") {
    val df = Seq(Some("2021-01-01 00:00:00"), None).toDF("ts")
      .select(to_timestamp($"ts").as("t"))
    assert(operators.DatetimeDim.build(Seq(df -> $"t")).count() == 1)
  }
}
