package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.TopKByScore

/** Specs for the bounded top-k aggregate: window-equivalence on random
  * data (incl. ties), cross-partition merge, and the k bound.
  */
class TopKByScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topk(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())

  test("matches the window row_number form on random data with many ties") {
    val rnd = new scala.util.Random(17)
    // 40 partitions force partial buffers + serialize/merge; coarse
    // scores force tie-breaks on id.
    val df = (0 until 2000).map(i =>
      (i % 7L, (rnd.nextInt(10) / 10.0), i.toLong))
      .toDF("g", "s", "id").repartition(40)
    val viaAgg = df.groupBy($"g").agg(topk($"s", $"id", 5).as("t"))
      .select($"g", posexplode($"t").as(Seq("pos", "e")))
      .select($"g", $"e.id", ($"pos" + 1).cast("int").as("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"s".desc, $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5).select($"g", $"id", $"rank".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k return all rows, ranked") {
    val out = Seq((1L, 0.5, 10L), (1L, 0.9, 11L))
      .toDF("g", "s", "id")
      .groupBy($"g").agg(topk($"s", $"id", 5).as("t"))
      .select(posexplode($"t").as(Seq("pos", "e")))
      .select($"e.id").as[Long].collect().toSeq
    assert(out == Seq(11L, 10L))
  }
}
