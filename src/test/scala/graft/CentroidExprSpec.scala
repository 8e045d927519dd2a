package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.dot
import graft.functions.expr.{CentroidDistances, CentroidKernel, CentroidMatrix, NearestCentroidId}
import graft.operators.VectorSim

/** Specs for the referenced-matrix centroid expressions that replaced
  * the k-`typedLit` literal form (VERDICT r03 item 1): bit-parity with
  * the legacy column formula, null semantics, both execution paths, and
  * the k >= 1024 regime the literal form could not reach.
  */
class CentroidExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def distCol(embCol: Column, cen: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CentroidDistances(
      ColumnBridge.expression(embCol), CentroidMatrix(cen)))
  }

  private def nearestCol(embCol: Column, cen: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NearestCentroidId(
      ColumnBridge.expression(embCol), CentroidMatrix(cen)))
  }

  /** The exact pre-r04 column formula (k literals) as the parity oracle. */
  private def legacyDists(embCol: Column, cen: Seq[Array[Double]]): Column = {
    val xx = dot(embCol, embCol)
    array(cen.map { c =>
      val cc = c.map(x => x * x).sum
      round(xx - lit(2) * dot(embCol, typedLit(c.toSeq)) + lit(cc), 6)
    }: _*)
  }

  test("distances and argmin match the legacy literal formula bit-for-bit") {
    val rnd = new scala.util.Random(17)
    val cen = Seq.fill(7)(Array.fill(16)(rnd.nextGaussian()))
    val df = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val rows = df.select(
      distCol(col("embedding"), cen).as("nu"),
      legacyDists(col("embedding"), cen).as("legacy"),
      nearestCol(col("embedding"), cen).as("nn"))
      .as[(Seq[Double], Seq[Double], Int)].collect()
    rows.foreach { case (nu, legacy, nn) =>
      assert(nu == legacy, "rounded distances must be bit-identical")
      assert(nn == legacy.indexOf(legacy.min), "argmin must take the lowest index on ties")
    }
  }

  test("argmin resolves exact distance ties to the lowest centroid index") {
    // Two identical centroids: every vector is equidistant from both.
    val c = Array(1.0, 2.0)
    val df = Seq((0L, Seq(3f, 4f))).toDF("vec_id", "embedding")
    assert(df.select(nearestCol(col("embedding"), Seq(c, c))).as[Int].head() == 0)
  }

  test("null element and dim mismatch yield null; both execution paths agree") {
    val cen = Seq(Array(1.0, 0.0))
    val df = Seq(
      (0L, Some(Seq(Some(1f), Some(2f)))), // fine
      (1L, Some(Seq(Some(1f), None))), // null element
      (2L, Some(Seq(Some(1f)))), // dim mismatch
      (3L, None) // null operand
    ).toDF("vec_id", "embedding")
    def run(): Seq[(Option[Seq[Double]], Option[Int])] = df
      .select(distCol(col("embedding"), cen).as("d"), nearestCol(col("embedding"), cen).as("n"))
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getSeq[Double](0).toList),
        if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq
    val codegen = run()
    // Genuine eval()-path twin (NO_CODEGEN factories): whole-stage off
    // alone still compiles the projection, so it never tested eval.
    val interpreted = TestSpark.interpreted(run())
    assert(codegen == interpreted)
    assert(codegen.map(_._2) == Seq(Some(0), None, None, None))
    assert(codegen.head._1.get.head == CentroidKernel.round6((1.0 + 4.0) - 2.0 * 1.0 + 1.0))
  }

  test("k=1024 trains and assigns with a plan free of thousand-element literals") {
    // 5k synthetic vectors, dim 16, generated distributed (no driver
    // array): v_d = pmod(hash(id, d), 997)/499 - 1 as float.
    val dim = 16
    val k = 1024
    val e = spark.range(5000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod(hash(col("id"), d), lit(997)) / lit(499.0) - lit(1.0)).cast("float"))
        .as("embedding"))
    val cen = VectorSim.kmeansCentroids(e, k = k, iters = 1)
    assert(cen.size == k && cen.forall(_.length == dim))
    val assigned = VectorSim.kmeansAssignments(e, cen)
    // The literal form embedded k dim-length arrays: ~k*dim numeric
    // tokens in the plan string. The referenced-matrix form must keep
    // the executed plan O(1) in k.
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.length < 20000, s"plan string blew up with k=$k: ${plan.length} chars")
    val counts = assigned.groupBy("cluster").count()
    val n = counts.agg(sum("count")).as[Long].head()
    assert(n == 5000)
    val clusters = assigned.select("cluster").as[Int].collect()
    assert(clusters.forall(c => c >= 0 && c < k))
  }

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val olds = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
